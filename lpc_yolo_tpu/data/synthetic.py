"""Synthetic coco8-style dataset generator for tests and offline smoke runs.

The reference test-suite downloads the real 8-image coco8 dataset
(cfg/datasets/coco8.yaml); this environment is zero-egress, so tests generate
an equivalent tiny YOLO-format dataset: colored rectangles on noise, whose
boxes are exactly known — a detector can overfit it in a few hundred steps.
"""

from __future__ import annotations

from pathlib import Path
import numpy as np
import yaml


def make_synthetic_dataset(
    root: Path,
    n_train: int = 8,
    n_val: int = 4,
    imgsz: int = 160,
    nc: int = 3,
    max_boxes: int = 4,
    seed: int = 0,
    segments: bool = False,
) -> str:
    """Create images/{train,val} + labels/{train,val} + data.yaml; returns yaml path."""
    import cv2

    rng = np.random.RandomState(seed)
    root = Path(root)
    colors = [(60, 60, 220), (60, 220, 60), (220, 60, 60), (40, 200, 220), (220, 200, 40)]
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.randint(90, 140, (imgsz, imgsz, 3), np.uint8)
            rows = []
            for _ in range(rng.randint(1, max_boxes + 1)):
                c = rng.randint(0, nc)
                w, h = rng.randint(imgsz // 6, imgsz // 2, 2)
                x1 = rng.randint(0, imgsz - w)
                y1 = rng.randint(0, imgsz - h)
                cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), colors[c % len(colors)], -1)
                if segments:  # polygon row (YOLO-seg format): the rectangle corners
                    pts = [
                        (x1 / imgsz, y1 / imgsz), ((x1 + w) / imgsz, y1 / imgsz),
                        ((x1 + w) / imgsz, (y1 + h) / imgsz), (x1 / imgsz, (y1 + h) / imgsz),
                    ]
                    rows.append(f"{c} " + " ".join(f"{a:.6f} {b:.6f}" for a, b in pts))
                else:
                    rows.append(
                        f"{c} {(x1 + w / 2) / imgsz:.6f} {(y1 + h / 2) / imgsz:.6f} {w / imgsz:.6f} {h / imgsz:.6f}"
                    )
            cv2.imwrite(str(root / "images" / split / f"im{i:03d}.jpg"), img)
            (root / "labels" / split / f"im{i:03d}.txt").write_text("\n".join(rows) + "\n")
    data = {
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "nc": nc,
        "names": {i: f"class{i}" for i in range(nc)},
    }
    yaml_path = root / "data.yaml"
    yaml_path.write_text(yaml.safe_dump(data))
    return str(yaml_path)
