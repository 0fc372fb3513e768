"""Dataset converters + validators.

Behavioral spec: reference ultralytics/data/converter.py:216-400 (COCO-JSON ->
YOLO txt labels, 91->80 class map) and data/utils.py:251-470 (label
verification, HUBDatasetStats-style summary).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def coco91_to_coco80_class() -> List[Optional[int]]:
    """COCO paper 91-id space -> 80-class contiguous ids (converter.py:14-80)."""
    x: List[Optional[int]] = [None] * 91
    valid = [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25,
        27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 46, 47, 48, 49, 50, 51,
        52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77,
        78, 79, 80, 81, 82, 84, 85, 86, 87, 88, 89, 90,
    ]
    for i, v in enumerate(valid):
        x[v - 1] = i
    return x


def convert_coco(
    labels_json: str,
    save_dir: str,
    use_segments: bool = False,
    cls91to80: bool = True,
) -> str:
    """COCO instances json -> YOLO-format labels dir (converter.py:216-330)."""
    coco = json.loads(Path(labels_json).read_text())
    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    id_map = coco91_to_coco80_class()

    images = {img["id"]: img for img in coco["images"]}
    anns = defaultdict(list)
    for a in coco.get("annotations", []):
        anns[a["image_id"]].append(a)

    for img_id, img in images.items():
        h, w = img["height"], img["width"]
        rows = []
        for a in anns.get(img_id, []):
            if a.get("iscrowd"):
                continue
            cid = a["category_id"]
            c = id_map[cid - 1] if cls91to80 else cid - 1
            if c is None:
                continue
            x, y, bw, bh = a["bbox"]  # COCO ltwh
            cx, cy = (x + bw / 2) / w, (y + bh / 2) / h
            if bw <= 0 or bh <= 0:
                continue
            row = f"{c} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}"
            if use_segments and a.get("segmentation"):
                seg = a["segmentation"][0]
                pts = np.asarray(seg, float).reshape(-1, 2) / [w, h]
                row = f"{c} " + " ".join(f"{v:.6f}" for v in pts.reshape(-1))
            rows.append(row)
        name = Path(img["file_name"]).stem
        (out_dir / f"{name}.txt").write_text("\n".join(rows) + ("\n" if rows else ""))
    return str(out_dir)


def verify_dataset(data_yaml: str) -> Dict:
    """Scan a YOLO dataset and report per-split stats + label problems
    (data/utils.py verify_image_label semantics, aggregated)."""
    from .dataset import YOLODataset, check_det_dataset

    info = check_det_dataset(data_yaml)
    report: Dict = {"nc": info["nc"], "names": info["names"], "splits": {}}
    for split in ("train", "val", "test"):
        if split not in info:
            continue
        ds = YOLODataset(info[split], cache=False)
        n_boxes, n_bad, n_empty = 0, 0, 0
        class_hist = np.zeros(info["nc"], int)
        for lab in ds.labels:
            b = lab["bboxes"]
            if len(b) == 0:
                n_empty += 1
                continue
            bad = (b < 0).any(axis=1) | (b[:, :4] > 1).any(axis=1)
            oob = (lab["cls"] < 0) | (lab["cls"] >= info["nc"])
            n_bad += int(bad.sum() + oob.sum())
            n_boxes += len(b)
            for c in lab["cls"]:
                if 0 <= c < info["nc"]:
                    class_hist[c] += 1
        report["splits"][split] = {
            "images": len(ds),
            "boxes": n_boxes,
            "empty_images": n_empty,
            "bad_labels": n_bad,
            "class_histogram": class_hist.tolist(),
        }
    return report
