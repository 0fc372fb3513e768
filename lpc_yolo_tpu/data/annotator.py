"""Auto-annotation: detector boxes -> SAM box-prompted masks -> YOLO seg labels.

Behavioral spec: reference data/annotator.py:8-50 (auto_annotate): run a YOLO
detector over a folder, prompt SAM with each detection box, write normalized
polygon labels `{cls} x1 y1 x2 y2 ...` per image.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def mask_to_polygon(mask: np.ndarray, max_points: int = 200) -> np.ndarray:
    """Largest external contour of a binary mask -> (k, 2) polygon (the
    reference's Masks.xyn path via cv2.findContours)."""
    import cv2

    m = (np.asarray(mask) > 0.5).astype(np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return np.zeros((0, 2), np.float32)
    c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
    if len(c) > max_points:
        idx = np.linspace(0, len(c) - 1, max_points).astype(int)
        c = c[idx]
    return c


def auto_annotate(
    data: str,
    det_model: str = "yolov10n.yaml",
    sam_model: str = "mobile_sam",
    output_dir: Optional[str] = None,
    conf: float = 0.25,
    imgsz: int = 640,
):
    """Annotate every image in `data` with detector+SAM; writes YOLO seg labels."""
    import cv2

    from ..engine.model import YOLO
    from ..models.sam import SAM

    det = YOLO(det_model) if isinstance(det_model, (str, Path)) else det_model
    sam = SAM(sam_model) if isinstance(sam_model, (str, Path)) else sam_model

    data = Path(data)
    out = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    out.mkdir(parents=True, exist_ok=True)

    images = sorted(
        p for p in data.iterdir() if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp")
    )
    for path in images:
        img = cv2.imread(str(path))
        h0, w0 = img.shape[:2]
        results = det.predict(img, conf=conf, imgsz=imgsz)
        r = results[0]
        if r.boxes is None or len(r.boxes) == 0:
            continue
        boxes = np.asarray(r.boxes.xyxy)
        cls = np.asarray(r.boxes.cls).astype(int)
        lines = []
        for b, c in zip(boxes, cls):
            seg = sam.predict(img, bboxes=[b.tolist()])[0]
            if seg.masks is None or not np.any(seg.masks[0] > 0.5):
                continue
            poly = mask_to_polygon(seg.masks[0])
            if len(poly) < 3:
                continue
            poly = poly / np.array([w0, h0], np.float32)
            lines.append(f"{int(c)} " + " ".join(f"{v:.6g}" for v in poly.reshape(-1)))
        if lines:
            (out / f"{path.stem}.txt").write_text("\n".join(lines) + "\n")
    return str(out)
