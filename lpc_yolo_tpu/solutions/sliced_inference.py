"""SAHI-style sliced (tiled) inference for small-object detection.

Behavioral spec: reference examples/YOLOv8-SAHI-Inference-Video/
yolov8_sahi.py (slice the frame into overlapping tiles, run detection per
tile, merge tile detections back into frame coordinates). TPU-first
re-design: ALL tiles go through the predictor as one fixed-size batch (one
compiled program, one device round-trip per frame) instead of the
reference's per-tile sequential model calls; the merged detections are
deduplicated with the framework's static-shape NMS.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def slice_grid(h: int, w: int, tile: int, overlap: float) -> List[Tuple[int, int]]:
    """Top-left corners of overlapping tile windows covering (h, w)."""
    step = max(1, int(tile * (1 - overlap)))

    def starts(total):
        s = list(range(0, max(total - tile, 0) + 1, step))
        if s[-1] + tile < total:
            s.append(total - tile)
        return s or [0]

    return [(y, x) for y in starts(h) for x in starts(w)]


def sliced_predict(
    yolo,
    image: np.ndarray,
    tile: int = 320,
    overlap: float = 0.2,
    conf: float = 0.25,
    iou: float = 0.45,
    max_det: int = 300,
):
    """Detect over overlapping tiles and merge to full-frame detections.

    Args:
        yolo: a YOLO facade (or anything with .predict accepting a list of
              ndarrays and batch=).
        image: BGR ndarray (H, W, 3).
    Returns an (N, 6) ndarray [x1, y1, x2, y2, conf, cls] in frame coords.
    """
    h, w = image.shape[:2]
    tile = min(tile, h, w)
    corners = slice_grid(h, w, tile, overlap)
    tiles = [image[y:y + tile, x:x + tile] for (y, x) in corners]
    # one batched predict over all tiles: a single compiled program at a
    # fixed (n_tiles, tile, tile) shape
    results = yolo.predict(tiles, conf=conf, iou=iou, imgsz=tile, batch=len(tiles), max_det=max_det)
    rows = []
    for (y0, x0), r in zip(corners, results):
        d = r.boxes.data
        if len(d) == 0:
            continue
        d = d.copy()
        d[:, [0, 2]] += x0
        d[:, [1, 3]] += y0
        rows.append(d)
    if not rows:
        return np.zeros((0, 6), np.float32)
    dets = np.concatenate(rows).astype(np.float32)
    keep = _nms_classwise(dets, iou)
    dets = dets[keep]
    order = np.argsort(-dets[:, 4])[:max_det]
    return dets[order]


def _nms_classwise(dets: np.ndarray, iou_thres: float) -> np.ndarray:
    """Greedy class-aware NMS over [x1,y1,x2,y2,conf,cls] rows (host-side:
    the merge set is small — a few hundred boxes per frame)."""
    order = np.argsort(-dets[:, 4])
    boxes, cls = dets[:, :4], dets[:, 5]
    areas = np.maximum(0, boxes[:, 2] - boxes[:, 0]) * np.maximum(0, boxes[:, 3] - boxes[:, 1])
    keep = []
    suppressed = np.zeros(len(dets), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        rest = order[~suppressed[order] & (order != i)]
        if len(rest) == 0:
            continue
        same = rest[cls[rest] == cls[i]]
        if len(same) == 0:
            continue
        x1 = np.maximum(boxes[i, 0], boxes[same, 0])
        y1 = np.maximum(boxes[i, 1], boxes[same, 1])
        x2 = np.minimum(boxes[i, 2], boxes[same, 2])
        y2 = np.minimum(boxes[i, 3], boxes[same, 3])
        inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
        o = inter / (areas[i] + areas[same] - inter + 1e-9)
        suppressed[same[o > iou_thres]] = True
    return np.array(keep, int)
