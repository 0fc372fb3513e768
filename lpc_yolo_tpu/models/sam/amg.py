"""Automatic mask generation helpers (reference models/sam/amg.py semantics).

Pure-numpy host-side utilities for the segment-everything `SAM.generate`
path: point grids, crop boxes, stability scores, and a greedy box NMS for
per-crop dedup. The device work (encoder + per-chunk decoder) stays jitted
with static shapes; these helpers orchestrate it.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) evenly-spaced normalized [0,1] grid (amg.py build_point_grid)."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1.0 - offset, n_per_side, dtype=np.float32)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def build_all_layer_point_grids(n_per_side: int, n_layers: int, scale_per_layer: int) -> List[np.ndarray]:
    """Per-crop-layer grids, each downscaled (amg.py build_all_layer_point_grids)."""
    return [
        build_point_grid(int(n_per_side / (scale_per_layer**i))) for i in range(n_layers + 1)
    ]


def generate_crop_boxes(
    im_size: Tuple[int, int], n_layers: int, overlap_ratio: float
) -> Tuple[List[List[int]], List[int]]:
    """Crop boxes [x0, y0, x1, y1] per layer + layer indices
    (amg.py generate_crop_boxes): layer i has (2**i)^2 overlapping crops."""
    h, w = im_size
    crop_boxes, layer_idxs = [[0, 0, w, h]], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * min(h, w) * (2 / n_crops_per_side))
        crop_w = crop_len(w, n_crops_per_side, overlap)
        crop_h = crop_len(h, n_crops_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0 in x0s:
            for y0 in y0s:
                crop_boxes.append([x0, y0, min(x0 + crop_w, w), min(y0 + crop_h, h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def calculate_stability_score(
    mask_logits: np.ndarray, mask_threshold: float, offset: float
) -> np.ndarray:
    """IoU between the mask binarized at threshold +/- offset
    (amg.py calculate_stability_score). mask_logits (..., H, W)."""
    hi = (mask_logits > (mask_threshold + offset)).sum(axis=(-1, -2)).astype(np.float64)
    lo = (mask_logits > (mask_threshold - offset)).sum(axis=(-1, -2)).astype(np.float64)
    return (hi / np.maximum(lo, 1)).astype(np.float32)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """XYXY boxes around binary masks (..., H, W) -> (..., 4); empty -> zeros
    (amg.py batched_mask_to_box)."""
    shape = masks.shape
    h, w = shape[-2:]
    flat = masks.reshape(-1, h, w)
    out = np.zeros((flat.shape[0], 4), np.float32)
    for i, m in enumerate(flat):
        ys, xs = np.nonzero(m)
        if len(xs):
            out[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return out.reshape(*shape[:-2], 4)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """Host-side greedy box NMS; returns kept indices sorted by score desc
    (stands in for torchvision.ops.nms in the reference amg flow)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        iou = inter / np.maximum(area[i] + area - inter, 1e-9)
        suppressed |= iou > iou_thres
        suppressed[i] = True
    return np.array(keep, np.int64)


def uncrop_boxes_xyxy(boxes: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + np.array([x0, y0, x0, y0], boxes.dtype)


def uncrop_points(points: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return points + np.array([x0, y0], points.dtype)
