"""Anchor-free grid anchors and distance<->box transforms.

Behavioral spec: reference ultralytics/utils/tal.py:294-345 (make_anchors,
dist2bbox, bbox2dist) and nn/modules/block.py:42-61 (DFL integral decode).

TPU notes: anchors are built from *static* feature shapes at trace time, so the
whole decode is shape-static and fuses into the surrounding XLA program. DFL is
a softmax-expectation (batched matmul over 16 bins) that maps onto the MXU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[float],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build per-anchor center points and strides from (h, w) feature shapes.

    Returns:
        anchor_points: (sum(h*w), 2) grid centers in feature-grid units.
        stride_tensor: (sum(h*w), 1) stride per anchor.
    """
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        sy, sx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([sx, sy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), stride, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True, axis: int = -1) -> jnp.ndarray:
    """Transform distances (l, t, r, b) to boxes (xywh or xyxy) about anchor points."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Transform xyxy boxes to clamped (l, t, r, b) distances for DFL targets."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1), 0, reg_max - 0.01
    )


def dfl_expectation(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Integral (softmax-expectation) decode of DFL logits.

    Args:
        pred_dist: (..., A, 4*reg_max) logits, channel layout side-major:
            channel c = side*reg_max + bin  (matches reference DFL, block.py:42-61).
    Returns:
        (..., A, 4) expected distances.
    """
    shape = pred_dist.shape
    x = pred_dist.reshape(*shape[:-1], 4, reg_max)
    proj = jnp.arange(reg_max, dtype=x.dtype)
    p = jnp.exp(x - jnp.max(x, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.einsum("...kb,b->...k", p, proj)
