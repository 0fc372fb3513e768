"""Oriented-box training loss.

Behavioral spec: reference ultralytics/utils/loss.py:599-715 (v8OBBLoss):
v8 detect structure with rotated boxes — dist2rbox decode with the head's
predicted angle, RotatedTaskAlignedAssigner (probiou metric), probiou box
loss (RotatedBboxLoss), DFL targets from the axis-aligned (cx,cy,w,h) part.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..nn.heads import dist2rbox
from ..ops.anchors import bbox2dist, dfl_expectation, make_anchors
from ..ops.boxes import probiou, xywh2xyxy
from .detection import _df_loss, optax_sigmoid_bce
from .tal import task_aligned_assigner


def v8_obb_loss(
    out: Dict,  # {'feats': tuple, 'angle': (B, A, 1) radians}
    gt_labels: jnp.ndarray,  # (B, M)
    gt_rboxes: jnp.ndarray,  # (B, M, 5) [cx, cy, w, h, angle] px
    mask_gt: jnp.ndarray,  # (B, M)
    strides,
    nc: int,
    reg_max: int = 16,
    tal_topk: int = 10,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (total, (3,) items = box, cls, dfl)."""
    feats, angle = out["feats"], out["angle"]
    B = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    no = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)
    pred_distri = flat[..., : 4 * reg_max].astype(jnp.float32)
    pred_scores = flat[..., 4 * reg_max :].astype(jnp.float32)
    A = flat.shape[1]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)

    dist = dfl_expectation(pred_distri, reg_max)
    pred_xywh = dist2rbox(dist, angle, anchor_points)  # (B, A, 4) grid units
    pred_rboxes = jnp.concatenate([pred_xywh, angle], axis=-1)  # (B, A, 5)

    # assigner in image units with rotated metric
    gt_for_assign = gt_rboxes
    pd_for_assign = jnp.concatenate(
        [pred_xywh * stride_tensor, angle], axis=-1
    )
    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pd_for_assign),
        anchor_points * stride_tensor,
        gt_labels,
        gt_for_assign,
        mask_gt,
        topk=tal_topk,
        num_classes=nc,
        alpha=0.5,
        beta=6.0,
        rotated=True,
    )
    target_rboxes = jax.lax.stop_gradient(assign.target_bboxes)  # (B, A, 5) px
    target_scores = jax.lax.stop_gradient(assign.target_scores)
    fg = jax.lax.stop_gradient(assign.fg_mask).astype(jnp.float32)
    tss = jnp.maximum(jnp.sum(target_scores), 1.0)

    loss_cls = jnp.sum(optax_sigmoid_bce(pred_scores, target_scores)) / tss

    # probiou box loss in grid units (RotatedBboxLoss, loss.py:644-660)
    tb = jnp.concatenate([target_rboxes[..., :4] / stride_tensor, target_rboxes[..., 4:]], axis=-1)
    weight = jnp.sum(target_scores, axis=-1) * fg
    iou = probiou(pred_rboxes, tb)
    loss_box = jnp.sum((1.0 - iou) * weight) / tss

    # DFL on the axis-aligned xywh of the target rbox (loss.py:120-126)
    target_ltrb = bbox2dist(anchor_points, xywh2xyxy(tb[..., :4]), reg_max - 1)
    dfl = _df_loss(pred_distri.reshape(B, A, 4, reg_max), target_ltrb).squeeze(-1)
    loss_dfl = jnp.sum(dfl * weight) / tss

    items = jnp.stack([loss_box * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain])
    total = jnp.sum(items) * B
    return total, jax.lax.stop_gradient(items)
