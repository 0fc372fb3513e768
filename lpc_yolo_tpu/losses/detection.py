"""v8/v10 detection losses as pure jitted functions.

Behavioral spec: reference ultralytics/utils/loss.py:63-106 (BboxLoss._df_loss,
CIoU term), :147-249 (v8DetectionLoss) and :717-727 (v10DetectLoss = one2many
topk-10 + one2one topk-1). Masked static-shape re-design: gt boxes arrive
pre-padded to a fixed M (mask_gt marks real rows), fg gathers become
elementwise multiplies, and the whole loss jits into the train step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.anchors import bbox2dist, dfl_expectation, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou
from .tal import task_aligned_assigner


class LossItems(NamedTuple):
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def _df_loss(pred_dist_logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss (loss.py:88-106).

    pred_dist_logits: (..., 4, reg_max) raw logits; target: (..., 4) in
    [0, reg_max-1). Returns (..., 1): mean over the 4 sides.
    """
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist_logits, axis=-1)
    reg_max = pred_dist_logits.shape[-1]
    # bin selection as a one-hot multiply-sum over the 16-lane bin axis, NOT
    # take_along_axis: dynamic gathers over (B, A, 4, 16) lower to serialized
    # scalar-core loops on TPU (xplane: 17 ms/step each at b32, the single
    # largest cost in the v10n train step); the one-hot form is a fused
    # iota-compare + reduce on the VPU (~zero cost).
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    sel = (bins == tl[..., None]).astype(logp.dtype) * wl[..., None] + (
        bins == jnp.clip(tr, 0, reg_max - 1)[..., None]
    ).astype(logp.dtype) * wr[..., None]
    ce = -jnp.sum(logp * sel, axis=-1)
    return jnp.mean(ce, axis=-1, keepdims=True)


def v8_detection_loss(
    feats: Sequence[jnp.ndarray],  # per-level (B, H, W, 4*reg_max + nc) raw maps
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy, pixels
    mask_gt: jnp.ndarray,  # (B, M) bool
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    tal_topk: int = 10,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    return_assign: bool = False,
):
    """One head-branch detection loss (loss.py:186-249). Returns
    (total_loss * batch_size, detached per-term items)."""
    if isinstance(feats[0], (tuple, list)):
        # per-level (box_map, cls_map) pairs (V10Detect split=True): the head
        # never concatenates the 64++nc channels, so the loss flattens each
        # branch directly. Box maps may arrive width-packed (B, H, W/P, P*64)
        # — pack_width is a row-major reshape, so .reshape(B, -1, 64) yields
        # the identical anchor order as the unpacked map.
        B = feats[0][1].shape[0]
        feat_shapes = [(cm.shape[1], cm.shape[2]) for _, cm in feats]
        pred_distri = jnp.concatenate(
            [bm.reshape(B, -1, 4 * reg_max) for bm, _ in feats], axis=1
        ).astype(jnp.float32)
        pred_scores = jnp.concatenate(
            [cm.reshape(B, -1, nc) for _, cm in feats], axis=1
        ).astype(jnp.float32)
    else:
        B = feats[0].shape[0]
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        no = 4 * reg_max + nc
        flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)  # (B, A, no)
        pred_distri = flat[..., : 4 * reg_max].astype(jnp.float32)
        pred_scores = flat[..., 4 * reg_max :].astype(jnp.float32)
    A = pred_scores.shape[1]

    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)

    # decode boxes in feature-grid units (loss.py:173-186)
    pred_dist_logits = pred_distri.reshape(B, A, 4, reg_max)
    pred_dist = dfl_expectation(pred_distri, reg_max)
    pred_bboxes = dist2bbox(pred_dist, anchor_points, xywh=False)  # (B, A, 4)

    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor),
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes,
        mask_gt,
        topk=tal_topk,
        num_classes=nc,
        alpha=0.5,
        beta=6.0,
    )
    target_bboxes = jax.lax.stop_gradient(assign.target_bboxes)
    target_scores = jax.lax.stop_gradient(assign.target_scores)
    fg = jax.lax.stop_gradient(assign.fg_mask).astype(jnp.float32)  # (B, A)

    target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    # cls: BCE with logits, sum over everything (loss.py:228)
    bce = optax_sigmoid_bce(pred_scores, target_scores)
    loss_cls = jnp.sum(bce) / target_scores_sum

    # box: CIoU on foreground anchors (loss.py:74-77)
    tb = target_bboxes / stride_tensor
    weight = jnp.sum(target_scores, axis=-1) * fg  # (B, A)
    iou = bbox_iou(pred_bboxes, tb, xywh=False, CIoU=True).squeeze(-1)  # (B, A)
    loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

    # dfl (loss.py:79-85)
    target_ltrb = bbox2dist(anchor_points, tb, reg_max - 1)  # (B, A, 4)
    dfl = _df_loss(pred_dist_logits, target_ltrb).squeeze(-1)  # (B, A)
    loss_dfl = jnp.sum(dfl * weight) / target_scores_sum

    items = LossItems(loss_box * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain)
    total = (items.box + items.cls + items.dfl) * B
    if return_assign:
        aux = {
            "assign": assign,
            "target_scores_sum": target_scores_sum,
            "fg": fg,
            "stride_tensor": stride_tensor,
        }
        return total, jax.lax.stop_gradient(items), aux
    return total, jax.lax.stop_gradient(items)


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCEWithLogits (elementwise, no reduction)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def v10_detect_loss(
    preds: Dict[str, Sequence[jnp.ndarray]],
    gt_labels: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    **gains,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-assignment loss (loss.py:717-727): one2many(topk=10) + one2one(topk=1).

    Returns (scalar total, (6,) detached items = [box,cls,dfl]_om ++ [box,cls,dfl]_oo).
    """
    t_om, i_om = v8_detection_loss(
        preds["one2many"], gt_labels, gt_bboxes, mask_gt, strides, nc, reg_max, tal_topk=10, **gains
    )
    t_oo, i_oo = v8_detection_loss(
        preds["one2one"], gt_labels, gt_bboxes, mask_gt, strides, nc, reg_max, tal_topk=1, **gains
    )
    items = jnp.stack([i_om.box, i_om.cls, i_om.dfl, i_oo.box, i_oo.cls, i_oo.dfl])
    return t_om + t_oo, items
