"""Segmentation training loss.

Behavioral spec: reference ultralytics/utils/loss.py:250-430
(v8SegmentationLoss): the v8 detect loss plus a per-foreground-anchor mask
BCE — pred mask = coeffs @ proto, compared against the assigned instance's
gt mask, cropped to the target box and normalized by box area, all scaled by
the box gain (loss.py:340-366 single_mask_loss/calculate_segmentation_loss).

TPU re-design: the reference loops over images and variable fg anchor sets;
here a fixed budget of K anchors per image is selected by assigned-score
(static shapes), masks are gathered by target_gt_idx, and everything is
masked arithmetic — one jitted program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .detection import optax_sigmoid_bce, v8_detection_loss


def v8_segmentation_loss(
    out: Dict,  # {'feats': tuple, 'mc': (B,A,nm), 'proto': (B,mh,mw,nm)}
    gt_labels: jnp.ndarray,  # (B, M)
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels
    mask_gt: jnp.ndarray,  # (B, M)
    gt_masks: jnp.ndarray,  # (B, M, mh, mw) instance masks at proto resolution
    strides,
    nc: int,
    reg_max: int = 16,
    tal_topk: int = 10,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    fg_budget: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (total loss, (4,) detached items = box, seg, cls, dfl)."""
    feats, mc, proto = out["feats"], out["mc"], out["proto"]
    total_det, items, aux = v8_detection_loss(
        feats, gt_labels, gt_bboxes, mask_gt, strides, nc, reg_max, tal_topk,
        box_gain, cls_gain, dfl_gain, return_assign=True,
    )
    assign = aux["assign"]
    B, A, nm = mc.shape
    mh, mw = proto.shape[1], proto.shape[2]
    imgsz_h = feats[0].shape[1] * int(strides[0])
    imgsz_w = feats[0].shape[2] * int(strides[0])

    # fixed per-image budget of fg anchors, chosen by assigned score
    score = jnp.sum(assign.target_scores, axis=-1) * assign.fg_mask  # (B, A)
    k = min(fg_budget, A)
    topv, topi = jax.lax.top_k(score, k)  # (B, k)
    valid = topv > 0  # only true foreground rows

    sel_mc = jnp.take_along_axis(mc, topi[..., None], axis=1)  # (B, k, nm)
    sel_gt = jnp.take_along_axis(assign.target_gt_idx, topi, axis=1)  # (B, k)
    sel_boxes = jnp.take_along_axis(assign.target_bboxes, topi[..., None], axis=1)  # (B,k,4) px

    gt_m = jnp.take_along_axis(
        gt_masks.astype(jnp.float32), sel_gt[..., None, None], axis=1
    )  # (B, k, mh, mw)

    # pred masks: (B, k, nm) @ (B, mh*mw, nm)^T -> (B, k, mh, mw)  [MXU batched matmul]
    pm = jnp.einsum("bkn,bhwn->bkhw", sel_mc.astype(jnp.float32), proto.astype(jnp.float32))

    # crop to target box in mask space + area-normalized BCE (loss.py:340-366)
    sx, sy = mw / imgsz_w, mh / imgsz_h
    bx = sel_boxes * jnp.array([sx, sy, sx, sy], dtype=sel_boxes.dtype)
    x1, y1, x2, y2 = jnp.split(bx[..., None], 4, axis=2)  # each (B,k,1,1)
    c = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, mw), 3)
    r = jax.lax.broadcasted_iota(jnp.float32, (1, 1, mh, 1), 2)
    crop = ((c >= x1) & (c < x2) & (r >= y1) & (r < y2)).astype(jnp.float32)

    bce = optax_sigmoid_bce(pm, gt_m) * crop  # (B, k, mh, mw)
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1.0).squeeze((2, 3))  # (B, k)
    per_anchor = jnp.sum(bce, axis=(2, 3)) / area  # (B, k)
    # reference: sum over fg anchors, / fg_mask.sum(), * box gain, then the
    # uniform * batch_size factor (loss.py:335-339,343-344 return
    # loss.sum() * batch_size with loss[1] = calculate_segmentation_loss / fg_mask.sum())
    fg_count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss_seg = jnp.sum(per_anchor * valid) / fg_count * box_gain

    total = total_det + loss_seg * B
    out_items = jnp.stack([items.box, jax.lax.stop_gradient(loss_seg), items.cls, items.dfl])
    return total, out_items
