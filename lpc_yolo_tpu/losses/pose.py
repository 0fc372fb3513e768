"""Pose training loss.

Behavioral spec: reference ultralytics/utils/loss.py:433-588 (v8PoseLoss):
the v8 detect loss plus, on foreground anchors, an OKS-style keypoint
location loss (KeypointLoss, loss.py:130-145: e = d^2 / ((2*sigma)^2 * 2*area),
factor by visible-kpt count) and a visibility BCE (kobj). Gains: pose=12,
kobj=1 (cfg/default.yaml).

TPU re-design: like the seg loss, a fixed top-K fg-anchor budget keeps shapes
static; keypoint targets are gathered by target_gt_idx and expressed in
stride units around each anchor (bbox_decode-analog kpts_decode at train time).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.anchors import make_anchors
from .detection import optax_sigmoid_bce, v8_detection_loss

# COCO 17-keypoint OKS sigmas (public COCO eval constants; loss.py:455)
OKS_SIGMA = np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
) / 10.0


def v8_pose_loss(
    out: Dict,  # {'feats': tuple, 'kpt_raw': (B, A, nk)}
    gt_labels: jnp.ndarray,  # (B, M)
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy px
    mask_gt: jnp.ndarray,  # (B, M)
    gt_kpts: jnp.ndarray,  # (B, M, nkpt, ndim) px coords (+ visibility)
    strides,
    nc: int,
    kpt_shape: Tuple[int, int] = (17, 3),
    reg_max: int = 16,
    pose_gain: float = 12.0,
    kobj_gain: float = 1.0,
    fg_budget: int = 64,
    **det_gains,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (total, (5,) items = box, pose, kobj, cls, dfl)."""
    feats, kpt_raw = out["feats"], out["kpt_raw"]
    total_det, items, aux = v8_detection_loss(
        feats, gt_labels, gt_bboxes, mask_gt, strides, nc, reg_max, return_assign=True, **det_gains
    )
    assign = aux["assign"]
    B, A, nk = kpt_raw.shape
    nkpt, ndim = kpt_shape
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)

    # decode predicted keypoints to pixel space (head.py kpts_decode semantics)
    y = kpt_raw.reshape(B, A, nkpt, ndim).astype(jnp.float32)
    pxy = (y[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)) * stride_tensor[None, :, None, :]

    # fixed fg budget by assigned score
    score = jnp.sum(assign.target_scores, axis=-1) * assign.fg_mask
    k = min(fg_budget, A)
    topv, topi = jax.lax.top_k(score, k)
    valid = (topv > 0).astype(jnp.float32)  # (B, k)
    sel_gt = jnp.take_along_axis(assign.target_gt_idx, topi, axis=1)  # (B, k)
    sel_pxy = jnp.take_along_axis(pxy, topi[..., None, None], axis=1)  # (B, k, nkpt, 2)
    sel_boxes = jnp.take_along_axis(assign.target_bboxes, topi[..., None], axis=1)  # (B, k, 4)

    gtk = jnp.take_along_axis(gt_kpts.astype(jnp.float32), sel_gt[..., None, None], axis=1)  # (B, k, nkpt, ndim)
    kpt_mask = (gtk[..., 2] != 0).astype(jnp.float32) if ndim == 3 else jnp.ones(gtk.shape[:-1])

    area = jnp.maximum(
        (sel_boxes[..., 2] - sel_boxes[..., 0]) * (sel_boxes[..., 3] - sel_boxes[..., 1]), 1.0
    )[..., None]  # (B, k, 1)
    sigmas = jnp.asarray(OKS_SIGMA[:nkpt], jnp.float32)
    d2 = jnp.sum((sel_pxy - gtk[..., :2]) ** 2, axis=-1)  # (B, k, nkpt)
    e = d2 / ((2 * sigmas[None, None]) ** 2 * (area + 1e-9) * 2)
    kpt_loss_factor = nkpt / (jnp.sum(kpt_mask, axis=-1, keepdims=True) + 1e-9)
    loc = jnp.sum(kpt_loss_factor * (1 - jnp.exp(-e)) * kpt_mask, axis=-1)  # (B, k)
    # reference KeypointLoss.forward is a plain .mean() over (n_fg, nkpt)
    # elements — no score weighting, no target_scores_sum (loss.py:130-145,578)
    fg_count = jnp.maximum(jnp.sum(valid), 1.0)
    loss_pose = jnp.sum(loc * valid) / (fg_count * nkpt)

    if ndim == 3:
        pv = jnp.take_along_axis(y[..., 2], topi[..., None], axis=1)  # (B, k, nkpt)
        bce = optax_sigmoid_bce(pv, kpt_mask)
        # reference bce_pose = nn.BCEWithLogitsLoss() mean over fg x nkpt (loss.py:582)
        loss_kobj = jnp.sum(jnp.mean(bce, axis=-1) * valid) / fg_count
    else:
        loss_kobj = jnp.float32(0.0)

    total = total_det + (pose_gain * loss_pose + kobj_gain * loss_kobj) * B
    out_items = jnp.stack(
        [items.box, jax.lax.stop_gradient(pose_gain * loss_pose),
         jax.lax.stop_gradient(kobj_gain * loss_kobj), items.cls, items.dfl]
    )
    return total, out_items
