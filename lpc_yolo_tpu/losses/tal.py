"""Task-aligned assignment as a fully-masked, static-shape JAX function.

Behavioral spec: reference ultralytics/utils/tal.py:13-290 (TaskAlignedAssigner).
The torch version branches on data (`if self.n_max_boxes == 0`, `if
fg_mask.max() > 1`) and uses boolean-mask gathers; this re-design keeps every
tensor at its padded static shape (B, M, A) and replaces the branches with
always-applied elementwise selects — the multi-assignment resolution `where`
is a no-op when no anchor is contested, which matches the torch fast path.

Everything here runs under stop_gradient in the loss (assignment is not
differentiated through, loss.py:218-224).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou, probiou, xywhr2xyxyxyxy


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy
    target_scores: jnp.ndarray  # (B, A, nc) soft targets
    fg_mask: jnp.ndarray  # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32


def task_aligned_assigner(
    pd_scores: jnp.ndarray,  # (B, A, nc) post-sigmoid
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy, image units
    anc_points: jnp.ndarray,  # (A, 2) image units
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy, image units
    mask_gt: jnp.ndarray,  # (B, M) bool — valid (non-pad) gt rows
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    rotated: bool = False,
) -> AssignResult:
    """When rotated=True, boxes are (..., 5) [cx, cy, w, h, angle]: candidate
    selection uses the point-in-rotated-rect test (tal.py RotatedTaskAligned
    Assigner.select_candidates_in_gts) and IoU is probiou."""
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    mask_gt_f = mask_gt.astype(pd_scores.dtype)

    if rotated:
        # corners (B, M, 4, 2); point-in-box via projections onto box axes
        corners = xywhr2xyxyxyxy(gt_bboxes)
        a_pt, b_pt, d_pt = corners[..., 0, :], corners[..., 1, :], corners[..., 3, :]
        ab = b_pt - a_pt  # (B, M, 2)
        ad = d_pt - a_pt
        ap = anc_points[None, None] - a_pt[..., None, :]  # (B, M, A, 2)
        dot_ab = jnp.sum(ap * ab[..., None, :], axis=-1)
        dot_ad = jnp.sum(ap * ad[..., None, :], axis=-1)
        norm_ab = jnp.sum(ab * ab, axis=-1, keepdims=True)
        norm_ad = jnp.sum(ad * ad, axis=-1, keepdims=True)
        mask_in_gts = (
            (dot_ab >= 0) & (dot_ab <= norm_ab) & (dot_ad >= 0) & (dot_ad <= norm_ad)
        ).astype(pd_scores.dtype)
    else:
        # --- candidates whose center lies inside each gt (tal.py:256-270)
        lt = gt_bboxes[..., None, :2]  # (B, M, 1, 2)
        rb = gt_bboxes[..., None, 2:]
        deltas = jnp.concatenate([anc_points[None, None] - lt, rb - anc_points[None, None]], axis=-1)
        mask_in_gts = (jnp.min(deltas, axis=-1) > eps).astype(pd_scores.dtype)  # (B, M, A)

    # --- align metric = score^alpha * CIoU^beta on masked candidates (tal.py:106-121)
    valid = mask_in_gts * mask_gt_f[..., None]  # (B, M, A)
    labels = jnp.clip(gt_labels, 0, nc - 1)
    bbox_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1
    )  # (B, M, A): score of each anchor for the gt's class
    bbox_scores = bbox_scores * valid

    if rotated:
        overlaps = probiou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :])
    else:
        overlaps = bbox_iou(
            gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True
        ).squeeze(-1)
    overlaps = jnp.clip(overlaps, 0.0, None) * valid  # (B, M, A)

    align_metric = bbox_scores**alpha * overlaps**beta

    # --- top-k candidates per gt (tal.py:127-162). Only the top-k MASK is
    # needed (the reference's duplicate-count trick reduces to it), so build
    # it with `topk` unrolled argmax+suppress passes instead of
    # lax.top_k + scatter: on TPU the (B, M, A) top_k lowers to a full
    # variadic sort (9 ms/step at b32) and the scatter serializes, while
    # argmax+one-hot are plain VPU reductions. Tie-handling is identical
    # (lowest index wins, matching lax.top_k / torch.topk). A segmented
    # exact top-k (per-segment lax.top_k at S=16 + tiny merge, one metric
    # read) was measured 4.4 ms/step SLOWER at v10n b32: top_k with indices
    # lowers to a variadic (f32, s32) sort over the whole metric, which
    # costs more than `topk` fused argmax re-reads.
    a_ix = jnp.arange(A)
    metric = align_metric
    mask_topk = jnp.zeros_like(align_metric, dtype=bool)
    for _ in range(topk):
        pick = a_ix == jnp.argmax(metric, axis=-1, keepdims=True)  # (B, M, A)
        mask_topk |= pick
        metric = jnp.where(pick, -jnp.inf, metric)
    mask_topk = mask_topk.astype(align_metric.dtype) * mask_gt_f[..., None]

    mask_pos = mask_topk * mask_in_gts * mask_gt_f[..., None]  # (B, M, A)

    # --- resolve anchors claimed by multiple gts: keep max-CIoU gt (tal.py:264-290)
    fg_counts = jnp.sum(mask_pos, axis=-2)  # (B, A)
    max_overlaps_idx = jnp.argmax(overlaps, axis=-2)  # (B, A)
    is_max_overlaps = jax.nn.one_hot(max_overlaps_idx, M, axis=-2, dtype=mask_pos.dtype)  # (B, M, A)
    mask_pos = jnp.where((fg_counts > 1)[:, None, :], is_max_overlaps, mask_pos)
    fg_mask = jnp.sum(mask_pos, axis=-2) > 0  # (B, A)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)  # (B, A)

    # --- gather targets (tal.py:163-214) as one-hot einsums over the small M
    # axis: take_along_axis (B, A) <- (B, M) lowers to serialized scalar
    # gathers on TPU (~7 ms/step at b32 across both v10 heads, xplane), while
    # the (B, A, M) x (B, M, k) contraction rides the MXU for free.
    # Precision.HIGHEST: the TPU's default matmul precision truncates f32
    # inputs to bf16, which would round the selected box coordinates (~8
    # mantissa bits); HIGHEST keeps the one-hot selection bit-exact.
    hi = jax.lax.Precision.HIGHEST
    onehot_gt = (jnp.arange(M) == target_gt_idx[..., None]).astype(pd_scores.dtype)  # (B, A, M)
    target_labels = jnp.einsum("bam,bm->ba", onehot_gt, labels.astype(pd_scores.dtype), precision=hi)
    target_labels = jnp.round(target_labels).astype(jnp.int32)
    target_bboxes = jnp.einsum("bam,bmk->bak", onehot_gt, gt_bboxes, precision=hi)  # (B, A, 4|5)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = target_scores * fg_mask[..., None]

    # --- normalize soft targets by per-gt max metric (tal.py:88-95)
    align_metric = align_metric * mask_pos
    pos_align_metrics = jnp.max(align_metric, axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)  # (B, M, 1)
    norm_align_metric = jnp.max(
        align_metric * pos_overlaps / (pos_align_metrics + eps), axis=-2
    )  # (B, A)
    target_scores = target_scores * norm_align_metric[..., None]

    return AssignResult(
        target_labels.astype(jnp.int32), target_bboxes, target_scores, fg_mask, target_gt_idx
    )
