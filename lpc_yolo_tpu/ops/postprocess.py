"""Fixed-shape, jit-safe detection postprocessing.

Behavioral spec:
  * v10_postprocess — reference ultralytics/utils/ops.py:851-864 (NMS-free
    dual-top-k decode of the one-to-one head). Already fixed-shape in the
    reference; maps 1:1 onto XLA top_k + gathers.
  * non_max_suppression — reference ultralytics/utils/ops.py:163-304 (batched,
    class-offset NMS). The reference implementation is data-dependent
    (variable candidate counts via torchvision.ops.nms); here it is re-designed
    as a static-shape masked greedy suppressor: candidates are pre-top-k'd to a
    fixed pool, then a lax.fori_loop performs max_det sequential selections,
    each suppressing the pool by IoU against the newly selected box. Output is
    always (B, max_det, 6) with zero rows for missing detections.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy


def v10_postprocess(preds: jnp.ndarray, max_det: int = 300, nc: int = 80) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS-free decode for the v10 one-to-one head.

    Args:
        preds: (B, A, 4 + nc) — xywh boxes and per-class scores (post-sigmoid).
        max_det: fixed number of output detections.
        nc: number of classes.

    Returns:
        boxes (B, max_det, 4), scores (B, max_det), labels (B, max_det) int32.
    """
    assert preds.shape[-1] == 4 + nc
    boxes, scores = preds[..., :4], preds[..., 4:]
    A = preds.shape[-2]
    k1 = min(max_det, A)  # fewer anchors than max_det at small imgsz

    # Stage 1: keep the k1 anchors with the highest per-anchor max score.
    max_scores = jnp.max(scores, axis=-1)  # (B, A)
    _, index = jax.lax.top_k(max_scores, k1)  # (B, k1)
    boxes = jnp.take_along_axis(boxes, index[..., None], axis=1)  # (B, k1, 4)
    scores = jnp.take_along_axis(scores, index[..., None], axis=1)  # (B, k1, nc)

    # Stage 2: flattened top-k over (anchor, class) pairs.
    flat = scores.reshape(scores.shape[0], -1)  # (B, k1*nc)
    k2 = min(max_det, flat.shape[-1])
    scores, index = jax.lax.top_k(flat, k2)  # (B, k2)
    # lax.rem/div (truncating) == %, // here since index, nc >= 0; jnp's
    # floor-division correction emits int-bool ops (sign/ne/and) that ONNX
    # importers (OpenCV-DNN 5.0) reject in elementwise layers.
    labels = jax.lax.rem(index, jnp.int32(nc))
    anchor = jax.lax.div(index, jnp.int32(nc))
    boxes = jnp.take_along_axis(boxes, anchor[..., None], axis=1)
    if k2 < max_det:  # pad to the fixed contract shape
        pad = max_det - k2
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
    return boxes, scores, labels.astype(jnp.int32)


def v10_detections(preds: jnp.ndarray, max_det: int = 300, nc: int = 80) -> jnp.ndarray:
    """v10_postprocess packed as (B, max_det, 6) = [x1, y1, x2, y2, score, label].

    Matches the reference predictor's packed layout (models/yolov10/predict.py:8-38,
    which converts xywh->xyxy via ops.xywh2xyxy before packing).
    """
    boxes, scores, labels = v10_postprocess(preds, max_det, nc)
    boxes = xywh2xyxy(boxes)
    return jnp.concatenate([boxes, scores[..., None], labels[..., None].astype(boxes.dtype)], axis=-1)


def _pairwise_iou_single_vs_pool(box: jnp.ndarray, pool: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """IoU of one xyxy box (4,) against a pool (K, 4) -> (K,)."""
    lt = jnp.maximum(box[:2], pool[:, :2])
    rb = jnp.minimum(box[2:], pool[:, 2:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (pool[:, 2] - pool[:, 0]) * (pool[:, 3] - pool[:, 1])
    return inter / (area1 + area2 - inter + eps)


@partial(jax.jit, static_argnames=("max_det", "pre_topk", "multi_label", "return_anchor_idx"))
def non_max_suppression(
    preds: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 4096,
    agnostic: bool = False,
    multi_label: bool = False,
    max_wh: float = 7680.0,
    return_anchor_idx: bool = False,
) -> jnp.ndarray:
    """Static-shape batched class-offset NMS.

    Args:
        preds: (B, A, 4 + nc) — xywh boxes + per-class scores (post-sigmoid),
            i.e. the transposed v8 head output (reference feeds (B, 4+nc, A)).
        conf_thres: score gate; rows below it can never be selected.
        iou_thres: suppression IoU threshold.
        max_det: fixed output detections per image.
        pre_topk: candidate pool size kept before suppression (reference
            max_nms=30000; a smaller static pool is used here — scores are
            globally sorted first so this only drops the lowest-scoring tail).
        agnostic: class-agnostic suppression.
        multi_label: emit one candidate per (anchor, class) above threshold
            (approximated by class-major flattening before top-k pooling).

    Returns:
        (B, max_det, 6) = [x1, y1, x2, y2, score, label]; invalid rows are all 0
        with label -1.
    """
    boxes_xywh, scores_all = preds[..., :4], preds[..., 4:]
    nc = scores_all.shape[-1]
    boxes_xyxy = xywh2xyxy(boxes_xywh)  # (B, A, 4)

    if multi_label:
        B, A = scores_all.shape[0], scores_all.shape[1]
        flat_scores = scores_all.reshape(B, A * nc)  # (B, A*nc) anchor-major
        k = min(pre_topk, A * nc)
        scores, flat_idx = jax.lax.top_k(flat_scores, k)
        labels = (flat_idx % nc).astype(jnp.int32)
        anchor = flat_idx // nc
        cand_boxes = jnp.take_along_axis(boxes_xyxy, anchor[..., None], axis=1)
    else:
        scores_best = jnp.max(scores_all, axis=-1)  # (B, A)
        labels_best = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)
        k = min(pre_topk, scores_best.shape[-1])
        scores, anchor = jax.lax.top_k(scores_best, k)
        labels = jnp.take_along_axis(labels_best, anchor, axis=1)
        cand_boxes = jnp.take_along_axis(boxes_xyxy, anchor[..., None], axis=1)

    valid = scores > conf_thres  # (B, k)
    # Class offset trick: boxes of different classes never overlap.
    offset = jnp.where(agnostic, 0.0, 1.0) * labels.astype(cand_boxes.dtype)[..., None] * max_wh
    off_boxes = cand_boxes + offset  # (B, k, 4)

    def nms_one(boxes_k, scores_k, valid_k):
        """Greedy NMS for one image: boxes_k (k,4) offset, scores_k (k,), valid (k,).

        lax.scan with stacked outputs (no in-loop buffer scatters — those
        compile pathologically slowly under vmap on TPU); per-step work is a
        VPU argmax + one row-vs-pool IoU."""
        live0 = jnp.where(valid_k, scores_k, -1.0)

        def step(live, _):
            j = jnp.argmax(live)
            ok = live[j] > 0.0
            box_j = jax.lax.dynamic_slice_in_dim(boxes_k, j, 1, axis=0)[0]
            iou = _pairwise_iou_single_vs_pool(box_j, boxes_k)
            suppress = ok & (iou > iou_thres)
            onehot_j = jax.lax.broadcasted_iota(jnp.int32, live.shape, 0) == j
            live = jnp.where(suppress | onehot_j, -1.0, live)
            return live, (jnp.where(ok, j, -1).astype(jnp.int32), ok)

        _, (keep_idx, keep_valid) = jax.lax.scan(step, live0, None, length=max_det)
        return keep_idx, keep_valid

    keep_idx, keep_valid = jax.vmap(nms_one)(off_boxes, scores, valid)  # (B, max_det)

    safe_idx = jnp.clip(keep_idx, 0, None)
    out_boxes = jnp.take_along_axis(cand_boxes, safe_idx[..., None], axis=1)
    out_scores = jnp.take_along_axis(scores, safe_idx, axis=1)
    out_labels = jnp.take_along_axis(labels, safe_idx, axis=1)

    m = keep_valid[..., None]
    out = jnp.concatenate(
        [
            jnp.where(m, out_boxes, 0.0),
            jnp.where(keep_valid, out_scores, 0.0)[..., None],
            jnp.where(keep_valid, out_labels, -1)[..., None].astype(out_boxes.dtype),
        ],
        axis=-1,
    )
    if return_anchor_idx:
        out_anchor = jnp.where(keep_valid, jnp.take_along_axis(anchor, safe_idx, axis=1), 0)
        return out, out_anchor.astype(jnp.int32)
    return out


def nms_rotated(
    rboxes: jnp.ndarray,
    scores_all: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1024,
    agnostic: bool = False,
    multi_label: bool = False,
    max_wh: float = 7680.0,
    return_anchor_idx: bool = False,
):
    """Static-shape rotated fast-NMS via pairwise probIoU.

    Mirrors reference ops.nms_rotated (utils/ops.py:143-161) and the
    rotated=True branch of ops.non_max_suppression (class offset applied to
    the box CENTERS, ops.py:279): candidates are score-sorted, the upper
    triangle of the pairwise probIoU matrix is max-reduced per column, and a
    box survives iff no higher-scoring box overlaps it above iou_thres
    ("fast-NMS" — one pass, no sequential suppression chain).

    TPU notes: the (k, k) probIoU matrix is pure VPU elementwise math and
    vmaps over the batch; k = pre_topk keeps shapes static (scores are
    globally top-k sorted first, so only the lowest-scoring tail is dropped).

    Args:
        rboxes: (B, A, 5) = [cx, cy, w, h, angle].
        scores_all: (B, A, nc) per-class scores (post-sigmoid).

    Returns:
        (B, max_det, 7) = [cx, cy, w, h, angle, score, label]; invalid rows
        are all 0 with label -1. With return_anchor_idx, also (B, max_det)
        source anchor indices.
    """
    from .boxes import probiou

    B, A, nc = scores_all.shape
    if multi_label:
        # one candidate per (anchor, class) above threshold — reference
        # obb/val.py postprocess passes multi_label=True
        flat = scores_all.reshape(B, A * nc)
        k = min(pre_topk, A * nc)
        scores, flat_idx = jax.lax.top_k(flat, k)  # sorted desc
        labels = (flat_idx % nc).astype(jnp.int32)
        anchor = flat_idx // nc
    else:
        scores_best = jnp.max(scores_all, axis=-1)
        labels_best = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)
        k = min(pre_topk, A)
        scores, anchor = jax.lax.top_k(scores_best, k)  # sorted desc
        labels = jnp.take_along_axis(labels_best, anchor, axis=1)
    cand = jnp.take_along_axis(rboxes, anchor[..., None], axis=1)  # (B, k, 5)
    valid = scores > conf_thres

    offset = jnp.where(agnostic, 0.0, 1.0) * labels.astype(cand.dtype)[..., None] * max_wh
    off = jnp.concatenate([cand[..., :2] + offset, cand[..., 2:]], axis=-1)

    def one(rb, vl):
        iou = probiou(rb[:, None, :], rb[None, :, :])  # (k, k)
        both = vl[:, None] & vl[None, :]
        tri = jnp.triu(jnp.where(both, iou, 0.0), k=1)
        return (jnp.max(tri, axis=0) < iou_thres) & vl

    keep = jax.vmap(one)(off, valid)  # (B, k)

    sel_scores = jnp.where(keep, scores, -1.0)
    # small-image graphs can yield fewer candidates than max_det (e.g. 189
    # anchors at imgsz=96): take what exists, pad the fixed-shape output
    kd = min(max_det, sel_scores.shape[1])
    out_scores, kidx = jax.lax.top_k(sel_scores, kd)
    ok = out_scores > 0
    out_boxes = jnp.take_along_axis(cand, kidx[..., None], axis=1)
    out_labels = jnp.take_along_axis(labels, kidx, axis=1)
    out_anchor = jnp.take_along_axis(anchor, kidx, axis=1)

    det = jnp.concatenate(
        [
            jnp.where(ok[..., None], out_boxes, 0.0),
            jnp.where(ok, out_scores, 0.0)[..., None],
            jnp.where(ok, out_labels, -1)[..., None].astype(out_boxes.dtype),
        ],
        axis=-1,
    )
    if kd < max_det:
        pad = jnp.zeros((B, max_det - kd, det.shape[-1]), det.dtype)
        pad = pad.at[..., -1].set(-1.0)
        det = jnp.concatenate([det, pad], axis=1)
        out_anchor = jnp.concatenate(
            [out_anchor, jnp.zeros((B, max_det - kd), out_anchor.dtype)], axis=1
        )
        ok = jnp.concatenate([ok, jnp.zeros((B, max_det - kd), bool)], axis=1)
    if return_anchor_idx:
        return det, jnp.where(ok, out_anchor, 0)
    return det
