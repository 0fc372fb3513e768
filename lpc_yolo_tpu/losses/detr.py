"""Hungarian matcher + DETR loss for RT-DETR training.

Behavioral spec: reference ultralytics/models/utils/ops.py:12-110
(HungarianMatcher: focal class cost + L1 + GIoU, gains {class:2? -> reference
default cost_gain = {'class': 1, 'bbox': 5, 'giou': 2}}) and
models/utils/loss.py:12-220 (DETRLoss: per-layer aux losses, varifocal class
loss with IoU-aware targets, L1 + GIoU box losses normalized by gt count).

TPU design: costs are computed fully in-graph; the assignment itself (an
inherently sequential combinatorial step over a 300 x M matrix) runs through
jax.pure_callback to scipy's linear_sum_assignment per image — a small host
round-trip per step, candidate for an in-graph auction solver later. Static
shapes: gts padded to M with a validity mask; unmatched/pad entries carry
zero weight.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou, xywh2xyxy


def _focal_class_cost(scores: jnp.ndarray, gt_cls: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """(B, nq, nc) sigmoid scores x (B, M) labels -> (B, nq, M) focal cost
    (models/utils/ops.py:60-70)."""
    pos = alpha * ((1 - scores) ** gamma) * (-jnp.log(scores + 1e-8))
    neg = (1 - alpha) * (scores**gamma) * (-jnp.log(1 - scores + 1e-8))
    cost = pos - neg  # (B, nq, nc)
    return jnp.take_along_axis(
        cost, jnp.clip(gt_cls, 0, scores.shape[-1] - 1)[:, None, :], axis=2
    )  # (B, nq, M)


def _lsa_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host-side per-image Hungarian: returns, per gt slot, the matched query
    index (or -1 for padding)."""
    from scipy.optimize import linear_sum_assignment

    B, nq, M = cost.shape
    out = np.full((B, M), -1, np.int32)
    for b in range(B):
        k = int(n_valid[b])
        if k == 0:
            continue
        r, c = linear_sum_assignment(cost[b, :, :k])
        out[b, c] = r.astype(np.int32)
    return out


def hungarian_match(
    pred_boxes: jnp.ndarray,  # (B, nq, 4) normalized cxcywh
    pred_logits: jnp.ndarray,  # (B, nq, nc)
    gt_boxes: jnp.ndarray,  # (B, M, 4) normalized cxcywh
    gt_cls: jnp.ndarray,  # (B, M)
    mask_gt: jnp.ndarray,  # (B, M)
    cost_gain: Tuple[float, float, float] = (2.0, 5.0, 2.0),  # class, bbox, giou
) -> jnp.ndarray:
    """Returns (B, M) matched query index per gt (-1 for padded gts)."""
    scores = jax.nn.sigmoid(pred_logits)
    c_cls = _focal_class_cost(scores, gt_cls)  # (B, nq, M)
    c_l1 = jnp.sum(jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]), axis=-1)
    giou = bbox_iou(
        xywh2xyxy(pred_boxes)[:, :, None, :], xywh2xyxy(gt_boxes)[:, None, :, :], xywh=False, GIoU=True
    ).squeeze(-1)
    cost = cost_gain[0] * c_cls + cost_gain[1] * c_l1 + cost_gain[2] * (1.0 - giou)
    cost = jnp.where(jnp.isfinite(cost), cost, 1e6)
    cost = jax.lax.stop_gradient(cost)
    n_valid = jnp.sum(mask_gt, axis=-1).astype(jnp.int32)

    B, _, M = cost.shape
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        cost,
        n_valid,
        vmap_method="sequential",
    )


def get_cdn_attn_mask(M: int, G: int, nq: int) -> np.ndarray:
    """Static denoising attention mask (models/utils/ops.py:240-252 semantics):
    True = attention BLOCKED. Matching queries cannot see dn queries; dn
    groups cannot see each other (block layout reproduced exactly, including
    the reference's 2M-sized group stripes)."""
    num_dn = 2 * G * M
    tgt = num_dn + nq
    mask = np.zeros((tgt, tgt), bool)
    mask[num_dn:, :num_dn] = True
    for i in range(G):
        lo, hi = 2 * M * i, 2 * M * (i + 1)
        mask[lo:hi, hi:num_dn] = True
        mask[lo:hi, :lo] = True
    return mask


def get_cdn_group(
    gt_cls: jnp.ndarray,  # (B, M) int
    gt_bboxes: jnp.ndarray,  # (B, M, 4) normalized cxcywh
    mask_gt: jnp.ndarray,  # (B, M)
    nc: int,
    class_embed: jnp.ndarray,  # (nc, hd)
    key,
    num_queries: int,
    num_dn: int = 100,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
):
    """Contrastive-denoising query group (models/utils/ops.py:153-252),
    static-shape: G = max(1, num_dn // M) groups of M positives + M negatives
    per image; padded gt slots carry zero embeddings and are loss-masked.

    Returns (dn_embed (B, 2GM, hd), dn_bbox_logit (B, 2GM, 4),
    attn_mask (2GM+nq, 2GM+nq) True=blocked, G).
    """
    B, M = gt_cls.shape
    G = max(1, num_dn // max(M, 1))
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # tile to (B, 2G, M): groups 0..G-1 positive, G..2G-1 negative
    cls = jnp.broadcast_to(gt_cls[:, None, :], (B, 2 * G, M))
    box = jnp.broadcast_to(gt_bboxes[:, None, :, :], (B, 2 * G, M, 4))
    valid = jnp.broadcast_to(mask_gt[:, None, :], (B, 2 * G, M))

    if cls_noise_ratio > 0:
        flip = jax.random.uniform(k1, cls.shape) < (cls_noise_ratio * 0.5)
        rand_lab = jax.random.randint(k2, cls.shape, 0, nc)
        cls = jnp.where(flip, rand_lab, cls)

    if box_noise_scale > 0:
        xyxy = xywh2xyxy(box)
        diff = jnp.tile(box[..., 2:] * 0.5, (1, 1, 1, 2)) * box_noise_scale
        sign = jax.random.randint(k3, box.shape, 0, 2) * 2.0 - 1.0
        part = jax.random.uniform(k4, box.shape)
        neg = jnp.arange(2 * G)[None, :, None, None] >= G  # negative groups
        part = part + neg.astype(part.dtype)  # negatives pushed outside the box
        xyxy = jnp.clip(xyxy + part * sign * diff, 0.0, 1.0)
        box = jnp.concatenate([(xyxy[..., :2] + xyxy[..., 2:]) / 2, xyxy[..., 2:] - xyxy[..., :2]], -1)
    box = jnp.clip(box, 1e-6, 1 - 1e-6)
    dn_bbox = jnp.log(box / (1.0 - box))  # inverse sigmoid (logit space)

    emb = class_embed[jnp.clip(cls, 0, nc - 1)]  # (B, 2G, M, hd)
    emb = emb * valid[..., None]  # padded slots -> zeros (reference padding_cls)
    dn_bbox = dn_bbox * valid[..., None]

    attn_mask = jnp.asarray(get_cdn_attn_mask(M, G, num_queries))
    return emb.reshape(B, 2 * G * M, -1), dn_bbox.reshape(B, 2 * G * M, 4), attn_mask, G


def detr_loss_fixed_match(
    dn_bboxes: jnp.ndarray,  # (L, B, 2GM, 4) normalized cxcywh
    dn_scores: jnp.ndarray,  # (L, B, 2GM, nc) logits
    gt_boxes: jnp.ndarray,  # (B, M, 4) normalized cxcywh
    gt_cls: jnp.ndarray,  # (B, M)
    mask_gt: jnp.ndarray,  # (B, M)
    num_group: int,
    gain_class: float = 1.0,
    gain_bbox: float = 5.0,
    gain_giou: float = 2.0,
) -> jnp.ndarray:
    """Denoising loss with the known 1:1 assignment (RTDETRDetectionLoss
    get_dn_match_indices, loss.py:287-345): per group g, positive slot m
    matches gt m; negatives and padded slots are background."""
    from .detection import optax_sigmoid_bce

    L, B, D, nc = dn_scores.shape
    G, M = num_group, gt_boxes.shape[1]
    num_gts = jnp.maximum(jnp.sum(mask_gt) * G, 1.0)
    total = 0.0
    for l in range(L):
        pb = dn_bboxes[l].reshape(B, 2 * G, M, 4)
        ps = dn_scores[l].reshape(B, 2 * G, M, nc)
        pos = pb[:, :G]  # (B, G, M, 4)
        valid = mask_gt[:, None, :]  # (B, 1, M)

        gt_b = jnp.broadcast_to(gt_boxes[:, None], pos.shape)
        iou_m = bbox_iou(
            xywh2xyxy(pos), xywh2xyxy(gt_b), xywh=False
        ).squeeze(-1)
        onehot_full = jax.nn.one_hot(jnp.clip(gt_cls, 0, nc - 1), nc)[:, None] * valid[..., None]
        gt_score = jnp.zeros((B, 2 * G, M, nc))
        gt_score = gt_score.at[:, :G].set(
            onehot_full * (jax.lax.stop_gradient(iou_m) * valid)[..., None]
        )
        one_hot_map = jnp.zeros((B, 2 * G, M, nc)).at[:, :G].set(onehot_full)
        p_sig = jax.nn.sigmoid(ps)
        vfl_w = 0.75 * p_sig**2.0 * (1.0 - one_hot_map) + gt_score * one_hot_map
        loss_cls = jnp.sum(optax_sigmoid_bce(ps, gt_score) * vfl_w) / num_gts

        l1 = jnp.sum(jnp.abs(pos - gt_b), -1) * valid
        giou = bbox_iou(xywh2xyxy(pos), xywh2xyxy(gt_b), xywh=False, GIoU=True).squeeze(-1)
        loss_bbox = jnp.sum(l1) / num_gts
        loss_giou = jnp.sum((1.0 - giou) * valid) / num_gts
        total = total + gain_class * loss_cls + gain_bbox * loss_bbox + gain_giou * loss_giou
    return total


def detr_loss(
    dec_bboxes: jnp.ndarray,  # (L, B, nq, 4) normalized cxcywh
    dec_scores: jnp.ndarray,  # (L, B, nq, nc) logits
    gt_boxes: jnp.ndarray,  # (B, M, 4) normalized cxcywh
    gt_cls: jnp.ndarray,  # (B, M)
    mask_gt: jnp.ndarray,  # (B, M)
    gain_class: float = 1.0,
    gain_bbox: float = 5.0,
    gain_giou: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aux-supervised DETR loss over all decoder layers (loss.py:12-220).

    Returns (total, (3,) detached items = [class, bbox, giou] of the last layer).
    """
    from .detection import optax_sigmoid_bce

    L, B, nq, nc = dec_scores.shape
    num_gts = jnp.maximum(jnp.sum(mask_gt), 1.0)
    total = 0.0
    last_items = None
    for l in range(L):
        pb, ps = dec_bboxes[l], dec_scores[l]
        match = hungarian_match(pb, ps, gt_boxes, gt_cls, mask_gt)  # (B, M)
        valid = (match >= 0) & mask_gt  # (B, M)
        safe = jnp.clip(match, 0, nq - 1)

        # matched pairs
        mp = jnp.take_along_axis(pb, safe[..., None], axis=1)  # (B, M, 4)
        iou_m = bbox_iou(xywh2xyxy(mp), xywh2xyxy(gt_boxes), xywh=False).squeeze(-1)  # (B, M)

        # class: varifocal loss with IoU-aware targets at matched queries
        # (reference RTDETRDetectionLoss uses use_vfl=True: loss.py:77-80 vfl
        # on gt_scores = matched-pair IoU, normalized by nq/num_gts -> sum/num_gts)
        b_ix = jnp.arange(B)[:, None]
        onehot = jax.nn.one_hot(jnp.clip(gt_cls, 0, nc - 1), nc) * valid[..., None]
        one_hot_map = jnp.zeros((B, nq, nc)).at[b_ix, safe].add(onehot)
        iou_valid = jax.lax.stop_gradient(iou_m) * valid
        gt_score_map = jnp.zeros((B, nq, nc)).at[b_ix, safe].add(onehot * iou_valid[..., None])
        p_sig = jax.nn.sigmoid(ps)
        vfl_w = 0.75 * p_sig**2.0 * (1.0 - one_hot_map) + gt_score_map * one_hot_map
        loss_cls = jnp.sum(optax_sigmoid_bce(ps, gt_score_map) * vfl_w) / num_gts

        # box terms on matched pairs
        l1 = jnp.sum(jnp.abs(mp - gt_boxes), axis=-1) * valid
        giou = bbox_iou(xywh2xyxy(mp), xywh2xyxy(gt_boxes), xywh=False, GIoU=True).squeeze(-1)
        loss_bbox = jnp.sum(l1) / num_gts
        loss_giou = jnp.sum((1.0 - giou) * valid) / num_gts

        layer_total = gain_class * loss_cls + gain_bbox * loss_bbox + gain_giou * loss_giou
        total = total + layer_total
        last_items = jnp.stack([loss_cls, loss_bbox, loss_giou])
    return total, jax.lax.stop_gradient(last_items)


def rtdetr_loss(out: Dict, gt_labels, gt_bboxes_px, mask_gt, imgsz: Tuple[int, int]):
    """Adapter for the trainer: pixel-xyxy gts -> normalized cxcywh, decoder +
    encoder aux losses + denoising loss (RTDETRDetectionModel.loss /
    RTDETRDetectionLoss.forward semantics, loss.py:287-320)."""
    h, w = imgsz
    scale = jnp.array([w, h, w, h], jnp.float32)
    xyxy_n = gt_bboxes_px / scale
    cxcywh = jnp.concatenate(
        [(xyxy_n[..., :2] + xyxy_n[..., 2:]) / 2, xyxy_n[..., 2:] - xyxy_n[..., :2]], axis=-1
    )
    dec_b, dec_s = out["dec_bboxes"], out["dec_scores"]
    num_dn = int(out.get("dn_split", 0))
    dn_total = 0.0
    if num_dn:
        dn_b, dec_b = dec_b[:, :, :num_dn], dec_b[:, :, num_dn:]
        dn_s, dec_s = dec_s[:, :, :num_dn], dec_s[:, :, num_dn:]
        dn_total = detr_loss_fixed_match(
            dn_b, dn_s, cxcywh, gt_labels, mask_gt, int(out["dn_group"])
        )
    total, items = detr_loss(dec_b, dec_s, cxcywh, gt_labels, mask_gt)
    enc_total, _ = detr_loss(
        out["enc_bboxes"][None], out["enc_scores"][None], cxcywh, gt_labels, mask_gt
    )
    return total + enc_total + dn_total, items
