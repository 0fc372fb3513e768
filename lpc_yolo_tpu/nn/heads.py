"""Detection heads: v8 `Detect` and NMS-free `v10Detect`, NHWC linen modules.

Behavioral spec: reference ultralytics/nn/modules/head.py:21-101 (Detect) and
:497-535 (v10Detect). The torch heads interleave branch compute with anchor
decode; here the modules emit raw per-level maps (box_logits ++ cls_logits on
the channel axis) and decoding is a separate pure function (`decode_feats`) so
the whole inference graph stays functional and jit-composable.

Bias init follows head.py:88-95,527-535: final box conv bias = 1.0; final cls
conv bias = log(5 / nc / (640 / stride)^2).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import dfl_expectation, dist2bbox, make_anchors
from .modules import ConvBN, Proto, kaiming_uniform


def _cls_bias_init(nc: int, stride: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, math.log(5 / nc / (640 / stride) ** 2), dtype)

    return init


def _box_bias_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def _v8_towers(xs, nc, ch, strides, reg_max, dtype, training):
    """The v8 Detect box+cls towers (head.py:38-43). A plain helper so Segment/
    Pose/OBB heads create the same flat param names (cv2_i_j / cv3_i_j) as the
    reference's attribute paths."""
    c2 = max(16, ch[0] // 4, reg_max * 4)
    c3 = max(ch[0], min(nc, 100))
    outs = []
    for i, x in enumerate(xs):
        b = ConvBN(c2, 3, dtype=dtype, name=f"cv2_{i}_0")(x, training)
        b = ConvBN(c2, 3, dtype=dtype, name=f"cv2_{i}_1")(b, training)
        b = nn.Conv(
            4 * reg_max, (1, 1), use_bias=True, kernel_init=kaiming_uniform(),
            bias_init=_box_bias_init, dtype=dtype, name=f"cv2_{i}_2",
        )(b)
        c = ConvBN(c3, 3, dtype=dtype, name=f"cv3_{i}_0")(x, training)
        c = ConvBN(c3, 3, dtype=dtype, name=f"cv3_{i}_1")(c, training)
        c = nn.Conv(
            nc, (1, 1), use_bias=True, kernel_init=kaiming_uniform(),
            bias_init=_cls_bias_init(nc, strides[i]), dtype=dtype, name=f"cv3_{i}_2",
        )(c)
        outs.append(jnp.concatenate([b, c], axis=-1))
    return tuple(outs)


class Detect(nn.Module):
    """YOLOv8 anchor-free decoupled head. Returns per-level raw maps
    (B, H, W, 4*reg_max + nc), channel layout [box_dfl(64), cls(nc)]."""

    nc: int = 80
    ch: Tuple[int, ...] = ()
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False):
        return _v8_towers(xs, self.nc, self.ch, self.strides, self.reg_max, self.dtype, training)


class Segment(nn.Module):
    """YOLOv8 Segment head (head.py:104-128): Detect towers + per-level
    mask-coefficient towers (cv4) + Proto prototype masks on P3.

    Returns (det_feats tuple, mc (B, A, nm), proto (B, H/4, W/4, nm))."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False):
        p = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], training)
        c4 = max(self.ch[0] // 4, self.nm)
        B = xs[0].shape[0]
        mcs = []
        for i, x in enumerate(xs):
            m = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, training)
            m = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, training)
            m = nn.Conv(
                self.nm, (1, 1), use_bias=True, kernel_init=kaiming_uniform(), dtype=self.dtype,
                name=f"cv4_{i}_2",
            )(m)
            mcs.append(m.reshape(B, -1, self.nm))
        mc = jnp.concatenate(mcs, axis=1)  # (B, A, nm)
        feats = _v8_towers(xs, self.nc, self.ch, self.strides, self.reg_max, self.dtype, training)
        return feats, mc, p


class V10Detect(nn.Module):
    """YOLOv10 dual-assignment head (head.py:497-535): a one-to-many branch
    (cv2/cv3, v8-style box tower + lightweight cls tower) and a structurally
    identical one-to-one branch fed with stop_gradient'ed neck features.

    Returns {'one2many': tuple, 'one2one': tuple} of raw (B,H,W,64+nc) maps.
    Predict-only callers can pass branches='one2one' to skip the o2m compute.
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False, branches: str = "both"):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))

        def branch(xs_in, pbox, pcls):
            outs = []
            for i, x in enumerate(xs_in):
                b = ConvBN(c2, 3, dtype=self.dtype, name=f"{pbox}_{i}_0")(x, training)
                b = ConvBN(c2, 3, dtype=self.dtype, name=f"{pbox}_{i}_1")(b, training)
                b = nn.Conv(
                    4 * self.reg_max,
                    (1, 1),
                    use_bias=True,
                    kernel_init=kaiming_uniform(),
                    bias_init=_box_bias_init,
                    dtype=self.dtype,
                    name=f"{pbox}_{i}_2",
                )(b)
                # lightweight cls tower: (DW3x3 -> 1x1) x2 -> 1x1 (head.py:503-506)
                ci = self.ch[i]
                c = ConvBN(ci, 3, g=ci, dtype=self.dtype, name=f"{pcls}_{i}_0_0")(x, training)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"{pcls}_{i}_0_1")(c, training)
                c = ConvBN(c3, 3, g=c3, dtype=self.dtype, name=f"{pcls}_{i}_1_0")(c, training)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"{pcls}_{i}_1_1")(c, training)
                c = nn.Conv(
                    self.nc,
                    (1, 1),
                    use_bias=True,
                    kernel_init=kaiming_uniform(),
                    bias_init=_cls_bias_init(self.nc, self.strides[i]),
                    dtype=self.dtype,
                    name=f"{pcls}_{i}_2",
                )(c)
                outs.append(jnp.concatenate([b, c], axis=-1))
            return tuple(outs)

        out = {}
        one2one_in = [jax.lax.stop_gradient(x) for x in xs]
        if branches in ("both", "one2one"):
            out["one2one"] = branch(one2one_in, "one2one_cv2", "one2one_cv3")
        if branches in ("both", "one2many"):
            out["one2many"] = branch(xs, "cv2", "cv3")
        return out


def decode_feats_topk(
    feats: Sequence[jnp.ndarray],
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    max_det: int = 300,
) -> jnp.ndarray:
    """Fused NMS-free v10 decode: top-k FIRST, then DFL/sigmoid on survivors.

    Produces bit-identical results to decode_feats + ops.v10_detections (the
    reference's Detect.inference + v10postprocess pipeline) but ~A/max_det x
    cheaper: sigmoid is monotonic, so the stage-1 per-anchor-max top-k can run
    on raw class logits, and the DFL softmax-expectation (the expensive part,
    (B,A,4,16) softmax+matmul) only runs on the max_det selected anchors.

    Returns (B, max_det, 6) = [x1, y1, x2, y2, score, label].
    """
    B = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    no = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)  # (B, A, no)
    A = flat.shape[1]
    k1 = min(max_det, A)
    box_logits = flat[..., : 4 * reg_max]
    cls_logits = flat[..., 4 * reg_max :].astype(jnp.float32)

    # stage 1 on raw logits (sigmoid is monotonic)
    max_logit = jnp.max(cls_logits, axis=-1)  # (B, A)
    _, idx = jax.lax.top_k(max_logit, k1)  # (B, k1)
    sel_box = jnp.take_along_axis(box_logits, idx[..., None], axis=1)  # (B, k1, 64)
    sel_cls = jnp.take_along_axis(cls_logits, idx[..., None], axis=1)  # (B, k1, nc)

    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)
    sel_anchors = jnp.take_along_axis(
        jnp.broadcast_to(anchor_points[None], (B, A, 2)), idx[..., None], axis=1
    )
    sel_strides = jnp.take_along_axis(
        jnp.broadcast_to(stride_tensor[None], (B, A, 1)), idx[..., None], axis=1
    )

    dist = dfl_expectation(sel_box.astype(jnp.float32), reg_max)  # (B, k1, 4)
    dbox = dist2bbox(dist, sel_anchors, xywh=True) * sel_strides
    scores = jax.nn.sigmoid(sel_cls)

    # stage 2: flattened (anchor, class) top-k (ops.py:851-864 semantics)
    flat_scores = scores.reshape(B, -1)
    k2 = min(max_det, flat_scores.shape[-1])
    out_scores, fidx = jax.lax.top_k(flat_scores, k2)
    labels = (fidx % nc).astype(jnp.int32)
    arow = fidx // nc
    out_boxes = jnp.take_along_axis(dbox, arow[..., None], axis=1)
    if k2 < max_det:
        pad = max_det - k2
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))

    from ..ops.boxes import xywh2xyxy

    return jnp.concatenate(
        [xywh2xyxy(out_boxes), out_scores[..., None], labels[..., None].astype(out_boxes.dtype)],
        axis=-1,
    )


def decode_feats(
    feats: Sequence[jnp.ndarray],
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
) -> jnp.ndarray:
    """Decode raw per-level head maps to (B, A, 4+nc) = [xywh_px, sigmoid cls].

    Mirrors Detect.inference (head.py:45-71): DFL expectation -> dist2bbox about
    static grid anchors -> scale by stride; class logits -> sigmoid.
    """
    B = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(B, -1, f.shape[-1]) for f in feats], axis=1)  # (B, A, no)
    box_logits, cls_logits = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5, dtype=jnp.float32)
    dist = dfl_expectation(box_logits.astype(jnp.float32), reg_max)
    dbox = dist2bbox(dist, anchor_points, xywh=True) * stride_tensor
    return jnp.concatenate([dbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)
