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
from typing import Any, Sequence, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import dfl_expectation, dist2bbox, make_anchors
from . import quant
from .modules import ConvBN, Proto, kaiming_uniform


def _cls_bias_init(nc: int, stride: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, math.log(5 / nc / (640 / stride) ** 2), dtype)

    return init


def _box_bias_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


class _ConvParams(nn.Module):
    """Declares nn.Conv's (kernel, bias) variable pair without executing it —
    lets the packed serving tower reuse the exact training-time param tree."""

    shape: Tuple[int, ...]
    bias_init: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming_uniform(), self.shape, jnp.float32)
        b = self.param("bias", self.bias_init, (self.shape[-1],), jnp.float32)
        return k, b


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
        # strides may still be the 3-level default during the stride-probe
        # build of a P2/P6 4-level graph; extrapolate octaves for bias init
        # (the real build passes the probed per-level strides)
        s_i = strides[i] if i < len(strides) else strides[-1] * 2 ** (i - len(strides) + 1)
        c = nn.Conv(
            nc, (1, 1), use_bias=True, kernel_init=kaiming_uniform(),
            bias_init=_cls_bias_init(nc, s_i), dtype=dtype, name=f"cv3_{i}_2",
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


class Pose(nn.Module):
    """YOLOv8 Pose head (head.py:161-200): Detect towers + per-level keypoint
    towers. Returns (det_feats, kpt (B, A, nk)) raw; keypoint decode is the
    pure fn `decode_kpts` (kpts_decode semantics)."""

    nc: int = 1
    kpt_shape: Tuple[int, int] = (17, 3)
    ch: Tuple[int, ...] = ()
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        B = xs[0].shape[0]
        ks = []
        for i, x in enumerate(xs):
            k = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, training)
            k = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, training)
            k = nn.Conv(nk, (1, 1), use_bias=True, kernel_init=kaiming_uniform(), dtype=self.dtype,
                        name=f"cv4_{i}_2")(k)
            ks.append(k.reshape(B, -1, nk))
        kpt = jnp.concatenate(ks, axis=1)  # (B, A, nk)
        feats = _v8_towers(xs, self.nc, self.ch, self.strides, self.reg_max, self.dtype, training)
        return feats, kpt


def decode_kpts(
    kpt: jnp.ndarray,  # (B, A, nk) raw
    feat_shapes,
    strides,
    kpt_shape: Tuple[int, int] = (17, 3),
) -> jnp.ndarray:
    """Keypoint decode (head.py:185-200): xy = (raw*2 + anchor - 0.5) * stride,
    visibility sigmoid. Returns (B, A, nk)."""
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)
    B, A, nk = kpt.shape
    nkpt, ndim = kpt_shape
    y = kpt.reshape(B, A, nkpt, ndim).astype(jnp.float32)
    xy = (y[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)) * stride_tensor[None, :, None, :]
    if ndim == 3:
        v = jax.nn.sigmoid(y[..., 2:3])
        y = jnp.concatenate([xy, v], axis=-1)
    else:
        y = xy
    return y.reshape(B, A, nk)


class OBB(nn.Module):
    """YOLOv8 oriented-box head (head.py:130-159): Detect towers + per-level
    angle towers. Returns (det_feats, angle (B, A, ne)) with angle already
    mapped to [-pi/4, 3pi/4] via (sigmoid - 0.25) * pi."""

    nc: int = 15
    ne: int = 1
    ch: Tuple[int, ...] = ()
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False):
        c4 = max(self.ch[0] // 4, self.ne)
        B = xs[0].shape[0]
        angs = []
        for i, x in enumerate(xs):
            a = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, training)
            a = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(a, training)
            a = nn.Conv(self.ne, (1, 1), use_bias=True, kernel_init=kaiming_uniform(), dtype=self.dtype,
                        name=f"cv4_{i}_2")(a)
            angs.append(a.reshape(B, -1, self.ne))
        angle = jnp.concatenate(angs, axis=1).astype(jnp.float32)
        angle = (jax.nn.sigmoid(angle) - 0.25) * math.pi
        feats = _v8_towers(xs, self.nc, self.ch, self.strides, self.reg_max, self.dtype, training)
        return feats, angle


def dist2rbox(pred_dist: jnp.ndarray, angle: jnp.ndarray, anchor_points: jnp.ndarray) -> jnp.ndarray:
    """Rotated-box decode (tal.py:329-345 dist2rbox): rotate the lt/rb offset
    midpoint by the predicted angle. Returns (..., 4) = [x, y, w, h]."""
    lt, rb = jnp.split(pred_dist, 2, axis=-1)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=-1)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=-1) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=-1)


class Classify(nn.Module):
    """YOLOv8 classification head (head.py:202-222): conv 1280 -> global
    avg-pool -> linear(nc). Returns logits (B, nc)."""

    nc: int = 1000
    c_: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = ConvBN(self.c_, 1, 1, dtype=self.dtype, name="conv")(x, training)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool
        return nn.Dense(self.nc, kernel_init=kaiming_uniform(), dtype=self.dtype, name="linear")(x)


class V10Detect(nn.Module):
    """YOLOv10 dual-assignment head (head.py:497-535): a one-to-many branch
    (cv2/cv3, v8-style box tower + lightweight cls tower) and a structurally
    identical one-to-one branch fed with stop_gradient'ed neck features.

    Returns {'one2many': tuple, 'one2one': tuple} of raw (B,H,W,64+nc) maps —
    or, with split=True, tuples of per-level (box_map, cls_map) PAIRS: the
    64++nc channel concat is pure layout traffic that the consumers (serving
    decode, training loss) immediately re-split, so both fast paths skip it.
    Predict-only callers can pass branches='one2one' to skip the o2m compute;
    train_pack=True width-packs the training box towers (P2, 128 dense lanes).
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False, branches: str = "both",
                 split: bool = False, train_pack: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))

        def branch(xs_in, pbox, pcls):
            from .modules import _FusedConvBN, packed_conv

            outs = []
            for i, x in enumerate(xs_in):
                pack = 2 if (split and not training and c2 < 128 and x.shape[2] % 2 == 0) else 1
                tpack = 2 if (train_pack and training and c2 < 128 and x.shape[2] % 2 == 0) else 1
                if tpack > 1:
                    # training-path packing (same idea as the serving tower
                    # below, but with live BN statistics): the c2=64 box-tower
                    # maps read/reduce at half-empty 128-lane tiles — the
                    # head's P3-level BN-stat/grad reduces alone were
                    # ~2 ms/step at v10n b32 (xplane). ConvBN's packed
                    # training path (packed_conv + PackedBN) keeps the exact
                    # variable tree and flax BatchNorm numerics; the final
                    # 1x1 runs packed on the raw (kernel, bias) pair. The
                    # packed (B, H, W/2, 2*64) output flattens to the same
                    # (B, A, 64) anchor order as the unpacked map (pack_width
                    # is a row-major reshape), so the loss consumes it
                    # directly — the packed region never unpacks.
                    b = ConvBN(c2, 3, pack_in=1, pack_out=tpack, dtype=self.dtype,
                               name=f"{pbox}_{i}_0")(x, training)
                    b = ConvBN(c2, 3, pack_in=tpack, pack_out=tpack, dtype=self.dtype,
                               name=f"{pbox}_{i}_1")(b, training)
                    wf, bff = _ConvParams(
                        (1, 1, c2, 4 * self.reg_max), _box_bias_init, name=f"{pbox}_{i}_2"
                    )()
                    b = packed_conv(b, wf.astype(self.dtype), 1, tpack, tpack,
                                    b=bff.astype(self.dtype))
                elif pack > 1:
                    # serving path: the box tower's c2=64 output maps waste
                    # half the lane tile; run the whole tower width-packed P2
                    # (128 lanes) through the final 1x1 — the decode gathers
                    # straight from the packed map, so no unpack copy either
                    # (~0.3 ms/step across v10m's levels, xplane-profiled)
                    w1, bf1 = _FusedConvBN(self.ch[i], c2, 3, name=f"{pbox}_{i}_0")()
                    b = packed_conv(x, w1.astype(self.dtype), 1, 1, pack,
                                    b=bf1.astype(self.dtype), act=True)
                    w2, bf2 = _FusedConvBN(c2, c2, 3, name=f"{pbox}_{i}_1")()
                    b = packed_conv(b, w2.astype(self.dtype), 1, pack, pack,
                                    b=bf2.astype(self.dtype), act=True)
                    wf, bff = _ConvParams(
                        (1, 1, c2, 4 * self.reg_max), _box_bias_init, name=f"{pbox}_{i}_2"
                    )()
                    # final DFL projection stays bf16 under int8 PTQ: its
                    # output IS the box distribution (accuracy-critical),
                    # and at (1,1,c2,64) per slot it is latency-bound anyway
                    with quant.suspended():
                        b = packed_conv(b, wf.astype(self.dtype), 1, pack, pack,
                                        b=bff.astype(self.dtype))
                else:
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
                if split:
                    # serving path: keep (box, cls) maps separate — the fused
                    # decode consumes them independently, and the per-level
                    # 64++nc concat costs a 1.5-tile layout copy per level
                    # (~0.4 ms/step on v10m b32, xplane-profiled)
                    outs.append((b, c))
                else:
                    outs.append(jnp.concatenate([b, c], axis=-1))
            return tuple(outs)

        out = {}
        one2one_in = [jax.lax.stop_gradient(x) for x in xs]
        if branches in ("both", "one2one"):
            out["one2one"] = branch(one2one_in, "one2one_cv2", "one2one_cv3")
        if branches in ("both", "one2many"):
            out["one2many"] = branch(xs, "cv2", "cv3")
        return out


def _topk(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k tuned for the TPU TopK custom call's row parallelism.

    The custom call's cost scales with the row LENGTH, not the row count
    (32 rows underfill the vector lanes): splitting each row into S
    segments, top-k'ing the (B*S, N/S) view, and merging the S*k segment
    winners is mathematically exact (top-k of a union == top-k of the
    per-part top-ks) and benched 1.24 ms vs 1.93 ms for the decode's
    (32, 24000) -> 300 at S=8. Narrow inputs keep approx_max_k at
    recall 1.0 (lowered to a cheap single sort for bf16 stage-1 shapes).
    Tie order between exactly-equal scores may differ from lax.top_k;
    detection scores are continuous floats, so ties are measure-zero.
    """
    B, N = x.shape
    S = 8
    if N >= 16000 and N % S == 0 and N // S >= k:
        s, i = jax.lax.top_k(x.reshape(B * S, N // S), k)
        offs = (jnp.arange(S, dtype=i.dtype) * (N // S))[None, :, None]
        s = s.reshape(B, S * k)
        i = (i.reshape(B, S, k) + offs).reshape(B, S * k)
        so, kk = jax.lax.top_k(s, k)
        return so, jnp.take_along_axis(i, kk, axis=1)
    return jax.lax.approx_max_k(x, k, recall_target=1.0)


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
    pairs = [(f[..., : 4 * reg_max], f[..., 4 * reg_max:]) for f in feats]
    return decode_feats_topk_split(pairs, strides, nc, reg_max, max_det)


def decode_feats_topk_split(
    pairs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    max_det: int = 300,
) -> jnp.ndarray:
    """decode_feats_topk over per-level (box_map, cls_map) PAIRS.

    The serving head keeps the 4*reg_max box map and the nc cls map separate
    (V10Detect split=True): the per-level 64++nc channel concat is pure
    layout traffic (~0.4 ms/step on v10m b32), and the decode only ever
    reads the two halves independently anyway.
    """
    B = pairs[0][0].shape[0]
    # box maps may arrive width-packed from the serving tower (V10Detect
    # packs the c2=64 box tower at P2); the cls map defines the true grid
    feat_shapes = [(cm.shape[1], cm.shape[2]) for _, cm in pairs]
    A = sum(h * w for h, w in feat_shapes)
    k1 = min(max_det, A)

    # stage 1 on raw logits (sigmoid is monotonic). The class max reduces
    # per scale BEFORE any reshape/concat so the big (B, A, no) tensor is
    # never materialized in a relayout; all math stays in the feats' dtype
    # (bf16 on the serving path) and only the k1 selected rows go to f32.
    max_logit = jnp.concatenate(
        [jnp.max(cm, axis=-1).reshape(B, -1) for _, cm in pairs], axis=1
    ).astype(jnp.float32)  # (B, A)
    _, idx = _topk(max_logit, k1)  # (B, k1)
    # gather the k1 survivor rows per level WITHOUT materializing the
    # (B, A, no) concat (profiled ~0.8 ms of pad+concat HBM traffic on v10m
    # b32): each level contributes via a masked 300-row gather instead.
    sel_box = jnp.zeros((B, k1, 4 * reg_max), pairs[0][0].dtype)
    sel_cls = jnp.zeros((B, k1, nc), jnp.float32)
    off = 0
    bidx = jnp.arange(B, dtype=idx.dtype)[:, None]
    for bm, cm in pairs:
        W = cm.shape[2]
        n_l = cm.shape[1] * W
        rel = idx - off
        in_lvl = (rel >= 0) & (rel < n_l)
        safe = jnp.clip(rel, 0, n_l - 1)
        # gather by 2-D (row, col) coordinates instead of flattening the
        # (B, H, W, no) map first: the serving layout keeps H outer-minor,
        # so the (B, H*W, no) reshape materializes a relayout copy (~0.5
        # ms/step on v10m b32, xplane-profiled); a coordinate gather reads
        # the map in place
        hh, ww = safe // W, safe % W
        if bm.shape[2] != W:
            # width-packed box map: pixel (h, w) lives in column w//P at
            # channel block (w%P); gather the packed column then pick the
            # sub-block — no unpack of the full map needed
            P = W // bm.shape[2]
            got = bm[bidx, hh, ww // P].reshape(B, k1, P, 4 * reg_max)
            got = jnp.take_along_axis(got, (ww % P)[..., None, None], axis=2)[:, :, 0]
        else:
            got = bm[bidx, hh, ww]
        sel_box = jnp.where(in_lvl[..., None], got, sel_box)
        sel_cls = jnp.where(in_lvl[..., None], cm[bidx, hh, ww].astype(jnp.float32), sel_cls)
        off += n_l

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

    # stage 2: flattened (anchor, class) top-k (ops.py:851-864 semantics).
    # (A per-anchor top-7 decomposition with a lax.cond exact-fallback was
    # benched 0.4 ms SLOWER in-graph despite winning in isolation — the
    # conditional serializes against the decode tail — so the single TopK
    # custom call stays.)
    flat_scores = scores.reshape(B, -1)
    k2 = min(max_det, flat_scores.shape[-1])
    out_scores, fidx = _topk(flat_scores, k2)
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


def decode_feats_obb(
    feats: Sequence[jnp.ndarray],
    angle: jnp.ndarray,  # (B, A, 1) in radians
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
) -> jnp.ndarray:
    """Rotated-box decode for the OBB head (OBB.decode_bboxes semantics):
    returns (B, A, 4+nc+1) = [cx, cy, w, h (rotated), sigmoid cls, angle]."""
    B = feats[0].shape[0]
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    no = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)
    box_logits, cls_logits = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)
    dist = dfl_expectation(box_logits.astype(jnp.float32), reg_max)
    rbox = dist2rbox(dist, angle, anchor_points) * stride_tensor
    return jnp.concatenate(
        [rbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32)), angle], axis=-1
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


class WorldDetect(nn.Module):
    """YOLO-World open-vocabulary head (reference head.py:224-264): v8 box
    towers + embedding towers whose logits are region-text similarities from a
    ContrastiveHead, so the class count is the number of text rows."""

    nc: int = 80
    embed: int = 512
    with_bn: bool = False
    ch: Tuple[int, ...] = ()
    strides: Tuple[float, ...] = (8.0, 16.0, 32.0)
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], text, training: bool = False):
        from .modules import BNContrastiveHead, ContrastiveHead

        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(xs):
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, training)
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, training)
            b = nn.Conv(
                4 * self.reg_max, (1, 1), use_bias=True, kernel_init=kaiming_uniform(),
                bias_init=_box_bias_init, dtype=self.dtype, name=f"cv2_{i}_2",
            )(b)
            e = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, training)
            e = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(e, training)
            e = nn.Conv(
                self.embed, (1, 1), use_bias=True, kernel_init=kaiming_uniform(),
                dtype=self.dtype, name=f"cv3_{i}_2",
            )(e)
            if self.with_bn:
                logits = BNContrastiveHead(self.embed, dtype=self.dtype, name=f"cv4_{i}")(e, text, training)
            else:
                logits = ContrastiveHead(dtype=self.dtype, name=f"cv4_{i}")(e, text, training)
            outs.append(jnp.concatenate([b, logits], axis=-1))
        return tuple(outs)
