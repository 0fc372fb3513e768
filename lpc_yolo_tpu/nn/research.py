"""Research block zoo: the ~90 imported-paper modules the reference YAML
compiler accepts (reference ultralytics/nn/modules/block.py:843-5724 and
nn/tasks.py:880-1045).

These are the plug-in backbone stages, attention modules, and neck blocks the
fork imports from public papers (Swin, VanillaNet, ConvNeXt, MobileNetV3,
StarNet, ShuffleNetV2, EfficientNet-Lite, FasterNet, MobileNeXt, GhostNet,
PP-LCNet, plus the attention-module zoo: SE/ECA/CoordAtt/SimAM/SK/Shuffle/
A2/CoT/GC/GE/MHSA/ParNet/PSA-polarized/SGE/Triplet/NAM/CrissCross/S2MLP/GAM,
and neck blocks RFB/DySample/ASFF/MSBlock/SlimNeck-GSConv/PPA/SCSA/FGFP/
AxialTransformer). None are used by the shipped YAMLs, but they are part of
the reference's YAML-compiler surface (tasks.py parse rules), so custom model
configs may reference them.

TPU-first re-design notes:
  * NHWC activations throughout (channel on the TPU lane axis); torch
    permute/view gymnastics become plain reshapes.
  * Global pooling + 1x1 convs become means + matmul-shaped Dense/Conv ops
    that XLA maps straight onto the MXU.
  * The AxialImageTransformer's reversible-sequence memory trick (reference
    block.py:4126-4265) is replaced by jax.checkpoint (rematerialisation) —
    the TPU-native way to trade FLOPs for activation memory.
  * In-place spatial shifts (S2-MLPv2) become functional pad+slice ops.
  * torch grid_sample (DySample) is re-implemented as a gather-based
    bilinear sampler with border clamping — static shapes, fully fusible.

Module/arg semantics follow reference block.py so reference YAMLs parse
unchanged; file:line citations are on each class.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import BN_EPS, BN_MOMENTUM, ConvBN, GhostConv, autopad, kaiming_uniform


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _act(x, kind: str):
    """Activation dispatch for the zoo's many per-paper choices."""
    if kind in ("relu",):
        return nn.relu(x)
    if kind == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if kind in ("hswish", "hardswish"):
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    if kind in ("hsigmoid", "hard_sigmoid"):
        return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    if kind == "gelu":
        return nn.gelu(x)
    if kind == "silu":
        return nn.silu(x)
    if kind == "elu":
        return nn.elu(x)
    if kind == "mish":
        return x * jnp.tanh(jax.nn.softplus(x))
    if kind == "sigmoid":
        return nn.sigmoid(x)
    if kind in ("none", "identity"):
        return x
    raise ValueError(f"unknown activation {kind!r}")


class CBA(nn.Module):
    """Conv2d + optional BN + activation, the zoo's generic conv unit.

    Mirrors the reference's per-paper Conv/BasicConv/ConvBNReLU/conv_block
    variants with one parameterised module (conv/bn submodule names match
    ConvBN so fuse_conv_bn folds these too).
    """

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: str = "relu"
    bn: bool = True
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        pad = self.p if self.p is not None else autopad(self.k, None, self.d)
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=self.bias,
            kernel_init=kaiming_uniform(),
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="bn",
            )(x)
        return _act(x, self.act)


def channel_shuffle(x, groups: int):
    """ShuffleNet channel shuffle on NHWC (reference block.py:2046)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


def _gap(x, keepdims=True):
    """Global average pool over H, W."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def _gmp(x, keepdims=True):
    """Global max pool over H, W."""
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)


def max_pool(x, k: int, s: int, p: int = 0):
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


def avg_pool(x, k: int, s: int, p: int = 0):
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return nn.avg_pool(x, (k, k), strides=(s, s))


def resize_nearest(x, h: int, w: int):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="nearest")


def resize_bilinear(x, h: int, w: int):
    """align_corners=False bilinear resize (matches F.interpolate default)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


# ---------------------------------------------------------------------------
# squeeze-excite family
# ---------------------------------------------------------------------------


class SeBlock(nn.Module):
    """GhostNet/PP-LCNet squeeze-excite (reference block.py:2005)."""

    c1: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = _gap(x)
        y = nn.Conv(max(1, self.c1 // self.reduction), (1, 1), dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.c1, (1, 1), dtype=self.dtype, name="fc2")(y)
        return x * nn.sigmoid(y)


class SE(nn.Module):
    """Classic SENet attention with Linear layers (reference block.py:2488)."""

    c1: int
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(max(1, self.c1 // self.ratio), use_bias=False, dtype=self.dtype, name="l1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.c1, use_bias=False, dtype=self.dtype, name="l2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ECA(nn.Module):
    """Efficient channel attention: 1D conv over the pooled channel vector
    with an adaptive kernel (reference block.py:5111 — the surviving ECA
    definition; the earlier k-size-only one at 2513 is shadowed by it)."""

    c1: int
    gamma: int = 2
    b: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        k = int(abs((math.log(self.c1, 2) + self.b) / self.gamma))
        k = k if k % 2 else k + 1
        y = jnp.mean(x, axis=(1, 2))[..., None]  # (B, C, 1)
        w = self.param("conv", kaiming_uniform(), (k, 1, 1), jnp.float32)
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype), w.astype(self.dtype), (1,), [(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return x * nn.sigmoid(y[..., 0])[:, None, None, :]


class EffectiveSEModule(nn.Module):
    """VoVNet2 eSE: single 1x1 over pooled features, hard-sigmoid gate
    (reference block.py:3364)."""

    c1: int
    add_maxpool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = _gap(x)
        if self.add_maxpool:
            y = 0.5 * y + 0.5 * _gmp(x)
        y = nn.Conv(self.c1, (1, 1), dtype=self.dtype, name="fc")(y)
        return x * _act(y, "hard_sigmoid")


# ---------------------------------------------------------------------------
# attention zoo
# ---------------------------------------------------------------------------


class CoordAtt(nn.Module):
    """Coordinate attention: factorised H/W pooling (reference block.py:2555)."""

    c1: int
    c2: int
    reduction: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        mip = max(8, self.c1 // self.reduction)
        x_h = jnp.mean(x, axis=2)  # (B, H, C) — pool over W
        x_w = jnp.mean(x, axis=1)  # (B, W, C) — pool over H
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        y = nn.Conv(mip, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(y)
        y = _act(y, "hswish")
        y_h, y_w = y[:, :h], y[:, h:]
        a_h = nn.sigmoid(nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv_h")(y_h))
        a_w = nn.sigmoid(nn.Conv(self.c2, (1, 1), dtype=self.dtype, name="conv_w")(y_w))
        # a_h: (B, H, 1, C) broadcasts over W; a_w: (B, W, 1, C) -> (B, 1, W, C)
        return x * jnp.swapaxes(a_w, 1, 2) * a_h


class SimAM(nn.Module):
    """Parameter-free SimAM attention (reference block.py:2639)."""

    e_lambda: float = 1e-4

    @nn.compact
    def __call__(self, x, training: bool = False):
        h, w = x.shape[1], x.shape[2]
        n = h * w - 1
        d = (x - jnp.mean(x, axis=(1, 2), keepdims=True)) ** 2
        y = d / (4 * (jnp.sum(d, axis=(1, 2), keepdims=True) / n + self.e_lambda)) + 0.5
        return x * nn.sigmoid(y)


class SplitAttention(nn.Module):
    """S2-MLPv2 split attention over k branches (reference block.py:2686)."""

    channel: int = 512
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_all, training: bool = False):
        # x_all: (B, k, H, W, C)
        b, k, h, w, c = x_all.shape
        flat = x_all.reshape(b, k, -1, c)
        a = jnp.sum(jnp.sum(flat, axis=1), axis=1)  # (B, C)
        hat_a = nn.Dense(self.channel, use_bias=False, dtype=self.dtype, name="mlp1")(a)
        hat_a = nn.gelu(hat_a)
        hat_a = nn.Dense(self.channel * self.k, use_bias=False, dtype=self.dtype, name="mlp2")(hat_a)
        hat_a = hat_a.reshape(b, self.k, c)
        bar_a = nn.softmax(hat_a, axis=1)[:, :, None, :]  # (B, k, 1, C)
        out = jnp.sum(bar_a * flat, axis=1).reshape(b, h, w, c)
        return out


def _spatial_shift1(x, c):
    """In-place torch shifts become functional pad+slice (block.py:2663)."""
    q = c // 4
    a = jnp.concatenate([x[:, :1, :, :q], x[:, :-1, :, :q]], axis=1)
    b = jnp.concatenate([x[:, 1:, :, q:2 * q], x[:, -1:, :, q:2 * q]], axis=1)
    cc = jnp.concatenate([x[:, :, :1, 2 * q:3 * q], x[:, :, :-1, 2 * q:3 * q]], axis=2)
    d = jnp.concatenate([x[:, :, 1:, 3 * q:], x[:, :, -1:, 3 * q:]], axis=2)
    return jnp.concatenate([a, b, cc, d], axis=-1)


def _spatial_shift2(x, c):
    q = c // 4
    a = jnp.concatenate([x[:, :, :1, :q], x[:, :, :-1, :q]], axis=2)
    b = jnp.concatenate([x[:, :, 1:, q:2 * q], x[:, :, -1:, q:2 * q]], axis=2)
    cc = jnp.concatenate([x[:, :1, :, 2 * q:3 * q], x[:, :-1, :, 2 * q:3 * q]], axis=1)
    d = jnp.concatenate([x[:, 1:, :, 3 * q:], x[:, -1:, :, 3 * q:]], axis=1)
    return jnp.concatenate([a, b, cc, d], axis=-1)


class S2Attention(nn.Module):
    """S2-MLPv2 attention (reference block.py:2709). The torch original's
    in-place quarter-channel shifts read only unmodified channel ranges, so
    the functional equivalent shifts each quarter independently with edge
    replication."""

    channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.channels
        y = nn.Dense(c * 3, dtype=self.dtype, name="mlp1")(x)
        x1 = _spatial_shift1(y[..., :c], c)
        x2 = _spatial_shift2(y[..., c:2 * c], c)
        x3 = y[..., 2 * c:]
        x_all = jnp.stack([x1, x2, x3], axis=1)  # (B, 3, H, W, C)
        a = SplitAttention(c, 3, dtype=self.dtype, name="split_attention")(x_all, training)
        return nn.Dense(c, dtype=self.dtype, name="mlp2")(a)


class NAMAttention(nn.Module):
    """Normalization-based attention: BN weights as channel saliency
    (reference block.py:2735-2770)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.channels
        # BN declared inline so its own scale doubles as the channel saliency
        # (weight_bn = |gamma| / sum|gamma| in the reference).
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if training:
            mu = jnp.mean(x, axis=(0, 1, 2))
            sig = jnp.var(x, axis=(0, 1, 2))
            mean.value = BN_MOMENTUM * mean.value + (1 - BN_MOMENTUM) * mu
            var.value = BN_MOMENTUM * var.value + (1 - BN_MOMENTUM) * sig
        else:
            mu, sig = mean.value, var.value
        y = (x - mu) * jax.lax.rsqrt(sig + BN_EPS) * gamma + beta
        w = jnp.abs(gamma) / jnp.sum(jnp.abs(gamma))
        return nn.sigmoid(y * w) * x


class CrissCrossAttention(nn.Module):
    """Criss-cross (row+column) attention (reference block.py:2782)."""

    c1: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        cq = max(1, self.c1 // 8)
        q = nn.Conv(cq, (1, 1), dtype=self.dtype, name="query_conv")(x)
        k = nn.Conv(cq, (1, 1), dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(self.c1, (1, 1), dtype=self.dtype, name="value_conv")(x)
        # column (H) attention: for each (b, w) treat H as sequence
        energy_h = jnp.einsum("bhwc,bkwc->bwhk", q, k)  # (B, W, H, H)
        # -inf on the diagonal so the H path excludes self (reference INF trick)
        eye = jnp.eye(h, dtype=bool)[None, None]
        energy_h = jnp.where(eye, -jnp.inf, energy_h)
        energy_h = jnp.swapaxes(energy_h, 1, 2)  # (B, H, W, H)
        # row (W) attention
        energy_w = jnp.einsum("bhwc,bhkc->bhwk", q, k)  # (B, H, W, W)
        concate = nn.softmax(jnp.concatenate([energy_h, energy_w], axis=3), axis=3)
        att_h = jnp.swapaxes(concate[..., :h], 1, 2)  # (B, W, H, H)
        att_w = concate[..., h:h + w]  # (B, H, W, W)
        out_h = jnp.einsum("bkwc,bwhk->bhwc", v, att_h)
        out_w = jnp.einsum("bhkc,bhwk->bhwc", v, att_w)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma * (out_h + out_w) + x


class GAMAttention(nn.Module):
    """Global attention mechanism (reference block.py:2878)."""

    c1: int
    c2: int
    group: bool = True
    rate: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c1, c2, rate = self.c1, self.c2, self.rate
        # channel attention: MLP over the channel vector at each position
        a = nn.Dense(max(1, c1 // rate), dtype=self.dtype, name="ca_fc1")(x)
        a = nn.relu(a)
        a = nn.Dense(c1, dtype=self.dtype, name="ca_fc2")(a)
        x = x * a
        # spatial attention: 7x7 conv pair (grouped if group=True)
        g = rate if self.group else 1
        s = CBA(c1 // rate, 7, g=g, act="relu", dtype=self.dtype, name="sa1")(x, training)
        s = CBA(c2, 7, g=g, act="none", dtype=self.dtype, name="sa2")(s, training)
        s = nn.sigmoid(s)
        s = channel_shuffle(s, 4)
        return x * s


class SKAttention(nn.Module):
    """Selective-kernel attention (reference block.py:2929)."""

    channel: int
    kernels: Tuple[int, ...] = (1, 3, 5, 7)
    reduction: int = 16
    group: int = 1
    L: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        d = max(self.L, self.channel // self.reduction)
        feats = [
            CBA(self.channel, k, g=self.group, act="relu", dtype=self.dtype, name=f"conv_{i}")(x, training)
            for i, k in enumerate(self.kernels)
        ]
        u = sum(feats)
        s = jnp.mean(u, axis=(1, 2))  # (B, C)
        z = nn.Dense(d, dtype=self.dtype, name="fc")(s)
        weights = jnp.stack(
            [nn.Dense(self.channel, dtype=self.dtype, name=f"fc_{i}")(z) for i in range(len(self.kernels))],
            axis=0,
        )  # (k, B, C)
        attn = nn.softmax(weights, axis=0)[:, :, None, None, :]
        return jnp.sum(attn * jnp.stack(feats, axis=0), axis=0)


class ShuffleAttention(nn.Module):
    """SA-Net shuffle attention (reference block.py:2997)."""

    channel: int
    G: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        cg = c // (2 * self.G)
        x = x.reshape(b * self.G, h, w, c // self.G)
        x0, x1 = x[..., :cg], x[..., cg:]
        cweight = self.param("cweight", nn.initializers.zeros, (1, 1, 1, cg), jnp.float32)
        cbias = self.param("cbias", nn.initializers.ones, (1, 1, 1, cg), jnp.float32)
        sweight = self.param("sweight", nn.initializers.zeros, (1, 1, 1, cg), jnp.float32)
        sbias = self.param("sbias", nn.initializers.ones, (1, 1, 1, cg), jnp.float32)
        xc = _gap(x0)
        xc = x0 * nn.sigmoid(cweight * xc + cbias)
        xs = nn.GroupNorm(num_groups=cg, dtype=self.dtype, name="gn")(x1)
        xs = x1 * nn.sigmoid(sweight * xs + sbias)
        out = jnp.concatenate([xc, xs], axis=-1).reshape(b, h, w, c)
        return channel_shuffle(out, 2)


class DoubleAttention(nn.Module):
    """A2-Net double attention (reference block.py:3067)."""

    c1: int
    reconstruct: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        cm = cn = int(self.c1 * 0.25)
        A = nn.Conv(cm, (1, 1), dtype=self.dtype, name="convA")(x).reshape(b, h * w, cm)
        B = nn.Conv(cn, (1, 1), dtype=self.dtype, name="convB")(x).reshape(b, h * w, cn)
        V = nn.Conv(cn, (1, 1), dtype=self.dtype, name="convV")(x).reshape(b, h * w, cn)
        attn_maps = nn.softmax(B, axis=-1)  # softmax over c_n (torch dim=1 on (b,c_n,hw) = channel)
        attn_vecs = nn.softmax(V, axis=-1)
        # feature gating: (b, c_m, hw) @ (b, hw, c_n) -> descriptors (b, c_m, c_n)
        gd = jnp.einsum("bpc,bpn->bcn", A, attn_maps)
        z = jnp.einsum("bcn,bpn->bpc", gd, attn_vecs).reshape(b, h, w, cm)
        if self.reconstruct:
            z = nn.Conv(self.c1, (1, 1), dtype=self.dtype, name="conv_reconstruct")(z)
        return z


class CoTAttention(nn.Module):
    """Contextual transformer attention (reference block.py:3311)."""

    dim: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        k1 = CBA(self.dim, self.kernel_size, g=4, act="relu", dtype=self.dtype, name="key_embed")(x, training)
        v = CBA(self.dim, 1, act="none", bias=False, dtype=self.dtype, name="value_embed")(x, training)
        y = jnp.concatenate([k1, x], axis=-1)
        factor = 4
        att = CBA(2 * self.dim // factor, 1, act="relu", dtype=self.dtype, name="attn1")(y, training)
        att = nn.Conv(self.kernel_size * self.kernel_size * self.dim, (1, 1), dtype=self.dtype, name="attn2")(att)
        att = att.reshape(b, h, w, self.kernel_size * self.kernel_size, self.dim).mean(axis=3)
        att = att.reshape(b, h * w, self.dim)
        k2 = nn.softmax(att, axis=1) * v.reshape(b, h * w, self.dim)  # torch softmax dim=-1 on (b,c,hw) = spatial
        return k1 + k2.reshape(b, h, w, self.dim)


class GlobalContext(nn.Module):
    """GCNet global-context block (reference block.py:3387)."""

    channels: int
    rd_ratio: float = 1.0 / 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        attn = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_attn")(x).reshape(b, h * w, 1)
        attn = nn.softmax(attn, axis=1)
        context = jnp.einsum("bpc,bpk->bkc", x.reshape(b, h * w, c), attn)[:, None]  # (B,1,1,C)
        rd = max(1, int(self.channels * self.rd_ratio))
        y = nn.Conv(rd, (1, 1), dtype=self.dtype, name="mlp_fc1")(context)
        y = nn.LayerNorm(dtype=self.dtype, name="mlp_norm")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="mlp_fc2")(y)
        return x * nn.sigmoid(y)


class GatherExcite(nn.Module):
    """Gather-excite with global extent, parameter-free gather
    (reference block.py:3469, extra_params=False, extent=0 path)."""

    channels: int
    extent: int = 0
    add_maxpool: bool = False
    rd_ratio: float = 1.0 / 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        h, w = x.shape[1], x.shape[2]
        if self.extent == 0:
            ge = _gap(x)
            if self.add_maxpool:
                ge = 0.5 * ge + 0.5 * _gmp(x)
        else:
            gk, gs = self.extent * 2 - 1, self.extent
            ge = avg_pool(x, gk, gs, gk // 2)
        rd = max(1, int(self.channels * self.rd_ratio))
        y = nn.Conv(rd, (1, 1), dtype=self.dtype, name="mlp_fc1")(ge)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="mlp_fc2")(y)
        if y.shape[1] != 1 or y.shape[2] != 1:
            y = resize_nearest(y, h, w)
        return x * nn.sigmoid(y)


class MHSA(nn.Module):
    """BoTNet multi-head self-attention with 2D relative position embedding
    (reference block.py:3576)."""

    n_dims: int
    width: int = 14
    height: int = 14
    heads: int = 4
    pos_emb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        hd = c // self.heads
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="query")(x).reshape(b, h * w, self.heads, hd)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="key")(x).reshape(b, h * w, self.heads, hd)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(x).reshape(b, h * w, self.heads, hd)
        energy = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if self.pos_emb:
            rel_h = self.param("rel_h", nn.initializers.normal(1.0), (1, self.heads, hd, 1, self.height), jnp.float32)
            rel_w = self.param("rel_w", nn.initializers.normal(1.0), (1, self.heads, hd, self.width, 1), jnp.float32)
            pos = (rel_h + rel_w).reshape(1, self.heads, hd, -1)[..., : h * w]
            energy = energy + jnp.einsum("nhdk,bqhd->bhqk", pos.astype(x.dtype), q)
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        return out


class ParNetAttention(nn.Module):
    """ParNet parallel attention (reference block.py:3634)."""

    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        sse = nn.sigmoid(nn.Conv(self.channel, (1, 1), dtype=self.dtype, name="sse_fc")(_gap(x)))
        x1 = CBA(self.channel, 1, act="none", bias=True, dtype=self.dtype, name="conv1x1")(x, training)
        x2 = CBA(self.channel, 3, act="none", bias=True, dtype=self.dtype, name="conv3x3")(x, training)
        return nn.silu(x1 + x2 + x * sse)


class _PolarizedChannel(nn.Module):
    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        wv = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="ch_wv")(x).reshape(b, h * w, c // 2)
        wq = nn.Conv(1, (1, 1), dtype=self.dtype, name="ch_wq")(x).reshape(b, h * w, 1)
        wq = nn.softmax(wq, axis=1)
        wz = jnp.einsum("bpc,bpk->bc", wv, wq)[:, None, None, :]  # (B,1,1,C/2)
        weight = nn.Conv(c, (1, 1), dtype=self.dtype, name="ch_wz")(wz)
        weight = nn.sigmoid(nn.LayerNorm(dtype=self.dtype, name="ln")(weight))
        return x * weight


class _PolarizedSpatial(nn.Module):
    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        wv = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="sp_wv")(x).reshape(b, h * w, c // 2)
        wq = _gap(nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="sp_wq")(x)).reshape(b, 1, c // 2)
        wq = nn.softmax(wq, axis=-1)
        wz = jnp.einsum("bkc,bpc->bpk", wq, wv).reshape(b, h, w, 1)
        return x * nn.sigmoid(wz)


class ParallelPolarizedSelfAttention(nn.Module):
    """Polarized self-attention, parallel composition (reference block.py:3666)."""

    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ch = _PolarizedChannel(self.channel, dtype=self.dtype, name="channel")(x, training)
        sp = _PolarizedSpatial(self.channel, dtype=self.dtype, name="spatial")(x, training)
        return ch + sp


class SequentialPolarizedSelfAttention(nn.Module):
    """Polarized self-attention, sequential composition (reference block.py:3765)."""

    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ch = _PolarizedChannel(self.channel, dtype=self.dtype, name="channel")(x, training)
        return _PolarizedSpatial(self.channel, dtype=self.dtype, name="spatial")(ch, training)


class SpatialGroupEnhance(nn.Module):
    """SGE: per-group spatial saliency (reference block.py:3718)."""

    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        g = self.groups
        xg = x.reshape(b, h, w, g, c // g)
        xn = jnp.sum(xg * jnp.mean(xg, axis=(1, 2), keepdims=True), axis=-1)  # (B,H,W,g)
        t = xn.reshape(b, h * w, g)
        t = t - jnp.mean(t, axis=1, keepdims=True)
        std = jnp.std(t, axis=1, keepdims=True) + 1e-5
        t = (t / std).reshape(b, h, w, g)
        weight = self.param("weight", nn.initializers.zeros, (1, 1, 1, g), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, g), jnp.float32)
        t = t * weight + bias
        out = xg * nn.sigmoid(t)[..., None]
        return out.reshape(b, h, w, c)


class _ZPoolGate(nn.Module):
    """TripletAttention gate: ZPool (max+mean over channel) -> 7x7 conv -> sigmoid."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        z = jnp.concatenate([jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)], axis=-1)
        s = CBA(1, 7, act="none", dtype=self.dtype, name="conv")(z, training)
        return x * nn.sigmoid(s)


class TripletAttention(nn.Module):
    """Rotate-to-interact triplet attention (reference block.py:3881)."""

    no_spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        # branch 1: interact channel with W (torch permute(0,2,1,3) on NCHW
        # swaps C and H; in NHWC that is swapping H into the channel slot)
        p1 = jnp.swapaxes(x, 1, 3)  # (B, C, W, H): "channel"=H
        o1 = jnp.swapaxes(_ZPoolGate(dtype=self.dtype, name="cw")(p1, training), 1, 3)
        p2 = jnp.swapaxes(x, 2, 3)  # (B, H, C, W): "channel"=W
        o2 = jnp.swapaxes(_ZPoolGate(dtype=self.dtype, name="hc")(p2, training), 2, 3)
        if not self.no_spatial:
            o3 = _ZPoolGate(dtype=self.dtype, name="hw")(x, training)
            return (o1 + o2 + o3) / 3.0
        return (o1 + o2) / 2.0


# ---------------------------------------------------------------------------
# RFB
# ---------------------------------------------------------------------------


class BasicRFB(nn.Module):
    """Receptive-field block with three dilated branches (reference block.py:3175)."""

    c1: int
    c2: int
    stride: int = 1
    scale: float = 0.1
    map_reduce: int = 8
    vision: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inter = self.c1 // self.map_reduce
        g, v, s = self.groups, self.vision, self.stride
        dt = self.dtype

        b0 = CBA(inter, 1, g=g, act="none", dtype=dt, name="b0_0")(x, training)
        b0 = CBA(2 * inter, 3, s=s, g=g, act="relu", dtype=dt, name="b0_1")(b0, training)
        b0 = CBA(2 * inter, 3, p=v + 1, d=v + 1, g=g, act="none", dtype=dt, name="b0_2")(b0, training)

        b1 = CBA(inter, 1, g=g, act="none", dtype=dt, name="b1_0")(x, training)
        b1 = CBA(2 * inter, 3, s=s, g=g, act="relu", dtype=dt, name="b1_1")(b1, training)
        b1 = CBA(2 * inter, 3, p=v + 2, d=v + 2, g=g, act="none", dtype=dt, name="b1_2")(b1, training)

        b2 = CBA(inter, 1, g=g, act="none", dtype=dt, name="b2_0")(x, training)
        b2 = CBA((inter // 2) * 3, 3, g=g, act="relu", dtype=dt, name="b2_1")(b2, training)
        b2 = CBA(2 * inter, 3, s=s, g=g, act="relu", dtype=dt, name="b2_2")(b2, training)
        b2 = CBA(2 * inter, 3, p=v + 4, d=v + 4, g=g, act="none", dtype=dt, name="b2_3")(b2, training)

        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = CBA(self.c2, 1, act="none", dtype=dt, name="conv_linear")(out, training)
        short = CBA(self.c2, 1, s=s, act="none", dtype=dt, name="shortcut")(x, training)
        return nn.relu(out * self.scale + short)


# ---------------------------------------------------------------------------
# GhostNet / MobileNeXt / PP-LCNet / ShuffleNetV2 / EfficientNet-Lite /
# MobileNetV3 backbones
# ---------------------------------------------------------------------------


class G_bneck(nn.Module):
    """Ghost bottleneck (reference block.py:843)."""

    c1: int
    c2: int
    midc: int
    k: int = 5
    s: int = 1
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.midc
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="ghost1")(x, training)
        if self.s == 2:
            y = ConvBN(c_, 3, 2, g=c_, act="none", dtype=self.dtype, name="dw")(y, training)
        if self.use_se:
            y = SeBlock(c_, dtype=self.dtype, name="se")(y, training)
        # squeeze GhostConv runs linear (act=False in the reference)
        g1 = ConvBN(self.c2 // 2, 1, 1, act="none", dtype=self.dtype, name="ghost2_cv1")(y, training)
        g2 = ConvBN(self.c2 // 2, 5, 1, g=self.c2 // 2, act="none", dtype=self.dtype, name="ghost2_cv2")(g1, training)
        y = jnp.concatenate([g1, g2], axis=-1)
        if self.c1 == self.c2 and self.s == 1:
            return y + x
        s1 = ConvBN(self.c1, 3, self.s, g=self.c1, act="none", dtype=self.dtype, name="short_dw")(x, training)
        s1 = ConvBN(self.c2, 1, 1, act="none", dtype=self.dtype, name="short_pw")(s1, training)
        return y + s1


class SGBlock(nn.Module):
    """MobileNeXt sandglass block (reference block.py:1492). Implements the
    four branch layouts keyed on (expand_ratio, c1 vs c2, stride)."""

    c1: int
    c2: int
    stride: int = 1
    expand_ratio: int = 6
    keep_3x3: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inp, oup = self.c1, self.c2
        hidden = inp // self.expand_ratio
        if hidden < oup / 6.0:
            hidden = math.ceil(oup / 6.0)
            hidden = max(16, int(hidden + 8) // 16 * 16)
        dt = self.dtype
        identity = False
        y = x
        if self.expand_ratio == 2:
            y = ConvBN(inp, 3, 1, g=inp, act="relu6", dtype=dt, name="dw1")(y, training)
            y = ConvBN(hidden, 1, 1, act="none", dtype=dt, name="pw1")(y, training)
            y = ConvBN(oup, 1, 1, act="relu6", dtype=dt, name="pw2")(y, training)
            y = ConvBN(oup, 3, self.stride, g=oup, act="none", dtype=dt, name="dw2")(y, training)
        elif inp != oup and self.stride == 1 and not self.keep_3x3:
            y = ConvBN(hidden, 1, 1, act="none", dtype=dt, name="pw1")(y, training)
            y = ConvBN(oup, 1, 1, act="relu6", dtype=dt, name="pw2")(y, training)
        elif inp != oup and self.stride == 2 and not self.keep_3x3:
            y = ConvBN(hidden, 1, 1, act="none", dtype=dt, name="pw1")(y, training)
            y = ConvBN(oup, 1, 1, act="relu6", dtype=dt, name="pw2")(y, training)
            y = ConvBN(oup, 3, self.stride, g=oup, act="none", dtype=dt, name="dw2")(y, training)
        else:
            identity = not self.keep_3x3
            y = ConvBN(inp, 3, 1, g=inp, act="relu6", dtype=dt, name="dw1")(y, training)
            y = ConvBN(hidden, 1, 1, act="none", dtype=dt, name="pw1")(y, training)
            y = ConvBN(oup, 1, 1, act="relu6", dtype=dt, name="pw2")(y, training)
            y = ConvBN(oup, 3, 1, g=oup, act="none", dtype=dt, name="dw2")(y, training)
        return x + y if identity else y


class DepthSepConv(nn.Module):
    """PP-LCNet depthwise-separable conv (reference block.py:2022)."""

    c1: int
    c2: int
    dw_size: int = 3
    stride: int = 1
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = ConvBN(self.c1, self.dw_size, self.stride, g=self.c1, act="none", dtype=self.dtype, name="dw")(x, training)
        y = _act(y, "hswish")
        if self.use_se:
            y = SeBlock(self.c1, reduction=16, dtype=self.dtype, name="se")(y, training)
        y = ConvBN(self.c2, 1, 1, act="none", dtype=self.dtype, name="pw")(y, training)
        return _act(y, "hswish")


class CBRM(nn.Module):
    """ShuffleNetV2 stem: conv-BN-ReLU + maxpool (reference block.py:2058)."""

    c1: int
    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = CBA(self.c2, 3, 2, act="relu", dtype=self.dtype, name="conv")(x, training)
        return max_pool(y, 3, 2, 1)


class Shuffle_Block(nn.Module):
    """ShuffleNetV2 unit (reference block.py:2072)."""

    c1: int
    c2: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        bf = self.c2 // 2
        dt = self.dtype

        def branch2(t, cin):
            t = CBA(bf, 1, act="relu", dtype=dt, name="b2_pw1")(t, training)
            t = CBA(bf, 3, self.stride, g=bf, act="none", dtype=dt, name="b2_dw")(t, training)
            return CBA(bf, 1, act="relu", dtype=dt, name="b2_pw2")(t, training)

        if self.stride == 1:
            x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
            out = jnp.concatenate([x1, branch2(x2, bf)], axis=-1)
        else:
            b1 = CBA(self.c1, 3, self.stride, g=self.c1, act="none", dtype=dt, name="b1_dw")(x, training)
            b1 = CBA(bf, 1, act="relu", dtype=dt, name="b1_pw")(b1, training)
            out = jnp.concatenate([b1, branch2(x, self.c1)], axis=-1)
        return channel_shuffle(out, 2)


class stem(nn.Module):
    """EfficientNet-Lite stem (reference block.py:2157)."""

    c1: int
    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        return CBA(self.c2, 3, 2, act="relu6", dtype=self.dtype, name="conv")(x, training)


class MBConvBlock(nn.Module):
    """EfficientNet-Lite MBConv (reference block.py:2169). drop_connect is a
    no-op at inference; in training it zeroes whole samples."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    expand_ratio: int = 1
    drop_connect_rate: float = 0.0
    has_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        dt = self.dtype
        identity = x
        oup = self.c1 * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = CBA(oup, 1, act="relu6", dtype=dt, name="expand")(y, training)
        y = CBA(oup, self.k, self.s, g=oup, act="relu6", dtype=dt, name="dw")(y, training)
        if self.has_se:
            y = SeBlock(oup, 4, dtype=dt, name="se")(y, training)
        y = CBA(self.c2, 1, act="none", dtype=dt, name="project")(y, training)
        if self.s == 1 and self.c1 == self.c2:
            if training and self.drop_connect_rate:
                keep = 1.0 - self.drop_connect_rate
                rng = self.make_rng("dropout")
                mask = jnp.floor(keep + jax.random.uniform(rng, (y.shape[0], 1, 1, 1)))
                y = y / keep * mask
            y = y + identity
        return y


class Conv_BN_HSwish(nn.Module):
    """MobileNetV3 stem conv (reference block.py:2252)."""

    c1: int
    c2: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        return CBA(self.c2, 3, self.stride, act="hswish", dtype=self.dtype, name="conv")(x, training)


class MobileNetV3_InvertedResidual(nn.Module):
    """MobileNetV3 inverted residual (reference block.py:2273)."""

    c1: int
    c2: int
    hidden_dim: int = 16
    kernel_size: int = 3
    stride: int = 1
    use_se: bool = False
    use_hs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        dt = self.dtype
        act = "hswish" if self.use_hs else "relu"
        hd = self.hidden_dim
        if self.c1 == hd:
            y = CBA(hd, self.kernel_size, self.stride, g=hd, act=act, dtype=dt, name="dw")(x, training)
            if self.use_se:
                y = SeBlock(hd, dtype=dt, name="se")(y, training)
            y = CBA(self.c2, 1, act="none", dtype=dt, name="pw")(y, training)
        else:
            y = CBA(hd, 1, act=act, dtype=dt, name="pw1")(x, training)
            y = CBA(hd, self.kernel_size, self.stride, g=hd, act="none", dtype=dt, name="dw")(y, training)
            if self.use_se:
                y = SeBlock(hd, dtype=dt, name="se")(y, training)
            y = _act(y, act)
            y = CBA(self.c2, 1, act="none", dtype=dt, name="pw2")(y, training)
        if self.stride == 1 and self.c1 == self.c2:
            return x + y
        return y


class mn_conv(nn.Module):
    """LeYOLO conv-BN-act (reference block.py:1746). k==s means valid padding."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    act: str = "RE"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        kind = {"RE": "relu6", "GE": "gelu", "SI": "silu", "EL": "elu"}.get(self.act, "hswish")
        p = 0 if self.k == self.s else autopad(self.k)
        return CBA(self.c2, self.k, self.s, p=p, act=kind, dtype=self.dtype, name="c")(x, training)


class InvertedBottleneck(nn.Module):
    """LeYOLO inverted bottleneck (reference block.py:1760)."""

    c1: int
    c2: int
    k: int = 3
    e: Optional[int] = None
    sa: str = "None"
    act: str = "RE"
    stride: int = 1
    pw: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_mid = self.e if self.e is not None else self.c1
        y = x
        if self.pw:
            y = mn_conv(self.c1, c_mid, act=self.act, dtype=self.dtype, name="pw")(y, training)
        y = CBA(
            c_mid, self.k, self.stride, g=c_mid,
            act={"RE": "relu6", "GE": "gelu", "SI": "silu", "EL": "elu"}.get(self.act, "hswish"),
            dtype=self.dtype, name="dw",
        )(y, training)
        y = CBA(self.c2, 1, act="none", bias=True, bn=False, dtype=self.dtype, name="proj")(y, training)
        y = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        if self.c1 == self.c2 and self.stride == 1:
            return x + y
        return y


class MobileNetV3_BLOCK(InvertedBottleneck):
    """Alias with identical semantics (reference block.py:1788)."""


# ---------------------------------------------------------------------------
# Swin Transformer (reference block.py:967-1330)
# ---------------------------------------------------------------------------


def _window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C). NHWC makes this a pure reshape."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c)


def _window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _swin_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask (nW, ws*ws, ws*ws), 0 / -100 (reference create_mask)."""
    img = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img.reshape(1, hp // ws, ws, wp // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference block.py:967)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        b_, n, c = x.shape
        ws, nh = self.window_size, self.num_heads
        hd = c // nh
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
            jnp.float32,
        )
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (hd ** -0.5)) @ jnp.swapaxes(k, -2, -1)
        bias = table[idx].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, nh, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).swapaxes(1, 2).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinTransformerBlock(nn.Module):
    """Swin block: (S)W-MSA + MLP (reference block.py:1064)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        shift = self.shift_size
        mask = None
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_swin_attn_mask(hp, wp, ws, shift))
        xw = _window_partition(x, ws).reshape(-1, ws * ws, c)
        xw = WindowAttention(self.dim, ws, self.num_heads, dtype=self.dtype, name="attn")(xw, mask, training)
        x = _window_reverse(xw.reshape(-1, ws, ws, c), ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = shortcut + x
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class SwinStage(nn.Module):
    """Stacked Swin blocks, alternating W-MSA / SW-MSA (reference block.py:1156)."""

    dim: int
    c2: int
    depth: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.dim == self.c2, "in/out channels must match"
        for i in range(self.depth):
            x = SwinTransformerBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x, training)
        return x


class PatchEmbed(nn.Module):
    """Swin patch embedding (reference block.py:1244)."""

    c1: int
    c2: int
    patch_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        p = self.patch_size
        h, w = x.shape[1], x.shape[2]
        if h % p or w % p:
            x = jnp.pad(x, ((0, 0), (0, (p - h % p) % p), (0, (p - w % p) % p), (0, 0)))
        x = nn.Conv(self.c2, (p, p), strides=(p, p), dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class PatchMerging(nn.Module):
    """Swin 2x2 patch merging (reference block.py:1285)."""

    dim: int
    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.c2 == 2 * self.dim
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


# ---------------------------------------------------------------------------
# VanillaNet / ConvNeXt / StarNet / FasterNet
# ---------------------------------------------------------------------------


class VanillaBlock(nn.Module):
    """VanillaNet block (reference block.py:1378): 1x1 conv pair + pool +
    series-informed activation (ReLU -> grouped conv + BN). The deep-training
    leaky_relu(x, 1) is the identity, matching the reference's act_learn=1."""

    dim: int
    dim_out: int
    act_num: int = 3
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = CBA(self.dim, 1, act="none", bias=True, dtype=self.dtype, name="conv1")(x, training)
        x = CBA(self.dim_out, 1, act="none", bias=True, dtype=self.dtype, name="conv2")(x, training)
        if self.stride != 1:
            x = max_pool(x, self.stride, self.stride)
        # series-informed activation
        x = nn.relu(x)
        k = self.act_num * 2 + 1
        x = CBA(self.dim_out, k, p=self.act_num, g=self.dim_out, act="none", bias=False,
                dtype=self.dtype, name="act")(x, training)
        return x


class ConvNeXt_Stem(nn.Module):
    """ConvNeXt stem conv + LN (reference block.py:1612)."""

    c1: int
    c2: int
    k: int = 4
    s: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s), padding="VALID",
                    dtype=self.dtype, name="conv")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)


class ConvNeXt_Downsample(nn.Module):
    """ConvNeXt downsample: LN then strided conv (reference block.py:1622)."""

    c1: int
    c2: int
    k: int = 2
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        return nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class ConvNeXt_Block(nn.Module):
    """n ConvNeXt inside-blocks (reference block.py:1632-1673): 7x7 dw conv,
    LN, 4x MLP with GELU, layer-scale gamma, residual."""

    c1: int
    c2: int
    n: int = 1
    layer_scale_init_value: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        dim = self.c2
        for i in range(self.n):
            inp = x
            y = CBA(dim, 7, g=dim, act="none", bias=True, bn=False, dtype=self.dtype, name=f"m_{i}_dwconv")(x, training)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"m_{i}_norm")(y)
            y = nn.Dense(4 * dim, dtype=self.dtype, name=f"m_{i}_pwconv1")(y)
            y = nn.gelu(y)
            y = nn.Dense(dim, dtype=self.dtype, name=f"m_{i}_pwconv2")(y)
            if self.layer_scale_init_value > 0:
                gamma = self.param(f"m_{i}_gamma", nn.initializers.constant(self.layer_scale_init_value),
                                   (dim,), jnp.float32)
                y = y * gamma
            x = inp + y
        return x


class StarBlock(nn.Module):
    """StarNet block (reference block.py:1866): dw7x7 -> f1*act(f2) star op ->
    1x1 -> dw7x7, residual once around n repeats."""

    dim: int
    mlp_ratio: int = 3
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inp = x
        d, r = self.dim, self.mlp_ratio
        for i in range(self.n):
            x = CBA(d, 7, g=d, act="none", bias=True, dtype=self.dtype, name=f"dwconv_{i}")(x, training)
            x1 = CBA(d * r, 1, act="none", bias=True, bn=False, dtype=self.dtype, name=f"f1_{i}")(x, training)
            x2 = CBA(d * r, 1, act="none", bias=True, bn=False, dtype=self.dtype, name=f"f2_{i}")(x, training)
            x = _act(x1, "relu6") * x2
            x = CBA(d, 1, act="none", bias=True, dtype=self.dtype, name=f"g_{i}")(x, training)
            x = CBA(d, 7, g=d, act="none", bias=True, bn=False, dtype=self.dtype, name=f"dwconv2_{i}")(x, training)
        return inp + x


class BasicStage(nn.Module):
    """FasterNet stage: n partial-conv MLP blocks (reference block.py:2406).
    Partial_conv3 split_cat: 3x3 on the first dim//4 channels only."""

    dim: int
    depth: int = 1
    n_div: int = 4
    mlp_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        d = self.dim
        dc = d // self.n_div
        for i in range(self.depth):
            shortcut = x
            x1 = nn.Conv(dc, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                         kernel_init=kaiming_uniform(), dtype=self.dtype, name=f"b{i}_pconv")(x[..., :dc])
            x = jnp.concatenate([x1, x[..., dc:]], axis=-1)
            y = CBA(d * self.mlp_ratio, 1, act="relu", dtype=self.dtype, name=f"b{i}_mlp1")(x, training)
            y = nn.Conv(d, (1, 1), use_bias=False, kernel_init=kaiming_uniform(),
                        dtype=self.dtype, name=f"b{i}_mlp2")(y)
            x = shortcut + y
        return x


class PatchEmbed_FasterNet(nn.Module):
    """FasterNet patch embed (reference block.py:2441)."""

    c1: int
    c2: int
    patch_size: int = 4
    patch_stride: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.c2, (self.patch_size, self.patch_size),
                    strides=(self.patch_stride, self.patch_stride), padding="VALID",
                    use_bias=False, kernel_init=kaiming_uniform(), dtype=self.dtype, name="proj")(x)
        return nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                            epsilon=BN_EPS, dtype=self.dtype, name="norm")(x)


class PatchMerging_FasterNet(nn.Module):
    """FasterNet patch merging (reference block.py:2460)."""

    c1: int
    c2: int
    k: int = 2
    patch_stride2: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.patch_stride2, self.patch_stride2),
                    padding="VALID", use_bias=False, kernel_init=kaiming_uniform(),
                    dtype=self.dtype, name="reduction")(x)
        return nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                            epsilon=BN_EPS, dtype=self.dtype, name="norm")(x)


# ---------------------------------------------------------------------------
# SlimNeck (GSConv family, reference block.py:4929-5040)
# ---------------------------------------------------------------------------


class GSConv(nn.Module):
    """GSConv: half standard conv, half cheap dw conv, interleave-shuffled
    (reference block.py:4929). Blocks in this pasted section use Mish convs."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        a = "mish" if self.act else "none"
        x1 = ConvBN(c_, self.k, self.s, g=self.g, act=a, dtype=self.dtype, name="cv1")(x, training)
        x2 = ConvBN(c_, 5, 1, g=c_, act=a, dtype=self.dtype, name="cv2")(x1, training)
        y = jnp.concatenate([x1, x2], axis=-1)
        # interleave the two halves channel-wise (the reference's shuffle)
        b, h, w, c = y.shape
        return y.reshape(b, h, w, 2, c // 2).swapaxes(-1, -2).reshape(b, h, w, c)


class GSConvns(nn.Module):
    """GSConv with normative shuffle: learned 1x1 mix + ReLU (block.py:4954)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = self.c2 // 2
        x1 = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        x2 = ConvBN(c_, 5, 1, g=c_, act="mish", dtype=self.dtype, name="cv2")(x1, training)
        y = jnp.concatenate([x1, x2], axis=-1)
        return nn.relu(nn.Conv(self.c2, (1, 1), use_bias=False, kernel_init=kaiming_uniform(),
                               dtype=self.dtype, name="shuf")(y))


class GSBottleneck(nn.Module):
    """GS bottleneck (reference block.py:4968)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        y = GSConv(self.c1, c_, 1, 1, dtype=self.dtype, name="gs1")(x, training)
        y = GSConv(c_, self.c2, 3, 1, act=False, dtype=self.dtype, name="gs2")(y, training)
        s = ConvBN(self.c2, 1, 1, act="none", dtype=self.dtype, name="shortcut")(x, training)
        return y + s


class GSBottleneckC(nn.Module):
    """Cheap GS bottleneck: depthwise shortcut (reference block.py:4989)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * 0.5)
        y = GSConv(self.c1, c_, 1, 1, dtype=self.dtype, name="gs1")(x, training)
        y = GSConv(c_, self.c2, 3, 1, act=False, dtype=self.dtype, name="gs2")(y, training)
        g = math.gcd(self.c1, self.c2)
        s = ConvBN(self.c2, self.k, self.s, g=g, act="none", dtype=self.dtype, name="shortcut")(x, training)
        return y + s


class VoVGSCSP(nn.Module):
    """VoV-GSCSP neck block (reference block.py:4996)."""

    c1: int
    c2: int
    n: int = 1
    e: float = 0.5
    cheap: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c_ = int(self.c2 * self.e)
        x1 = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv1")(x, training)
        if self.cheap:
            x1 = GSBottleneckC(c_, c_, 1, 1, dtype=self.dtype, name="gsb")(x1, training)
        else:
            for i in range(self.n):
                x1 = GSBottleneck(c_, c_, e=1.0, dtype=self.dtype, name=f"gsb_{i}")(x1, training)
        y = ConvBN(c_, 1, 1, act="mish", dtype=self.dtype, name="cv2")(x, training)
        return ConvBN(self.c2, 1, act="mish", dtype=self.dtype, name="cv3")(
            jnp.concatenate([y, x1], axis=-1), training
        )


class VoVGSCSPC(VoVGSCSP):
    """Cheap variant (reference block.py:5016)."""

    cheap: bool = True


# ---------------------------------------------------------------------------
# MSBlock (YOLO-MS, reference block.py:4799-4911)
# ---------------------------------------------------------------------------


class MSBlock(nn.Module):
    """Multi-scale block (reference block.py:4819)."""

    c1: int
    c2: int
    kernel_sizes: Sequence[int] = (1, 3, 3)
    in_expand_ratio: float = 3.0
    mid_expand_ratio: float = 2.0
    layers_num: int = 3
    in_down_ratio: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_ch = int(self.c1 * self.in_expand_ratio // self.in_down_ratio)
        mid_ch = in_ch // len(self.kernel_sizes)
        groups = int(mid_ch * self.mid_expand_ratio)
        dt = self.dtype
        out = ConvBN(in_ch, 1, act="silu", dtype=dt, name="in_conv")(x, training)
        channels = []
        for i, k in enumerate(self.kernel_sizes):
            ch = out[..., i * mid_ch:(i + 1) * mid_ch]
            if i >= 1:
                ch = ch + channels[i - 1]
            if k != 1:
                for j in range(int(self.layers_num)):
                    ch_in = ConvBN(groups, 1, act="silu", dtype=dt, name=f"mid_{i}_{j}_in")(ch, training)
                    ch_mid = ConvBN(groups, k, g=groups, act="silu", dtype=dt, name=f"mid_{i}_{j}_mid")(ch_in, training)
                    ch = ConvBN(mid_ch, 1, act="silu", dtype=dt, name=f"mid_{i}_{j}_out")(ch_mid, training)
            channels.append(ch)
        out = jnp.concatenate(channels, axis=-1)
        return ConvBN(self.c2, 1, act="silu", dtype=dt, name="out_conv")(out, training)


class C2f_MSBlock(nn.Module):
    """C2f with MSBlock inner modules (reference block.py:4875)."""

    c1: int
    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, act="silu", dtype=self.dtype, name="cv1")(x, training)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(MSBlock(c, c, dtype=self.dtype, name=f"m_{i}")(ys[-1], training))
        return ConvBN(self.c2, 1, act="silu", dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), training
        )


# ---------------------------------------------------------------------------
# ASFF / DySample upsampling (reference block.py:4532-4766)
# ---------------------------------------------------------------------------


class _UpsampleT(nn.Module):
    """ConvTranspose 2x/4x upsample used by ASFF (reference block.py:4634)."""

    c2: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        s = self.scale
        return nn.ConvTranspose(self.c2, (s, s), strides=(s, s), padding="VALID",
                                dtype=self.dtype, name="cv1")(x)


class ASFF2(nn.Module):
    """Adaptive spatial feature fusion over two levels (reference block.py:4651).
    c1 is the [low, high] channel pair; `level` picks the output resolution."""

    c1: Tuple[int, int]
    c2: int
    level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, training: bool = False):
        x_l, x_h = xs
        inter = self.c1[self.level]
        dt = self.dtype
        if self.level == 0:
            r0 = x_l
            r1 = _UpsampleT(inter, 2, dtype=dt, name="up1")(x_h, training)
        else:
            r0 = ConvBN(inter, 2, 2, p=0, act="silu", dtype=dt, name="down0")(x_l, training)
            r1 = x_h
        w0 = ConvBN(8, 1, act="silu", dtype=dt, name="w0")(r0, training)
        w1 = ConvBN(8, 1, act="silu", dtype=dt, name="w1")(r1, training)
        w = nn.Conv(2, (1, 1), dtype=dt, name="weights_levels")(jnp.concatenate([w0, w1], axis=-1))
        w = nn.softmax(w, axis=-1)
        fused = r0 * w[..., 0:1] + r1 * w[..., 1:2]
        return ConvBN(inter, 3, 1, act="silu", dtype=dt, name="conv")(fused, training)


class ASFF3(nn.Module):
    """Adaptive spatial feature fusion over three levels (reference block.py:4693)."""

    c1: Tuple[int, int, int]
    c2: int
    level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, training: bool = False):
        x0, x1, x2 = xs
        inter = self.c1[self.level]
        dt = self.dtype
        if self.level == 0:
            r0 = x0
            r1 = _UpsampleT(inter, 2, dtype=dt, name="up1")(x1, training)
            r2 = _UpsampleT(inter, 4, dtype=dt, name="up2")(x2, training)
        elif self.level == 1:
            r0 = ConvBN(inter, 2, 2, p=0, act="silu", dtype=dt, name="down0")(x0, training)
            r1 = x1
            r2 = _UpsampleT(inter, 2, dtype=dt, name="up2")(x2, training)
        else:
            r0 = ConvBN(inter, 4, 4, p=0, act="silu", dtype=dt, name="down0")(x0, training)
            r1 = ConvBN(inter, 2, 2, p=0, act="silu", dtype=dt, name="down1")(x1, training)
            r2 = x2
        w0 = ConvBN(8, 1, act="silu", dtype=dt, name="w0")(r0, training)
        w1 = ConvBN(8, 1, act="silu", dtype=dt, name="w1")(r1, training)
        w2 = ConvBN(8, 1, act="silu", dtype=dt, name="w2")(r2, training)
        w = nn.Conv(3, (1, 1), dtype=dt, name="weights_levels")(jnp.concatenate([w0, w1, w2], axis=-1))
        w = nn.softmax(w, axis=-1)
        fused = r0 * w[..., 0:1] + r1 * w[..., 1:2] + r2 * w[..., 2:3]
        return ConvBN(inter, 3, 1, act="silu", dtype=dt, name="conv")(fused, training)


def _grid_sample_border(x, cx, cy):
    """Bilinear sample x (B,H,W,C) at normalized coords in [-1,1] with border
    clamping — the gather-based JAX stand-in for torch grid_sample."""
    b, h, w, c = x.shape
    fx = (cx + 1.0) * 0.5 * w - 0.5
    fy = (cy + 1.0) * 0.5 * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    def gather(yi, xi):
        return jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yi, xi)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


class DySample(nn.Module):
    """Dynamic upsampling by learned offsets ('lp' style, reference
    block.py:4532). grid_sample becomes a gather-based bilinear sampler."""

    c1: int
    scale: int = 2
    style: str = "lp"
    groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        s, g = self.scale, self.groups
        # offsets: 2 coords per group per subpixel
        off = nn.Conv(2 * g * s * s, (1, 1), kernel_init=nn.initializers.normal(0.001),
                      dtype=self.dtype, name="offset")(x)
        init = np.stack(np.meshgrid(
            (np.arange(s) - (s - 1) / 2) / s, (np.arange(s) - (s - 1) / 2) / s, indexing="xy"
        ), -1).transpose(1, 0, 2)  # (s, s, 2)
        init_pos = np.tile(init.reshape(-1, 2), (g, 1)).reshape(1, 1, 1, -1)
        off = off * 0.25 + jnp.asarray(init_pos, off.dtype)
        # (B, H, W, g*s*s*2) -> per-group sampling coordinates
        off = off.reshape(b, h, w, g, s * s, 2)
        base_x = (jnp.arange(w) + 0.5)[None, None, :, None, None]
        base_y = (jnp.arange(h) + 0.5)[None, :, None, None, None]
        cx = 2 * (base_x + off[..., 0]) / w - 1  # (B,H,W,g,s*s)
        cy = 2 * (base_y + off[..., 1]) / h - 1
        # pixel-shuffle the s*s subpixels into the upsampled grid
        cx = cx.reshape(b, h, w, g, s, s).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * s, w * s, g)
        cy = cy.reshape(b, h, w, g, s, s).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * s, w * s, g)
        xg = x.reshape(b, h, w, g, c // g)
        outs = []
        for gi in range(g):
            outs.append(_grid_sample_border(xg[:, :, :, gi], cx[..., gi], cy[..., gi]))
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# PPA / SCSA / FGFP (reference block.py:5042-5724)
# ---------------------------------------------------------------------------


class _SpatialAttnModule(nn.Module):
    """mean/max-over-channel 7x7 spatial gate (reference block.py:5042)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        z = jnp.concatenate([jnp.mean(x, -1, keepdims=True), jnp.max(x, -1, keepdims=True)], -1)
        z = nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)], dtype=self.dtype, name="conv2d")(z)
        return nn.sigmoid(z) * x


class LocalGlobalAttention(nn.Module):
    """HCF-Net local-global attention over PxP patches (reference block.py:5058)."""

    output_dim: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        p = self.patch_size
        d = self.output_dim
        hp, wp = h // p, w // p
        patches = x[:, :hp * p, :wp * p].reshape(b, hp, p, wp, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * wp, p * p, c)
        feats = patches.mean(-1)  # (B, N, P*P)
        feats = nn.Dense(d // 2, dtype=self.dtype, name="mlp1")(feats)
        feats = nn.LayerNorm(dtype=self.dtype, name="norm")(feats)
        feats = nn.Dense(d, dtype=self.dtype, name="mlp2")(feats)
        attn = nn.softmax(feats, axis=-1)
        local_out = feats * attn
        prompt = self.param("prompt", nn.initializers.normal(1.0), (d,), jnp.float32)
        tdt = self.param("top_down_transform", lambda k, s: jnp.eye(d), (d, d))
        cos_sim = jnp.einsum(
            "bnd,d->bn",
            local_out / (jnp.linalg.norm(local_out, axis=-1, keepdims=True) + 1e-6),
            prompt / (jnp.linalg.norm(prompt) + 1e-6),
        )[..., None]
        local_out = local_out * jnp.clip(cos_sim, 0, 1)
        local_out = local_out @ tdt
        local_out = local_out.reshape(b, hp, wp, d)
        local_out = resize_bilinear(local_out, h, w)
        return nn.Conv(d, (1, 1), dtype=self.dtype, name="conv")(local_out)


class PPA(nn.Module):
    """HCF-Net parallelized patch-aware attention (reference block.py:5185)."""

    c1: int
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        f, dt = self.filters, self.dtype
        skip = CBA(f, 1, p=0, act="none", bias=True, dtype=dt, name="skip")(x, training)
        lga2 = LocalGlobalAttention(f, 2, dtype=dt, name="lga2")(skip, training)
        lga4 = LocalGlobalAttention(f, 4, dtype=dt, name="lga4")(skip, training)
        x1 = CBA(f, 3, act="relu", bias=True, dtype=dt, name="c1")(x, training)
        x2 = CBA(f, 3, act="relu", bias=True, dtype=dt, name="c2")(x1, training)
        x3 = CBA(f, 3, act="relu", bias=True, dtype=dt, name="c3")(x2, training)
        y = x1 + x2 + x3 + skip + lga2 + lga4
        y = ECA(f, dtype=dt, name="cn")(y, training)
        y = _SpatialAttnModule(dtype=dt, name="sa")(y, training)
        y = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=dt, name="bn1")(y)
        return nn.relu(y)


class SCSA(nn.Module):
    """Spatial-channel synergistic attention (reference block.py:5366)."""

    dim: int
    head_num: int = 8
    window_size: int = 7
    group_kernel_sizes: Tuple[int, int, int, int] = (3, 5, 7, 9)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        gc = c // 4
        ks = self.group_kernel_sizes
        x_h = jnp.mean(x, axis=2)  # (B, H, C)
        x_w = jnp.mean(x, axis=1)  # (B, W, C)

        # the h- and w-path share the depthwise 1D convs (reference applies
        # the same nn.Conv1d modules to both), so params are created once
        dwc = {}
        for name, k in zip(("local_dwc", "global_dwc_s", "global_dwc_m", "global_dwc_l"), ks):
            dwc[name] = (
                self.param(name, kaiming_uniform(), (k, 1, gc), jnp.float32),
                self.param(name + "_bias", nn.initializers.zeros, (gc,), jnp.float32),
                k,
            )

        def dwc1d(v, name):
            wgt, bias, k = dwc[name]
            out = jax.lax.conv_general_dilated(
                v.astype(self.dtype), wgt.astype(self.dtype), (1,), [(k // 2, k // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=gc,
            )
            return out + bias.astype(out.dtype)

        def multi_dwc(v):
            parts = [
                dwc1d(v[..., :gc], "local_dwc"),
                dwc1d(v[..., gc:2 * gc], "global_dwc_s"),
                dwc1d(v[..., 2 * gc:3 * gc], "global_dwc_m"),
                dwc1d(v[..., 3 * gc:], "global_dwc_l"),
            ]
            return jnp.concatenate(parts, axis=-1)

        h_attn = nn.sigmoid(nn.GroupNorm(num_groups=4, dtype=self.dtype, name="norm_h")(multi_dwc(x_h)))
        w_attn = nn.sigmoid(nn.GroupNorm(num_groups=4, dtype=self.dtype, name="norm_w")(multi_dwc(x_w)))
        x = x * h_attn[:, :, None, :] * w_attn[:, None, :, :]

        ws = self.window_size
        y = avg_pool(x, ws, ws) if min(h, w) >= ws else _gap(x)
        y = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="norm")(y)
        hd = self.dim // self.head_num
        q = CBA(c, 1, g=c, act="none", bias=False, bn=False, dtype=self.dtype, name="q")(y, training)
        k = CBA(c, 1, g=c, act="none", bias=False, bn=False, dtype=self.dtype, name="k")(y, training)
        v = CBA(c, 1, g=c, act="none", bias=False, bn=False, dtype=self.dtype, name="v")(y, training)
        hh, ww = y.shape[1], y.shape[2]
        qh = q.reshape(b, hh * ww, self.head_num, hd).transpose(0, 2, 3, 1)  # (B, heads, hd, L)
        kh = k.reshape(b, hh * ww, self.head_num, hd).transpose(0, 2, 3, 1)
        vh = v.reshape(b, hh * ww, self.head_num, hd).transpose(0, 2, 3, 1)
        attn = nn.softmax((qh @ jnp.swapaxes(kh, -2, -1)) * (hd ** -0.5), axis=-1)
        out = attn @ vh  # (B, heads, hd, L)
        out = jnp.mean(out, axis=-1).reshape(b, 1, 1, c)
        return nn.sigmoid(out) * x


class _ChannelGate(nn.Module):
    """block.py:2592 ChannelAttention: avg+max pooled two-conv MLP, returns
    the sigmoid gate (callers multiply)."""

    c1: int
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        f1 = nn.Conv(max(1, self.c1 // self.ratio), (1, 1), use_bias=False,
                     kernel_init=kaiming_uniform(), dtype=self.dtype, name="f1")
        f2 = nn.Conv(self.c1, (1, 1), use_bias=False,
                     kernel_init=kaiming_uniform(), dtype=self.dtype, name="f2")
        avg = f2(nn.relu(f1(_gap(x))))
        mx = f2(nn.relu(f1(_gmp(x))))
        return nn.sigmoid(avg + mx)


class FGFP(nn.Module):
    """Fine-grained feature pyramid (reference block.py:5629)."""

    c1: int
    c2: Optional[int] = None
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c2 = self.c2 or self.c1 // 2
        dt = self.dtype
        identity = x
        h, w = x.shape[1], x.shape[2]
        y = nn.Conv(c2, (1, 1), dtype=dt, name="conv_compress")(x)
        up = resize_nearest(y, h * 2, w * 2)
        up = nn.Conv(c2 // 2, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt, name="conv_refine1")(up)
        up = _ChannelGate(c2 // 2, self.ratio, dtype=dt, name="channel_attention")(up) * up
        up = nn.Conv(c2, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt, name="conv_refine2")(up)
        up = max_pool(up, 2, 2)
        y = jnp.concatenate([identity, up], axis=-1)
        return nn.Conv(self.c1, (1, 1), dtype=dt, name="conv_final")(y)


class FGFP_Head(nn.Module):
    """FGFP detection-head enhancer (reference block.py:5694)."""

    c1: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        identity = x
        y = nn.Conv(self.c1 // 2, (1, 1), dtype=self.dtype, name="conv1")(x)
        gate = jnp.concatenate([jnp.mean(y, -1, keepdims=True), jnp.max(y, -1, keepdims=True)], -1)
        gate = nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)], use_bias=False,
                       kernel_init=kaiming_uniform(), dtype=self.dtype, name="sa_conv")(gate)
        y = nn.sigmoid(gate) * y
        y = nn.Conv(self.c1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv2")(y)
        return y + identity


# ---------------------------------------------------------------------------
# Axial image transformer (reference block.py:4091-4490). The reversible
# sequence (a torch autograd trick to avoid storing activations) maps to
# jax.checkpoint: same memory win, compiler-managed.
# ---------------------------------------------------------------------------


class _AxialSelfAttention(nn.Module):
    """Attention along one axis; input (B*, L, C) (reference block.py:4360)."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        e = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="to_kv")(x)
        k, v = kv[..., :self.dim], kv[..., self.dim:]
        b, t, d = q.shape

        def split(t_):
            return t_.reshape(b, -1, self.heads, e).swapaxes(1, 2)

        q, k, v = split(q), split(k), split(v)
        dots = nn.softmax((q @ jnp.swapaxes(k, -2, -1)) * (e ** -0.5), axis=-1)
        out = (dots @ v).swapaxes(1, 2).reshape(b, t, d)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class AxialImageTransformer(nn.Module):
    """Axial attention transformer (reference block.py:4443): per depth, LN +
    row attention, LN + column attention, then two 3x3 conv FFNs. Uses
    jax.checkpoint in place of the reference's ReversibleSequence."""

    dim: int
    depth: int = 1
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        dt = self.dtype

        for i in range(self.depth):
            # height-axis attention (sequence = H for each (b, w) column)
            y = nn.LayerNorm(dtype=dt, name=f"d{i}_norm_h")(x)
            y = y.swapaxes(1, 2).reshape(b * w, h, c)
            y = _AxialSelfAttention(self.dim, self.heads, dtype=dt, name=f"d{i}_attn_h")(y)
            x = x + y.reshape(b, w, h, c).swapaxes(1, 2)
            # width-axis attention
            y = nn.LayerNorm(dtype=dt, name=f"d{i}_norm_w")(x)
            y = y.reshape(b * h, w, c)
            y = _AxialSelfAttention(self.dim, self.heads, dtype=dt, name=f"d{i}_attn_w")(y)
            x = x + y.reshape(b, h, w, c)
            # conv FFNs (ChanLayerNorm + conv4x + leaky + conv)
            for j in range(2):
                y = nn.LayerNorm(dtype=dt, name=f"d{i}_ff{j}_norm")(x)
                y = nn.Conv(self.dim * 4, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt, name=f"d{i}_ff{j}_c1")(y)
                y = nn.leaky_relu(y)
                y = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt, name=f"d{i}_ff{j}_c2")(y)
                x = x + y
        return x


# ---------------------------------------------------------------------------
# compiler registration (parse rules mirror reference tasks.py:880-1045)
# ---------------------------------------------------------------------------

# args[0] is a width-scaled output-channel count -> out_args = [c1, c2, *rest]
WIDTH_SCALED = {
    "G_bneck", "PatchMerging", "PatchEmbed", "SwinStage", "VanillaBlock",
    "SGBlock", "ConvNeXt_Stem", "ConvNeXt_Block", "ConvNeXt_Downsample",
    "MobileNetV3_BLOCK", "InvertedBottleneck", "mn_conv", "DepthSepConv",
    "CBRM", "Shuffle_Block", "stem", "MBConvBlock", "Conv_BN_HSwish",
    "MobileNetV3_InvertedResidual", "CoordAtt", "GAMAttention", "MSBlock",
    "C2f_MSBlock", "GSConv", "GSConvns", "VoVGSCSP", "VoVGSCSPC", "PPA",
    "BasicRFB", "PatchEmbed_FasterNet", "PatchMerging_FasterNet",
}
# repeats (depth-scaled n) inserted at arg index 2 (after [c1, c2])
WIDTH_REPEAT = {"ConvNeXt_Block", "C2f_MSBlock", "VoVGSCSP"}
# out_args = [c1, *yaml_args]; output channels unchanged
C1_PREPEND = {
    "SE", "ECA", "ShuffleAttention", "SKAttention", "DoubleAttention",
    "CoTAttention", "EffectiveSEModule", "GlobalContext", "GatherExcite",
    "MHSA", "AxialImageTransformer", "DySample", "SCSA", "FGFP", "FGFP_Head",
    "StarBlock", "BasicStage",
}
# out_args = [c1] only
C1_ONLY = {
    "S2Attention", "NAMAttention", "CrissCrossAttention",
    "SequentialPolarizedSelfAttention", "ParallelPolarizedSelfAttention",
    "ParNetAttention",
}
# args pass through untouched; output channels unchanged
PASSTHROUGH = {"SimAM", "SpatialGroupEnhance", "TripletAttention"}
# multi-input modules (list of feature maps)
MULTI_INPUT = {"ASFF2", "ASFF3"}

ALL_RESEARCH = (
    WIDTH_SCALED | C1_PREPEND | C1_ONLY | PASSTHROUGH | MULTI_INPUT
)

# n-repeat folded into the module itself (vs. sequential stacking)
_INTERNAL_REPEAT = {"ConvNeXt_Block", "C2f_MSBlock", "VoVGSCSP", "StarBlock"}


def build_research_module(m: str, a: tuple, dtype, name: str):
    """Instantiate a research-zoo module from compiled (module, args)."""
    g = globals()
    cls = g[m] if m in g else None
    if cls is None:
        raise NotImplementedError(m)
    kw = {"dtype": dtype, "name": name}
    if m in ("SimAM",):
        return SimAM(*(a or ()), name=name)
    if m == "SpatialGroupEnhance":
        return SpatialGroupEnhance(*(a or ()), dtype=dtype, name=name)
    if m == "TripletAttention":
        return TripletAttention(*(a or ()), dtype=dtype, name=name)
    if m == "SKAttention":
        # tuple-ify the kernels list if provided
        a = (a[0], tuple(a[1])) + tuple(a[2:]) if len(a) > 1 else a
    if m in ("ASFF2", "ASFF3"):
        return cls(tuple(a[0]), a[1], *(a[2:]), **kw)
    return cls(*a, **kw)
