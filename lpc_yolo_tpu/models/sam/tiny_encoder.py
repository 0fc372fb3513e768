"""TinyViT image encoder for MobileSAM, NHWC flax re-design.

Behavioral spec: reference models/sam/modules/tiny_encoder.py (742 LoC torch).
TPU-first differences: activations stay NHWC end to end (the torch code
round-trips between (B,L,C) sequences and (B,C,H,W) maps every block); window
partition/reverse are static reshapes; the attention-bias gather index is a
compile-time numpy constant. Submodule names mirror the torch attribute paths
so the weight porter is a pure name map.

MobileSAM configuration (build.py:55-64): embed_dims [64,128,160,320],
depths [2,2,6,2], heads [2,4,5,10], windows [7,7,14,7], img 1024 -> (64,64,256)
embeddings through the 256-channel neck.
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.modules import kaiming_uniform

# torch BatchNorm2d defaults (NOT the YOLO 1e-3/0.03 overrides — TinyViT never
# calls initialize_weights)
BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax momentum = 1 - torch 0.1


class Conv2dBN(nn.Module):
    """conv(bias=False) + BN (tiny_encoder.py:23-36)."""

    b: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(
            self.b, (self.ks, self.ks), strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            feature_group_count=self.groups, use_bias=False,
            kernel_init=kaiming_uniform(), dtype=self.dtype, name="c",
        )(x)
        return nn.BatchNorm(
            use_running_average=not training, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn",
        )(x)


class PatchEmbed(nn.Module):
    """Two stride-2 convs: img -> /4 resolution (tiny_encoder.py:38-60)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = Conv2dBN(self.embed_dim // 2, 3, 2, 1, dtype=self.dtype, name="seq_0")(x, training)
        x = nn.gelu(x, approximate=False)
        return Conv2dBN(self.embed_dim, 3, 2, 1, dtype=self.dtype, name="seq_2")(x, training)


class MBConv(nn.Module):
    """Inverted bottleneck with GELU (tiny_encoder.py:63-98)."""

    out_chans: int
    expand_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = int(x.shape[-1] * self.expand_ratio)
        y = Conv2dBN(hidden, 1, dtype=self.dtype, name="conv1")(x, training)
        y = nn.gelu(y, approximate=False)
        y = Conv2dBN(hidden, 3, 1, 1, groups=hidden, dtype=self.dtype, name="conv2")(y, training)
        y = nn.gelu(y, approximate=False)
        y = Conv2dBN(self.out_chans, 1, dtype=self.dtype, name="conv3")(y, training)
        return nn.gelu(y + x, approximate=False)


class PatchMerging(nn.Module):
    """1x1 expand -> dw 3x3 (stride 2, or 1 for dims {320,448,576}) -> 1x1
    (tiny_encoder.py:101-135)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        x = Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x, training)
        x = nn.gelu(x, approximate=False)
        x = Conv2dBN(self.out_dim, 3, stride, 1, groups=self.out_dim, dtype=self.dtype, name="conv2")(x, training)
        x = nn.gelu(x, approximate=False)
        return Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x, training)


def _attention_bias_idxs(resolution: Tuple[int, int]) -> Tuple[np.ndarray, int]:
    """(N, N) gather index over unique |offset| pairs (tiny_encoder.py:268-280)."""
    points = list(itertools.product(range(resolution[0]), range(resolution[1])))
    offsets = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.array(idxs, np.int32).reshape(n, n), len(offsets)


class WindowAttention(nn.Module):
    """Multi-head attention with trainable per-offset biases
    (tiny_encoder.py:231-322). attn_ratio=1 in TinyViT blocks."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float = 1.0
    resolution: Tuple[int, int] = (7, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x: (B*, N, C) token windows
        B, N, _ = x.shape
        nh_kd = self.key_dim * self.num_heads
        d = int(self.attn_ratio * self.key_dim)
        dh = d * self.num_heads
        idxs, n_offsets = _attention_bias_idxs(self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros, (self.num_heads, n_offsets))

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(dh + nh_kd * 2, kernel_init=kaiming_uniform(), dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, self.num_heads, -1)
        q, k, v = (
            qkv[..., : self.key_dim],
            qkv[..., self.key_dim : 2 * self.key_dim],
            qkv[..., 2 * self.key_dim :],
        )
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k) * (self.key_dim**-0.5)
        attn = attn + biases[:, idxs][None]  # (1, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, dh)
        return nn.Dense(self.dim, kernel_init=kaiming_uniform(), dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    """LN -> fc1 -> GELU -> fc2 (tiny_encoder.py:203-228)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden, kernel_init=kaiming_uniform(), dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, kernel_init=kaiming_uniform(), dtype=self.dtype, name="fc2")(x)


class TinyViTBlock(nn.Module):
    """Window attention + local dw conv + MLP (tiny_encoder.py:324-430).
    Operates on NHWC maps; windows are static reshapes."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    local_conv_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        B, H, W, C = x.shape
        ws = self.window_size
        res = x
        if H == ws and W == ws:
            y = x.reshape(B, H * W, C)
            y = WindowAttention(
                self.dim, C // self.num_heads, self.num_heads,
                resolution=(ws, ws), dtype=self.dtype, name="attn",
            )(y, training)
            y = y.reshape(B, H, W, C)
        else:
            pad_b = (ws - H % ws) % ws
            pad_r = (ws - W % ws) % ws
            y = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            pH, pW = H + pad_b, W + pad_r
            nH, nW = pH // ws, pW // ws
            y = y.reshape(B, nH, ws, nW, ws, C).transpose(0, 1, 3, 2, 4, 5).reshape(B * nH * nW, ws * ws, C)
            y = WindowAttention(
                self.dim, C // self.num_heads, self.num_heads,
                resolution=(ws, ws), dtype=self.dtype, name="attn",
            )(y, training)
            y = y.reshape(B, nH, nW, ws, ws, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
            y = y[:, :H, :W]
        x = res + y

        pad = self.local_conv_size // 2
        x = Conv2dBN(
            C, self.local_conv_size, 1, pad, groups=C, dtype=self.dtype, name="local_conv"
        )(x, training)
        y = Mlp(int(C * self.mlp_ratio), C, dtype=self.dtype, name="mlp")(
            x.reshape(B, H * W, C), training
        )
        return x + y.reshape(B, H, W, C)


class TinyViT(nn.Module):
    """MobileSAM image encoder (tiny_encoder.py:537-742): patch embed ->
    ConvLayer stage -> 3 attention stages -> 256-ch neck. Returns NHWC
    (B, 64, 64, 256) image embeddings for a 1024x1024 input."""

    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    neck_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = PatchEmbed(self.embed_dims[0], dtype=self.dtype, name="patch_embed")(x, training)

        # stage 0: MBConv stack + PatchMerging (ConvLayer, tiny_encoder.py:136-201)
        for i in range(self.depths[0]):
            x = MBConv(
                self.embed_dims[0], self.mbconv_expand_ratio, dtype=self.dtype,
                name=f"layers_0_blocks_{i}",
            )(x, training)
        x = PatchMerging(self.embed_dims[1], dtype=self.dtype, name="layers_0_downsample")(x, training)

        # stages 1..3: TinyViT blocks (+ PatchMerging except last)
        n_stages = len(self.depths)
        for s in range(1, n_stages):
            for i in range(self.depths[s]):
                x = TinyViTBlock(
                    self.embed_dims[s], self.num_heads[s], self.window_sizes[s],
                    self.mlp_ratio, dtype=self.dtype, name=f"layers_{s}_blocks_{i}",
                )(x, training)
            if s < n_stages - 1:
                x = PatchMerging(
                    self.embed_dims[s + 1], dtype=self.dtype, name=f"layers_{s}_downsample"
                )(x, training)

        # neck: 1x1 -> LN -> 3x3 -> LN, all bias-free (tiny_encoder.py:656-672)
        x = nn.Conv(self.neck_dim, (1, 1), use_bias=False, kernel_init=kaiming_uniform(),
                    dtype=self.dtype, name="neck_0")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_1")(x)
        x = nn.Conv(self.neck_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=kaiming_uniform(), dtype=self.dtype, name="neck_2")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_3")(x)
