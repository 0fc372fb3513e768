"""SAM ViT-B/L/H image encoder (ViTDet-style) in flax, NHWC.

Behavioral spec: reference models/sam/modules/encoders.py:13-125 (ImageEncoderViT),
:332-450 (Block/Attention with decomposed rel-pos), :453-573 (window partition +
rel-pos helpers), build.py:21-51 (vit_b/l/h configs: window 14, use_rel_pos).

TPU design notes:
  * tokens stay a (B, H, W, C) grid end-to-end; window partition is a static
    reshape/transpose (no dynamic shapes), so XLA lays each 14x14 window out
    as one attention batch.
  * decomposed relative position uses a PRECOMPUTED integer index matrix
    (q_size == k_size always holds in SAM: windows attend within themselves,
    global blocks attend over the full 64x64 grid), so the gather
    rel_pos[q-k+size-1] is a static take() — no interpolate path needed
    because the tables are built at exactly 2*size-1 entries.
  * attention runs as einsums on (B*windows, heads, tokens, head_dim): the
    MXU sees large batched matmuls; softmax in f32 for stability.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ...nn.modules import kaiming_uniform


def _rel_idx(size: int) -> np.ndarray:
    """(size, size) integer gather indices: idx[q, k] = q - k + size - 1."""
    q = np.arange(size)[:, None]
    k = np.arange(size)[None, :]
    return (q - k + size - 1).astype(np.int32)


class ViTAttention(nn.Module):
    """Windowed/global MHA with decomposed rel-pos (encoders.py:397-450)."""

    dim: int
    num_heads: int
    size: int  # token grid side (window size, or full grid for global blocks)
    use_rel_pos: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, S, S, C) where B folds in the window count
        B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, kernel_init=kaiming_uniform(), dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, HW, heads, hd)
        q = jnp.swapaxes(q, 1, 2)  # (B, heads, HW, hd)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        attn = jnp.einsum("bhqc,bhkc->bhqk", q * (hd ** -0.5), k)

        if self.use_rel_pos:
            rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.size - 1, hd))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.size - 1, hd))
            idx = _rel_idx(self.size)
            Rh = jnp.asarray(rel_pos_h, self.dtype)[idx]  # (S, S, hd)
            Rw = jnp.asarray(rel_pos_w, self.dtype)[idx]
            rq = q.reshape(B, self.num_heads, H, W, hd)
            # encoders.py:536-573 add_decomposed_rel_pos
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(B, self.num_heads, H * W, H * W)

        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, kernel_init=kaiming_uniform(), dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block with optional window partition (encoders.py:332-394)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0  # 0 = global attention
    grid: int = 64  # full token-grid side (img_size // patch_size)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)

        ws = self.window_size
        if ws > 0:
            pad_h = (ws - H % ws) % ws
            pad_w = (ws - W % ws) % ws
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = H + pad_h, W + pad_w
            x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)

        x = ViTAttention(
            dim=self.dim, num_heads=self.num_heads,
            size=ws if ws > 0 else self.grid, dtype=self.dtype, name="attn",
        )(x)

        if ws > 0:
            nh, nw = Hp // ws, Wp // ws
            x = x.reshape(B, nh, nw, ws, ws, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            x = x[:, :H, :W]

        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        # MLPBlock lin1/lin2 with exact (erf) GELU, matching torch nn.GELU
        y = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=kaiming_uniform(),
                     dtype=self.dtype, name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, kernel_init=kaiming_uniform(), dtype=self.dtype, name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """ViTDet backbone + SAM neck -> (B, grid, grid, 256) embeddings."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_abs_pos: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        del training
        grid = self.img_size // self.patch_size
        # patch embed: 16x16 s16 conv (encoders.py:576-603)
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            kernel_init=kaiming_uniform(), dtype=self.dtype, name="patch_embed_proj",
        )(x)
        if self.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim))
            x = x + jnp.asarray(pos, self.dtype)

        for i in range(self.depth):
            x = ViTBlock(
                dim=self.embed_dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                grid=grid, dtype=self.dtype, name=f"blocks_{i}",
            )(x)

        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (encoders.py:98-114); torch
        # LayerNorm2d normalizes over channels, which in NHWC is a plain LN
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_0")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_3")(x)
        return x


VIT_CONFIGS = {
    # build.py:21-51
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)),
}
