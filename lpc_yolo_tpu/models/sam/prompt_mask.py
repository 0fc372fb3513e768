"""SAM prompt encoder + mask decoder + two-way transformer, flax NHWC.

Behavioral spec: reference models/sam/modules/encoders.py:128-330
(PromptEncoder, PositionEmbeddingRandom), decoders.py:12-190 (MaskDecoder,
MLP), transformer.py:12-274 (TwoWayTransformer/TwoWayAttentionBlock/
Attention). TPU re-design notes:
  * static prompt shapes — points are padded to a fixed count with label -1
    (the reference already uses -1 padding); label-conditional embeddings are
    a one-hot matmul instead of boolean scatter.
  * image embeddings stay NHWC; the token<->image transformer flattens to
    (B, 4096, C) once.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.modules import kaiming_uniform


class PositionEmbeddingRandom(nn.Module):
    """Random-fourier positional encoding (encoders.py:288-329)."""

    num_pos_feats: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.gaussian = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(stddev=1.0),
            (2, self.num_pos_feats),
        )

    def encode(self, coords01: jnp.ndarray) -> jnp.ndarray:
        """coords in [0,1]^2, shape (..., 2) -> (..., 2*num_pos_feats)."""
        c = (2.0 * coords01 - 1.0) @ self.gaussian
        c = 2.0 * np.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, h: int, w: int) -> jnp.ndarray:
        """(h, w, C) dense positional encoding (encoders.py:311-322)."""
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(y, x, indexing="ij")
        return self.encode(jnp.stack([xx, yy], axis=-1))

    def __call__(self, coords01):
        return self.encode(coords01)


class PromptEncoder(nn.Module):
    """Point/box/mask prompts -> sparse + dense embeddings (encoders.py:128-286).

    Points come in as ((B, N, 2) pixel coords, (B, N) labels) with labels:
      -1 pad  |  0 negative point  |  1 positive point  |  2/3 box corners
    Box prompts are expressed as two corner points with labels 2, 3 (the
    reference's _embed_boxes unrolled into the same path).
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2, dtype=self.dtype)
        # point_embeddings_{0..3}.weight (1, D); not_a_point / no_mask (1, D)
        self.point_embeddings = [
            self.param(f"point_embeddings_{i}", nn.initializers.normal(1.0), (1, self.embed_dim))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        # mask-prompt downscaler (encoders.py:180-188): 4x-embedding-size mask
        # -> embedding grid; used when a mask prompt is given
        self.mask_downscaling_0 = nn.Conv(
            self.mask_in_chans // 4, (2, 2), strides=(2, 2), kernel_init=kaiming_uniform(),
            dtype=self.dtype, name="mask_downscaling_0",
        )
        self.mask_downscaling_1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="mask_downscaling_1")
        self.mask_downscaling_3 = nn.Conv(
            self.mask_in_chans, (2, 2), strides=(2, 2), kernel_init=kaiming_uniform(),
            dtype=self.dtype, name="mask_downscaling_3",
        )
        self.mask_downscaling_4 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="mask_downscaling_4")
        self.mask_downscaling_6 = nn.Conv(
            self.embed_dim, (1, 1), kernel_init=kaiming_uniform(),
            dtype=self.dtype, name="mask_downscaling_6",
        )

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """(B, 4h, 4w, 1) mask prompt -> (B, h, w, D) dense embedding."""
        x = self.mask_downscaling_0(masks)
        x = nn.gelu(self.mask_downscaling_1(x), approximate=False)
        x = self.mask_downscaling_3(x)
        x = nn.gelu(self.mask_downscaling_4(x), approximate=False)
        return self.mask_downscaling_6(x)

    def dense_pe(self) -> jnp.ndarray:
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)  # (h, w, D)

    def __call__(
        self, points: jnp.ndarray, labels: jnp.ndarray, masks: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse (B, N, D), dense (B, h, w, D)) embeddings."""
        H, W = self.input_image_size
        coords = (points + 0.5) / jnp.array([W, H], jnp.float32)
        pe = self.pe_layer.encode(coords)  # (B, N, D)
        # label-conditional additive embeddings via one-hot (labels -1..3)
        lab = (labels + 1).astype(jnp.int32)  # 0..4
        table = jnp.concatenate(
            [self.not_a_point_embed] + list(self.point_embeddings), axis=0
        )  # (5, D)
        onehot = jax.nn.one_hot(lab, 5, dtype=pe.dtype)  # (B, N, 5)
        add = onehot @ table
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)  # pad points: zero pe
        sparse = pe + add

        B = points.shape[0]
        h, w = self.image_embedding_size
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, self.embed_dim), (B, h, w, self.embed_dim)
            )
        return sparse, dense


class _Attn(nn.Module):
    """Downsampling attention (transformer.py:205-274)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embedding_dim // self.downsample_rate
        hq = nn.Dense(d, kernel_init=kaiming_uniform(), dtype=self.dtype, name="q_proj")(q)
        hk = nn.Dense(d, kernel_init=kaiming_uniform(), dtype=self.dtype, name="k_proj")(k)
        hv = nn.Dense(d, kernel_init=kaiming_uniform(), dtype=self.dtype, name="v_proj")(v)
        B, Nq, _ = hq.shape
        Nk = hk.shape[1]
        hd = d // self.num_heads
        hq = hq.reshape(B, Nq, self.num_heads, hd)
        hk = hk.reshape(B, Nk, self.num_heads, hd)
        hv = hv.reshape(B, Nk, self.num_heads, hd)
        attn = jnp.einsum("bqhc,bkhc->bhqk", hq, hk) / jnp.sqrt(jnp.float32(hd)).astype(hq.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, hv).reshape(B, Nq, d)
        return nn.Dense(self.embedding_dim, kernel_init=kaiming_uniform(), dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Self + bidirectional cross attention (transformer.py:116-203)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = _Attn(self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + _Attn(self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn")(
                q, q, queries
            )
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _Attn(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)

        y = nn.Dense(self.mlp_dim, kernel_init=kaiming_uniform(), dtype=self.dtype, name="mlp_lin1")(queries)
        y = nn.relu(y)
        y = nn.Dense(self.embedding_dim, kernel_init=kaiming_uniform(), dtype=self.dtype, name="mlp_lin2")(y)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _Attn(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """depth x TwoWayAttentionBlock + final token->image attention
    (transformer.py:12-113)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        # image_embedding/pe: (B, h, w, C) NHWC -> (B, hw, C)
        B, h, w, C = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, C)
        key_pe = image_pe.reshape(B, h * w, C) if image_pe.ndim == 4 else image_pe
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype, name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + _Attn(
            self.embedding_dim, self.num_heads, 2, dtype=self.dtype, name="final_attn_token_to_image"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys


class _MLP(nn.Module):
    """relu MLP (decoders.py:157-190)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, kernel_init=kaiming_uniform(), dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


class MaskDecoder(nn.Module):
    """Transformer mask decoder (decoders.py:12-155): iou+mask tokens through
    a TwoWayTransformer, hypernetwork MLPs over 4x-upscaled embeddings."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        """image_embeddings (B, h, w, C) NHWC; returns (masks (B, 4, 4h, 4w),
        iou_pred (B, 4)) — caller slices multimask/single."""
        D = self.transformer_dim
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, D))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (num_mask_tokens, D))

        B = sparse_prompt.shape[0]
        output_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None], (B, 1 + num_mask_tokens, D)
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt  # (B, h, w, C)
        hs, keys = TwoWayTransformer(dtype=self.dtype, name="transformer")(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

        h, w = src.shape[1], src.shape[2]
        src2 = keys.reshape(B, h, w, D)
        # output_upscaling: convT 2x -> LN -> GELU -> convT 2x -> GELU
        u = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2), transpose_kernel=True,
                             kernel_init=kaiming_uniform(), dtype=self.dtype, name="output_upscaling_0")(src2)
        u = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="output_upscaling_1")(u)
        u = nn.gelu(u, approximate=False)
        u = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2), transpose_kernel=True,
                             kernel_init=kaiming_uniform(), dtype=self.dtype, name="output_upscaling_3")(u)
        u = nn.gelu(u, approximate=False)  # (B, 4h, 4w, D/8)

        hyper = jnp.stack(
            [
                _MLP(D, D // 8, 3, dtype=self.dtype, name=f"output_hypernetworks_mlps_{i}")(
                    mask_tokens_out[:, i]
                )
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B, num_mask_tokens, D/8)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, u)
        iou_pred = _MLP(
            self.iou_head_hidden_dim, num_mask_tokens, self.iou_head_depth,
            dtype=self.dtype, name="iou_prediction_head",
        )(iou_token_out)
        return masks, iou_pred
