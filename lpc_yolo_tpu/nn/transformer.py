"""RT-DETR transformer stack: multiscale deformable attention + decoder.

Behavioral spec: reference ultralytics/nn/modules/transformer.py:216-400
(MSDeformAttn, DeformableTransformerDecoderLayer/Decoder), nn/modules/utils.py
:42-85 (multi_scale_deformable_attn_pytorch) and head.py:267-535 (RTDETRDecoder:
input projection, anchor generation, encoder-head top-k query selection,
iterative box refinement).

TPU notes: torch's F.grid_sample becomes an explicit bilinear gather
(`bilinear_sample`) — XLA turns the 4-neighbor gathers into vectorized
dynamic-slices; the per-level loop is static (3 levels). Attention/FFN matmuls
ride the MXU; the decoder's 6 layers are unrolled at trace time.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MLP(nn.Module):
    """Simple FFN stack (transformer.py:174-190): relu between layers."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def bilinear_sample(value: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """F.grid_sample(mode=bilinear, padding=zeros, align_corners=False) on one map.

    value: (H, W, C); grid: (..., 2) in [-1, 1] normalized coords (x, y).
    Returns (..., C).
    """
    H, W, C = value.shape
    gx = (grid[..., 0] + 1.0) * W / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * H / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(H * W, C)
        v = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return v * inside[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def multi_scale_deformable_attn(
    value: jnp.ndarray,  # (B, len_v, nh, hd)
    value_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, len_q, nh, nl, np, 2) in [0, 1]
    attention_weights: jnp.ndarray,  # (B, len_q, nh, nl, np)
) -> jnp.ndarray:
    """utils.py:42-85 semantics. Returns (B, len_q, nh*hd)."""
    B, _, nh, hd = value.shape
    _, len_q = sampling_locations.shape[:2]
    grids = 2 * sampling_locations - 1
    offsets = [0]
    for h, w in value_shapes:
        offsets.append(offsets[-1] + h * w)

    sampled = []
    for lvl, (h, w) in enumerate(value_shapes):
        v = value[:, offsets[lvl] : offsets[lvl + 1]]  # (B, h*w, nh, hd)
        v = v.transpose(0, 2, 1, 3).reshape(B * nh, h, w, hd)  # planar per (batch, head)
        g = grids[:, :, :, lvl]  # (B, len_q, nh, np, 2)
        g = g.transpose(0, 2, 1, 3, 4).reshape(B * nh, len_q, -1, 2)
        out = jax.vmap(bilinear_sample)(v.reshape(B * nh, h, w, hd) if v.ndim == 4 else v, g)
        sampled.append(out)  # (B*nh, len_q, np, hd)
    stacked = jnp.stack(sampled, axis=2)  # (B*nh, len_q, nl, np, hd)
    aw = attention_weights.transpose(0, 2, 1, 3, 4).reshape(B * nh, len_q, len(value_shapes), -1)
    out = jnp.sum(stacked * aw[..., None], axis=(2, 3))  # (B*nh, len_q, hd)
    return out.reshape(B, nh, len_q, hd).transpose(0, 2, 1, 3).reshape(B, len_q, nh * hd)


def _offsets_bias_init(n_heads: int, n_levels: int, n_points: int):
    """The reference's directional grid bias for sampling offsets
    (transformer.py:246-258)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
        grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
        grid = jnp.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
        scale = jnp.arange(1, n_points + 1, dtype=jnp.float32).reshape(1, 1, n_points, 1)
        return (grid * scale).reshape(-1).astype(dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (transformer.py:216-307)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes):
        """query (B, len_q, C); refer_bbox (B, len_q, nl, 4) in [0,1];
        value (B, len_v, C)."""
        B, len_q = query.shape[:2]
        nh, nl, npnt = self.n_heads, self.n_levels, self.n_points
        hd = self.d_model // nh

        v = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, nh, hd)
        offsets = nn.Dense(
            nh * nl * npnt * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offsets_bias_init(nh, nl, npnt),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(B, len_q, nh, nl, npnt, 2)
        aw = nn.Dense(
            nh * nl * npnt, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="attention_weights"
        )(query).reshape(B, len_q, nh, nl * npnt)
        aw = jax.nn.softmax(aw, axis=-1).reshape(B, len_q, nh, nl, npnt)

        # refer_bbox carries (cx, cy, w, h): offsets scaled by box size (head.py path)
        add = offsets / npnt * refer_bbox[:, :, None, :, None, 2:] * 0.5
        locations = refer_bbox[:, :, None, :, None, :2] + add
        out = multi_scale_deformable_attn(v, value_shapes, locations, aw)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (transformer.py:309-371)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos=None, attn_mask=None):
        q = k = embed if query_pos is None else embed + query_pos
        # flax mask semantics: True = may attend (attn_mask arrives True=blocked)
        mask = None if attn_mask is None else ~attn_mask[None, None]
        tgt = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model, dtype=self.dtype, name="self_attn"
        )(q, k, embed, mask=mask)
        embed = nn.LayerNorm(dtype=self.dtype, name="norm1")(embed + tgt)

        tgt = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, dtype=self.dtype, name="cross_attn"
        )(embed if query_pos is None else embed + query_pos, refer_bbox[:, :, None, :], feats, shapes)
        embed = nn.LayerNorm(dtype=self.dtype, name="norm2")(embed + tgt)

        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(embed + ff)


class RTDETRDecoder(nn.Module):
    """Real-Time DETR decoder head (head.py:267-535).

    Training may pass a contrastive-denoising batch `dn` = {'cls' (B,M),
    'bboxes' (B,M,4) normalized cxcywh, 'mask' (B,M), 'key'} — noised gt
    queries are prepended (get_cdn_group) with the group attention mask, and
    the per-layer outputs carry num_dn extra queries for the dn loss.
    """

    nc: int = 80
    ch: Tuple[int, ...] = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    num_denoising: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], training: bool = False, dn=None):
        B = xs[0].shape[0]
        nl = len(xs)
        # input projection: 1x1 conv + BN per level (head.py:326)
        feats_list, shapes = [], []
        for i, x in enumerate(xs):
            f = nn.Conv(self.hd, (1, 1), use_bias=False, dtype=self.dtype, name=f"input_proj_{i}_0")(x)
            f = nn.BatchNorm(
                use_running_average=not training, momentum=0.97, epsilon=1e-3, dtype=self.dtype,
                name=f"input_proj_{i}_1",
            )(f)
            h, w = f.shape[1], f.shape[2]
            shapes.append((h, w))
            feats_list.append(f.reshape(B, h * w, self.hd))
        feats = jnp.concatenate(feats_list, axis=1)  # (B, sum hw, hd)

        # anchors (head.py:397-414)
        anchors, valid = [], []
        for i, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
            xy = (jnp.stack([gx, gy], -1) + 0.5) / jnp.array([w, h], jnp.float32)
            wh = jnp.full((h, w, 2), 0.05 * (2.0**i), jnp.float32)
            anchors.append(jnp.concatenate([xy, wh], -1).reshape(h * w, 4))
        anchors = jnp.concatenate(anchors, 0)  # (A, 4)
        eps = 1e-2
        valid_mask = jnp.all((anchors > eps) & (anchors < 1 - eps), axis=-1, keepdims=True)
        anchors = jnp.where(valid_mask, jnp.log(anchors / (1 - anchors)), jnp.inf)

        # encoder head + top-k query selection (head.py:430-470)
        features = nn.Dense(self.hd, dtype=self.dtype, name="enc_output_0")(valid_mask * feats)
        features = nn.LayerNorm(dtype=self.dtype, name="enc_output_1")(features)
        enc_scores_all = nn.Dense(self.nc, dtype=self.dtype, name="enc_score_head")(features)  # (B, A, nc)

        k = min(self.nq, enc_scores_all.shape[1])
        topv, topi = jax.lax.top_k(jnp.max(enc_scores_all, -1), k)  # (B, k)
        top_feats = jnp.take_along_axis(features, topi[..., None], axis=1)  # (B, k, hd)
        top_anchors = jnp.take_along_axis(jnp.broadcast_to(anchors[None], (B,) + anchors.shape), topi[..., None], axis=1)
        enc_scores = jnp.take_along_axis(enc_scores_all, topi[..., None], axis=1)

        refer_raw = MLP(self.hd, 4, 3, dtype=self.dtype, name="enc_bbox_head")(top_feats) + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer_raw)
        embed = jax.lax.stop_gradient(top_feats) if training else top_feats
        refer_bbox = jax.nn.sigmoid(jax.lax.stop_gradient(refer_raw) if training else refer_raw)

        # contrastive denoising group (head.py:366-375 + models/utils/ops.py:153);
        # the embed table is created unconditionally so init() without a dn
        # batch still materializes it (reference head.py:335)
        dn_table = self.param(
            "denoising_class_embed", nn.initializers.normal(1.0), (self.nc, self.hd)
        )
        attn_mask = None
        num_dn = 0
        dn_group = 0
        if training and dn is not None:
            from ..losses.detr import get_cdn_group

            dn_embed, dn_bbox_logit, attn_mask, dn_group = get_cdn_group(
                dn["cls"], dn["bboxes"], dn["mask"], self.nc, dn_table, dn["key"],
                num_queries=k, num_dn=self.num_denoising,
            )
            num_dn = dn_embed.shape[1]
            embed = jnp.concatenate([dn_embed.astype(embed.dtype), embed], axis=1)
            refer_bbox = jnp.concatenate([jax.nn.sigmoid(dn_bbox_logit).astype(refer_bbox.dtype), refer_bbox], axis=1)

        pos_mlp = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")

        dec_bboxes, dec_scores = [], []
        out = embed
        last_idx = self.ndl - 1
        for i in range(self.ndl):
            out = DeformableTransformerDecoderLayer(
                self.hd, self.nh, self.d_ffn, n_levels=nl, n_points=self.ndp,
                dtype=self.dtype, name=f"decoder_layers_{i}",
            )(out, refer_bbox, feats, shapes, query_pos=pos_mlp(refer_bbox), attn_mask=attn_mask)
            delta = MLP(self.hd, 4, 3, dtype=self.dtype, name=f"dec_bbox_head_{i}")(out)
            refined = jax.nn.sigmoid(delta + inverse_sigmoid(refer_bbox))
            if training:
                dec_scores.append(nn.Dense(self.nc, dtype=self.dtype, name=f"dec_score_head_{i}")(out))
                dec_bboxes.append(refined)
                refer_bbox = jax.lax.stop_gradient(refined)
            else:
                if i == last_idx:
                    dec_scores.append(nn.Dense(self.nc, dtype=self.dtype, name=f"dec_score_head_{i}")(out))
                    dec_bboxes.append(refined)
                refer_bbox = refined
        if training:
            # stacked per-layer outputs for the DETR loss + encoder outputs;
            # the first num_dn queries (if any) belong to the denoising group
            return {
                "dec_bboxes": jnp.stack(dec_bboxes),  # (ndl, B, num_dn+nq, 4) normalized cxcywh
                "dec_scores": jnp.stack(dec_scores),  # (ndl, B, num_dn+nq, nc) logits
                "enc_bboxes": enc_bboxes,
                "enc_scores": enc_scores,
                "dn_split": num_dn,
                "dn_group": dn_group,
            }
        # eval: (B, nq, 4+nc) with sigmoid class scores (head.py:393-395)
        return jnp.concatenate([dec_bboxes[-1], jax.nn.sigmoid(dec_scores[-1])], axis=-1)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (reference transformer.py:28-86).

    MultiheadAttention maps to flax MHDPA (same param count: fused qkv+out
    projections with biases); dropout is identity at inference. Runs on
    (B, N, C) sequences; the N=400 stride-32 map rides the MXU as one matmul.
    """

    c: int
    cm: int = 2048
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos=None):
        q = k = x if pos is None else x + pos
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c, out_features=self.c,
            dtype=self.dtype, name="ma",
        )(q, k, x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + a)
        y = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(self.c, dtype=self.dtype, name="fc2")(nn.gelu(y, approximate=False))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


def sincos_2d_pos_embed(w: int, h: int, dim: int, temperature: float = 10000.0):
    """2D sin-cos position embedding, replicating the reference construction
    (transformer.py:104-118) EXACTLY — including its meshgrid('ij') flatten
    order, which iterates h fastest while the features flatten w fastest.
    Parity with torch requires reproducing that transposed order, not fixing it.
    """
    assert dim % 4 == 0
    grid_w, grid_h = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="ij"
    )
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )[None]


class AIFI(nn.Module):
    """Attention-based Intra-scale Feature Interaction (reference
    transformer.py:86-118): flatten the stride-32 map, add 2D sin-cos pos
    embed, run one TransformerEncoderLayer, restore the spatial map.
    NHWC input (B, H, W, C)."""

    c: int
    cm: int = 1024
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        pos = sincos_2d_pos_embed(w, h, c).astype(x.dtype)
        y = x.reshape(b, h * w, c)
        y = TransformerEncoderLayer(
            c, self.cm, self.num_heads, dtype=self.dtype, name="enc"
        )(y, pos=pos)
        return y.reshape(b, h, w, c)


class TransformerLayer(nn.Module):
    """LayerNorm-free ViT layer (reference transformer.py:121-133): extra
    bias-free q/k/v projections feeding a standard MHA, then 2 linear FFN
    with residuals."""

    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c, out_features=self.c,
            dtype=self.dtype, name="ma",
        )(q, k, v)
        x = a + x
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return y + x


class TransformerBlock(nn.Module):
    """ViT block over a conv map (reference transformer.py:136-155): optional
    input conv, learned linear position embedding, n TransformerLayers."""

    c2: int
    num_heads: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .modules import ConvBN

        b, h, w, c = x.shape
        if c != self.c2:
            x = ConvBN(self.c2, 1, 1, act="silu", dtype=self.dtype, name="conv")(x, training)
        p = x.reshape(b, h * w, self.c2)
        p = p + nn.Dense(self.c2, dtype=self.dtype, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p)
        return p.reshape(b, h, w, self.c2)
