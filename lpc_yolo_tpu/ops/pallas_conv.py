"""Implicit-GEMM 3x3 stride-1 conv as a Pallas TPU kernel.

XLA's conv emitter reaches ~94 TF/s on the (B,80,80,96) -> 96 interiors that
dominate v10m's C2f blocks (48% of peak; the N=96 output tile caps the
ceiling at ~72%). This kernel builds the im2col patch matrix in VMEM (nine
sublane-shifted slices, lane-concatenated to K=9C) and runs ONE MXU dot per
row block, with bias + activation fused into the epilogue.

Scope: k=3, stride 1, groups 1, 'same' padding, NHWC bf16. The caller
pre-pads H/W by 1 (jnp.pad on device, one cheap copy) so every grid block
reads a dense (hb+2, W+2, C) tile with plain BlockSpec indexing over
non-overlapping output rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn import modules as _m  # for apply_act/mish without cycles


def _conv3_kernel(x_ref, w_ref, b_ref, out_ref, *, hb: int, W: int, C: int, Co: int, act):
    # x_ref: (1, hb+2, W+2, C) padded input rows; w_ref: (9, C, Co); b: (1, Co).
    # Nine accumulated dots (one per tap): Mosaic rejects the lane-dim concat
    # of misaligned C-wide pieces that a single K=9C dot would need, so each
    # tap contributes a (hb*W, C) x (C, Co) dot into the f32 accumulator.
    acc = jnp.zeros((hb * W, Co), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            piece = x_ref[0, kh:kh + hb, kw:kw + W, :].reshape(hb * W, C)
            acc = acc + jnp.dot(piece, w_ref[kh * 3 + kw], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if act:
        acc = _m.apply_act(acc, act)
    out_ref[0] = acc.reshape(hb, W, Co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "hb", "interpret"))
def conv3x3_pallas(x, w, b=None, act=False, hb: int = 16, interpret: bool = False):
    """Same-padded 3x3 stride-1 conv: x (B,H,W,C) NHWC, w (3,3,C,Co) HWIO."""
    B, H, W, C = x.shape
    Co = w.shape[-1]
    if H % hb:
        hb = next(h for h in (8, 5, 4, 2, 1) if H % h == 0)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9, C, Co)
    bf = (b if b is not None else jnp.zeros((Co,), x.dtype)).reshape(1, Co)
    grid = (B, H // hb)
    return pl.pallas_call(
        functools.partial(_conv3_kernel, hb=hb, W=W, C=C, Co=Co, act=act),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                # consecutive blocks overlap by 2 rows (the 3x3 halo):
                # pl.Element makes the H dim element-indexed, so the index
                # map strides by hb while the block stays hb+2 tall
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(hb + 2), pl.Element(W + 2), pl.Element(C)),
                    lambda i, j: (i, j * hb, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((9, C, Co), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Co), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hb, W, Co), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * Co,
            bytes_accessed=x.size * x.dtype.itemsize + B * H * W * Co * x.dtype.itemsize,
            transcendentals=B * H * W * Co,
        ),
        interpret=interpret,
    )(xp, wf, bf)
