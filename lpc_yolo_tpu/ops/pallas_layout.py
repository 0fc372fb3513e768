"""Width-pack layout changes as Pallas TPU kernels.

`modules.repack_width` / `unpack_width` are logically free reshapes (the
row-major element order of a width-packed buffer is P-invariant), but XLA's
tiled layouts make the lane-dimension change a physical relayout: on v10m's
serving graph the 4->2 repack of the (32,320,80,384) stem activation compiled
to a generic transpose copy running at ~128 GB/s (1.23 ms, xplane-profiled).
This kernel streams the same relayout through VMEM with sublane-side
interleaving only — the r pack-pieces of each input column are lane-sliced
and restacked along the width axis, which Mosaic lowers to dense vector
shuffles — recovering most of the HBM bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _repack_kernel(in_ref, out_ref, *, r: int, ptc: int, wb: int):
    # Mosaic rejects rank-5 stack/reshape relayouts; express the interleave
    # as static rank-2 slice copies instead: out column wi*r+q takes lane
    # block q of input column wi.
    for wi in range(wb):
        x = in_ref[0, :, wi, :]  # (hb, r*ptc)
        for q in range(r):
            out_ref[0, :, wi * r + q, :] = x[:, q * ptc:(q + 1) * ptc]


@functools.partial(jax.jit, static_argnames=("p_from", "p_to", "interpret"))
def repack_width_pallas(x: jnp.ndarray, p_from: int, p_to: int, interpret: bool = False) -> jnp.ndarray:
    """(B, H, W/p_from, p_from*C) -> (B, H, W/p_to, p_to*C), p_to | p_from.

    p_to == 1 is the unpack case. Value-identical to
    `modules.repack_width` / `unpack_width` (pure element-order-preserving
    reshape); only the compiled data path differs.
    """
    b, h, wf, pfc = x.shape
    assert p_from % p_to == 0 and p_from > p_to, (p_from, p_to)
    c = pfc // p_from
    r = p_from // p_to
    ptc = p_to * c
    # block the H axis so a block (in + out) stays well under VMEM
    hb = h
    while hb * wf * pfc * x.dtype.itemsize * 2 > 4 * 1024 * 1024 and hb % 2 == 0:
        hb //= 2
    grid = (b, h // hb)
    return pl.pallas_call(
        functools.partial(_repack_kernel, r=r, ptc=ptc, wb=wf),
        out_shape=jax.ShapeDtypeStruct((b, h, wf * r, ptc), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, wf, pfc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (1, hb, wf * r, ptc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * b * h * wf * pfc * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
