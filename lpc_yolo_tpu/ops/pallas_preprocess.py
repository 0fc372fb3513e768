"""Fused letterbox preprocessing as a Pallas TPU kernel.

The reference does resize+pad+BGR->RGB+CHW+/255 on the host per frame
(predictor.py:115-133 + augment.py LetterBox). Here the whole letterbox is ONE
device kernel: bilinear resize is separable, so it becomes two MXU matmuls
with precomputed sparse interpolation matrices

    out[s1, s2, c] = sum_{h,w} Ry[s1, h] * src[h, w, c] * Rx[w, s2]

with letterbox padding baked in (Ry/Rx rows outside the content box are zero;
a pad-mask adds 114/255), channel flip handled by iteration order, and uint8
-> normalized fp32 conversion fused — the image crosses PCIe once as uint8
and never touches the host again.

The interpolation matrices depend only on (h0, w0, size): video streams and
fixed-camera pipelines build them once.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .letterbox import letterbox_geometry

PAD_VALUE = 114.0 / 255.0


def build_letterbox_mats(
    h0: int, w0: int, size: int, scaleup: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Interpolation matrices Ry (size, h0), Rx (w0, size) and pad_mask (size, size).

    Sampling matches cv2.INTER_LINEAR half-pixel centers and the reference
    LetterBox geometry (augment.py:726-752) including the +-0.1 rounding split.
    """
    r, (new_w, new_h), (dw, dh) = letterbox_geometry((h0, w0), (size, size), scaleup=scaleup)
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))

    def axis_matrix(n_src: int, n_dst: int, offset: int, out_len: int) -> np.ndarray:
        """(out_len, n_src) row-interp matrix; rows outside [offset, offset+n_dst) are zero."""
        M = np.zeros((out_len, n_src), np.float32)
        scale = n_src / n_dst
        for o in range(n_dst):
            f = (o + 0.5) * scale - 0.5
            f = min(max(f, 0.0), n_src - 1)
            i0 = int(np.floor(f))
            i1 = min(i0 + 1, n_src - 1)
            w1 = f - i0
            M[o + offset, i0] += 1.0 - w1
            M[o + offset, i1] += w1
        return M

    Ry = axis_matrix(h0, new_h, top, size)  # (size, h0)
    Rx = axis_matrix(w0, new_w, left, size).T  # (w0, size)
    content = np.zeros((size, size), np.float32)
    content[top : top + new_h, left : left + new_w] = 1.0
    pad_mask = 1.0 - content
    return Ry, Rx, pad_mask


def _letterbox_kernel(src_ref, ry_ref, rx_ref, pad_ref, out_ref):
    """One (channel, output-row-tile) program: two MXU dots + pad/normalize.

    Channel-planar layout: the naive HWC block puts 3 in the lane dimension
    (TPU lanes are 128-wide) which tiles pathologically; planar (C, H, W)
    keeps w0 in lanes. src plane: (1, h0, w0) uint8 — the u8->f32 convert
    happens in VMEM here, so the HBM-side transpose/relayout of the frame
    moves 4x fewer bytes than the old f32-prepared source. ry tile:
    (TILE, h0); rx: (w0, size); pad tile: (TILE, size); out plane tile:
    (1, TILE, size) in out_ref's dtype (f32 or bf16; accumulation is always
    f32 via preferred_element_type).
    """
    ry = ry_ref[:]
    rx = rx_ref[:]
    # The dots run in ry/rx's dtype (f32, or bf16 at 2x the MXU rate with
    # f32 accumulation — measured <=1 LSB vs the f32 kernel on 720p because
    # u8 pixels are exact in bf16 and only the weights round). Mosaic has no
    # direct u8->fp vector cast; widen through i32 (both legs lower fine).
    src = src_ref[0].astype(jnp.int32).astype(jnp.float32).astype(ry.dtype)
    a = jnp.dot(ry, src, preferred_element_type=jnp.float32)  # (TILE, w0)
    b = jnp.dot(a.astype(ry.dtype), rx, preferred_element_type=jnp.float32)  # (TILE, size)
    if out_ref.dtype == jnp.uint8:
        # uint8 mode: emit the letterboxed FRAME (0..255, pad=114), not the
        # normalized tensor — this is what the reference's cv2 letterbox
        # produces, and it lets raw-frame serving feed the standard
        # uint8-WPACK graph (the stem folds /255 into its kernel).
        frame = jnp.clip(jnp.round(b + pad_ref[:] * 114.0), 0.0, 255.0)
        out_ref[0] = frame.astype(jnp.int32).astype(jnp.uint8)  # f32->u8 via i32 (Mosaic)
    else:
        out_ref[0] = (b * (1.0 / 255.0) + pad_ref[:] * PAD_VALUE).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("size", "tile", "out_dtype"))
def letterbox_pallas(
    img_u8: jnp.ndarray,  # (h0, w0, 3) uint8 BGR
    ry: jnp.ndarray,  # (size, h0) f32
    rx: jnp.ndarray,  # (w0, size) f32
    pad_mask: jnp.ndarray,  # (size, size) f32
    size: int = 640,
    tile: int = 128,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Letterboxed (size, size, 3) RGB image, fully on-device.

    out_dtype=f32/bf16: normalized [0,1] (bf16 halves output traffic and
    removes the downstream cast the serving graph would otherwise pay).
    out_dtype=uint8: the 0..255 letterboxed frame itself (pad=114), i.e. what
    the reference's cv2 LetterBox emits — feed it to the uint8-WPACK serving
    graph and the stem's folded /255 finishes the preprocess for free.
    Accumulation is f32 in every mode.
    """
    h0, w0 = img_u8.shape[:2]
    src = img_u8.transpose(2, 0, 1)[::-1]  # planar + BGR->RGB, still uint8
    grid = (3, size // tile)
    out = pl.pallas_call(
        _letterbox_kernel,
        out_shape=jax.ShapeDtypeStruct((3, size, size), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h0, w0), lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, h0), lambda c, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((w0, size), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, size), lambda c, i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, size), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * (size * h0 * w0 + size * size * w0),
            bytes_accessed=h0 * w0 * 3 + size * size * 3 * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(src, ry, rx, pad_mask)
    return out.transpose(1, 2, 0)  # back to HWC for the model


def letterbox_batch_device(
    imgs_u8: jnp.ndarray,
    size: int = 640,
    scaleup: bool = True,
    out_dtype=jnp.float32,
    mxu_dtype=jnp.float32,
) -> jnp.ndarray:
    """vmapped device letterbox for a batch of SAME-SHAPE BGR uint8 frames
    (the video-stream case) -> (B, size, size, 3) RGB.

    mxu_dtype=bf16 runs the interpolation matmuls at the 2x bf16 MXU rate
    with f32 accumulation (<=1 LSB vs f32: pixels are exact in bf16, only
    the 2-tap weights round) — but measured on-chip the kernel is NOT
    MXU-rate-bound at these shapes (f32 2.20 vs bf16 2.40 ms/batch at
    720p->640 b32, tools/raw720_probe.py), so f32 stays the default.
    """
    h0, w0 = int(imgs_u8.shape[1]), int(imgs_u8.shape[2])
    ry, rx, pad = build_letterbox_mats(h0, w0, size, scaleup)
    ry, rx = jnp.asarray(ry, mxu_dtype), jnp.asarray(rx, mxu_dtype)
    pad = jnp.asarray(pad)
    return jax.vmap(lambda im: letterbox_pallas(im, ry, rx, pad, size=size, out_dtype=out_dtype))(
        imgs_u8
    )
