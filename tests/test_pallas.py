"""Pallas letterbox kernel tests (interpret mode on the CPU test platform;
the real-TPU timing/parity run lives in the verify drives — 0.53 ms/frame
device vs 1.36 ms/frame host cv2 at 1080x810->640)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.ops.letterbox import letterbox_image
from lpc_yolo_tpu.ops.pallas_preprocess import build_letterbox_mats, letterbox_pallas


def test_letterbox_mats_geometry():
    ry, rx, pad = build_letterbox_mats(1080, 810, 640)
    assert ry.shape == (640, 1080) and rx.shape == (810, 640) and pad.shape == (640, 640)
    # rows sum to 1 inside content, 0 outside
    rowsum = ry.sum(1)
    content_rows = rowsum > 0
    np.testing.assert_allclose(rowsum[content_rows], 1.0, atol=1e-5)
    # pad mask complements content box
    assert pad.sum() > 0
    assert (pad[:, :80] == 1).all()  # left pad band for 810-wide source


def test_letterbox_kernel_matches_cv2():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 192, 3), np.uint8)
    ry, rx, pad = map(jnp.asarray, build_letterbox_mats(256, 192, 128))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(letterbox_pallas(jnp.asarray(img), ry, rx, pad, size=128))
    ref, _, _ = letterbox_image(img, (128, 128))
    ref_f = ref[..., ::-1].astype(np.float32) / 255.0
    d = np.abs(out - ref_f)
    assert d.max() < 2.5 / 255.0  # bilinear rounding differences only
    # pad region is exactly 114/255
    assert abs(out[0, 0, 0] - 114.0 / 255.0) < 1e-6


def test_letterbox_kernel_bf16_output():
    """out_dtype=bf16 (the serving feed) stays within one bf16 ulp of the f32
    kernel: accumulation is f32 in both, only the final store rounds."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (200, 160, 3), np.uint8)
    ry, rx, pad = map(jnp.asarray, build_letterbox_mats(200, 160, 128))
    with pltpu.force_tpu_interpret_mode():
        f32 = np.asarray(letterbox_pallas(jnp.asarray(img), ry, rx, pad, size=128))
        b16 = np.asarray(
            letterbox_pallas(jnp.asarray(img), ry, rx, pad, size=128, out_dtype=jnp.bfloat16)
        ).astype(np.float32)
    assert np.abs(b16 - f32).max() <= 1.0 / 256.0  # one bf16 ulp at [0, 1]


def test_letterbox_kernel_uint8_frame():
    """out_dtype=uint8 emits the letterboxed FRAME (what cv2 LetterBox
    produces): ±1 LSB of the host reference inside the content box, pad
    exactly 114 — this is the raw-frame serving feed (uint8-WPACK graph)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (256, 192, 3), np.uint8)
    ry, rx, pad = map(jnp.asarray, build_letterbox_mats(256, 192, 128))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            letterbox_pallas(jnp.asarray(img), ry, rx, pad, size=128, out_dtype=jnp.uint8)
        )
    ref, _, _ = letterbox_image(img, (128, 128))
    ref = ref[..., ::-1]  # BGR->RGB like the kernel
    pad_px = np.asarray(pad) > 0
    assert (out[pad_px] == 114).all()
    d = np.abs(out[~pad_px].astype(np.int32) - ref[~pad_px].astype(np.int32))
    assert np.percentile(d, 99.9) <= 1 and d.max() <= 2


def test_letterbox_bf16_mats_parity():
    """bf16 interpolation matrices (the serving default — 2x MXU rate) stay
    within 1 LSB of the f32 kernel: pixels are exact in bf16, accumulation is
    f32, only the 2-tap weights round."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (256, 192, 3), np.uint8)
    ry, rx, pad = map(jnp.asarray, build_letterbox_mats(256, 192, 128))
    with pltpu.force_tpu_interpret_mode():
        f32 = np.asarray(
            letterbox_pallas(jnp.asarray(img), ry, rx, pad, size=128, out_dtype=jnp.uint8)
        )
        b16 = np.asarray(
            letterbox_pallas(
                jnp.asarray(img), ry.astype(jnp.bfloat16), rx.astype(jnp.bfloat16), pad,
                size=128, out_dtype=jnp.uint8,
            )
        )
    assert np.abs(b16.astype(np.int32) - f32.astype(np.int32)).max() <= 1
