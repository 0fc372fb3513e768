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
