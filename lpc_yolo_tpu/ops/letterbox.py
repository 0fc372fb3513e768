"""Letterbox preproceessing: host-side (cv2, parity-exact) and device-side
(fused XLA) variants.

Behavioral spec: reference ultralytics/data/augment.py:684-752 (LetterBox):
r = min(new/h, new/w) (never upscale if scaleup=False), resize bilinear,
split padding across both sides with the +-0.1 rounding trick, pad value 114.

TPU-first design note: the classic pipeline does resize+pad+BGR->RGB+CHW+/255
on host per frame (predictor.py:115-133). Here the host only decodes+resizes
(cv2, cheap, parallelizable) and the normalize/pad/layout work rides the XLA
graph on-device (`device_preprocess`), fused by the compiler into the first
conv — no separate CHW pass, no fp32 host buffer, uint8 over PCIe.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp


def letterbox_geometry(
    shape: Tuple[int, int],
    new_shape: Tuple[int, int],
    scaleup: bool = True,
    center: bool = True,
    stride: int = 32,
    auto: bool = False,
) -> Tuple[float, Tuple[int, int], Tuple[float, float]]:
    """Compute (gain, (new_w, new_h), (pad_w, pad_h)) like the reference."""
    h0, w0 = shape
    nh, nw = new_shape
    r = min(nh / h0, nw / w0)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = int(round(w0 * r)), int(round(h0 * r))
    dw, dh = nw - new_unpad[0], nh - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    if center:
        dw /= 2
        dh /= 2
    return r, new_unpad, (dw, dh)


def letterbox_image(
    img: np.ndarray,
    new_shape: Tuple[int, int] = (640, 640),
    color: int = 114,
    scaleup: bool = True,
    center: bool = True,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Host letterbox (HWC uint8/float) -> (letterboxed HWC, gain, (dw, dh)).

    Matches reference augment.py:726-752 including the round(x - 0.1) /
    round(x + 0.1) side-split.
    """
    import cv2

    h0, w0 = img.shape[:2]
    r, new_unpad, (dw, dh) = letterbox_geometry((h0, w0), new_shape, scaleup, center)
    if (w0, h0) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(color, color, color))
    return out, r, (dw, dh)


def device_preprocess(imgs_u8: jnp.ndarray, bgr: bool = False) -> jnp.ndarray:
    """On-device tail of preprocessing: uint8 NHWC -> fp32 NHWC in [0,1].

    Channel flip + normalize fuse into the first conv under jit; transfer
    stays uint8 (4x less PCIe/ICI traffic than fp32).
    """
    x = imgs_u8.astype(jnp.float32) / 255.0
    if bgr:
        x = x[..., ::-1]
    return x



def device_preprocess_wpack(imgs_u8: jnp.ndarray, bgr: bool = False) -> jnp.ndarray:
    """uint8 width-packed (B, H, W/8, 8*3) -> fp32 same shape in [0,1].

    The packed feed is byte-identical to NHWC (free host reshape) but lands
    on dense 128-lane TPU tiles; the stem then runs width-packed
    (compiler._wpack_prefix). BGR->RGB flips within each packed pixel."""
    x = imgs_u8.astype(jnp.float32) / 255.0
    if bgr:
        b, h, wp, pc = x.shape
        x = x.reshape(b, h, wp, pc // 3, 3)[..., ::-1].reshape(b, h, wp, pc)
    return x
