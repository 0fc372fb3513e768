"""Instance-mask decode ops for the segmentation task.

Behavioral spec: reference ultralytics/utils/ops.py:630-722 (crop_mask,
process_mask, process_mask_upsample): mask = sigmoid(coeffs @ protos),
cropped to its (downsampled) box, optionally upsampled to network size.

TPU notes: the coeff-by-proto contraction is one (N, nm) x (nm, H*W) matmul
on the MXU; cropping is a broadcasted-iota mask (no gather); everything is
fixed-shape over max_det rows.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside each box (ops.py:630-648).

    masks: (N, H, W); boxes: (N, 4) xyxy in mask-pixel units.
    """
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (N,1,1)
    c = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w), 2)
    r = jax.lax.broadcasted_iota(jnp.float32, (1, h, 1), 1)
    keep = (c >= x1) & (c < x2) & (r >= y1) & (r < y2)
    return masks * keep


def process_mask(
    protos: jnp.ndarray,  # (H4, W4, nm) NHWC single image
    coeffs: jnp.ndarray,  # (N, nm)
    boxes: jnp.ndarray,  # (N, 4) xyxy in network-input pixels
    shape: Tuple[int, int],  # network input (h, w)
    upsample: bool = False,
) -> jnp.ndarray:
    """Decode N instance masks (ops.py:670-703). Returns (N, H4, W4) or
    (N, h, w) sigmoid masks (threshold at 0.5 downstream)."""
    mh, mw, nm = protos.shape
    flat = protos.reshape(-1, nm)  # (H4*W4, nm)
    masks = jax.nn.sigmoid(coeffs @ flat.T).reshape(-1, mh, mw)  # (N, H4, W4)

    ih, iw = shape
    scale = jnp.array([mw / iw, mh / ih, mw / iw, mh / ih], dtype=boxes.dtype)
    masks = crop_mask(masks, boxes * scale)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), method="bilinear")
    return masks


def masks2segments(masks, strategy: str = "largest"):
    """Binary masks (N, H, W) -> list of (n, 2) polygons (ops.py
    masks2segments via cv2.findContours; strategy 'largest' or 'concat')."""
    import cv2
    import numpy as np

    out = []
    for m in np.asarray(masks).astype(np.uint8):
        cs = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if cs:
            if strategy == "concat":
                seg = np.concatenate([c.reshape(-1, 2) for c in cs])
            else:
                seg = max(cs, key=len).reshape(-1, 2)
        else:
            seg = np.zeros((0, 2))
        out.append(seg.astype(np.float32))
    return out


def scale_image(masks, im0_shape, ratio_pad=None):
    """Undo the letterbox on an (H, W[, C]) image/mask array: crop the pad,
    resize to im0_shape (ops.py scale_image)."""
    import cv2
    import numpy as np

    masks = np.asarray(masks)
    im1_shape = masks.shape[:2]
    if im1_shape[:2] == tuple(im0_shape[:2]):
        return masks
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = ((im1_shape[1] - im0_shape[1] * gain) / 2,
               (im1_shape[0] - im0_shape[0] * gain) / 2)
    else:
        pad = ratio_pad[1]
    top, left = int(round(pad[1] - 0.1)), int(round(pad[0] - 0.1))
    bottom = im1_shape[0] - int(round(pad[1] + 0.1))
    right = im1_shape[1] - int(round(pad[0] + 0.1))
    masks = masks[top:bottom, left:right]
    return cv2.resize(masks, (im0_shape[1], im0_shape[0]))


def scale_masks(masks, shape, padding: bool = True):
    """Rescale (N, H, W) letterboxed masks to `shape` (h, w) (ops.py
    scale_masks): crop the symmetric pad, then bilinear-resize on device."""
    mh, mw = masks.shape[-2:]
    gain = min(mh / shape[0], mw / shape[1])
    pad_w, pad_h = (mw - shape[1] * gain) / 2, (mh - shape[0] * gain) / 2
    if padding:
        top, left = int(round(pad_h - 0.1)), int(round(pad_w - 0.1))
        bottom, right = mh - int(round(pad_h + 0.1)), mw - int(round(pad_w + 0.1))
        masks = masks[..., top:bottom, left:right]
    return jax.image.resize(masks, masks.shape[:-2] + tuple(shape), "bilinear")
