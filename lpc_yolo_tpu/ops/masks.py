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
