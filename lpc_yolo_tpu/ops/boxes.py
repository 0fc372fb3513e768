"""Box format conversions and IoU family, as pure JAX functions.

Behavioral spec: ultralytics/utils/ops.py:382-576 (format conversions) and
ultralytics/utils/metrics.py:8-140 (bbox_iou / box_iou) in the reference repo.
All functions are shape-polymorphic over leading dims, jit-safe (no data-dependent
control flow), and operate on the last axis holding 4 box coordinates.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPS = 1e-7


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w / 2, h / 2
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x: jnp.ndarray, w: float = 640.0, h: float = 640.0, padw: float = 0.0, padh: float = 0.0) -> jnp.ndarray:
    """Normalized (cx, cy, w, h) -> pixel (x1, y1, x2, y2) with optional pad offset."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x: jnp.ndarray, w: float = 640.0, h: float = 640.0, clip: bool = False, eps: float = 0.0) -> jnp.ndarray:
    """Pixel (x1, y1, x2, y2) -> normalized (cx, cy, w, h)."""
    if clip:
        x1 = jnp.clip(x[..., 0:1], 0, w - eps)
        y1 = jnp.clip(x[..., 1:2], 0, h - eps)
        x2 = jnp.clip(x[..., 2:3], 0, w - eps)
        y2 = jnp.clip(x[..., 3:4], 0, h - eps)
    else:
        x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2 / w, (y1 + y2) / 2 / h, (x2 - x1) / w, (y2 - y1) / h], axis=-1
    )


def ltwh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(left, top, w, h) -> (x1, y1, x2, y2)."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l, t, l + w, t + h], axis=-1)


def xyxy2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (left, top, w, h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = EPS,
) -> jnp.ndarray:
    """Elementwise IoU between aligned boxes (broadcasting), last axis = 4.

    Returns shape broadcast(box1[...,:1], box2[...,:1]) — a trailing singleton axis,
    matching the reference's keepdim behavior (metrics.py:78).
    """
    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    # Intersection
    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )

    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)  # convex width
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)  # convex height
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps  # convex diagonal squared
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2  # DIoU
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area  # GIoU
    return iou


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pairwise IoU for xyxy boxes: box1 (N,4), box2 (M,4) -> (N, M).

    Mirrors reference metrics.py box_iou (used by validator TP matching).
    """
    a1 = box1[..., :, None, :2]  # (N,1,2)
    a2 = box1[..., :, None, 2:]
    b1 = box2[..., None, :, :2]  # (1,M,2)
    b2 = box2[..., None, :, 2:]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    area2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    return inter / (area1[..., :, None] + area2[..., None, :] - inter + eps)


def _rbox_covariance(obb: jnp.ndarray):
    """Gaussian covariance terms of rotated boxes (metrics.py probiou helper)."""
    w, h, r = obb[..., 2], obb[..., 3], obb[..., 4]
    a, b = (w**2) / 12.0, (h**2) / 12.0
    cos, sin = jnp.cos(r), jnp.sin(r)
    return a * cos**2 + b * sin**2, a * sin**2 + b * cos**2, (a - b) * cos * sin


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Probabilistic IoU between rotated boxes (metrics.py:198-260), elementwise.

    obb: (..., 5) = [cx, cy, w, h, angle]. Returns (...,) in [0, 1].
    """
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _rbox_covariance(obb1)
    a2, b2, c2 = _rbox_covariance(obb2)
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.clip(a1 * b1 - c1**2, 0, None)
    det2 = jnp.clip(a2 * b2 - c2**2, 0, None)
    t3 = jnp.log(denom / (4 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    return 1.0 - jnp.sqrt(1.0 - jnp.exp(-bd) + eps)


def xywhr2xyxyxyxy(rbox: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) rotated boxes -> (..., 4, 2) corner points (ops.py xywhr2xyxyxyxy)."""
    c, s = jnp.cos(rbox[..., 4]), jnp.sin(rbox[..., 4])
    w2, h2 = rbox[..., 2] / 2, rbox[..., 3] / 2
    v1 = jnp.stack([w2 * c, w2 * s], axis=-1)
    v2 = jnp.stack([-h2 * s, h2 * c], axis=-1)
    ctr = rbox[..., :2]
    return jnp.stack([ctr + v1 + v2, ctr + v1 - v2, ctr - v1 - v2, ctr - v1 + v2], axis=-2)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding: bool = True):
    """Rescale boxes from letterboxed img1_shape (h, w) back to original img0_shape.

    Mirrors reference ops.scale_boxes (ops.py:89). Pure function on (..., 4) arrays.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
            round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1),
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]

    if padding:
        boxes = boxes - jnp.array([pad[0], pad[1], pad[0], pad[1]], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)."""
    x = jnp.clip(boxes[..., 0::2], 0, shape[1])
    y = jnp.clip(boxes[..., 1::2], 0, shape[0])
    out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return out


def rbox_hull(rbox: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned hull (..., 4) xyxy of rotated boxes (..., 5) xywhr."""
    pts = xywhr2xyxyxyxy(rbox)  # (..., 4, 2)
    lo = jnp.min(pts, axis=-2)
    hi = jnp.max(pts, axis=-2)
    return jnp.concatenate([lo, hi], axis=-1)


def ltwh2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(left, top, w, h) -> (cx, cy, w, h) (ops.py ltwh2xywh)."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l + w / 2, t + h / 2, w, h], axis=-1)


def xywh2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (left, top, w, h) (ops.py xywh2ltwh)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, w, h], axis=-1)


def clip_coords(coords: jnp.ndarray, shape) -> jnp.ndarray:
    """Clip (..., 2) xy points to image shape (h, w) (ops.py clip_coords)."""
    x = jnp.clip(coords[..., 0:1], 0, shape[1])
    y = jnp.clip(coords[..., 1:2], 0, shape[0])
    return jnp.concatenate([x, y] + ([coords[..., 2:]] if coords.shape[-1] > 2 else []), axis=-1)


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None,
                 normalize: bool = False, padding: bool = True):
    """Rescale (..., 2+) xy coords (keypoints/segments) from letterboxed
    img1_shape (h, w) back to img0_shape (ops.py scale_coords)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    x = coords[..., 0:1]
    y = coords[..., 1:2]
    if padding:
        x = x - pad[0]
        y = y - pad[1]
    x, y = x / gain, y / gain
    out = jnp.concatenate([x, y] + ([coords[..., 2:]] if coords.shape[-1] > 2 else []), axis=-1)
    out = clip_coords(out, img0_shape)
    if normalize:
        out = out / jnp.asarray([img0_shape[1], img0_shape[0]] + [1.0] * (coords.shape[-1] - 2),
                                out.dtype)
    return out


def segment2box(segment, width: float = 640.0, height: float = 640.0):
    """Polygon (n, 2) -> xyxy box of its inside-image points (ops.py segment2box)."""
    import numpy as np

    seg = np.asarray(segment)
    x, y = seg[:, 0], seg[:, 1]
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    if not len(x):
        return np.zeros(4, seg.dtype)
    return np.array([x.min(), y.min(), x.max(), y.max()], seg.dtype)


def regularize_rboxes(rboxes: jnp.ndarray) -> jnp.ndarray:
    """Canonical rotated boxes: long side as w, angle wrapped to [0, pi)
    (ops.py regularize_rboxes — swap edges and add pi/2 when h >= w)."""
    x, y, w, h, t = jnp.split(rboxes, 5, axis=-1)
    long_first = w > h
    w_, h_ = jnp.where(long_first, w, h), jnp.where(long_first, h, w)
    t_ = jnp.where(long_first, t, t + math.pi / 2) % math.pi
    return jnp.concatenate([x, y, w_, h_, t_], axis=-1)


def xyxyxyxy2xywhr(corners):
    """(..., 4, 2) rectangle corners -> (..., 5) (cx, cy, w, h, rad)
    (ops.py xyxyxyxy2xywhr, which runs cv2.minAreaRect per box; for the
    rectangular corner sets this framework produces, the minimum-area rect IS
    the quad, so the closed form below is exact and stays jit-safe)."""
    pts = jnp.asarray(corners)
    ctr = jnp.mean(pts, axis=-2)
    e1 = pts[..., 1, :] - pts[..., 0, :]
    e2 = pts[..., 2, :] - pts[..., 1, :]
    w = jnp.linalg.norm(e1, axis=-1)
    h = jnp.linalg.norm(e2, axis=-1)
    t = jnp.arctan2(e1[..., 1], e1[..., 0]) % math.pi
    rb = jnp.concatenate([ctr, w[..., None], h[..., None], t[..., None]], axis=-1)
    return regularize_rboxes(rb)
