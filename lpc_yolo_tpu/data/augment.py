"""Host-side training augmentations producing fixed-shape padded samples.

Behavioral spec: reference ultralytics/data/augment.py — Mosaic-4 (:135),
RandomPerspective affine (:347), HSV jitter (:584), flips (:627), LetterBox
(:684), pipeline composer v8_transforms (:973) with default hyp values from
cfg/default.yaml (hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=0, translate=0.1,
scale=0.5, shear=0, perspective=0, flipud=0, fliplr=0.5, mosaic=1.0).

TPU-first contract: every sample leaves this module at a STATIC shape —
(imgsz, imgsz, 3) uint8 + (max_gt,) cls + (max_gt, 4) pixel-xyxy + mask — so
batches jit-compile once. Mosaic/affine stay on host (cv2 warp), cheap vs the
device step; normalization happens on device (ops/letterbox.device_preprocess).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

from ..ops.letterbox import letterbox_image

DEFAULT_HYP = {
    "hsv_h": 0.015,
    "hsv_s": 0.7,
    "hsv_v": 0.4,
    "degrees": 0.0,
    "translate": 0.1,
    "scale": 0.5,
    "shear": 0.0,
    "perspective": 0.0,
    "flipud": 0.0,
    "fliplr": 0.5,
    "mosaic": 1.0,
    "mosaic9": 0.0,
    "mixup": 0.0,
    "copy_paste": 0.0,
}


def xywhn_to_xyxy(bboxes: np.ndarray, w: float, h: float, padw: float = 0, padh: float = 0) -> np.ndarray:
    out = np.empty_like(bboxes)
    out[:, 0] = w * (bboxes[:, 0] - bboxes[:, 2] / 2) + padw
    out[:, 1] = h * (bboxes[:, 1] - bboxes[:, 3] / 2) + padh
    out[:, 2] = w * (bboxes[:, 0] + bboxes[:, 2] / 2) + padw
    out[:, 3] = h * (bboxes[:, 1] + bboxes[:, 3] / 2) + padh
    return out


def resample_segments(segments, n: int = 200) -> np.ndarray:
    """Resample a list of (k, 2) polygons to a fixed (N, n, 2) array by linear
    interpolation along the closed contour (reference utils/ops.py
    resample_segments semantics; fixed point count keeps shapes static)."""
    out = np.zeros((len(segments), n, 2), np.float32)
    for i, s in enumerate(segments):
        if len(s) == 0:
            continue
        s = np.concatenate([s, s[0:1]], axis=0)  # close the contour
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out[i] = np.stack([np.interp(x, xp, s[:, 0]), np.interp(x, xp, s[:, 1])], axis=-1)
    return out


def segments2boxes_px(segments: np.ndarray, width: float, height: float) -> np.ndarray:
    """Vectorized segment2box (reference utils/ops.py:segment2box): xyxy from
    the in-canvas points of each (N, P, 2) polygon; all-outside -> zeros."""
    x, y = segments[..., 0], segments[..., 1]
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)  # (N, P)
    any_in = inside.any(axis=1)
    big = np.float32(1e12)
    x1 = np.where(inside, x, big).min(axis=1)
    y1 = np.where(inside, y, big).min(axis=1)
    x2 = np.where(inside, x, -big).max(axis=1)
    y2 = np.where(inside, y, -big).max(axis=1)
    boxes = np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
    boxes[~any_in] = 0.0
    return boxes


def _segments_px(item: Dict, boxes_px: np.ndarray, sx: float, sy: float, padx: float, pady: float, seg_points: int) -> np.ndarray:
    """Item's normalized polygons -> fixed-point pixel polygons aligned with
    boxes_px; box-only labels (no polygon) become the box rectangle."""
    n = len(boxes_px)
    segs = resample_segments(item.get("segments", []), seg_points)
    if len(segs) < n:
        segs = np.concatenate([segs, np.zeros((n - len(segs), seg_points, 2), np.float32)])
    empty = ~segs.reshape(len(segs), -1).any(axis=1) if len(segs) else np.zeros(0, bool)
    segs = segs * np.array([sx, sy], np.float32) + np.array([padx, pady], np.float32)
    if empty.any():
        rect = [
            resample_segments(
                [np.array([[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]], np.float32)],
                seg_points,
            )[0]
            for b in boxes_px[empty]
        ]
        segs[empty] = np.stack(rect)
    return segs


# COCO-17 left/right keypoint swap for horizontal flip (reference
# cfg/datasets/coco8-pose.yaml flip_idx)
COCO_FLIP_IDX = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]


def mosaic4(
    dataset,
    idx: int,
    rng: np.random.RandomState,
    imgsz: int,
    seg_points: Optional[int] = None,
    kpt_shape: Optional[Tuple[int, int]] = None,
) -> Dict:
    """4-image mosaic on a 2x2 canvas of side 2*imgsz (augment.py:160-210).

    With seg_points / kpt_shape set, polygon and keypoint labels ride along in
    canvas pixel space (reference Instances.denormalize + add_padding).
    """
    import cv2

    s = imgsz
    yc, xc = (int(rng.uniform(s // 2, 2 * s - s // 2)) for _ in range(2))
    indices = [idx] + [rng.randint(0, len(dataset)) for _ in range(3)]
    canvas = np.full((s * 2, s * 2, 3), 114, np.uint8)
    all_cls, all_boxes, all_segs, all_kpts = [], [], [], []
    for i, index in enumerate(indices):
        item = dataset.get_item_raw(index)
        img = item["img"]
        h0, w0 = img.shape[:2]
        r = s / max(h0, w0)
        if r != 1:
            img = cv2.resize(img, (int(w0 * r), int(h0 * r)), interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(item["bboxes"]):
            tile_boxes = xywhn_to_xyxy(item["bboxes"], w, h, padw, padh)
            all_boxes.append(tile_boxes)
            all_cls.append(item["cls"])
            if seg_points is not None:
                all_segs.append(_segments_px(item, tile_boxes, w, h, padw, padh, seg_points))
            if kpt_shape is not None:
                kpts = item.get("keypoints")
                if kpts is None or kpts.size == 0:
                    kpts = np.zeros((len(item["bboxes"]),) + tuple(kpt_shape), np.float32)
                else:
                    kpts = kpts.copy()
                    kpts[..., 0] = kpts[..., 0] * w + padw
                    kpts[..., 1] = kpts[..., 1] * h + padh
                all_kpts.append(kpts)
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.int32)
    boxes = boxes.clip(0, 2 * s)
    out = {"img": canvas, "cls": cls, "bboxes_xyxy": boxes, "mosaic_border": (-s // 2, -s // 2)}
    if seg_points is not None:
        out["segments"] = (
            np.concatenate(all_segs) if all_segs else np.zeros((0, seg_points, 2), np.float32)
        )
    if kpt_shape is not None:
        out["keypoints"] = (
            np.concatenate(all_kpts) if all_kpts else np.zeros((0,) + tuple(kpt_shape), np.float32)
        )
    return out


def random_perspective(
    img: np.ndarray,
    boxes: np.ndarray,
    cls: np.ndarray,
    rng: np.random.RandomState,
    hyp: Dict,
    border: Tuple[int, int] = (0, 0),
    segments: Optional[np.ndarray] = None,  # (N, P, 2) pixel polygons
    keypoints: Optional[np.ndarray] = None,  # (N, K, 2|3) pixel kpts
):
    """Affine warp (rotation/scale/shear/translate) + label transform +
    candidate filter (augment.py:347-470).

    With segments, boxes are recomputed from the warped polygons
    (apply_segments, augment.py:447-474) and the area threshold relaxes to
    0.01; keypoints are warped and out-of-canvas ones marked invisible
    (apply_keypoints, augment.py:476-501). Returns (img, boxes, cls) or
    (img, boxes, cls, segments[, keypoints]) matching the inputs given.
    """
    import cv2

    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-hyp["perspective"], hyp["perspective"])
    P[2, 1] = rng.uniform(-hyp["perspective"], hyp["perspective"])
    R = np.eye(3)
    a = rng.uniform(-hyp["degrees"], hyp["degrees"])
    scale = rng.uniform(1 - hyp["scale"], 1 + hyp["scale"])
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=scale)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-hyp["shear"], hyp["shear"]) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-hyp["shear"], hyp["shear"]) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - hyp["translate"], 0.5 + hyp["translate"]) * width
    T[1, 2] = rng.uniform(0.5 - hyp["translate"], 0.5 + hyp["translate"]) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if hyp["perspective"]:
            img = cv2.warpPerspective(img, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    n = len(boxes)
    if n:
        if segments is not None and len(segments):
            # warp polygons, rebuild boxes from in-canvas points, clip polys to box
            N, P, _ = segments.shape
            xy = np.ones((N * P, 3))
            xy[:, :2] = segments.reshape(N * P, 2)
            xy = xy @ M.T
            xy = xy[:, :2] / xy[:, 2:3] if hyp["perspective"] else xy[:, :2]
            segments = xy.reshape(N, P, 2).astype(np.float32)
            new = segments2boxes_px(segments, width, height)
            segments[..., 0] = segments[..., 0].clip(new[:, 0:1], new[:, 2:3])
            segments[..., 1] = segments[..., 1].clip(new[:, 1:2], new[:, 3:4])
        else:
            xy = np.ones((n * 4, 3))
            xy[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
            xy = xy @ M.T
            xy = (xy[:, :2] / xy[:, 2:3] if hyp["perspective"] else xy[:, :2]).reshape(n, 8)
            x, y = xy[:, [0, 2, 4, 6]], xy[:, [1, 3, 5, 7]]
            new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        if keypoints is not None and len(keypoints):
            N, K, ndim = keypoints.shape
            xy = np.ones((N * K, 3))
            xy[:, :2] = keypoints[..., :2].reshape(N * K, 2)
            xy = xy @ M.T
            xy = xy[:, :2] / xy[:, 2:3] if hyp["perspective"] else xy[:, :2]
            out_of = (xy[:, 0] < 0) | (xy[:, 1] < 0) | (xy[:, 0] > width) | (xy[:, 1] > height)
            kp = keypoints.copy()
            kp[..., :2] = xy.reshape(N, K, 2)
            if ndim == 3:
                kp[..., 2] = np.where(out_of.reshape(N, K), 0.0, kp[..., 2])
            keypoints = kp.astype(np.float32)
        # candidate filter (augment.py box_candidates): wh>2px, ar<100,
        # area ratio>0.1 (0.01 when polygons define the boxes)
        area_thr = 0.01 if segments is not None and len(segments) else 0.10
        w1, h1 = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
        w2, h2 = new[:, 2] - new[:, 0], new[:, 3] - new[:, 1]
        ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
        keep = (w2 > 2) & (h2 > 2) & (w2 * h2 / (w1 * h1 * scale**2 + 1e-16) > area_thr) & (ar < 100)
        boxes, cls = new[keep], cls[keep]
        if segments is not None and len(segments):
            segments = segments[keep]
        if keypoints is not None and len(keypoints):
            keypoints = keypoints[keep]
    if segments is not None and keypoints is not None:
        return img, boxes, cls, segments, keypoints
    if segments is not None:
        return img, boxes, cls, segments
    if keypoints is not None:
        return img, boxes, cls, keypoints
    return img, boxes, cls


def augment_hsv(img: np.ndarray, rng: np.random.RandomState, hgain: float, sgain: float, vgain: float) -> np.ndarray:
    """HSV color jitter in place (augment.py:584-607)."""
    import cv2

    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(np.uint8)
        lut_sat = np.clip(x * r[1], 0, 255).astype(np.uint8)
        lut_val = np.clip(x * r[2], 0, 255).astype(np.uint8)
        img_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR, dst=img)
    return img


def mosaic9(dataset, idx: int, rng: np.random.RandomState, imgsz: int) -> Dict:
    """9-image mosaic on a 3x3 canvas (augment.py:212-280), cropped to 2*imgsz."""
    import cv2

    s = imgsz
    indices = [idx] + [rng.randint(0, len(dataset)) for _ in range(8)]
    canvas = np.full((s * 3, s * 3, 3), 114, np.uint8)
    all_cls, all_boxes = [], []
    hp = wp = -1  # previous tile dims
    for i, index in enumerate(indices):
        item = dataset.get_item_raw(index)
        img = item["img"]
        h0, w0 = img.shape[:2]
        r = s / max(h0, w0)
        if r != 1:
            img = cv2.resize(img, (int(w0 * r), int(h0 * r)), interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        # tile placement (reference Mosaic._mosaic9 layout)
        if i == 0:
            c = s, s, s + w, s + h
        elif i == 1:
            c = s, s - h, s + w, s
        elif i == 2:
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:
            c = s + w0p, s, s + w0p + w, s + h
        elif i == 4:
            c = s + w0p, s + hp, s + w0p + w, s + hp + h
        elif i == 5:
            c = s + w0p - w, s + hp, s + w0p, s + hp + h
        elif i == 6:
            c = s + w0p - wp - w, s + hp, s + w0p - wp, s + hp + h
        elif i == 7:
            c = s - w, s + hp - h, s, s + hp
        else:
            c = s - w, s + hp - hp0 - h, s, s + hp - hp0
        if i == 0:
            w0p, hp0 = w, h
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(x, 0) for x in c)
        x2, y2 = min(x2, 3 * s), min(y2, 3 * s)
        canvas[y1:y2, x1:x2] = img[(y1 - padh):(y2 - padh), (x1 - padw):(x2 - padw)]
        if len(item["bboxes"]):
            all_boxes.append(xywhn_to_xyxy(item["bboxes"], w, h, padw, padh))
            all_cls.append(item["cls"])
        hp, wp = h, w
    # center 2s x 2s crop with random offset (reference: border -s//2)
    yc, xc = (int(rng.uniform(0, s)) for _ in range(2))
    canvas = canvas[yc : yc + 2 * s, xc : xc + 2 * s]
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.int32)
    boxes = (boxes - np.array([xc, yc, xc, yc], np.float32)).clip(0, 2 * s)
    keep = ((boxes[:, 2] - boxes[:, 0]) > 2) & ((boxes[:, 3] - boxes[:, 1]) > 2)
    return {"img": canvas, "cls": cls[keep], "bboxes_xyxy": boxes[keep], "mosaic_border": (-s // 2, -s // 2)}


def mixup(sample_a: Dict, sample_b: Dict, rng: np.random.RandomState) -> Dict:
    """Beta(32,32) image blend with concatenated labels (augment.py:326-346)."""
    r = rng.beta(32.0, 32.0)
    img = (sample_a["img"].astype(np.float32) * r + sample_b["img"].astype(np.float32) * (1 - r)).astype(np.uint8)
    return {
        "img": img,
        "cls": np.concatenate([sample_a["cls"], sample_b["cls"]]),
        "bboxes_xyxy": np.concatenate([sample_a["bboxes_xyxy"], sample_b["bboxes_xyxy"]]),
        "mosaic_border": sample_a.get("mosaic_border", (0, 0)),
    }


def copy_paste(img: np.ndarray, boxes: np.ndarray, cls: np.ndarray, rng: np.random.RandomState, p: float = 0.5):
    """Box-level copy-paste (augment.py:753-818 simplified to rectangular
    regions — the reference pastes segment polygons): flips object crops onto
    low-overlap locations."""
    from ..utils.metrics import box_iou_np

    n = len(boxes)
    if n == 0 or p <= 0:
        return img, boxes, cls
    img = img.copy()
    w = img.shape[1]
    new_boxes, new_cls = [boxes], [cls]
    for j in rng.permutation(n)[: round(p * n)]:
        x1, y1, x2, y2 = boxes[j].astype(int)
        box_new = np.array([w - x2, y1, w - x1, y2], np.float32)  # horizontal mirror position
        ioa = box_iou_np(box_new[None], boxes)
        if (ioa < 0.30).all() and x2 > x1 and y2 > y1:
            bw = x2 - x1
            img[y1:y2, int(box_new[0]) : int(box_new[0]) + bw] = np.fliplr(img[y1:y2, x1:x2])
            new_boxes.append(box_new[None])
            new_cls.append(cls[j : j + 1])
    return img, np.concatenate(new_boxes), np.concatenate(new_cls)


class AlbumentationsBridge:
    """Optional albumentations pipeline (reference augment.py:819-874): Blur,
    MedianBlur, ToGray, CLAHE, each at p=0.01, applied image-only before the
    HSV jitter. Silently disabled when the package is absent — the same
    import-gated behavior as the reference."""

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as A

            self.transform = A.Compose(
                [A.Blur(p=0.01), A.MedianBlur(p=0.01), A.ToGray(p=0.01), A.CLAHE(p=0.01)]
            )
        except Exception:  # noqa: BLE001 — absent or incompatible package: skip
            pass

    def __call__(self, img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        if self.transform is None or rng.rand() >= self.p:
            return img
        return self.transform(image=img)["image"]


class TrainTransforms:
    """Mosaic + affine + HSV + flip -> fixed (imgsz, imgsz) sample (v8_transforms)."""

    def __init__(self, imgsz: int = 640, hyp: Optional[Dict] = None, max_gt: int = 128):
        self.imgsz = imgsz
        self.hyp = {**DEFAULT_HYP, **(hyp or {})}
        self.max_gt = max_gt
        self.mosaic_enabled = True
        self.albumentations = AlbumentationsBridge()

    def close_mosaic(self):
        """Disable mosaic for the final epochs (trainer.py:354-356)."""
        self.mosaic_enabled = False

    def __call__(self, dataset, idx: int, rng: np.random.RandomState) -> Dict:
        hyp = self.hyp
        use_mosaic = self.mosaic_enabled and rng.rand() < hyp["mosaic"]
        if use_mosaic:
            mfn = mosaic9 if rng.rand() < hyp.get("mosaic9", 0.0) else mosaic4
            m = mfn(dataset, idx, rng, self.imgsz)
            if rng.rand() < hyp.get("mixup", 0.0):
                m2 = mfn(dataset, rng.randint(0, len(dataset)), rng, self.imgsz)
                m = mixup(m, m2, rng)
            img, boxes, cls = m["img"], m["bboxes_xyxy"], m["cls"]
            if hyp.get("copy_paste", 0.0) > 0:
                img, boxes, cls = copy_paste(img, boxes, cls, rng, hyp["copy_paste"])
            border = m["mosaic_border"]
        else:
            item = dataset.get_item_raw(idx)
            img, gain, pad = letterbox_image(item["img"], (self.imgsz, self.imgsz))
            h0, w0 = item["img"].shape[:2]
            boxes = xywhn_to_xyxy(item["bboxes"], w0 * gain, h0 * gain, pad[0], pad[1])
            cls = item["cls"]
            border = (0, 0)
        img = np.ascontiguousarray(img)
        img, boxes, cls = random_perspective(img, boxes, cls, rng, hyp, border)
        img = self.albumentations(img, rng)
        img = augment_hsv(img, rng, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"])
        if rng.rand() < hyp["flipud"]:
            img = np.flipud(img)
            boxes[:, [1, 3]] = img.shape[0] - boxes[:, [3, 1]]
        if rng.rand() < hyp["fliplr"]:
            img = np.fliplr(img)
            boxes[:, [0, 2]] = img.shape[1] - boxes[:, [2, 0]]
        img = np.ascontiguousarray(img)

        # pad/truncate to static max_gt
        M = self.max_gt
        n = min(len(boxes), M)
        out_boxes = np.zeros((M, 4), np.float32)
        out_cls = np.zeros((M,), np.int32)
        mask = np.zeros((M,), bool)
        out_boxes[:n] = boxes[:n]
        out_cls[:n] = cls[:n]
        mask[:n] = True
        return {"img": img, "cls": out_cls, "bboxes": out_boxes, "mask": mask}


class ValTransforms:
    """Letterbox-only path for validation; keeps letterbox geometry for unscaling."""

    def __init__(self, imgsz: int = 640, max_gt: int = 128):
        self.imgsz = imgsz
        self.max_gt = max_gt

    def __call__(self, dataset, idx: int, rng=None) -> Dict:
        item = dataset.get_item_raw(idx)
        img0 = item["img"]
        h0, w0 = img0.shape[:2]
        img, gain, pad = letterbox_image(img0, (self.imgsz, self.imgsz), scaleup=False)
        boxes = xywhn_to_xyxy(item["bboxes"], w0 * gain, h0 * gain, pad[0], pad[1])
        M = self.max_gt
        n = min(len(boxes), M)
        out_boxes = np.zeros((M, 4), np.float32)
        out_cls = np.zeros((M,), np.int32)
        mask = np.zeros((M,), bool)
        out_boxes[:n] = boxes[:n]
        out_cls[:n] = item["cls"][:n]
        mask[:n] = True
        return {
            "img": np.ascontiguousarray(img),
            "cls": out_cls,
            "bboxes": out_boxes,
            "mask": mask,
            "orig_shape": (h0, w0),
            "gain": gain,
            "pad": pad,
            "path": item["path"],
        }


class SegTrainTransforms:
    """Full geometric pipeline for segmentation training: mosaic + affine on
    polygons (reference augment.py:447 apply_segments), HSV, flips — then
    polygons rasterized into per-instance masks at proto resolution (imgsz/4).
    """

    def __init__(self, imgsz: int = 640, hyp: Optional[Dict] = None, max_gt: int = 64,
                 mask_ratio: int = 4, seg_points: int = 200):
        self.imgsz = imgsz
        self.hyp = {**DEFAULT_HYP, **(hyp or {})}
        self.max_gt = max_gt
        self.mask_ratio = mask_ratio
        self.seg_points = seg_points
        self.mosaic_enabled = True
        self.albumentations = AlbumentationsBridge()

    def close_mosaic(self):
        self.mosaic_enabled = False

    def __call__(self, dataset, idx: int, rng: np.random.RandomState) -> Dict:
        import cv2

        hyp = self.hyp
        if self.mosaic_enabled and rng.rand() < hyp["mosaic"]:
            m = mosaic4(dataset, idx, rng, self.imgsz, seg_points=self.seg_points)
            img, boxes, cls, segs = m["img"], m["bboxes_xyxy"], m["cls"], m["segments"]
            border = m["mosaic_border"]
        else:
            item = dataset.get_item_raw(idx)
            img, gain, pad = letterbox_image(item["img"], (self.imgsz, self.imgsz))
            h0, w0 = item["img"].shape[:2]
            boxes = xywhn_to_xyxy(item["bboxes"], w0 * gain, h0 * gain, pad[0], pad[1])
            segs = _segments_px(item, boxes, w0 * gain, h0 * gain, pad[0], pad[1], self.seg_points)
            cls = item["cls"]
            border = (0, 0)
        img = np.ascontiguousarray(img)
        img, boxes, cls, segs = random_perspective(img, boxes, cls, rng, hyp, border, segments=segs)
        img = self.albumentations(img, rng)
        img = augment_hsv(img, rng, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"])
        if rng.rand() < hyp["flipud"]:
            img = np.flipud(img)
            boxes[:, [1, 3]] = img.shape[0] - boxes[:, [3, 1]]
            segs[..., 1] = img.shape[0] - segs[..., 1]
        if rng.rand() < hyp["fliplr"]:
            img = np.fliplr(img)
            boxes[:, [0, 2]] = img.shape[1] - boxes[:, [2, 0]]
            segs[..., 0] = img.shape[1] - segs[..., 0]
        img = np.ascontiguousarray(img)

        mh = mw = self.imgsz // self.mask_ratio
        M = self.max_gt
        n = min(len(boxes), M)
        out_boxes = np.zeros((M, 4), np.float32)
        out_cls = np.zeros((M,), np.int32)
        mask = np.zeros((M,), bool)
        masks = np.zeros((M, mh, mw), np.uint8)
        r = 1.0 / self.mask_ratio
        for j in range(n):
            out_boxes[j] = boxes[j]
            out_cls[j] = cls[j]
            mask[j] = True
            cv2.fillPoly(masks[j], [(segs[j] * r).astype(np.int32)], 1)
        return {"img": img, "cls": out_cls, "bboxes": out_boxes, "mask": mask, "masks": masks}


class PoseTrainTransforms:
    """Full geometric pipeline for pose training: mosaic + affine on keypoints
    (reference augment.py:476 apply_keypoints), HSV, flips with the left/right
    flip_idx swap (augment.py:634-660)."""

    def __init__(self, imgsz: int = 640, hyp: Optional[Dict] = None, max_gt: int = 32,
                 kpt_shape: Tuple[int, int] = (17, 3), flip_idx: Optional[list] = None):
        self.imgsz = imgsz
        self.hyp = {**DEFAULT_HYP, **(hyp or {})}
        self.max_gt = max_gt
        self.kpt_shape = tuple(kpt_shape)
        if flip_idx is None:
            flip_idx = COCO_FLIP_IDX if self.kpt_shape[0] == 17 else list(range(self.kpt_shape[0]))
        self.flip_idx = list(flip_idx)
        self.mosaic_enabled = True
        self.albumentations = AlbumentationsBridge()

    def close_mosaic(self):
        self.mosaic_enabled = False

    def __call__(self, dataset, idx: int, rng: np.random.RandomState) -> Dict:
        hyp = self.hyp
        if self.mosaic_enabled and rng.rand() < hyp["mosaic"]:
            m = mosaic4(dataset, idx, rng, self.imgsz, kpt_shape=self.kpt_shape)
            img, boxes, cls, kpts = m["img"], m["bboxes_xyxy"], m["cls"], m["keypoints"]
            border = m["mosaic_border"]
        else:
            item = dataset.get_item_raw(idx)
            img, gain, pad = letterbox_image(item["img"], (self.imgsz, self.imgsz))
            h0, w0 = item["img"].shape[:2]
            boxes = xywhn_to_xyxy(item["bboxes"], w0 * gain, h0 * gain, pad[0], pad[1])
            kpts = item.get("keypoints")
            if kpts is None or kpts.size == 0:
                kpts = np.zeros((len(boxes),) + self.kpt_shape, np.float32)
            else:
                kpts = kpts.copy()
                kpts[..., 0] = kpts[..., 0] * w0 * gain + pad[0]
                kpts[..., 1] = kpts[..., 1] * h0 * gain + pad[1]
            cls = item["cls"]
            border = (0, 0)
        img = np.ascontiguousarray(img)
        img, boxes, cls, kpts = random_perspective(img, boxes, cls, rng, hyp, border, keypoints=kpts)
        img = self.albumentations(img, rng)
        img = augment_hsv(img, rng, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"])
        if rng.rand() < hyp["flipud"]:
            img = np.flipud(img)
            boxes[:, [1, 3]] = img.shape[0] - boxes[:, [3, 1]]
            kpts[..., 1] = img.shape[0] - kpts[..., 1]
        if rng.rand() < hyp["fliplr"]:
            img = np.fliplr(img)
            boxes[:, [0, 2]] = img.shape[1] - boxes[:, [2, 0]]
            kpts[..., 0] = img.shape[1] - kpts[..., 0]
            kpts = kpts[:, self.flip_idx]  # left/right keypoint identity swap
        img = np.ascontiguousarray(img)

        M = self.max_gt
        n = min(len(boxes), M)
        out_boxes = np.zeros((M, 4), np.float32)
        out_cls = np.zeros((M,), np.int32)
        mask = np.zeros((M,), bool)
        out_kpts = np.zeros((M,) + self.kpt_shape, np.float32)
        out_boxes[:n] = boxes[:n]
        out_cls[:n] = cls[:n]
        mask[:n] = True
        if len(kpts):
            out_kpts[:n] = kpts[:n]
        return {"img": img, "cls": out_cls, "bboxes": out_boxes, "mask": mask, "keypoints": out_kpts}


class OBBTrainTransforms:
    """Letterbox + HSV for oriented-box training: rboxes are in normalized
    units from the DOTA label parse; uniform scale + shift preserves angles."""

    def __init__(self, imgsz: int = 640, hyp: Optional[Dict] = None, max_gt: int = 32):
        self.imgsz = imgsz
        self.hyp = {**DEFAULT_HYP, **(hyp or {})}
        self.max_gt = max_gt
        self.mosaic_enabled = False

    def close_mosaic(self):
        self.mosaic_enabled = False

    def __call__(self, dataset, idx: int, rng: np.random.RandomState) -> Dict:
        item = dataset.get_item_raw(idx)
        img, gain, pad = letterbox_image(item["img"], (self.imgsz, self.imgsz))
        h0, w0 = item["img"].shape[:2]
        rb = item.get("rboxes", np.zeros((0, 5), np.float32)).copy()
        if len(rb):
            rb[:, 0] = rb[:, 0] * w0 * gain + pad[0]
            rb[:, 1] = rb[:, 1] * h0 * gain + pad[1]
            rb[:, 2] = rb[:, 2] * w0 * gain
            rb[:, 3] = rb[:, 3] * h0 * gain
        img = augment_hsv(np.ascontiguousarray(img), rng, self.hyp["hsv_h"], self.hyp["hsv_s"], self.hyp["hsv_v"])
        M = self.max_gt
        n = min(len(rb), M)
        out_rb = np.zeros((M, 5), np.float32)
        out_cls = np.zeros((M,), np.int32)
        mask = np.zeros((M,), bool)
        out_rb[:n] = rb[:n]
        out_cls[:n] = item["cls"][:n]
        mask[:n] = True
        return {"img": img, "cls": out_cls, "rboxes": out_rb, "mask": mask,
                "bboxes": np.zeros((M, 4), np.float32)}
