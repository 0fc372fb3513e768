"""Geometric-augmentation label correctness for segments and keypoints.

Mirrors the reference's apply_segments/apply_keypoints semantics
(reference data/augment.py:447,476,634-660): polygons and keypoints must ride
through mosaic/affine/flip exactly like the image pixels do.
"""

import numpy as np
import pytest

from lpc_yolo_tpu.data.augment import (
    COCO_FLIP_IDX,
    DEFAULT_HYP,
    PoseTrainTransforms,
    SegTrainTransforms,
    random_perspective,
    resample_segments,
    segments2boxes_px,
)

IDENTITY_HYP = {
    **DEFAULT_HYP,
    "degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0, "perspective": 0.0,
    "flipud": 0.0, "fliplr": 0.0, "mosaic": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
}


class FakeDS:
    def __init__(self, item, n=1):
        self.item, self.n = item, n

    def __len__(self):
        return self.n

    def get_item_raw(self, i):
        out = {}
        for k, v in self.item.items():
            if isinstance(v, np.ndarray):
                out[k] = v.copy()
            elif isinstance(v, list):
                out[k] = [x.copy() for x in v]
            else:
                out[k] = v
        return out


def _square_item(imgsz=128, kpts=False):
    img = np.full((imgsz, imgsz, 3), 200, np.uint8)
    # one axis-aligned square occupying the center quarter, normalized labels
    box = np.array([[0.5, 0.5, 0.25, 0.25]], np.float32)  # xywh
    poly = np.array([[0.375, 0.375], [0.625, 0.375], [0.625, 0.625], [0.375, 0.625]], np.float32)
    item = {"img": img, "cls": np.array([1], np.int32), "bboxes": box, "segments": [poly], "path": "fake.jpg"}
    if kpts:
        k = np.zeros((1, 17, 3), np.float32)
        k[0, :, 0] = np.linspace(0.4, 0.6, 17)
        k[0, :, 1] = np.linspace(0.4, 0.6, 17)[::-1]
        k[0, :, 2] = 2.0
        item["keypoints"] = k
    return item


def test_affine_transforms_segments_and_keypoints_identically():
    """Corner keypoints placed on polygon vertices must land exactly where the
    warped polygon vertices land, for a non-trivial affine."""
    rng_img = np.random.RandomState(3)
    img = rng_img.randint(0, 255, (160, 160, 3), np.uint8)
    poly = np.array([[40.0, 40.0], [120.0, 40.0], [120.0, 120.0], [40.0, 120.0]], np.float32)
    segs = resample_segments([poly], 200)  # (1, 200, 2)
    kpts = np.concatenate([poly, np.full((4, 1), 2.0, np.float32)], axis=1)[None]  # (1, 4, 3)
    boxes = np.array([[40.0, 40.0, 120.0, 120.0]], np.float32)
    cls = np.array([0], np.int32)
    hyp = {**IDENTITY_HYP, "degrees": 25.0, "scale": 0.3, "translate": 0.05, "shear": 4.0}

    _, b1, _, s1 = random_perspective(img.copy(), boxes.copy(), cls.copy(), np.random.RandomState(7), hyp, (0, 0), segments=segs.copy())
    _, b2, _, k2 = random_perspective(img.copy(), boxes.copy(), cls.copy(), np.random.RandomState(7), hyp, (0, 0), keypoints=kpts.copy())
    assert len(b1) == 1 and len(b2) == 1
    # polygon corner points (resampled contour starts at vertex 0)
    visible = k2[0][k2[0, :, 2] > 0]
    for corner in visible[:, :2]:
        d = np.linalg.norm(s1[0] - corner, axis=1).min()
        assert d < 1.5, f"kpt-vs-segment disagreement {d}"
    # box derived from segments must tightly cover the kpts
    assert (visible[:, 0] >= b1[0, 0] - 1).all() and (visible[:, 0] <= b1[0, 2] + 1).all()


def test_segments2boxes_px_clips_and_zeroes():
    segs = np.array(
        [[[-10, -10], [50, 20], [30, 60]], [[-5, -5], [-9, -4], [-2, -8]]], np.float32
    )
    boxes = segments2boxes_px(segs, 100, 100)
    np.testing.assert_allclose(boxes[0], [30, 20, 50, 60])
    np.testing.assert_allclose(boxes[1], 0)


def test_seg_identity_pipeline_rasterizes_in_place():
    t = SegTrainTransforms(imgsz=128, hyp=IDENTITY_HYP, max_gt=8)
    t.close_mosaic()
    out = t(FakeDS(_square_item()), 0, np.random.RandomState(0))
    assert out["mask"][0] and not out["mask"][1:].any()
    np.testing.assert_allclose(out["bboxes"][0], [48, 48, 80, 80], atol=1.5)
    m = out["masks"][0]
    ys, xs = np.nonzero(m)
    # mask occupies the box footprint at ratio 4
    assert abs(xs.min() - 12) <= 1 and abs(xs.max() - 19) <= 1
    assert abs(ys.min() - 12) <= 1 and abs(ys.max() - 19) <= 1


def test_seg_mosaic_affine_mask_matches_box():
    hyp = {**DEFAULT_HYP, "mosaic": 1.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0}
    t = SegTrainTransforms(imgsz=96, hyp=hyp, max_gt=16)
    out = t(FakeDS(_square_item(), n=4), 0, np.random.RandomState(1))
    n = int(out["mask"].sum())
    assert n >= 1
    r = 4
    for j in range(n):
        ys, xs = np.nonzero(out["masks"][j])
        if len(xs) == 0:
            continue
        x1, y1, x2, y2 = out["bboxes"][j] / r
        # rasterized mask stays inside (and roughly fills) its box
        assert xs.min() >= np.floor(x1) - 1 and xs.max() <= np.ceil(x2) + 1
        assert ys.min() >= np.floor(y1) - 1 and ys.max() <= np.ceil(y2) + 1


def test_pose_fliplr_swaps_flip_idx_and_mirrors_x():
    hyp = {**IDENTITY_HYP, "fliplr": 1.0}
    t = PoseTrainTransforms(imgsz=128, hyp=hyp, max_gt=4, kpt_shape=(17, 3))
    out = t(FakeDS(_square_item(kpts=True)), 0, np.random.RandomState(0))
    assert out["mask"][0]
    # identity (no flip) reference run
    t2 = PoseTrainTransforms(imgsz=128, hyp=IDENTITY_HYP, max_gt=4, kpt_shape=(17, 3))
    ref = t2(FakeDS(_square_item(kpts=True)), 0, np.random.RandomState(0))
    k_f, k_r = out["keypoints"][0], ref["keypoints"][0]
    for i, j in enumerate(COCO_FLIP_IDX):
        np.testing.assert_allclose(k_f[i, 0], 128 - k_r[j, 0], atol=1e-3)
        np.testing.assert_allclose(k_f[i, 1], k_r[j, 1], atol=1e-3)


def test_pose_mosaic_affine_keypoints_inside_boxes():
    hyp = {**DEFAULT_HYP, "mosaic": 1.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0}
    t = PoseTrainTransforms(imgsz=96, hyp=hyp, max_gt=16, kpt_shape=(17, 3))
    out = t(FakeDS(_square_item(kpts=True), n=4), 0, np.random.RandomState(2))
    n = int(out["mask"].sum())
    assert n >= 1
    for j in range(n):
        k = out["keypoints"][j]
        vis = k[k[:, 2] > 0]
        if len(vis) == 0:
            continue
        x1, y1, x2, y2 = out["bboxes"][j]
        # kpts were on the square's diagonal; after a shared warp they stay in the box
        assert (vis[:, 0] >= x1 - 2).all() and (vis[:, 0] <= x2 + 2).all()
        assert (vis[:, 1] >= y1 - 2).all() and (vis[:, 1] <= y2 + 2).all()


@pytest.mark.parametrize("flip", ["flipud", "fliplr"])
def test_seg_flip_mirrors_mask(flip):
    hyp = {**IDENTITY_HYP, flip: 1.0}
    t = SegTrainTransforms(imgsz=128, hyp=hyp, max_gt=8)
    t.close_mosaic()
    item = _square_item()
    item["segments"] = [np.array([[0.25, 0.25], [0.5, 0.25], [0.5, 0.5], [0.25, 0.5]], np.float32)]
    item["bboxes"] = np.array([[0.375, 0.375, 0.25, 0.25]], np.float32)
    out = t(FakeDS(item), 0, np.random.RandomState(0))
    ys, xs = np.nonzero(out["masks"][0])
    if flip == "fliplr":
        assert xs.mean() > 16 and ys.mean() < 16  # x mirrored about 16 (=128/4/2)
    else:
        assert xs.mean() < 16 and ys.mean() > 16
