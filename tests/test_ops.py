"""Unit + parity tests for the ops/math core.

Parity tests compare against the torch reference at /root/reference when
present (skipped otherwise) — they check numerics, not implementation.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from lpc_yolo_tpu.ops import (
    bbox_iou,
    box_iou,
    dfl_expectation,
    dist2bbox,
    bbox2dist,
    make_anchors,
    non_max_suppression,
    v10_postprocess,
    xywh2xyxy,
    xyxy2xywh,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "ultralytics"))


def _ref_ultralytics():
    """Import the torch reference package, stubbing deps absent from this env."""
    import types

    import torch

    class _DummyMeta(type):
        def __getattr__(cls, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return cls

    class _Dummy(torch.nn.Identity, metaclass=_DummyMeta):
        """Stands in for any imported class/function in unused reference blocks."""

        def __init__(self, *a, **k):
            super().__init__()

    class _AutoStub(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Dummy

    for missing in (
        "torchvision",
        "torchvision.ops",
        "torchvision.transforms",
        "timm",
        "timm.layers",
        "timm.layers.create_act",
        "timm.layers.norm",
        "timm.layers.create_conv2d",
        "timm.layers.helpers",
        "timm.layers.mlp",
    ):
        if missing not in sys.modules:
            sys.modules[missing] = _AutoStub(missing)
    sys.modules["torchvision"].__version__ = "0.15.0"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import ultralytics  # noqa

    return ultralytics


def test_box_roundtrip():
    x = np.random.rand(32, 4).astype(np.float32) * 100
    x[:, 2:] += 1.0
    out = np.asarray(xyxy2xywh(xywh2xyxy(jnp.asarray(x))))
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_box_iou_identity():
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], dtype=jnp.float32)
    m = np.asarray(box_iou(b, b))
    np.testing.assert_allclose(np.diag(m), [1.0, 1.0], atol=1e-5)
    assert 0.1 < m[0, 1] < 0.2  # 25/175


def test_make_anchors_shapes():
    pts, strides = make_anchors([(80, 80), (40, 40), (20, 20)], [8, 16, 32])
    assert pts.shape == (8400, 2)
    assert strides.shape == (8400, 1)
    # first anchor of P3 is (0.5, 0.5); first of P4 block is also (0.5, 0.5)
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(strides)[np.array([0, 6400, 8000])].ravel(), [8, 16, 32])


def test_dist2bbox_bbox2dist_roundtrip():
    pts = jnp.asarray(np.random.rand(100, 2).astype(np.float32) * 20 + 8)
    dist = jnp.asarray(np.random.rand(100, 4).astype(np.float32) * 5)
    box = dist2bbox(dist, pts, xywh=False)
    back = bbox2dist(pts, box, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-4)


def test_dfl_expectation_range():
    logits = jnp.asarray(np.random.randn(2, 100, 64).astype(np.float32))
    d = dfl_expectation(logits, reg_max=16)
    assert d.shape == (2, 100, 4)
    assert float(d.min()) >= 0.0 and float(d.max()) <= 15.0


def test_v10_postprocess_topk_semantics():
    B, A, nc = 2, 400, 8
    preds = np.random.rand(B, A, 4 + nc).astype(np.float32)
    boxes, scores, labels = v10_postprocess(jnp.asarray(preds), max_det=30, nc=nc)
    assert boxes.shape == (B, 30, 4) and scores.shape == (B, 30) and labels.shape == (B, 30)
    s = np.asarray(scores)
    assert (np.diff(s, axis=-1) <= 1e-6).all()  # sorted descending


def test_nms_suppresses_overlaps():
    # Two heavily overlapping boxes of the same class + one distinct.
    preds = np.zeros((1, 8, 4 + 3), dtype=np.float32)
    preds[0, 0, :4] = [50, 50, 20, 20]
    preds[0, 0, 4] = 0.9
    preds[0, 1, :4] = [51, 51, 20, 20]
    preds[0, 1, 4] = 0.8
    preds[0, 2, :4] = [200, 200, 20, 20]
    preds[0, 2, 5] = 0.7
    out = np.asarray(non_max_suppression(jnp.asarray(preds), conf_thres=0.25, iou_thres=0.45, max_det=10))
    valid = out[0][out[0, :, 4] > 0]
    assert len(valid) == 2
    np.testing.assert_allclose(valid[:, 4], [0.9, 0.7], atol=1e-5)
    assert valid[0, 5] == 0 and valid[1, 5] == 1


def test_nms_class_offset_keeps_different_classes():
    preds = np.zeros((1, 4, 4 + 2), dtype=np.float32)
    preds[0, 0, :4] = [50, 50, 20, 20]
    preds[0, 0, 4] = 0.9  # class 0
    preds[0, 1, :4] = [50, 50, 20, 20]
    preds[0, 1, 5] = 0.8  # same box, class 1
    out = np.asarray(non_max_suppression(jnp.asarray(preds), max_det=10))
    valid = out[0][out[0, :, 4] > 0]
    assert len(valid) == 2
    out_ag = np.asarray(non_max_suppression(jnp.asarray(preds), max_det=10, agnostic=True))
    valid_ag = out_ag[0][out_ag[0, :, 4] > 0]
    assert len(valid_ag) == 1


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_ciou_parity_vs_reference():
    import torch

    _ref_ultralytics()
    from ultralytics.utils.metrics import bbox_iou as t_bbox_iou

    b1 = np.random.rand(64, 4).astype(np.float32) * 100
    b2 = np.random.rand(64, 4).astype(np.float32) * 100
    b1[:, 2:] += 5
    b2[:, 2:] += 5
    ours = np.asarray(bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=False, CIoU=True))
    ref = t_bbox_iou(torch.tensor(b1), torch.tensor(b2), xywh=False, CIoU=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_v10_postprocess_parity_vs_reference():
    import torch

    _ref_ultralytics()
    from ultralytics.utils.ops import v10postprocess as t_v10

    B, A, nc, md = 2, 512, 80, 300
    preds = np.random.rand(B, A, 4 + nc).astype(np.float32)
    boxes, scores, labels = v10_postprocess(jnp.asarray(preds), max_det=md, nc=nc)
    tb, ts, tl = t_v10(torch.tensor(preds), md, nc)
    np.testing.assert_allclose(np.asarray(scores), ts.numpy(), atol=1e-6)
    # top_k tie-breaking differs between torch and XLA on exactly-equal scores:
    # compare rows order-insensitively via a lexicographic sort per image.
    for b in range(B):
        ours = np.concatenate(
            [np.asarray(scores)[b, :, None], np.asarray(labels)[b, :, None], np.asarray(boxes)[b]], axis=-1
        )
        ref = np.concatenate([ts[b, :, None].numpy(), tl[b, :, None].numpy(), tb[b].numpy()], axis=-1)
        ours = ours[np.lexsort(ours.T[::-1])]
        ref = ref[np.lexsort(ref.T[::-1])]
        np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not present")
def test_conversion_ops_parity_vs_reference():
    """ltwh/xywh/coords/segment/rbox utility ops match the reference numerics
    (utils/ops.py:382-576)."""
    import torch

    _ref_ultralytics()
    from ultralytics.utils import ops as rops

    from lpc_yolo_tpu.ops.boxes import (
        clip_coords,
        ltwh2xywh,
        regularize_rboxes,
        scale_coords,
        segment2box,
        xywh2ltwh,
        xywhr2xyxyxyxy,
        xyxyxyxy2xywhr,
    )

    rng = np.random.RandomState(0)
    ltwh = (rng.rand(16, 4) * 100).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ltwh2xywh(jnp.asarray(ltwh))),
        rops.ltwh2xywh(torch.from_numpy(ltwh)).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(xywh2ltwh(jnp.asarray(ltwh))),
        rops.xywh2ltwh(torch.from_numpy(ltwh)).numpy(), atol=1e-5)

    pts = (rng.rand(8, 17, 3) * 800 - 50).astype(np.float32)
    ours = np.asarray(clip_coords(jnp.asarray(pts.copy()), (480, 640)))
    theirs = rops.clip_coords(torch.from_numpy(pts.copy()), (480, 640)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    k = (rng.rand(8, 17, 2) * 600).astype(np.float32)
    ours = np.asarray(scale_coords((640, 640), jnp.asarray(k.copy()), (480, 608)))
    theirs = rops.scale_coords((640, 640), torch.from_numpy(k.copy()), (480, 608)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3)

    seg = (rng.rand(40, 2) * 800 - 40).astype(np.float32)
    np.testing.assert_allclose(segment2box(seg, 640, 640),
                               rops.segment2box(seg.copy(), 640, 640), atol=1e-5)

    rb = np.concatenate([rng.rand(32, 2) * 100 + 50, rng.rand(32, 2) * 40 + 5,
                         rng.rand(32, 1) * np.pi], -1).astype(np.float32)
    ours = np.asarray(regularize_rboxes(jnp.asarray(rb)))
    theirs = rops.regularize_rboxes(torch.from_numpy(rb)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # corners <-> rbox round-trip through OUR corner expansion: the recovered
    # canonical rbox must describe the same rectangle as regularize(original)
    reg = np.asarray(regularize_rboxes(jnp.asarray(rb)))
    rec = np.asarray(xyxyxyxy2xywhr(xywhr2xyxyxyxy(jnp.asarray(rb))))
    np.testing.assert_allclose(rec[:, :2], reg[:, :2], atol=1e-3)
    np.testing.assert_allclose(np.sort(rec[:, 2:4]), np.sort(reg[:, 2:4]), atol=1e-3)


def test_mask_scale_ops():
    """masks2segments/scale_image/scale_masks behavior (utils/ops.py:630-722)."""
    import cv2  # noqa: F401  (masks2segments needs cv2)

    from lpc_yolo_tpu.ops.masks import masks2segments, scale_image, scale_masks

    m = np.zeros((2, 64, 64), np.float32)
    m[0, 10:20, 10:30] = 1
    m[1, 40:60, 5:15] = 1
    segs = masks2segments(m)
    assert len(segs) == 2 and segs[0].shape[1] == 2
    assert segs[0][:, 0].min() >= 9 and segs[0][:, 0].max() <= 30

    # letterboxed 64x64 -> original 32x64 frame (pad 16 top/bottom)
    im = np.zeros((64, 64, 3), np.float32)
    im[16:48] = 1.0
    out = scale_image(im, (32, 64))
    assert out.shape == (32, 64, 3) and out.min() > 0.9

    sm = scale_masks(jnp.asarray(m[None])[0][None] if False else jnp.asarray(m), (32, 64))
    assert sm.shape == (2, 32, 64)
