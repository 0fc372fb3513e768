"""Segmentation task tests: graph build, param parity, mask ops, predict path."""

import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.nn import build_model
from lpc_yolo_tpu.ops.masks import crop_mask, process_mask

CFG = Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" / "models"


def test_seg_param_count():
    """torch SegmentationModel('yolov8-seg.yaml', scale n) has 3,409,952 params
    excluding the frozen DFL conv — measured from the reference."""
    m = build_model(CFG / "v8/yolov8-seg.yaml")
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert n == 3_409_952


def test_seg_forward_shapes():
    m = build_model(CFG / "v8/yolov8-seg.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out, _ = m.apply(v, jnp.zeros((2, 64, 64, 3)), training=True, mutable=["batch_stats"])
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert out["mc"].shape == (2, A, 32)
    assert out["proto"].shape == (2, 16, 16, 32)  # P3/4 resolution
    ev = m.apply(v, jnp.zeros((2, 64, 64, 3)), training=False)
    assert ev["pred"].shape == (2, A, 84)


def test_crop_mask():
    masks = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0], [0.0, 0.0, 8.0, 8.0]])
    out = np.asarray(crop_mask(masks, boxes))
    assert out[0].sum() == 16  # 4x4 window
    assert out[1].sum() == 64


def test_process_mask_shapes():
    protos = jnp.asarray(np.random.rand(16, 16, 32).astype(np.float32))
    coeffs = jnp.asarray(np.random.randn(5, 32).astype(np.float32))
    boxes = jnp.asarray(np.tile(np.array([8, 8, 40, 40], np.float32), (5, 1)))
    m = process_mask(protos, coeffs, boxes, (64, 64))
    assert m.shape == (5, 16, 16)
    mu = process_mask(protos, coeffs, boxes, (64, 64), upsample=True)
    assert mu.shape == (5, 64, 64)
    assert float(mu.min()) >= 0 and float(mu.max()) <= 1


def test_seg_training_step(tmp_path):
    """1-epoch seg training on synthetic polygon labels: loss finite, ckpts out."""
    from lpc_yolo_tpu.data import make_synthetic_dataset

    y = make_synthetic_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=96, nc=2, segments=True)
    m = YOLO(Path(__file__).resolve().parent / "assets" / "tiny-seg.yaml", nc=2)
    res = m.train(data=y, epochs=1, batch=2, imgsz=64, workers=0, max_gt=8,
                  close_mosaic=0, save_dir=str(tmp_path / "run"))
    csv_text = (tmp_path / "run" / "results.csv").read_text()
    assert "train/seg" in csv_text
    assert (tmp_path / "run" / "weights" / "last.ckpt").exists()


def test_polygon_label_parsing(tmp_path):
    from lpc_yolo_tpu.data import YOLODataset, make_synthetic_dataset, check_det_dataset

    y = make_synthetic_dataset(tmp_path / "ds", n_train=2, n_val=1, imgsz=96, nc=2, segments=True)
    info = check_det_dataset(y)
    ds = YOLODataset(info["train"], cache=False)
    item = ds.get_item_raw(0)
    assert len(item["segments"]) == len(item["cls"])
    assert all(len(s) == 4 for s in item["segments"])  # rectangle polygons
    # derived boxes bound the polygons
    for s, b in zip(item["segments"], item["bboxes"]):
        np.testing.assert_allclose(s[:, 0].min(), b[0] - b[2] / 2, atol=1e-5)


def test_seg_predict_end_to_end():
    m = YOLO("yolov8-seg.yaml")
    assert m.task == "segment"
    img = (np.random.rand(100, 160, 3) * 255).astype(np.uint8)
    r = m.predict(img, imgsz=96, conf=1e-6)[0]
    if len(r):  # random weights: detections may or may not clear even 1e-6
        assert r.masks is not None
        assert r.masks.shape[1:] == (100, 160)
        assert r.masks.dtype == bool


def test_seg_val_mask_map(tmp_path):
    """Validator on a segment model reports mask mAP keys ((M) suffix) next
    to box mAP — reference SegmentMetrics semantics."""
    from lpc_yolo_tpu.data import make_synthetic_dataset

    y = make_synthetic_dataset(tmp_path / "ds", n_train=2, n_val=2, imgsz=96, nc=2, segments=True)
    m = YOLO("yolov8-seg.yaml", nc=2)
    res = m.val(data=y, imgsz=96, batch=2, conf=0.001)
    assert "metrics/mAP50-95(B)" in res
    assert "metrics/mAP50-95(M)" in res and "metrics/mAP50(M)" in res
    assert np.isfinite(res["metrics/mAP50-95(M)"])
