"""Pose / OBB / Classify task tests: builds, reference param parity, predict paths."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.nn import build_model

CFG = Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" / "models"

# measured from the torch reference (ex the frozen DFL conv)
PARAM_COUNTS = {
    "v8/yolov8-pose.yaml": 3_295_454,
    "v8/yolov8-obb.yaml": 3_228_851,
    "v8/yolov8-cls.yaml": 2_719_288,
}


@pytest.mark.parametrize("cfg", sorted(PARAM_COUNTS))
def test_param_counts(cfg):
    m = build_model(CFG / cfg)
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert n == PARAM_COUNTS[cfg]


def test_pose_outputs():
    m = build_model(CFG / "v8/yolov8-pose.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)), training=False)
    A = 64 + 16 + 4
    assert out["pred"].shape == (2, A, 5)  # nc=1
    assert out["kpt"].shape == (2, A, 51)
    # visibility channel is sigmoid-bounded
    kv = np.asarray(out["kpt"]).reshape(2, A, 17, 3)[..., 2]
    assert kv.min() >= 0 and kv.max() <= 1


def test_obb_outputs():
    m = build_model(CFG / "v8/yolov8-obb.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)), training=False)
    assert out["pred"].shape[-1] == 4 + 80 + 1  # rbox + cls + angle
    ang = np.asarray(out["angle"])
    assert ang.min() >= -np.pi / 4 - 1e-6 and ang.max() <= 3 * np.pi / 4 + 1e-6


def test_classify_predict():
    m = YOLO("yolov8-cls.yaml")
    assert m.task == "classify"
    img = (np.random.rand(120, 160, 3) * 255).astype(np.uint8)
    r = m.predict(img, imgsz=64)[0]
    assert r.probs is not None and r.probs.shape == (1000,)
    np.testing.assert_allclose(r.probs.sum(), 1.0, atol=1e-4)


def test_pose_predict():
    m = YOLO("yolov8-pose.yaml")
    assert m.task == "pose"
    img = (np.random.rand(120, 160, 3) * 255).astype(np.uint8)
    r = m.predict(img, imgsz=64, conf=1e-6)[0]
    if len(r):
        assert r.keypoints is not None
        assert r.keypoints.shape[1:] == (17, 3)
