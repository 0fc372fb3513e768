"""v9 (GELAN/CBLinear-CBFuse) and YOLO-World build/forward/param-parity tests.

Param counts below were measured from the torch reference models built from
the same YAMLs (ex-DFL, per the porting convention: the rebuild decodes DFL
analytically so the frozen 16-param arange conv does not exist here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu import YOLO, YOLOWorld
from lpc_yolo_tpu.nn import build_model

CFG = "lpc_yolo_tpu/cfg/models"

REF_PARAMS = {
    f"{CFG}/v9/yolov9c.yaml": 25_590_896,
    f"{CFG}/v9/yolov9e.yaml": 58_206_576,
}


def _n_params(model):
    v = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True))
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v["params"]))


@pytest.mark.parametrize("cfg", list(REF_PARAMS))
def test_v9_param_parity(cfg):
    assert _n_params(build_model(cfg)) == REF_PARAMS[cfg]


def test_world_param_parity():
    import yaml

    d = yaml.safe_load(open(f"{CFG}/v8/yolov8-world.yaml"))
    d["scale"] = "n"
    assert _n_params(build_model(d)) == 4_204_095


def test_v9c_forward():
    m = build_model(f"{CFG}/v9/yolov9c.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = jax.jit(lambda v, x: m.apply(v, x, training=False, predict_only=True)["pred"])(
        v, jnp.zeros((1, 64, 64, 3))
    )
    assert out.shape == (1, 84, 4 + 3)  # 64/8^2 + 64/16^2 + 64/32^2 anchors
    assert np.isfinite(np.asarray(out)).all()


def test_v9e_cblinear_cbfuse_routing():
    """Full yolov9e graph compiles (channel inference + CBLinear/CBFuse
    routing) via eval_shape — no XLA compile of the huge graph — and a small
    CBLinear->CBFuse pair runs numerically."""
    m = build_model(f"{CFG}/v9/yolov9e.yaml", nc=2)
    assert {"RepNCSPELAN4", "ADown", "CBLinear", "CBFuse"} <= {s.module for s in m.specs}
    out_shape = jax.eval_shape(
        lambda x: m.apply(
            m.init(jax.random.PRNGKey(0), x, training=True), x,
            training=False, predict_only=True,
        )["pred"],
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32),
    )
    assert out_shape.shape == (1, 84, 4 + 2)

    # numeric routing on a small graph: CBLinear splits, CBFuse resizes+sums
    tiny = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [32, 3, 2]],          # 0
            [-1, 1, "CBLinear", [[16, 32]]],      # 1: split into 16+32 ch
            [0, 1, "Conv", [16, 3, 2]],           # 2
            [[1, -1], 1, "CBFuse", [[0]]],        # 3: fuse CBLinear branch 0
            [-1, 1, "Conv", [32, 3, 2]],          # 4
        ],
        "head": [[[4], 1, "Detect", ["nc"]]],
    }
    tm = build_model(tiny)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = tm.init(jax.random.PRNGKey(0), x, training=True)
    out = tm.apply(v, x, training=False, predict_only=True)["pred"]
    assert np.isfinite(np.asarray(out)).all()


def test_world_predict_set_classes(tmp_path):
    import cv2

    img = np.full((96, 128, 3), 127, np.uint8)
    cv2.rectangle(img, (30, 30), (90, 70), (250, 250, 250), -1)
    p = tmp_path / "im.jpg"
    cv2.imwrite(str(p), img)

    y = YOLOWorld("yolov8n-world.yaml", nc=4)
    y.set_classes(["person", "bus"])
    assert y.txt_feats.shape == (1, 2, 512)
    res = y.predict(str(p), imgsz=64, conf=0.0)
    r = res[0]
    assert r.boxes is not None
    # open-vocab: class ids live in the 2-name space
    cls = np.asarray(r.boxes.cls)
    assert ((cls >= 0) & (cls < 2)).all()


def test_world_text_changes_scores():
    """Different text embeddings must change the contrastive logits."""
    import yaml

    d = yaml.safe_load(open(f"{CFG}/v8/yolov8-world.yaml"))
    d["scale"] = "n"
    m = build_model(d, nc=4)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, training=True)
    t1 = jnp.asarray(np.random.RandomState(1).randn(1, 3, 512), jnp.float32)
    t2 = jnp.asarray(np.random.RandomState(2).randn(1, 3, 512), jnp.float32)
    f = jax.jit(lambda v, x, t: m.apply(v, x, training=False, predict_only=True, text=t)["pred"])
    p1, p2 = f(v, x, t1), f(v, x, t2)
    assert p1.shape == (1, 84, 4 + 3)
    assert not np.allclose(np.asarray(p1[..., 4:]), np.asarray(p2[..., 4:]))
    # box branch is text-independent only through C2fAttn guides — scores must differ
    assert np.isfinite(np.asarray(p1)).all() and np.isfinite(np.asarray(p2)).all()
