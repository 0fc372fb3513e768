"""Model-graph tests: YAML compile, param-count parity, forward shapes, and
(when the reference is mounted) full-forward numerical parity.

Expected parameter counts were measured from the reference torch models
(tasks.py DetectionModel/YOLOv10DetectionModel), excluding the frozen DFL
arange conv (16 params) which this framework decodes analytically.
"""

import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.nn import build_model

CFG = Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" / "models"
REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "ultralytics"))

# (config path, expected param count from torch reference)
PARAM_COUNTS = {
    "v10/yolov10n.yaml": 2_775_504,
    "v10/yolov10s.yaml": 8_128_256,
    "v10/yolov10m.yaml": 16_576_752,
    "v10/yolov10b.yaml": 20_574_368,
    "v10/yolov10l.yaml": 25_888_672,
    "v10/yolov10x.yaml": 31_808_944,
    "v10/yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml": 3_968_338,
    "v8/yolov8.yaml": 3_157_184,
}


def _n_params(variables):
    return sum(x.size for x in jax.tree.leaves(variables["params"]))


@pytest.mark.parametrize("cfg", sorted(PARAM_COUNTS))
def test_build_and_param_count(cfg):
    m = build_model(CFG / cfg)
    assert m.strides == (8.0, 16.0, 32.0)
    # Count via eval_shape: no FLOPs, no memory.
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert n == PARAM_COUNTS[cfg], f"{cfg}: {n} != {PARAM_COUNTS[cfg]}"


@pytest.mark.parametrize("cfg", ["v10/yolov10n.yaml", "v10/yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml"])
def test_forward_shapes(cfg):
    m = build_model(CFG / cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = jnp.zeros((2, 64, 64, 3))
    out = m.apply(v, x, training=False)
    A = (8 * 8 + 4 * 4 + 2 * 2)
    assert out["pred"].shape == (2, A, 84)
    train_out, _ = m.apply(v, x, training=True, mutable=["batch_stats"])
    assert set(train_out) == {"one2many", "one2one"}
    assert train_out["one2many"][0].shape == (2, 8, 8, 144)
    po = m.apply(v, x, training=False, predict_only=True)
    assert set(po) == {"det"}
    assert po["det"].shape == (2, 300, 6)


def test_fused_decode_matches_full_decode():
    """decode_feats_topk (top-k before DFL/sigmoid) must equal the full decode
    + v10 top-k pipeline row-for-row (sigmoid monotonicity argument).

    The claim is head-level, so a 4-layer graph with a v10Detect head stands
    in for the full model (the full-model compile dominated suite time)."""
    from lpc_yolo_tpu.nn.heads import decode_feats, decode_feats_topk
    from lpc_yolo_tpu.ops import v10_detections

    tiny = {
        "nc": 80,
        "backbone": [
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "Conv", [256, 3, 2]],
        ],
        "head": [[[0, 1, 2], 1, "v10Detect", ["nc"]]],
    }
    m = build_model(tiny)
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), training=True)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 96, 96, 3).astype(np.float32))
    out, _ = m.apply(v, x, training=True, mutable=["batch_stats"])
    feats = out["one2one"]
    full = v10_detections(decode_feats(feats, m.strides, m.nc), 300, m.nc)
    fused = decode_feats_topk(feats, m.strides, m.nc, max_det=300)
    # identical score ordering; compare row sets after lexsort (ties may permute)
    a, b = np.asarray(full), np.asarray(fused)
    # the end-to-end serving path (split head + packed box tower + split
    # decode) must agree with the full decode of the same inference-mode
    # forward (training-mode feats differ: batch vs running BN stats)
    po = m.apply(v, x, training=False)
    full_inf = np.asarray(v10_detections(po["pred"], 300, m.nc))
    served = np.asarray(m.apply(v, x, training=False, predict_only=True)["det"])
    for i in range(full_inf.shape[0]):
        sa = full_inf[i][np.lexsort(full_inf[i].T[::-1])]
        sc = served[i][np.lexsort(served[i].T[::-1])]
        np.testing.assert_allclose(sa, sc, atol=0.1)
    np.testing.assert_allclose(a[..., 4], b[..., 4], atol=1e-6)  # scores identical
    for i in range(a.shape[0]):
        sa = a[i][np.lexsort(a[i].T[::-1])]
        sb = b[i][np.lexsort(b[i].T[::-1])]
        np.testing.assert_allclose(sa, sb, atol=1e-4)


def test_topk_helper_exact():
    """heads._topk (approx_max_k at recall 1.0) must return the exact top-k.

    The serving decode swapped lax.top_k for the PartialReduce lowering
    (several times faster on TPU for wide inputs); this pins value-exactness
    and index-set equality against lax.top_k on the decode's real shapes."""
    from lpc_yolo_tpu.nn.heads import _topk

    for shape, k, seed in (((32, 8400), 300, 0), ((32, 24000), 300, 1), ((2, 500), 300, 2)):
        x = jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))
        ev, ei = jax.lax.top_k(x, min(k, shape[-1]))
        av, ai = _topk(x, min(k, shape[-1]))
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(av))
        # ties may permute between implementations; compare index sets
        assert all(
            set(np.asarray(ei)[b]) == set(np.asarray(ai)[b]) for b in range(shape[0])
        )


def test_fuse_conv_bn_exact():
    """BN fold must be numerically exact at inference (fuse semantics)."""
    from lpc_yolo_tpu.nn.fuse import fuse_conv_bn

    m = build_model(CFG / "v10/yolov10n.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    _, mut = m.apply(v, x, training=True, mutable=["batch_stats"])  # non-trivial stats
    v = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    a = m.apply(v, x, training=False, predict_only=True)["det"]
    b = m.apply(fuse_conv_bn(v), x, training=False, predict_only=True)["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_nc_override():
    m = build_model(CFG / "v10/yolov10n.yaml", nc=7)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)), training=False)
    assert out["pred"].shape[-1] == 4 + 7


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
@pytest.mark.parametrize("name", ["yolov10n", "yolov10-SPD-Conv-Tiny-CBAM-LPC"])
def test_forward_parity_vs_reference(name):
    """Port reference random-init weights, compare decoded output on random input."""
    from test_ops import _ref_ultralytics

    _ref_ultralytics()
    import torch
    from ultralytics.nn.tasks import YOLOv10DetectionModel

    from lpc_yolo_tpu.utils.torch_port import port_state_dict

    ours = f"v10/{name}.yaml"
    tm = YOLOv10DetectionModel(f"{REF}/ultralytics/cfg/models/v10/{name}.yaml", verbose=False)
    tm.eval()
    m = build_model(CFG / ours)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    v2 = port_state_dict(tm.state_dict(), v)

    x = np.random.RandomState(0).rand(1, 3, 160, 160).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.tensor(x))
    t_pred = tout["one2one"][0].numpy().transpose(0, 2, 1)  # (1, A, 84)
    j_pred = np.asarray(m.apply(v2, jnp.asarray(x.transpose(0, 2, 3, 1)), training=False)["pred"])
    np.testing.assert_allclose(j_pred, t_pred, atol=2e-3)
