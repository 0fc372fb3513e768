"""Full model-YAML zoo sweep + torch param parity for the round-3 additions.

Mirrors the reference's test_all_model_yamls (tests/test_python.py:280): every
YAML shipped under lpc_yolo_tpu/cfg/models must compile through the graph
compiler, init, and produce a decoded forward — all via jax.eval_shape (zero
FLOPs), so the whole ~36-config sweep runs in seconds.

Param counts were measured from the torch reference models built from the
same YAMLs (nn/tasks.py DetectionModel et al.); Detect-family counts exclude
the frozen 16-param DFL arange conv, which this framework decodes
analytically (ops/anchors.dfl_expectation).
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.nn import build_model

CFG = Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" / "models"
ALL_YAMLS = sorted(CFG.glob("*/*.yaml"))

# torch reference totals; DFL-16 applies to Detect/Segment/Pose heads
TORCH_COUNTS = {
    "rt-detr/rtdetr-l.yaml": (32_970_476, 0),
    "rt-detr/rtdetr-x.yaml": (67_467_852, 0),
    "rt-detr/rtdetr-resnet50.yaml": (42_925_132, 0),
    "rt-detr/rtdetr-resnet101.yaml": (61_917_260, 0),
    "v8/yolov8-cls-resnet50.yaml": (27_413_032, 0),
    "v8/yolov8-cls-resnet101.yaml": (46_405_160, 0),
    "v3/yolov3.yaml": (103_754_144, 16),
    "v3/yolov3-spp.yaml": (104_803_744, 16),
    "v3/yolov3-tiny.yaml": (12_173_248, 16),
    "v5/yolov5.yaml": (2_654_816, 16),
    "v5/yolov5-p6.yaml": (4_334_896, 16),
    "v6/yolov6.yaml": (4_500_080, 16),
    "v8/yolov8-p2.yaml": (3_354_144, 16),
    "v8/yolov8-p6.yaml": (4_984_352, 16),
    "v8/yolov8-ghost.yaml": (1_865_316, 16),
    "v8/yolov8-ghost-p2.yaml": (2_033_944, 16),
    "v8/yolov8-ghost-p6.yaml": (2_901_100, 16),
    "v8/yolov8-seg-p6.yaml": (5_302_816, 16),
    "v8/yolov8-pose-p6.yaml": (5_182_152, 16),
    "v8/yolov8-worldv2.yaml": (3_695_183, 16),
}


def _count(model, imgsz=128):
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), training=True)
    )
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))


def test_zoo_is_complete():
    """The repo must ship at least as many model configs as it tests here."""
    assert len(ALL_YAMLS) >= 36, [p.name for p in ALL_YAMLS]


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_yaml_builds_and_forwards(path):
    """Every shipped YAML compiles, inits, and decodes (eval_shape only)."""
    m = build_model(path)
    imgsz = 128

    def run():
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), training=True)
        return m.apply(v, jnp.zeros((2, imgsz, imgsz, 3)), training=False)

    out = jax.eval_shape(run)
    assert isinstance(out, dict) and out, path.name
    if "pred" in out:
        assert out["pred"].shape[0] == 2
        assert out["pred"].ndim == 3


@pytest.mark.parametrize("cfg", sorted(TORCH_COUNTS), ids=lambda c: c.replace("/", "_"))
def test_param_parity_vs_torch(cfg):
    torch_n, dfl = TORCH_COUNTS[cfg]
    n = _count(build_model(CFG / cfg))
    assert n == torch_n - dfl, f"{cfg}: ours {n} vs torch {torch_n} (dfl {dfl})"


def test_four_level_head_runs():
    """P2/P6 graphs decode over 4 stride levels end-to-end (real forward)."""
    m = build_model(CFG / "v8/yolov8-p2.yaml")
    assert m.strides == (4.0, 8.0, 16.0, 32.0)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)), training=False)
    A = 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2
    assert out["pred"].shape == (1, A, 84)


def test_v6_activation_override():
    """yolov6's `activation: nn.ReLU()` key rebinds the conv.py-family default
    act (reference tasks.py Conv.default_act): outputs of a silu build and the
    relu build must differ, and the relu build has no negative activations in
    the stem output."""
    import yaml as _yaml

    d = _yaml.safe_load((CFG / "v6/yolov6.yaml").read_text())
    m_relu = build_model(CFG / "v6/yolov6.yaml")
    assert m_relu.default_act == "relu"
    d.pop("activation")
    m_silu = build_model(d)
    assert m_silu.default_act == "silu"
    # assert the RESOLVED activation during each forward: numeric output
    # comparison is blind here because v6's long plain-conv chains at
    # identity-BN random init push pre-activations outside the range where
    # silu and relu differ in f32
    from lpc_yolo_tpu.nn import modules as M

    v = m_relu.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    orig, seen = M.apply_act, []
    M.apply_act = lambda t, act: (seen.append((act, M.DEFAULT_ACT.get())), orig(t, act))[1]
    try:
        m_relu.apply(v, x, training=False)
        relu_resolutions = {d for a, d in seen if a == "silu"}
        seen.clear()
        m_silu.apply(v, x, training=False)
        silu_resolutions = {d for a, d in seen if a == "silu"}
    finally:
        M.apply_act = orig
    assert relu_resolutions == {"relu"}, relu_resolutions
    assert silu_resolutions == {"silu"}, silu_resolutions


def test_rtdetr_l_real_forward():
    """rtdetr-l (HGStem/HGBlock/AIFI/RepC3 backbone) runs a real forward.

    128px gives 336 anchors so the decoder keeps its full 300 queries (at
    64px the query count clamps to the 84 available anchors)."""
    m = build_model(CFG / "rt-detr/rtdetr-l.yaml")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), training=True)
    out = m.apply(v, jnp.zeros((1, 128, 128, 3)), training=False)
    assert out["pred"].shape == (1, 300, 84)
