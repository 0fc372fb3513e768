"""Research block zoo: every family builds through the YAML compiler and runs.

Mirrors the reference's surface at nn/modules/block.py:843-5724 + the
parse rules at nn/tasks.py:880-1045: backbone stages (Swin, VanillaNet,
ConvNeXt, MobileNetV3, StarNet, ShuffleNetV2, EfficientNet-Lite, FasterNet,
MobileNeXt, GhostNet, PP-LCNet), the attention-module zoo, and neck blocks
(RFB, DySample, ASFF, MSBlock, SlimNeck GSConv, PPA, SCSA, FGFP, Axial).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpc_yolo_tpu.nn import build_model
from lpc_yolo_tpu.nn import research as R


def _head(start: int):
    """Minimal single-scale Detect head reading from layer `start`."""
    return [[start, 1, "Detect", ["nc"]]]


def _build_and_run(backbone, ch_img=3, size=64, nc=4):
    cfg = {
        "nc": nc,
        "backbone": backbone,
        "head": _head(len(backbone) - 1),
    }
    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, size, size, ch_img), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=True)
    out = model.apply(variables, x, training=False, predict_only=True)
    assert "pred" in out and np.isfinite(np.asarray(out["pred"], np.float32)).all()
    return out


# --- backbone families ------------------------------------------------------


def test_swin_family():
    _build_and_run([
        [-1, 1, "PatchEmbed", [32, 4]],
        [-1, 1, "SwinStage", [32, 2, 4, 4]],   # dim, depth, heads, window
        [-1, 1, "PatchMerging", [64]],
        [-1, 1, "SwinStage", [64, 2, 4, 4]],
    ])


def test_vanilla_convnext_star():
    _build_and_run([
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "VanillaBlock", [32, 3, 2]],
        [-1, 1, "ConvNeXt_Downsample", [48, 2, 2]],
        [-1, 2, "ConvNeXt_Block", [48]],
        [-1, 2, "StarBlock", [3]],
    ])


def test_mobile_families():
    _build_and_run([
        [-1, 1, "Conv_BN_HSwish", [16, 2]],
        [-1, 1, "MobileNetV3_InvertedResidual", [16, 16, 3, 2, 1, 0]],
        [-1, 1, "MobileNetV3_BLOCK", [24, 3, 32, "None", "RE", 2]],
        [-1, 1, "SGBlock", [24, 1, 6]],
        [-1, 1, "DepthSepConv", [32, 3, 2, 1]],
        [-1, 1, "G_bneck", [32, 16, 3, 1]],
    ])


def test_shufflenet_efficientnet_fasternet():
    _build_and_run([
        [-1, 1, "CBRM", [16]],
        [-1, 1, "Shuffle_Block", [32, 2]],
        [-1, 1, "Shuffle_Block", [32, 1]],
        [-1, 1, "stem", [16]],
        [-1, 1, "MBConvBlock", [16, 3, 1, 1, 0.0]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "BasicStage", [2]],
    ])


def test_fasternet_patches():
    _build_and_run([
        [-1, 1, "PatchEmbed_FasterNet", [32, 4, 4]],
        [-1, 1, "BasicStage", [1]],
        [-1, 1, "PatchMerging_FasterNet", [64, 2, 2]],
    ])


# --- attention zoo ----------------------------------------------------------

ATTNS = [
    ("SE", [16]),
    ("ECA", []),
    ("CoordAtt", [32]),
    ("SimAM", []),
    ("S2Attention", []),
    ("NAMAttention", []),
    ("CrissCrossAttention", []),
    ("GAMAttention", [32]),
    ("SKAttention", []),
    ("ShuffleAttention", []),
    ("DoubleAttention", []),
    ("CoTAttention", []),
    ("EffectiveSEModule", []),
    ("GlobalContext", []),
    ("GatherExcite", []),
    ("MHSA", []),
    ("ParNetAttention", []),
    ("ParallelPolarizedSelfAttention", []),
    ("SequentialPolarizedSelfAttention", []),
    ("SpatialGroupEnhance", []),
    ("TripletAttention", []),
]


@pytest.mark.parametrize("mod,args", ATTNS, ids=[m for m, _ in ATTNS])
def test_attention_zoo(mod, args):
    _build_and_run([
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, mod, args],
    ], size=32)


def test_attention_preserves_shape():
    """Attention modules are drop-in: same output channels as input."""
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 32), jnp.float32)
    for cls, kwargs in [
        (R.SE, {"c1": 32}),
        (R.SimAM, {}),
        (R.TripletAttention, {}),
        (R.CrissCrossAttention, {"c1": 32}),
        (R.SpatialGroupEnhance, {}),
    ]:
        m = cls(**kwargs)
        v = m.init(jax.random.PRNGKey(0), x, training=True)
        y = m.apply(v, x, training=False)
        assert y.shape == x.shape, cls.__name__


# --- neck blocks ------------------------------------------------------------


def test_rfb_msblock_slimneck():
    _build_and_run([
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "BasicRFB", [32]],
        [-1, 1, "MSBlock", [32, [1, 3, 3]]],
        [-1, 2, "C2f_MSBlock", [32]],
        [-1, 1, "GSConv", [32, 3, 2]],
        [-1, 1, "GSConvns", [32]],
        [-1, 1, "VoVGSCSP", [32]],
        [-1, 1, "VoVGSCSPC", [32]],
    ], size=32)


def test_ppa_scsa_fgfp_axial():
    _build_and_run([
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "PPA", [32]],
        [-1, 1, "SCSA", [8, 4]],     # head_num=8, window=4
        [-1, 1, "FGFP", []],
        [-1, 1, "FGFP_Head", []],
        [-1, 1, "AxialImageTransformer", [1, 4]],  # depth=1, heads=4
    ], size=32)


def test_dysample_upsamples_2x():
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 16), jnp.float32)
    m = R.DySample(16, scale=2, groups=4)
    v = m.init(jax.random.PRNGKey(0), x, training=True)
    y = m.apply(v, x, training=False)
    assert y.shape == (1, 16, 16, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_dysample_zero_offset_matches_input_grid():
    """With zero offsets DySample reduces to (near-)nearest upsampling of a
    constant image — a correctness anchor for the grid_sample port."""
    x = jnp.ones((1, 8, 8, 16), jnp.float32) * 3.5
    m = R.DySample(16, scale=2, groups=4)
    v = m.init(jax.random.PRNGKey(0), x, training=True)
    y = m.apply(v, x, training=False)
    np.testing.assert_allclose(np.asarray(y), 3.5, rtol=1e-5)


def test_asff_fusion():
    """ASFF2/ASFF3 fuse multi-level features at a selected resolution."""
    cfg = {
        "nc": 4,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],   # 0: /2
            [-1, 1, "Conv", [32, 3, 2]],   # 1: /4
            [-1, 1, "Conv", [64, 3, 2]],   # 2: /8
        ],
        "head": [
            [[1, 2], 1, "ASFF2", [32, 0]],      # fuse at level 0 (/4)
            [[1, 2], 1, "ASFF2", [32, 1]],      # fuse at level 1 (/8)
            [[0, 1, 2], 1, "ASFF3", [16, 0]],   # 3-level fuse at /2
            [[2], 1, "Detect", ["nc"]],
        ],
    }
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=True)
    out = model.apply(variables, x, training=False, predict_only=True)
    assert "pred" in out


def test_swin_window_attention_mask_static():
    """Shifted-window mask matches the reference construction pattern:
    non--100 entries exactly where tokens share a region."""
    m = R._swin_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # the first (non-boundary) window attends fully
    assert (m[0] == 0).all()


def test_channel_shuffle_roundtrip():
    x = jnp.arange(2 * 2 * 2 * 8, dtype=jnp.float32).reshape(2, 2, 2, 8)
    y = R.channel_shuffle(R.channel_shuffle(x, 2), 4)
    assert y.shape == x.shape
    # shuffle(2) interleaves halves: [0,4,1,5,2,6,3,7]
    z = R.channel_shuffle(x, 2)
    np.testing.assert_array_equal(
        np.asarray(z[0, 0, 0]), np.asarray(x[0, 0, 0])[[0, 4, 1, 5, 2, 6, 3, 7]]
    )
