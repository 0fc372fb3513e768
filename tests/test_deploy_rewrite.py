"""Deploy-mode block rewrites: same variable tree, identical math.

build_model(deploy=True) swaps C2f for a slice/concat-free algebraic rewrite
(modules.C2f._deploy_call) that is 2-3x faster on TPU at large spatial dims.
These tests pin (a) variable-tree equality with the training build and
(b) numerical equivalence on the full v10n predict path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpc_yolo_tpu.nn import build_model


@pytest.fixture(scope="module")
def pair():
    plain = build_model("lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml")
    dep = build_model("lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml", deploy=True)
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    return plain, dep, variables


def test_variable_tree_identical(pair):
    plain, dep, variables = pair
    v2 = dep.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), training=True)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape


def test_deploy_predict_parity(pair):
    plain, dep, variables = pair
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    a = plain.apply(variables, x, training=False, predict_only=True)["det"]
    b = dep.apply(variables, x, training=False, predict_only=True)["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_deploy_train_mode_falls_back(pair):
    """training=True on a deploy build must run the plain path (BN stat updates)."""
    _, dep, variables = pair
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    out, mut = dep.apply(variables, x, training=True, mutable=["batch_stats"])
    stem_bn = mut["batch_stats"]["model_0"]["bn"]
    assert not np.allclose(np.asarray(stem_bn["mean"]), 0.0)


def test_deploy_with_fused_variables(pair):
    """Deploy rewrite must also accept fuse_conv_bn-transformed variables."""
    from lpc_yolo_tpu.nn.fuse import fuse_conv_bn

    plain, dep, variables = pair
    vf = fuse_conv_bn(variables)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    a = plain.apply(variables, x, training=False, predict_only=True)["det"]
    b = dep.apply(vf, x, training=False, predict_only=True)["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_deploy_wpack_prefix_parity(pair):
    """Width-packed deploy predict (dense-lane stem) matches plain NHWC.

    The WPACK feed is byte-identical to NHWC — (B, H, W/8, 8*3) is the same
    row-major buffer — and the packed convs are exact kernel rewrites
    (modules.packed_conv), so outputs must agree to float tolerance."""
    plain, dep, variables = pair
    x = np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
    a = plain.apply(variables, jnp.asarray(x), training=False, predict_only=True)["det"]
    b = dep.apply(
        variables, jnp.asarray(x.reshape(2, 64, 8, 24)),
        training=False, predict_only=True, input_layout="WPACK",
    )["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize(
    "H,W,Ci,Co,k,s,Pi,Po",
    [
        (16, 64, 3, 16, 3, 2, 8, 8),    # stem conv1 (uint8 pack x8)
        (16, 64, 16, 32, 3, 2, 8, 4),   # stride-2 channel-doubling: P halves
        (16, 64, 32, 32, 1, 1, 4, 4),   # C2f 1x1
        (16, 64, 16, 16, 3, 1, 4, 4),   # C2f bottleneck 3x3
        (16, 64, 32, 64, 3, 2, 4, 2),
        (16, 64, 64, 64, 3, 1, 2, 2),
        (16, 64, 192, 64, 1, 1, 1, 2),  # pack-on-entry (neck C2f cv1)
        (16, 64, 48, 16, 3, 1, 1, 8),   # pack-on-entry with k3
        (16, 64, 3, 48, 3, 2, 8, 8),    # v10m stem under the old gcd rule
        (16, 64, 48, 96, 3, 2, 8, 4),   # old v10m conv1: 48@P8 -> 96@P4
        (16, 64, 96, 96, 1, 1, 4, 4),   # old v10m C2f96 cv1 (384 dense lanes)
        (16, 64, 48, 48, 3, 1, 4, 4),   # old v10m C2f96 interior 3x3
        (16, 64, 96, 192, 3, 2, 4, 2),  # v10m stage-2 boundary: chain continuation
        (16, 64, 3, 48, 3, 2, 8, 4),    # v10m stem, re-tuned plan: (8,4)
        (16, 64, 48, 96, 3, 2, 2, 1),   # v10m conv1: in-conv chain ending (2,1)
        (16, 64, 96, 96, 1, 1, 1, 2),   # v10m C2f96 cv1 pack-on-entry
        (16, 64, 48, 48, 3, 1, 2, 2),   # v10m C2f96 interior at P2
        (16, 64, 96, 192, 3, 2, 2, 1),  # v10m stage-2 boundary: (2,1) ending
    ],
    ids=lambda v: str(v),
)
def test_packed_conv_exact(H, W, Ci, Co, k, s, Pi, Po):
    """modules.packed_conv is an exact rewrite of a same-padded conv for
    every (kernel, stride, pack) combination the serving graph uses."""
    from lpc_yolo_tpu.nn.modules import pack_width, packed_conv, unpack_width

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.rand(k, k, Ci, Co), jnp.float32)
    p = k // 2
    ref = jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = unpack_width(packed_conv(pack_width(x, Pi), w, s, Pi, Po), Po)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_packed_conv_bias_act():
    """Packed bias tiles per subpixel block; activation applies elementwise."""
    from lpc_yolo_tpu.nn.modules import pack_width, packed_conv, unpack_width

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 32, 16), jnp.float32)
    w = jnp.asarray(rng.rand(1, 1, 16, 16), jnp.float32)
    b = jnp.asarray(rng.rand(16), jnp.float32)
    ref = jax.nn.silu(
        jax.lax.conv_general_dilated(x, w, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    )
    got = unpack_width(packed_conv(pack_width(x, 8), w, 1, 8, 8, b=b, act="silu"), 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)



def test_repack_width_is_pure_reshape():
    """repack_width between any two pack factors must be value-preserving:
    the flattened element order of the packed layout is P-invariant."""
    from lpc_yolo_tpu.nn.modules import pack_width, repack_width, unpack_width

    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 32, 6), jnp.float32)
    for pf, pt in [(8, 4), (4, 8), (2, 8), (8, 1)]:
        a = pack_width(x, pf)
        b = repack_width(a, pf, pt) if pt > 1 else unpack_width(a, pf)
        ref = pack_width(x, pt) if pt > 1 else x
        np.testing.assert_array_equal(np.asarray(b), np.asarray(ref))


def test_deploy_upsample_commute_parity():
    """The FPN-neck upsample-commute (compiler._up_fusion_plan + C2f up_pair)
    must match the plain NHWC build: cv1 is 1x1, so its upsampled-input rows
    commute through the nearest 2x upsample exactly (float-reassociation
    tolerance only)."""
    cfg = {
        "nc": 8,
        "backbone": [
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [192, 3, 2]],
            [-1, 1, "Conv", [256, 3, 2]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 1], 1, "Concat", [1]],
            [-1, 1, "C2f", [192, False]],
        ],
        "head": [[[2, 5], 1, "v10Detect", ["nc"]]],
    }
    plain = build_model(cfg)
    dep = build_model(cfg, deploy=True)
    from lpc_yolo_tpu.nn.compiler import _up_fusion_plan

    assert _up_fusion_plan(dep.specs, dep.save), "triple not detected"
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = jnp.asarray(np.random.RandomState(7).rand(2, 64, 64, 3), jnp.float32)
    a = plain.apply(variables, x, training=False, predict_only=True)["det"]
    b = dep.apply(variables, x, training=False, predict_only=True)["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_repack_width_pallas_matches_reshape():
    """ops.pallas_layout.repack_width_pallas must be value-identical to the
    pure-reshape repack for every serving transition (down-repack + unpack).
    Interpret mode; tiny shapes keep it fast."""
    from lpc_yolo_tpu.ops.pallas_layout import repack_width_pallas
    from lpc_yolo_tpu.nn.modules import repack_width, unpack_width

    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 4 * 6), jnp.float32)
    for pf, pt in [(4, 2), (4, 1), (2, 1)]:
        xx = x if pf == 4 else repack_width(x, 4, 2)
        ref = repack_width(xx, pf, pt) if pt > 1 else unpack_width(xx, pf)
        got = repack_width_pallas(xx, pf, pt, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv3x3_pallas_matches_lax():
    """ops.pallas_conv.conv3x3_pallas (implicit-GEMM experiment; not wired
    into the serving graph — benched at parity with XLA's conv emitter on
    v5e) must match lax.conv exactly. Interpret mode, tiny shape."""
    from lpc_yolo_tpu.ops.pallas_conv import conv3x3_pallas

    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16) - 0.5, jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).rand(3, 3, 16, 8) * 0.2, jnp.float32)
    b = jnp.asarray(np.random.RandomState(2).rand(8), jnp.float32)
    got = conv3x3_pallas(x, w, b, act=False, hb=4, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_deploy_wpack_mid_channel_plan_parity():
    """WPACK parity through the re-tuned mid-channel plan paths.

    A tiny graph reproducing the v10m stem pattern (Conv48 s2 -> Conv96 s2 ->
    C2f96 -> Conv192 s2 -> head) exercises every new plan combination —
    stem chain (8,4), in-conv chain ending (2,1), C2f pack-on-entry (1,2)
    with P2 interiors — and must match the plain NHWC build to float
    tolerance (same exactness argument as the v10n prefix test)."""
    cfg = {
        "nc": 8,
        "backbone": [
            [-1, 1, "Conv", [48, 3, 2]],
            [-1, 1, "Conv", [96, 3, 2]],
            [-1, 2, "C2f", [96, True]],
            [-1, 1, "Conv", [192, 3, 2]],
        ],
        "head": [[[1, 2, 3], 1, "v10Detect", ["nc"]]],
    }
    plain = build_model(cfg)
    dep = build_model(cfg, deploy=True)
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = np.random.RandomState(5).rand(2, 64, 64, 3).astype(np.float32)
    a = plain.apply(variables, jnp.asarray(x), training=False, predict_only=True)["det"]
    b = dep.apply(
        variables, jnp.asarray(x.reshape(2, 64, 8, 24)),
        training=False, predict_only=True, input_layout="WPACK",
    )["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("C,Co,k", [(8, 16, 1), (4, 8, 3)], ids=lambda v: str(v))
def test_s2d_fold_kernel_exact(C, Co, k):
    """modules.s2d_fold_kernel: conv(space_to_depth(x), w) must equal
    conv(x, folded_w, stride 2, pad (2p, 2k-2-2p)) exactly — the s2d is a
    pure layout op absorbed into the kernel's input rows."""
    from lpc_yolo_tpu.nn.modules import SpaceToDepth, s2d_fold_kernel

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 12, 16, C), jnp.float32)
    w = jnp.asarray(rng.rand(k, k, 4 * C, Co), jnp.float32)
    z = SpaceToDepth().apply({}, x)
    p = k // 2
    ref = jax.lax.conv_general_dilated(
        z, w, (1, 1), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    w2 = s2d_fold_kernel(w)
    pad = (2 * p, 2 * k - 2 - 2 * p)
    got = jax.lax.conv_general_dilated(
        x, w2, (2, 2), [pad, pad], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize(
    "C,Co,k,Pi,Po",
    [
        (8, 16, 1, 4, 4),   # LPC stage-1 C2f cv1 (fold + direct chain)
        (16, 32, 1, 2, 2),  # LPC stage-2
        (8, 16, 1, 8, 4),   # repack-on-entry fold
        (4, 8, 3, 4, 2),    # k=3 fold (SPDConv shape)
    ],
    ids=lambda v: str(v),
)
def test_packed_conv_s2d_fold_exact(C, Co, k, Pi, Po):
    """Width-packed folded-s2d conv: packed_conv(pack(x), fold(w), s=2,
    pl=2p, ph=(2p, 2k-2-2p)) must equal conv(s2d(x), w, 'same')."""
    from lpc_yolo_tpu.nn.modules import (
        SpaceToDepth, pack_width, packed_conv, s2d_fold_kernel, unpack_width,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 32, C), jnp.float32)
    w = jnp.asarray(rng.rand(k, k, 4 * C, Co), jnp.float32)
    z = SpaceToDepth().apply({}, x)
    p = k // 2
    ref = jax.lax.conv_general_dilated(
        z, w, (1, 1), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    pad = (2 * p, 2 * k - 2 - 2 * p)
    got = unpack_width(
        packed_conv(pack_width(x, Pi), s2d_fold_kernel(w), 2, Pi, Po, pl=pad[0], ph=pad),
        Po,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_s2d_fold_graph_parity():
    """Deploy s2d fold end-to-end: a graph with space_to_depth -> C2f (both
    packed and plain regimes) and space_to_depth -> Conv must match the plain
    NHWC build in both NHWC and WPACK serving layouts."""
    from lpc_yolo_tpu.nn.compiler import _s2d_fuse_plan

    cfg = {
        "nc": 8,
        "backbone": [
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "space_to_depth", [1]],
            [-1, 1, "C2f", [64, True]],       # packed-regime C2f fold
            [-1, 1, "space_to_depth", [1]],
            [-1, 1, "Conv", [128, 3, 1]],     # Conv fold (k=3)
            [-1, 1, "space_to_depth", [1]],
            [-1, 1, "C2f", [256, True]],      # plain-path C2f fold (c2 > 128)
        ],
        "head": [[[2, 4, 6], 1, "v10Detect", ["nc"]]],
    }
    plain = build_model(cfg)
    dep = build_model(cfg, deploy=True)
    assert len(_s2d_fuse_plan(dep.specs, dep.save)) == 3, "fold sites not detected"
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = np.random.RandomState(9).rand(2, 64, 64, 3).astype(np.float32)
    a = plain.apply(variables, jnp.asarray(x), training=False, predict_only=True)["det"]
    b = dep.apply(variables, jnp.asarray(x), training=False, predict_only=True)["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    c = dep.apply(
        variables, jnp.asarray(x.reshape(2, 64, 8, 24)),
        training=False, predict_only=True, input_layout="WPACK",
    )["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


def test_lpc_deploy_parity():
    """The full LPC-YOLO serving graph (s2d folds at all four stage
    boundaries + packed C2f + split decode) matches its plain build."""
    plain = build_model("lpc_yolo_tpu/cfg/models/v10/yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml")
    dep = build_model(
        "lpc_yolo_tpu/cfg/models/v10/yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml", deploy=True
    )
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    v2 = dep.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), training=True)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    x = np.random.RandomState(11).rand(2, 64, 64, 3).astype(np.float32)
    a = plain.apply(variables, jnp.asarray(x), training=False, predict_only=True)["det"]
    b = dep.apply(variables, jnp.asarray(x), training=False, predict_only=True)["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    c = dep.apply(
        variables, jnp.asarray(x.reshape(2, 64, 8, 24)),
        training=False, predict_only=True, input_layout="WPACK",
    )["det"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


def test_deploy_wpack_large_batch_plan_parity():
    """The batch-aware pack gate (min_pack=4 at B >= 96) must still be an
    exact rewrite: a B=96 WPACK forward matches the plain NHWC build."""
    cfg = {
        "nc": 8,
        "backbone": [
            [-1, 1, "Conv", [48, 3, 2]],   # P2 site gated off at large B
            [-1, 1, "Conv", [32, 3, 2]],   # P4 site stays packed
            [-1, 2, "C2f", [96, True]],    # P2 C2f gated off
            [-1, 1, "Conv", [192, 3, 2]],
        ],
        "head": [[[1, 2, 3], 1, "v10Detect", ["nc"]]],
    }
    plain = build_model(cfg)
    dep = build_model(cfg, deploy=True)
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    x = np.random.RandomState(13).rand(96, 32, 32, 3).astype(np.float32)
    # compare the full decoded map (pre top-k): the rewrite-exactness claim.
    # det rows are top-k-selected, and near-tied random-init scores make the
    # selection order compiler-dependent (1-ulp fusion differences flip ties).
    a = plain.apply(variables, jnp.asarray(x), training=False)["pred"]
    b = dep.apply(
        variables, jnp.asarray(x.reshape(96, 32, 4, 24)),
        training=False, input_layout="WPACK",
    )["pred"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_deploy_c2f128_interior_packed_parity():
    """c2=128 C2f blocks (hidden c=64, any n) run packed-plain on the deploy
    serving graph: interiors land exactly dense on 128 lanes (45% -> 100%
    tile fill on 3x3 64->64 — tools/lane_fill.py puts these at ~8% of
    v10l's FLOPs). The rewrite must stay exact, including n=3 (the v10l/b
    P2-stage shape, beyond the O(n^2) plain rewrite's n<=2 gate)."""
    cfg = {
        "nc": 8,
        "backbone": [
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 3, "C2f", [128, True]],   # the new packed-plain site
            [-1, 1, "Conv", [256, 3, 2]],
            [-1, 2, "C2f", [256, True]],   # dense already: stays plain
            [-1, 1, "Conv", [512, 3, 2]],
        ],
        "head": [[[2, 4, 5], 1, "v10Detect", ["nc"]]],
    }
    plain = build_model(cfg)
    dep = build_model(cfg, deploy=True)
    variables = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    v2 = dep.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), training=True)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    x = np.random.RandomState(17).rand(2, 64, 64, 3).astype(np.float32)
    a = plain.apply(variables, jnp.asarray(x), training=False)["pred"]
    b = dep.apply(
        variables, jnp.asarray(x.reshape(2, 64, 8, 24)),
        training=False, input_layout="WPACK",
    )["pred"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
