"""Training-path width packing: the packed training graph must be EXACTLY
the unpacked one (loss, gradients, BN batch-stats) — the pack is a layout
transform, not an approximation.

The comparison runs at float64 because the unpacked training graph itself is
chaotic at f32 (training-mode BN on random weights amplifies a 1e-5 input
perturbation to ~1.6e-2 at the output), so f32 output diffs measure noise
amplification, not correctness. At f64 both graphs agree to ~1e-8.

Also covers the Trainer auto-enable wiring and a tiny packed e2e train run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.nn import build_model


@pytest.mark.slow
def test_train_pack_exact_f64():
    with jax.enable_x64(True):
        cfg = "lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml"
        m0 = build_model(cfg, nc=3, dtype=jnp.float64)
        m1 = build_model(cfg, nc=3, dtype=jnp.float64, train_pack=True)
        variables = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), training=True)
        x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float64)

        def mkloss(m, wpack):
            def loss(params, bs):
                from lpc_yolo_tpu.nn.modules import unpack_width

                xin = jnp.asarray(x.reshape(1, 32, 4, 24)) if wpack else jnp.asarray(x)
                out, mut = m.apply(
                    {"params": params, "batch_stats": bs}, xin, training=True,
                    mutable=["batch_stats"], input_layout="WPACK" if wpack else "NHWC",
                )
                # the packed graph returns per-level (box, cls) PAIRS with a
                # width-packed box map; normalize to the unpacked concat form
                # so both losses sum identical structures in identical order
                maps = []
                for br in out.values():
                    for t in br:
                        if isinstance(t, tuple):
                            bm, cm = t
                            if bm.shape[2] != cm.shape[2]:
                                bm = unpack_width(bm, cm.shape[2] // bm.shape[2])
                            t = jnp.concatenate([bm, cm], axis=-1)
                        maps.append(t)
                return sum(jnp.sum(jnp.abs(t)) for t in maps), mut

            return loss

        p, bs = variables["params"], variables["batch_stats"]
        (l0, mut0), g0 = jax.value_and_grad(mkloss(m0, False), has_aux=True)(p, bs)
        (l1, mut1), g1 = jax.value_and_grad(mkloss(m1, True), has_aux=True)(p, bs)
        assert abs(float(l0 - l1)) / abs(float(l0)) < 1e-12
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(float(np.abs(a).max()), 1e-6)  # skip analytically-zero grads
            assert float(np.abs(a - b).max()) / scale < 1e-6
        for a, b in zip(jax.tree.leaves(mut0["batch_stats"]), jax.tree.leaves(mut1["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_train_s2d_fold_exact_f64():
    """The training-graph space_to_depth fold (enabled by train_pack on
    s2d-stage models like LPC) must be EXACT: conv(s2d(x), w) ==
    conv(x, s2d_fold_kernel(w)) at stride 2, so loss, gradients, and BN
    batch-stats match the unfolded graph (reference s2d: block.py:4063)."""
    cfg = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 1]],
            [-1, 1, "space_to_depth", [1]],
            [-1, 1, "C2f", [32, True]],
            [-1, 1, "Conv", [32, 3, 1]],
            [-1, 1, "space_to_depth", [1]],
            [-1, 1, "Conv", [64, 1, 1]],
        ],
        "head": [[[-1], 1, "v10Detect", ["nc"]]],
    }
    with jax.enable_x64(True):
        m0 = build_model(dict(cfg), nc=3, dtype=jnp.float64)
        m1 = build_model(dict(cfg), nc=3, dtype=jnp.float64, train_pack=True)
        variables = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), training=True)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3))

        def mkloss(m):
            def loss(params, bs):
                out, mut = m.apply(
                    {"params": params, "batch_stats": bs}, x, training=True,
                    mutable=["batch_stats"],
                )
                total = 0.0
                for br in out.values():
                    for t in br:
                        if isinstance(t, tuple):
                            total += sum(jnp.sum(jnp.abs(u)) for u in t)
                        else:
                            total += jnp.sum(jnp.abs(t))
                return total, mut

            return loss

        p, bs = variables["params"], variables["batch_stats"]
        (l0, mut0), g0 = jax.value_and_grad(mkloss(m0), has_aux=True)(p, bs)
        (l1, mut1), g1 = jax.value_and_grad(mkloss(m1), has_aux=True)(p, bs)
        assert abs(float(l0 - l1)) / abs(float(l0)) < 1e-12
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(float(np.abs(a).max()), 1e-6)
            assert float(np.abs(a - b).max()) / scale < 1e-6
        for a, b in zip(jax.tree.leaves(mut0["batch_stats"]), jax.tree.leaves(mut1["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_stem_preproc_fold_matches_explicit_normalize():
    """Under train_pack, the train step folds /255 + BGR->RGB into the stem
    kernel (conv(flip(x)/255, W) == conv(x, flip(W)/255)): a uint8 batch must
    produce the same loss as feeding the explicitly-normalized f32 image."""
    from lpc_yolo_tpu.engine.train_step import OptConfig, init_train_state, make_train_step

    model = build_model("tests/assets/tiny-v10.yaml", nc=3, dtype=jnp.float32, train_pack=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    cfg = OptConfig(total_steps=10, warmup_steps=2)
    rng = np.random.RandomState(3)
    img_u8 = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    gt = {
        "cls": jnp.asarray(rng.randint(0, 3, (2, 4)).astype(np.int32)),
        "bboxes": jnp.asarray((rng.rand(2, 4, 4) * 20 + 5).astype(np.float32)),
        "mask": jnp.asarray(np.ones((2, 4), bool)),
    }
    gt["bboxes"] = gt["bboxes"].at[..., 2:].add(gt["bboxes"][..., :2])

    losses = []
    for img in (
        jnp.asarray(img_u8),  # fold path
        jnp.asarray(img_u8[..., ::-1].astype(np.float32) / 255.0),  # explicit
    ):
        state, tx = init_train_state(model, variables, cfg)
        step = make_train_step(model, tx, cfg)
        _, metrics = step(state, {"img": img, **gt})
        losses.append(float(metrics["loss"]))
    assert abs(losses[0] - losses[1]) / abs(losses[1]) < 1e-4, losses


def test_train_pack_mesh_sharded_step():
    """train_pack composes with mesh data-parallelism: on a multi-chip TPU
    host the Trainer enables BOTH (clone(train_pack=True) + shard_batch), so
    the packed training graph must compile and run under an 8-device mesh
    (the WPACK reshape is per-sample and the batch axis shards cleanly).

    This is also the packed-step-runs smoke test: a previous single-device
    twin compiled a near-identical 90 s XLA:CPU program for strictly less
    coverage (the mesh program exercises the same uint8 path, loss, donation,
    and optimizer chain, plus the SPMD partitioner), so the two were merged."""
    from lpc_yolo_tpu.engine.train_step import OptConfig, init_train_state, make_train_step
    from lpc_yolo_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch

    model = build_model("tests/assets/tiny-v10.yaml", nc=3,
                        dtype=jnp.float32, train_pack=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    cfg = OptConfig(total_steps=10, warmup_steps=2)
    state, tx = init_train_state(model, variables, cfg)
    step = make_train_step(model, tx, cfg)
    mesh = data_parallel_mesh(batch_size=8)
    assert mesh.devices.size == 8
    state = replicate(state, mesh)
    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray((rng.rand(8, 64, 64, 3) * 255).astype(np.uint8)),
        "cls": jnp.asarray(rng.randint(0, 3, (8, 4)).astype(np.int32)),
        "bboxes": jnp.asarray((rng.rand(8, 4, 4) * 20 + 5).astype(np.float32)),
        "mask": jnp.asarray(np.ones((8, 4), bool)),
    }
    batch["bboxes"] = batch["bboxes"].at[..., 2:].add(batch["bboxes"][..., :2])
    device_batch = shard_batch(batch, mesh)
    state, metrics = step(state, device_batch)
    assert np.isfinite(float(metrics["loss"]))
