"""Failure detection & elastic recovery: the non-finite-grad skip guard in
the train step (reference GradScaler inf-check semantics, trainer.py:389-394)
and preemption-safe checkpointing (SIGTERM -> save last.ckpt -> clean exit ->
resume), which the reference lacks (DDP crash just aborts, trainer.py:204-209).
"""

import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.data import make_synthetic_dataset

from pathlib import Path

ASSETS = Path(__file__).resolve().parent / "assets"

TINY = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[[0, 1, 2], 1, "Detect", ["nc"]]],
}


def test_nonfinite_step_is_skipped():
    from lpc_yolo_tpu.engine.train_step import OptConfig, init_train_state, make_train_step
    from lpc_yolo_tpu.nn import build_model

    model = build_model(TINY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), training=True)
    cfg = OptConfig(lr0=0.01, warmup_steps=1, total_steps=10, optimizer="sgd")
    state, tx = init_train_state(model, variables, cfg)
    step = make_train_step(model, tx, cfg, loss_kind="v8")

    def batch(img_value):
        return {
            "img": jnp.full((2, 32, 32, 3), img_value, jnp.float32),
            "cls": jnp.zeros((2, 4), jnp.int32),
            "bboxes": jnp.tile(jnp.asarray([4.0, 4.0, 20.0, 20.0]), (2, 4, 1)),
            "mask": jnp.ones((2, 4), bool),
        }

    # warm up past schedule position 0 (lr there is 0 by construction) so the
    # post-skip clean step provably moves params
    state, metrics = step(state, batch(0.5))
    assert not bool(metrics["skipped"])
    p0 = jax.tree.map(np.asarray, state.params)
    ema_updates0 = float(state.ema_updates)

    # poisoned batch: inf image -> non-finite loss/grads -> update skipped
    state, metrics = step(state, batch(np.inf))
    assert bool(metrics["skipped"])
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for e in jax.tree_util.tree_leaves(state.ema_params):
        assert np.isfinite(np.asarray(e)).all()
    assert float(state.ema_updates) == ema_updates0  # EMA clock frozen on skip

    # clean batch afterwards: training proceeds, params move
    state, metrics = step(state, batch(0.5))
    assert not bool(metrics["skipped"])
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(state.params))
    )
    assert moved and int(state.step) == 3


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-run -> clean exit with last.ckpt -> resume finishes."""
    data = make_synthetic_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=64, nc=2)
    y = YOLO(ASSETS / "tiny-detect.yaml", nc=2)
    run = tmp_path / "run"

    # trainer is constructed inside YOLO.train; inject the signal via the
    # epoch-start event: epoch 0 runs fully, epoch 1 is preempted
    import lpc_yolo_tpu.engine.trainer as trainer_mod

    orig_init = trainer_mod.Trainer.__init__

    def patched_init(self, *a, **kw):
        orig_init(self, *a, **kw)

        def maybe_preempt(tr):
            if tr.epoch == 1:
                signal.raise_signal(signal.SIGTERM)

        self.callbacks.add("on_train_epoch_start", maybe_preempt)

    trainer_mod.Trainer.__init__ = patched_init
    try:
        y.train(data=data, epochs=3, imgsz=64, batch=2, workers=0, save_dir=run, val=False)
    finally:
        trainer_mod.Trainer.__init__ = orig_init

    csv_text = (run / "results.csv").read_text()
    assert csv_text.count("\n") == 2  # header + epoch 0 only (epoch 1 preempted)
    assert (run / "weights" / "last.ckpt").exists()

    # resume: continues from epoch 1 and completes the remaining epochs
    y2 = YOLO(ASSETS / "tiny-detect.yaml", nc=2)
    y2.train(data=data, epochs=3, imgsz=64, batch=2, workers=0, save_dir=run, val=False, resume=True)
    rows = (run / "results.csv").read_text().strip().splitlines()
    epochs_logged = [int(r.split(",")[0]) for r in rows[1:] if not r.startswith("epoch")]
    assert epochs_logged == [0, 1, 2]
