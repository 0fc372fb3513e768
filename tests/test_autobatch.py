"""batch=-1 resolution (reference utils/autobatch.py:13-70): the Trainer
probes the real train step's compiled memory via XLA AOT analysis and picks
the largest power-of-two batch that fits the 60% HBM budget."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.engine.trainer import Trainer
from lpc_yolo_tpu.nn import build_model

TINY = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [[[0, 1, 2], 1, "Detect", ["nc"]]],
}


def test_trainer_autobatch_resolves_batch():
    model = build_model(TINY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), training=True)
    yolo = SimpleNamespace(model=model, variables=variables)
    tr = Trainer(yolo, data="unused.yaml", imgsz=32, max_gt=4)
    b = tr._autobatch(model, task="v8", max_batch=2)
    assert b in (1, 2)  # tiny model at 32px fits far more than 2; capped probe


def test_autobatch_respects_memory_limit(monkeypatch):
    import lpc_yolo_tpu.utils.autobatch as ab

    # a fake 1-byte device: nothing fits, autobatch must fall back to batch=1
    monkeypatch.setattr(ab, "device_memory_bytes", lambda device=None: 1)

    def make_fn(b):
        def fn(x):
            return jnp.sum(x * 2.0)

        return fn, (jnp.zeros((b, 8)),)

    assert ab.autobatch(make_fn, max_batch=8, verbose=False) == 1
