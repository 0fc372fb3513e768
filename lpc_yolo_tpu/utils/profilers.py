"""Tracing / profiling utilities.

Behavioral spec: reference utils/ops.py:18-64 (Profile context timer with
device sync), nn/tasks.py:121-144 (per-layer profiling), SURVEY.md §5
"Tracing/profiling". TPU equivalents: wall-clock Profile with
block_until_ready sync, jax.profiler trace capture for xprof, and a per-layer
cost report from XLA's analytical cost model (no 10x reruns needed — the
compiler already knows the FLOPs).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp


class Profile(contextlib.ContextDecorator):
    """Accumulating wall-clock timer; syncs the device on exit (ops.py:18-64)."""

    def __init__(self, t: float = 0.0, sync: Any = None):
        self.t = t
        self.sync = sync  # array/pytree to block on, or None

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            jax.block_until_ready(self.sync)
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        return False

    def __str__(self):
        return f"{self.t:.6f} s"


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """jax.profiler trace capture (open with xprof/tensorboard)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def model_cost(model, variables, imgsz: int = 640, batch: int = 1) -> Dict[str, float]:
    """FLOPs/bytes of the compiled predict program from XLA's cost analysis
    (the analog of the reference's thop-based flops.py + _profile_one_layer)."""
    def fwd(img):
        return model.apply(variables, img, training=False, predict_only=True)["pred"]

    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    try:  # analytic cost only needs a compile; CPU avoids tying up the chip
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            compiled = jax.jit(fwd).lower(x).compile()
    except RuntimeError:
        compiled = jax.jit(fwd).lower(x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    return {
        "gflops": round(flops / 1e9, 2),
        "gflops/img": round(flops / 1e9 / batch, 2),
        "bytes_accessed_gb": round(float(ca.get("bytes accessed", 0.0)) / 1e9, 3),
    }


def n_params(variables) -> int:
    import numpy as np

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
