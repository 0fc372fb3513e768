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


def profile_layers(model, variables, imgsz: int = 640, batch: int = 1,
                   verbose: bool = True):
    """Per-layer FLOPs/params table (the analog of the reference's
    `predict(profile=True)` -> BaseModel._profile_one_layer, nn/tasks.py:121).

    Per-layer FLOPs come from differencing XLA cost analyses of graphs
    truncated after each layer (`model.apply(..., upto=i)`) — exact for the
    compiled program, no thop-style per-module estimates. Compiles happen on
    CPU (analysis only).
    """
    import numpy as _np

    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    cpu = jax.devices("cpu")[0]

    def flops_upto(i):
        def fwd(img):
            out = model.apply(variables, img, training=False, predict_only=True,
                              **({"upto": i} if i is not None else {}))
            return out["pred"] if isinstance(out, dict) and "pred" in out else out

        with jax.default_device(cpu):
            ca = jax.jit(fwd).lower(x).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))

    p = variables["params"]
    params_of = {}
    for top_key in p:
        digits = "".join(c for c in top_key.split("_")[1] if c.isdigit()) if "_" in top_key else ""
        i = int(digits) if digits else -1
        params_of[i] = params_of.get(i, 0) + sum(
            int(_np.prod(v.shape)) for v in jax.tree.leaves(p[top_key])
        )

    rows, prev = [], 0.0
    n = len(model.specs)
    for i, spec in enumerate(model.specs):
        total = flops_upto(i if i < n - 1 else None)  # last layer: full graph (head + decode)
        rows.append({
            "i": i, "module": spec.module, "from": list(spec.f), "n": spec.n,
            "params": params_of.get(i, 0),
            "gflops": round((total - prev) / 1e9, 3),
        })
        prev = total
    if verbose:
        print(f"{'idx':>4} {'from':>12} {'n':>2} {'params':>10} {'GFLOPs':>8}  module")
        for r in rows:
            print(f"{r['i']:>4} {str(r['from']):>12} {r['n']:>2} {r['params']:>10,} {r['gflops']:>8}  {r['module']}")
        print(f"total: {sum(r['params'] for r in rows):,} params, {round(prev / 1e9, 2)} GFLOPs (imgsz={imgsz}, batch={batch})")
    return rows
