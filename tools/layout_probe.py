"""On-chip experiment: can the v10n train step's layout-copy bucket be shrunk
from above the compiler?

The round-4 roofline attributed 5.6 ms/step (13%) of the v10n b32 train step
to 708 diffuse relayouts between the conv custom-calls' preferred activation
layout (minor-to-major {3,0,2,1}) and fused consumers' {1,3,2,0}
(docs/tpu-design.md "Where the remaining train gap is"). This probe runs the
three levers JAX exposes, measured on the real chip:

  base      the production step, untouched (control)
  pin_conv  `with_layout_constraint` pins every ConvBN/activation output to
            the conv-preferred m2m {3,0,2,1} — if consumers can absorb it,
            the producer-side copies disappear
  pin_cons  same, pinned to the consumer-preferred m2m {1,3,2,0}
  auto_io   `Format(Layout.AUTO)` on the donated TrainState I/O — lets XLA
            pick executable-boundary layouts instead of defaults (the carry
            of the measurement scan is already XLA-chosen, so this isolates
            the top-level-jit boundary cost the trainer loop pays)

Injection for pin_*: monkeypatch `modules.apply_act` — every ConvBN and
block activation exit routes through it, so one hook pins the whole
activation graph without touching library code.

Usage: python tools/layout_probe.py [variant ...]   (default: all)
Writes one JSON line per variant.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental.layout import Format, Layout, with_layout_constraint  # noqa: E402

from train_roofline import build  # noqa: E402

STEPS = 24


def measure(step, state, batch_d, auto_io=False):
    def run(state, batch):
        def body(s, _):
            s2, m = step(s, batch)
            return s2, m["loss"]

        _, losses = jax.lax.scan(body, state, None, length=STEPS)
        return losses[-1]

    if auto_io:
        # AUTO only on >=2D leaves — scalars/vectors have one layout anyway
        # and AUTO on them trips the arg-layout match check
        auto = jax.tree.map(
            lambda v: Format(Layout.AUTO) if getattr(v, "ndim", 0) >= 2 else None,
            (state, batch_d),
        )
        runj = jax.jit(run, in_shardings=auto)
        # AUTO input layouts require explicitly laid-out arguments: lower on
        # abstract shapes, compile, then device_put the real operands into
        # the formats XLA chose.
        abstract = jax.tree.map(
            lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), (state, batch_d)
        )
        compiled = runj.lower(*abstract).compile()
        fmts = compiled.input_formats[0]
        state, batch_d = jax.device_put((state, batch_d), fmts)
        call = lambda: compiled(state, batch_d)  # the jit wrapper re-checks AUTO
    else:
        runj = jax.jit(run)
        call = lambda: runj(state, batch_d)

    loss = float(call())
    assert np.isfinite(loss), loss
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(call())
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS * 1000.0


def pinned_apply_act(m2m):
    from lpc_yolo_tpu.nn import modules

    orig = modules.apply_act

    def apply_act(x, act):
        y = orig(x, act)
        if y.ndim == 4:
            y = with_layout_constraint(y, Layout(major_to_minor=m2m))
        return y

    return orig, apply_act


def run_variant(name, trace=False):
    from lpc_yolo_tpu.nn import modules

    pin = None
    if name == "pin_conv":
        pin = (1, 2, 0, 3)  # minor-to-major {3,0,2,1}
    elif name == "pin_cons":
        pin = (0, 2, 3, 1)  # minor-to-major {1,3,2,0}
    orig = None
    if pin is not None:
        orig, patched = pinned_apply_act(pin)
        modules.apply_act = patched
    try:
        step, state, batch_d = build("n", 32)
        ms = measure(step, state, batch_d, auto_io=(name == "auto_io"))
        out = {"variant": name, "ms_per_step": round(ms, 2), "img_s": round(32 / ms * 1e3, 1)}
        if trace:
            from train_roofline import trace_buckets

            buckets = trace_buckets(step, state, batch_d)
            out["layout_copy_ms"] = round(buckets.get("layout-copy", 0.0), 2)
            out["buckets_ms"] = {k: round(v, 2) for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])}
    finally:
        if orig is not None:
            modules.apply_act = orig
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    trace = "--trace" in args
    variants = [a for a in args if not a.startswith("-")] or ["base", "pin_conv", "pin_cons", "auto_io"]
    for v in variants:
        try:
            run_variant(v, trace=trace)
        except Exception as e:  # record the failure mode — it IS the result
            print(json.dumps({"variant": v, "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
