"""Isolated conv micro-bench: channel widths x activations x kernel sizes.

Finds the achievable MXU rate for the conv shapes that dominate v10m, and
whether the Mish epilogue (fork's block.py Conv activation) limits them.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


ACTS = {
    "none": lambda x: x,
    "silu": jax.nn.silu,
    "mish": mish,
    "relu": jax.nn.relu,
}


def conv_fn(x, w, act):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return ACTS[act](y)


def timeit(fn, x, iters=16, reps=4):
    @jax.jit
    def loop(x):
        def body(i, carry):
            t, acc = carry
            out = fn(t)
            s = jnp.sum(out).astype(jnp.float32)
            bump = (s > jnp.float32(1e30)).astype(t.dtype)
            return t + bump, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    float(loop(x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1000.0


def main():
    B = 32
    dt = jnp.bfloat16
    # (HW, Cin, Cout, k) — all with the SAME total FLOPs where possible
    cases = [
        (80, 96, 96, 3),     # C2f-192 interior
        (80, 96, 96, 3, "silu"),
        (80, 96, 96, 3, "mish"),
        (40, 192, 192, 3),   # C2f-384 interior
        (40, 192, 192, 3, "mish"),
        (80, 128, 128, 3),   # lane-aligned control, same spatial
        (40, 256, 256, 3),   # lane-x2 control
        (40, 384, 384, 3),   # 3x128 aligned
        (20, 512, 512, 3),   # dense control
        (80, 192, 96, 1),    # cv1-ish 1x1
        (80, 576, 192, 1),   # L16 cv1 1x1
    ]
    for case in cases:
        hw, ci, co, k = case[:4]
        act = case[4] if len(case) > 4 else "none"
        x = jnp.asarray(np.random.RandomState(0).randn(B, hw, hw, ci) * 0.5, dt)
        w = jnp.asarray(np.random.RandomState(1).randn(k, k, ci, co) * 0.05, dt)
        t = timeit(partial(conv_fn, w=w, act=act), x)
        gf = B * hw * hw * ci * co * k * k * 2 / 1e9
        print(
            f"conv {ci:4d}->{co:4d} k{k} @{hw:3d} act={act:4s}: {t:7.3f} ms  "
            f"{gf / t:7.1f} TF/s ({gf / t / 1.97:4.1f}% peak)",
            flush=True,
        )


if __name__ == "__main__":
    main()
