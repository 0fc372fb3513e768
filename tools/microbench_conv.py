"""Micro-benchmark conv layout candidates on the real TPU — trace-based.

The axon tunnel adds ~24 ms of round-trip latency per dispatch, so host
wall-clock is useless for sub-ms ops. Each candidate therefore runs a 30-iter
on-device fori_loop under jax.profiler, and the DEVICE time of its compute op
(from the trace, per iteration) is reported. See memory: tpu-tunnel-workflow.
"""

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def device_us(fn, *args, tag="case"):
    """Per-iteration device time (us) of fn's ops inside a fori_loop."""
    @jax.jit
    def loop(*a):
        def body(i, carry):
            t, acc = carry
            y = fn(t, *a[1:])
            # consume the FULL output: partial indexing lets XLA slice the
            # computation away (an early version measured a 3x3 conv at 27 us
            # because only 8 output elements were live)
            s = jnp.sum(y.astype(jnp.float32))
            bump = (s > jnp.float32(1e30)).astype(t.dtype)
            return t + bump, acc + s

        _, acc = jax.lax.fori_loop(0, ITERS, body, (a[0], jnp.float32(0)))
        return acc

    float(loop(*args))  # compile
    trace_dir = f"/tmp/ubench/{tag}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    float(loop(*args))
    jax.profiler.stop_trace()
    tr = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    dev = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    # sum leaf ops that ran ITERS times (the loop body compute), skip the
    # carry-update add fusion (~29 us) and loop scaffolding
    by = defaultdict(lambda: [0.0, 0])
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        if e["name"].startswith(("jit_", "while")):
            continue
        by[e["name"]][0] += e.get("dur", 0)
        by[e["name"]][1] += 1
    total = sum(dur for dur, n in by.values() if n >= ITERS)
    return total / ITERS


def conv(x, w, s=1, g=1):
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g,
    )


def s2d_kernel(w):
    """Exact 2x2-space-to-depth rewrite of a 3x3 s1 HWIO kernel (3x3 packed
    kernel over 4C channels; half the blocks zero -> 4x dense FLOPs)."""
    C, Co = w.shape[2], w.shape[3]
    W = np.zeros((3, 3, 4 * C, 4 * Co), np.float32)
    for ay in range(2):
        for ax in range(2):
            so = ay * 2 + ax
            for ky in range(3):
                for kx in range(3):
                    ty, tx = ay + ky - 1, ax + kx - 1
                    u, py = ty // 2, ty % 2
                    v, px = tx // 2, tx % 2
                    si = py * 2 + px
                    W[u + 1, v + 1, si * C:(si + 1) * C, so * Co:(so + 1) * Co] = w[ky, kx]
    return W


def s2d(x, S=2):
    B, H, W_, C = x.shape
    return np.ascontiguousarray(
        np.asarray(x, np.float32).reshape(B, H // S, S, W_ // S, S, C)
        .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // S, W_ // S, S * S * C)
    )


def main():
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    rows = []

    def run(name, fn, *args):
        us = device_us(fn, *args, tag=name.replace(" ", "_").replace("/", "_")[:40])
        rows.append((name, us))
        print(f"{us:9.1f} us  {name}", flush=True)

    # C2f192 interior conv (hot on v10m @80^2)
    x = jnp.asarray(rng.rand(32, 80, 80, 96), dt)
    w = jnp.asarray(rng.rand(3, 3, 96, 96) * 0.1, dt)
    run("3x3 96->96 @80^2 b32", conv, x, w)
    xs = jnp.asarray(s2d(x), dt)
    ws = jnp.asarray(s2d_kernel(np.asarray(w, np.float32)), dt)
    run("  as S2D 3x3 384->384 @40^2", conv, xs, ws)

    w1 = jnp.asarray(rng.rand(1, 1, 96, 96) * 0.1, dt)
    run("1x1 96->96 @80^2", conv, x, w1)
    run("elementwise +1 @80^2x96", lambda t: t + jnp.bfloat16(1.0), x)

    x48 = jnp.asarray(rng.rand(32, 160, 160, 48), dt)
    w48 = jnp.asarray(rng.rand(3, 3, 48, 48) * 0.1, dt)
    run("3x3 48->48 @160^2", conv, x48, w48)
    run("  as S2D 3x3 192->192 @80^2", conv, jnp.asarray(s2d(x48), dt),
        jnp.asarray(s2d_kernel(np.asarray(w48, np.float32)), dt))

    x192 = jnp.asarray(rng.rand(32, 40, 40, 192), dt)
    w192 = jnp.asarray(rng.rand(3, 3, 192, 192) * 0.1, dt)
    run("3x3 192->192 @40^2", conv, x192, w192)

    x128 = jnp.asarray(rng.rand(32, 80, 80, 128), dt)
    w128 = jnp.asarray(rng.rand(3, 3, 128, 128) * 0.1, dt)
    run("3x3 128->128 @80^2", conv, x128, w128)

    x256 = jnp.asarray(rng.rand(32, 80, 80, 256), dt)
    w256 = jnp.asarray(rng.rand(3, 3, 256, 256) * 0.1, dt)
    run("3x3 256->256 @80^2", conv, x256, w256)

    # NCHW-style: channels in sublanes instead? (dimension_numbers probe)
    def conv_nchw(t, ww):
        return jax.lax.conv_general_dilated(
            t, ww, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
    xc = jnp.asarray(np.asarray(x, np.float32).transpose(0, 3, 1, 2), dt)
    wc = jnp.asarray(np.asarray(w, np.float32).transpose(3, 2, 0, 1), dt)
    run("3x3 96->96 @80^2 NCHW", conv_nchw, xc, wc)

    print("\nsummary:")
    for n, us in rows:
        print(f"{us:9.1f} us  {n}")


if __name__ == "__main__":
    main()
