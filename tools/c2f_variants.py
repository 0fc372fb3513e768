"""Compare exact C2f serving rewrites at v10m's mid-channel shapes.

Variants (all numerically equivalent up to bf16 reassociation):
  plain     cv1 -> slice -> bottleneck chain -> concat -> cv2
  splitcv1  cv1 kernel split into (a, b) convs (no slice) + concat cv2
  sumcv2    splitcv1 + cv2 as sum of per-piece convs (no concat)
  o2        existing O(n^2) deploy rewrite shape (pad-front + kernel sums)

Times each on the real chip with the dependent-loop methodology.
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


def conv(x, w, p=0, b=None, act=False):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if b is not None:
        y = y + b
    return mish(y) if act else y


def make_weights(rng, c1, c2, n, dt):
    c = c2 // 2
    r = np.random.RandomState(rng)
    W = {
        "cv1_w": jnp.asarray(r.randn(1, 1, c1, 2 * c) * 0.05, dt),
        "cv1_b": jnp.asarray(r.randn(2 * c) * 0.05, dt),
        "cv2_w": jnp.asarray(r.randn(1, 1, (2 + n) * c, c2) * 0.05, dt),
        "cv2_b": jnp.asarray(r.randn(c2) * 0.05, dt),
    }
    for i in range(n):
        W[f"m{i}_w1"] = jnp.asarray(r.randn(3, 3, c, c) * 0.05, dt)
        W[f"m{i}_b1"] = jnp.asarray(r.randn(c) * 0.05, dt)
        W[f"m{i}_w2"] = jnp.asarray(r.randn(3, 3, c, c) * 0.05, dt)
        W[f"m{i}_b2"] = jnp.asarray(r.randn(c) * 0.05, dt)
    return W


def plain(x, W, n, c, shortcut):
    y = conv(x, W["cv1_w"], b=W["cv1_b"], act=True)
    ys = [y[..., :c], y[..., c:]]
    for i in range(n):
        t = conv(ys[-1], W[f"m{i}_w1"], p=1, b=W[f"m{i}_b1"], act=True)
        t = conv(t, W[f"m{i}_w2"], p=1, b=W[f"m{i}_b2"], act=True)
        ys.append(ys[-1] + t if shortcut else t)
    return conv(jnp.concatenate(ys, axis=-1), W["cv2_w"], b=W["cv2_b"], act=True)


def splitcv1(x, W, n, c, shortcut):
    wa = W["cv1_w"][..., :c]
    wb = W["cv1_w"][..., c:]
    a = conv(x, wa, b=W["cv1_b"][:c], act=True)
    bb = conv(x, wb, b=W["cv1_b"][c:], act=True)
    ys = [a, bb]
    for i in range(n):
        t = conv(ys[-1], W[f"m{i}_w1"], p=1, b=W[f"m{i}_b1"], act=True)
        t = conv(t, W[f"m{i}_w2"], p=1, b=W[f"m{i}_b2"], act=True)
        ys.append(ys[-1] + t if shortcut else t)
    return conv(jnp.concatenate(ys, axis=-1), W["cv2_w"], b=W["cv2_b"], act=True)


def sumcv2(x, W, n, c, shortcut):
    wa = W["cv1_w"][..., :c]
    wb = W["cv1_w"][..., c:]
    a = conv(x, wa, b=W["cv1_b"][:c], act=True)
    bb = conv(x, wb, b=W["cv1_b"][c:], act=True)
    ys = [a, bb]
    for i in range(n):
        t = conv(ys[-1], W[f"m{i}_w1"], p=1, b=W[f"m{i}_b1"], act=True)
        t = conv(t, W[f"m{i}_w2"], p=1, b=W[f"m{i}_b2"], act=True)
        ys.append(ys[-1] + t if shortcut else t)
    out = None
    for k, piece in enumerate(ys):
        wk = W["cv2_w"][:, :, k * c:(k + 1) * c, :]
        t = conv(piece, wk)
        out = t if out is None else out + t
    return mish(out + W["cv2_b"])


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
    cases = [
        # (name, HW, c1, c2, n, shortcut)
        ("L4  C2f 192->192 n4 short @80", 80, 192, 192, 4, True),
        ("L6  C2f 384->384 n4 short @40", 40, 384, 384, 4, True),
        ("L13 C2f 960->384 n2       @40", 40, 960, 384, 2, False),
        ("L16 C2f 576->192 n2       @80", 80, 576, 192, 2, False),
        ("L2  C2f  96->96  n2 short @160", 160, 96, 96, 2, True),
    ]
    for name, hw, c1, c2, n, short in cases:
        c = c2 // 2
        W = make_weights(0, c1, c2, n, dt)
        x = jnp.asarray(np.random.RandomState(1).randn(B, hw, hw, c1) * 0.5, dt)
        # numeric agreement check (bf16 tolerance)
        ref = np.asarray(plain(x, W, n, c, short), np.float32)
        for vname, fn in (("splitcv1", splitcv1), ("sumcv2", sumcv2)):
            got = np.asarray(fn(x, W, n, c, short), np.float32)
            err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
            assert err < 0.05, (name, vname, err)
        res = []
        for vname, fn in (("plain", plain), ("splitcv1", splitcv1), ("sumcv2", sumcv2)):
            t = timeit(partial(fn, W=W, n=n, c=c, shortcut=short), x)
            res.append(f"{vname}={t:7.3f}ms")
        print(f"{name}: " + "  ".join(res), flush=True)


if __name__ == "__main__":
    main()
