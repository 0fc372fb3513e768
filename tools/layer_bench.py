"""Per-layer micro-bench of the v10m serving graph on the real chip.

Times each layer module in isolation (deploy math, fused vars, bf16) at its
true input shape, plus top-k algorithm variants for the decode stage.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lpc_yolo_tpu.nn import modules as M


def timeit(fn, *args, iters=16, reps=4):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *a[1:])
            if isinstance(out, (tuple, list)):
                s = sum(jnp.sum(v).astype(jnp.float32) for v in out)
            else:
                s = jnp.sum(out).astype(jnp.float32)
            bump = (s > jnp.float32(1e30)).astype(x.dtype)
            return x + bump, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (a[0], jnp.float32(0)))
        return acc

    float(loop(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1000.0


def bench_module(name, mod, in_shape, extra_inputs=()):
    x = jnp.asarray(np.random.RandomState(0).randn(*in_shape), jnp.bfloat16)
    extras = [jnp.asarray(np.random.RandomState(i + 1).randn(*s), jnp.bfloat16)
              for i, s in enumerate(extra_inputs)]
    token = M.DEPLOY_MATH.set(True)
    try:
        if extras:
            variables = mod.init(jax.random.PRNGKey(0), [x] + extras, training=False)
            fn = lambda x, v, *e: mod.apply(v, [x] + list(e), training=False)
            t = timeit(fn, x, variables, *extras)
        else:
            variables = mod.init(jax.random.PRNGKey(0), x, training=False)
            fn = lambda x, v: mod.apply(v, x, training=False)
            t = timeit(fn, x, variables)
        print(f"{name:42s} {t:8.3f} ms", flush=True)
        return t
    finally:
        M.DEPLOY_MATH.reset(token)


def main():
    B = 32
    dt = jnp.bfloat16
    rows = [
        # (name, module, input shape)
        ("L0 Conv 3->48 s2 @640", M.ConvBN(48, 3, 2, dtype=dt), (B, 640, 640, 3)),
        ("L1 Conv 48->96 s2 @320", M.ConvBN(96, 3, 2, dtype=dt), (B, 320, 320, 48)),
        ("L2 C2f 96 n2 short @160", M.C2f(96, n=2, shortcut=True, dtype=dt), (B, 160, 160, 96)),
        ("L2p C2f 96 n2 short deploy @160", M.C2f(96, n=2, shortcut=True, deploy=True, dtype=dt), (B, 160, 160, 96)),
        ("L3 Conv 96->192 s2 @160", M.ConvBN(192, 3, 2, dtype=dt), (B, 160, 160, 96)),
        ("L4 C2f 192 n4 short @80", M.C2f(192, n=4, shortcut=True, dtype=dt), (B, 80, 80, 192)),
        ("L4d C2f 192 n4 short deploy @80", M.C2f(192, n=4, shortcut=True, deploy=True, dtype=dt), (B, 80, 80, 192)),
        ("L5 SCDown 192->384 @80", M.SCDown(384, 3, 2, dtype=dt), (B, 80, 80, 192)),
        ("L6 C2f 384 n4 short @40", M.C2f(384, n=4, shortcut=True, dtype=dt), (B, 40, 40, 384)),
        ("L6d C2f 384 n4 short deploy @40", M.C2f(384, n=4, shortcut=True, deploy=True, dtype=dt), (B, 40, 40, 384)),
        ("L7 SCDown 384->576 @40", M.SCDown(576, 3, 2, dtype=dt), (B, 40, 40, 384)),
        ("L8 C2fCIB 576 n2 @20", M.C2fCIB(576, n=2, shortcut=True, dtype=dt), (B, 20, 20, 576)),
        ("L9 SPPF 576 @20", M.SPPF(576, 5, dtype=dt), (B, 20, 20, 576)),
        ("L10 PSA 576 @20", M.PSA(576, dtype=dt), (B, 20, 20, 576)),
        ("L13 C2f 960->384 n2 @40", M.C2f(384, n=2, dtype=dt), (B, 40, 40, 960)),
        ("L16 C2f 576->192 n2 @80", M.C2f(192, n=2, dtype=dt), (B, 80, 80, 576)),
        ("L17 Conv 192->192 s2 @80", M.ConvBN(192, 3, 2, dtype=dt), (B, 80, 80, 192)),
        ("L19 C2fCIB 576->384 n2 @40", M.C2fCIB(384, n=2, shortcut=True, dtype=dt), (B, 40, 40, 576)),
        ("L20 SCDown 384->384 @40", M.SCDown(384, 3, 2, dtype=dt), (B, 40, 40, 384)),
        ("L22 C2fCIB 960->576 n2 @20", M.C2fCIB(576, n=2, shortcut=True, dtype=dt), (B, 20, 20, 960)),
    ]
    total = 0.0
    for name, mod, shape in rows:
        try:
            t = bench_module(name, mod, shape)
            if not name[3:4] in ("d", "p"):
                total += t
        except Exception as e:
            print(f"{name:42s} FAILED {e!r:.80}", flush=True)
    print(f"{'sum (plain rows)':42s} {total:8.3f} ms", flush=True)

    # head towers
    from lpc_yolo_tpu.nn.heads import v10Detect  # noqa

    # top-k variants
    x1 = jnp.asarray(np.random.RandomState(0).randn(B, 8400), jnp.float32)
    x2 = jnp.asarray(np.random.RandomState(1).randn(B, 24000), jnp.float32)

    def tk(x):
        s, i = jax.lax.top_k(x, 300)
        return jnp.sum(s) + jnp.sum(i)

    def amk(x, recall):
        s, i = jax.lax.approx_max_k(x, 300, recall_target=recall)
        return jnp.sum(s) + jnp.sum(i)

    print(f"{'top_k 8400->300 f32':42s} {timeit(lambda x: tk(x), x1):8.3f} ms", flush=True)
    for r in (0.95, 0.99, 1.0):
        try:
            print(f"{'approx_max_k 8400->300 r=%.2f' % r:42s} {timeit(lambda x, r=r: amk(x, r), x1):8.3f} ms", flush=True)
        except Exception as e:
            print("approx fail", e)
    print(f"{'top_k 24000->300 f32':42s} {timeit(lambda x: tk(x), x2):8.3f} ms", flush=True)
    for r in (0.95, 0.99, 1.0):
        try:
            print(f"{'approx_max_k 24000->300 r=%.2f' % r:42s} {timeit(lambda x, r=r: amk(x, r), x2):8.3f} ms", flush=True)
        except Exception as e:
            print("approx fail", e)

    # exactness check of approx_max_k at recall 1.0
    for shape in ((B, 8400), (B, 24000)):
        xa = np.random.RandomState(7).randn(*shape).astype(np.float32)
        xs, xi = jax.lax.top_k(jnp.asarray(xa), 300)
        as_, ai = jax.lax.approx_max_k(jnp.asarray(xa), 300, recall_target=1.0)
        same_vals = np.array_equal(np.asarray(xs), np.sort(np.asarray(as_), axis=1)[:, ::-1])
        sorted_desc = bool(np.all(np.diff(np.asarray(as_), axis=1) <= 0))
        print(f"approx r=1.0 {shape}: same value-set={same_vals} sorted={sorted_desc}", flush=True)


if __name__ == "__main__":
    main()
