"""On-chip micro-bench: pallas repack vs XLA reshape relayout.

Times the v10m stem's 4->2 repack (32,320,80,384) and the unpack cases.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lpc_yolo_tpu.nn.modules import repack_width, unpack_width
from lpc_yolo_tpu.ops.pallas_layout import repack_width_pallas


def timeit(fn, x, iters=16, reps=4):
    @jax.jit
    def loop(x):
        def body(i, carry):
            t, acc = carry
            out = fn(t)
            s = jnp.sum(out[:, 0, 0, :]).astype(jnp.float32)
            bump = (s > jnp.float32(1e30)).astype(t.dtype)
            return t + bump, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    float(loop(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000.0


def main():
    cases = [
        ((32, 320, 80, 384), 4, 2),   # v10m stem repack
        ((32, 320, 80, 384), 4, 1),   # unpack
        ((32, 160, 80, 384), 2, 1),   # stage-boundary unpack
    ]
    for shape, pf, pt in cases:
        x = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.bfloat16)
        gb = np.prod(shape) * 2 * 2 / 1e9
        t_x = timeit(lambda t: repack_width(t, pf, pt) if pt > 1 else unpack_width(t, pf), x)
        t_p = timeit(lambda t: repack_width_pallas(t, pf, pt), x)
        print(
            f"{shape} P{pf}->P{pt}: xla={t_x:7.3f} ms ({gb/t_x*1000:5.0f} GB/s)  "
            f"pallas={t_p:7.3f} ms ({gb/t_p*1000:5.0f} GB/s)",
            flush=True,
        )
        a = np.asarray(repack_width_pallas(x, pf, pt), np.float32)
        r = np.asarray(repack_width(x, pf, pt) if pt > 1 else unpack_width(x, pf), np.float32)
        assert np.array_equal(a, r), "MISMATCH"
    print("exact ok", flush=True)


if __name__ == "__main__":
    main()
