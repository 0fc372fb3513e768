"""Probe: where does the end-to-end int8 serving gain go?

tools/int8_probe.py measured the PRE-QUANTIZED int8 conv chain at
1.65-1.83x bf16 on v10x's 3x3 shapes, but the wired q8_conv serving rows
(bench.py int8) came out at only +6% on x. This probe times the SAME
shapes in three variants to attribute the loss:

  bf16   : bf16 conv chain (baseline)
  q8full : the exact q8_conv dataflow — bf16 in, f32 quantize (round/clip
           /cast int8), int8 conv -> int32, f32 dequant, bf16 out
  q8pre  : pre-quantized int8 chain (conv -> shift requant -> int8), the
           probe's upper bound

If q8full << q8pre, the elementwise quantize/dequant epilogues (3 extra
HBM round-trips per layer if unfused) are eating the MXU win -> the fix
is keeping activations int8 BETWEEN layers (quantize once per tensor,
consume int8 directly) rather than round-tripping through bf16 per site.

Run on the chip: python tools/q8_path_probe.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 32


def conv(x, w, acc):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )


def timed(step, x0, iters=50):
    f = jax.jit(lambda x: lax.fori_loop(0, iters, lambda i, x: step(x), x))
    f(x0).block_until_ready()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        f(x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters


def probe(name, h, w_, c, k):
    key = jax.random.PRNGKey(0)
    wf = np.asarray(jax.random.normal(key, (k, k, c, c), jnp.float32)) * (0.5 / (k * np.sqrt(c)))
    flops = 2 * B * h * w_ * c * c * k * k

    xb = jax.device_put(jax.random.normal(key, (B, h, w_, c), jnp.bfloat16))
    wb = jnp.asarray(wf, jnp.bfloat16)
    dt_b = timed(lambda x: conv(x, wb, jnp.bfloat16), xb)

    # q8full: exact q8_conv dataflow, chained through bf16
    w8 = jnp.asarray(np.clip(np.round(wf * 256), -127, 127).astype(np.int8))
    scale = jnp.float32(0.05)

    def stepfull(x):
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127).astype(jnp.int8)
        y32 = conv(x8, lax.optimization_barrier(w8), jnp.int32)
        return (y32.astype(jnp.float32) * (scale / 256.0)).astype(jnp.bfloat16)

    dt_f = timed(stepfull, xb)

    # q8pre: pre-quantized int8 chain
    x8 = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(-100, 100, (B, h, w_, c), dtype=np.int8))
    )

    def steppre(x):
        y = conv(x, w8, jnp.int32)
        return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)

    dt_p = timed(steppre, x8)

    print(
        f"{name:22s} bf16 {dt_b*1e3:7.3f} ms {flops/dt_b/1e12:5.1f} TF/s | "
        f"q8full {dt_f*1e3:7.3f} ms ({dt_b/dt_f:4.2f}x) | "
        f"q8pre {dt_p*1e3:7.3f} ms ({dt_b/dt_p:4.2f}x)",
        flush=True,
    )


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for name, h, w_, c, k in [
        ("x 3x3  80ch @320", 320, 320, 80, 3),
        ("x 3x3 160ch @160", 160, 160, 160, 3),
        ("x 3x3 320ch @80", 80, 80, 320, 3),
        ("x 1x1 640ch @40", 40, 40, 640, 1),
        ("l 3x3 256ch @80", 80, 80, 256, 3),
    ]:
        probe(name, h, w_, c, k)


if __name__ == "__main__":
    main()
