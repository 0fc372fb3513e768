"""Probe: does XLA:TPU lower int8 convolutions to the MXU's int8 path?

TPU v5e advertises 394 int8 TOPS vs 197 bf16 TFLOP/s. If
`lax.conv_general_dilated` on int8 operands (int32 accumulation) runs ~2x
the bf16 rate on the dominant serving-conv shapes, an int8 serving graph
(per-channel weight scales + per-tensor activation scales, requantize
between layers) is the one remaining lever for the MXU-geometry-bound
yolov10x scale — the reference ships int8 deploy paths itself (TensorRT
int8 / TFLite int8: /root/reference/ultralytics/engine/exporter.py `int8`
flag), so an int8 TPU path is parity-legitimate.

Shapes: cin==cout so iterations chain with a pure data dependency
(int8 chains through the realistic requantize shift; bf16 chains
directly). Dependent-loop in-graph timing like bench.py.

Run on the chip: python tools/int8_probe.py
"""

import os
import sys
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
    f(x0).block_until_ready()  # compile + warm
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

    # bf16 chain
    xb = jax.device_put(jax.random.normal(key, (B, h, w_, c), jnp.bfloat16))
    wb = jnp.asarray(wf, jnp.bfloat16)
    dt_b = timed(lambda x: conv(x, wb, jnp.bfloat16), xb)

    # int8 chain: conv -> int32 -> requantize (shift) -> int8
    x8 = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(-100, 100, (B, h, w_, c), dtype=np.int8))
    )
    w8 = jnp.asarray(np.clip(np.round(wf * 256), -127, 127).astype(np.int8))

    def step8(x):
        y = conv(x, w8, jnp.int32)
        return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)

    try:
        dt_i = timed(step8, x8)
        msg = f"int8 {dt_i*1e3:7.3f} ms {flops/dt_i/1e12:6.1f} TOP/s | speedup {dt_b/dt_i:4.2f}x"
    except Exception as e:  # pragma: no cover - probe tool
        msg = f"int8 FAILED: {str(e)[:90]}"

    print(f"{name:28s} bf16 {dt_b*1e3:7.3f} ms {flops/dt_b/1e12:6.1f} TF/s | {msg}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for name, h, w_, c, k in [
        # v10x family: 1.25x widths -> partial 128-lane fill
        ("x 3x3  80ch @320", 320, 320, 80, 3),
        ("x 3x3 160ch @160", 160, 160, 160, 3),
        ("x 3x3 320ch @80", 80, 80, 320, 3),
        ("x 1x1 640ch @40", 40, 40, 640, 1),
        # v10l family: exact 128-lane tiling
        ("l 3x3 128ch @160", 160, 160, 128, 3),
        ("l 3x3 256ch @80", 80, 80, 256, 3),
        ("l 1x1 512ch @40", 40, 40, 512, 1),
        # dense control
        ("ctrl 1x1 1024ch @40", 40, 40, 1024, 1),
    ]:
        probe(name, h, w_, c, k)


if __name__ == "__main__":
    main()
