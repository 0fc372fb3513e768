"""Benchmark harness: flagship throughput on the real TPU chip.

Measures the NMS-free predict path (yolov10n, 640x640, batch 32, bf16
compute): normalize -> backbone -> neck -> v10 head -> DFL decode -> top-k.

Methodology note: the axon-tunneled device makes per-call host timing
unreliable (async completion + ~1 MB/s device->host fetch), so the benchmark
runs N forward passes inside ONE jitted lax.fori_loop with a data dependency
between iterations (output perturbs the next input by 1e-12, preventing CSE),
and fetches a single scalar. Wall-clock of that one dispatch / (N * batch)
gives per-image throughput of pure device compute.

Baseline comparator (BASELINE.md §B): the reference's YOLOv8n A100-TensorRT
latency of 0.99 ms/img => ~1010 img/s; vs_baseline = ours / 1010.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_S = 1010.0  # YOLOv8n on A100 TensorRT (docs/en/models/yolov8.md:59)


def main():
    from lpc_yolo_tpu.nn import build_model

    batch, imgsz, iters = 32, 640, 16
    model = build_model(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml"),
        dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)

    def forward(variables, img):
        return model.apply(variables, img, training=False, predict_only=True)["det"]

    @jax.jit
    def bench_loop(variables, img):
        def body(i, carry):
            x, acc = carry
            det = forward(variables, x)
            s = jnp.sum(det[:, 0, 4]).astype(jnp.float32)
            # data dependency defeats cross-iteration CSE; 1e-12 is numerically nil
            return x + 1e-12 * s, acc + s

        x, acc = jax.lax.fori_loop(0, iters, body, (img, jnp.float32(0)))
        return acc

    img = jnp.asarray(np.random.RandomState(0).rand(batch, imgsz, imgsz, 3).astype(np.float32))

    float(bench_loop(variables, img))  # compile + warmup (scalar fetch = real sync)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_loop(variables, img))  # scalar fetch forces full completion
        best = min(best, time.perf_counter() - t0)
    ips = batch * iters / best

    print(
        json.dumps(
            {
                "metric": "images/sec/chip yolov10n 640x640 b32 bf16 (NMS-free predict incl. top-k decode)",
                "value": round(ips, 1),
                "unit": "img/s",
                "vs_baseline": round(ips / BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
