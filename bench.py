"""Benchmark harness: flagship throughput on the real TPU chip.

Measures end-to-end NMS-free predict (yolov10n, 640x640, batch 32, bf16
compute): jitted forward + v10 decode, steady-state images/sec/chip.

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

    batch, imgsz = 32, 640
    model = build_model(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml"),
        dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)

    @jax.jit
    def predict(variables, img):
        return model.apply(variables, img, training=False, predict_only=True)["pred"]

    img = jnp.asarray(np.random.RandomState(0).rand(batch, imgsz, imgsz, 3).astype(np.float32))

    # Warmup / compile
    predict(variables, img).block_until_ready()

    # Steady state: enough iters to amortize dispatch
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(variables, img)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "images/sec/chip yolov10n 640x640 b32 bf16 (NMS-free predict)",
                "value": round(ips, 1),
                "unit": "img/s",
                "vs_baseline": round(ips / BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
