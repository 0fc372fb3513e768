"""Benchmark harness: flagship throughput on the real TPU chip.

Measures the deployed NMS-free predict path end-to-end on device for
yolov10n @640x640, batch 32: uint8 input -> normalize to bf16 (the on-device
preprocess stage) -> backbone -> neck -> v10 head -> fused DFL/top-k decode.
The model is built with deploy=True (slice/concat-free C2f rewrite,
nn/modules.py) and runs on conv+BN-fused variables (nn/fuse.py) — i.e. the
same graph the Predictor serves.

Methodology note: the axon-tunneled device makes per-call host timing
unreliable (async completion + slow device->host fetch), so the benchmark
runs N forward passes inside ONE jitted lax.fori_loop with a data dependency
between iterations (output perturbs the next input, preventing CSE), and
fetches a single scalar. Wall-clock of that dispatch / N gives per-batch step
latency; /(N*batch) gives per-image throughput. p50_ms_per_batch is the
median over repeated dispatches of the looped step time.

Baseline comparator (BASELINE.md §B): the reference's YOLOv8n A100-TensorRT
latency of 0.99 ms/img => ~1010 img/s; vs_baseline = ours / 1010.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
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
    from lpc_yolo_tpu.nn.fuse import fold_preprocess, fuse_conv_bn

    batch, imgsz, iters = 32, 640, 16
    model = build_model(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml"),
        dtype=jnp.bfloat16,
        deploy=True,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    variables = fuse_conv_bn(variables)

    def forward(variables, img_u8):
        # width-packed uint8 feed: (B, H, W/8, 8*3) is the same bytes as NHWC
        # (free host reshape) but the stem then runs on dense 128-lane tiles
        # (compiler._wpack_prefix), unpacking once at C>=128. The /255
        # normalize is folded into the first conv kernel (fuse.fold_preprocess)
        # so the image-side preprocess is a bare uint8->bf16 convert.
        variables = fold_preprocess(variables)
        x = img_u8.astype(jnp.bfloat16)
        return model.apply(variables, x, training=False, predict_only=True, input_layout="WPACK")["det"]

    @jax.jit
    def bench_loop(variables, img_u8):
        def body(i, carry):
            img, acc = carry
            det = forward(variables, img)
            s = jnp.sum(det[:, 0, 4]).astype(jnp.float32)
            # data dependency defeats cross-iteration CSE; the xor is a no-op
            # on the image content scale but ties iteration i+1 to i's output
            bump = (s > jnp.float32(1e30)).astype(jnp.uint8)
            return img + bump, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (img_u8, jnp.float32(0)))
        return acc

    img = jnp.asarray(
        (np.random.RandomState(0).rand(batch, imgsz, imgsz // 8, 24) * 255).astype(np.uint8)
    )

    float(bench_loop(variables, img))  # compile + warmup (scalar fetch = real sync)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(bench_loop(variables, img))  # scalar fetch forces full completion
        times.append(time.perf_counter() - t0)
    best = min(times)
    p50 = sorted(times)[len(times) // 2] / iters * 1000.0
    ips = batch * iters / best

    print(
        json.dumps(
            {
                "metric": "images/sec/chip yolov10n 640x640 b32 bf16 (uint8-in e2e: normalize + NMS-free predict + top-k decode)",
                "value": round(ips, 1),
                "unit": "img/s",
                "vs_baseline": round(ips / BASELINE_IMG_PER_S, 3),
                "p50_ms_per_batch": round(p50, 3),
                "p50_ms_per_image": round(p50 / batch, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
