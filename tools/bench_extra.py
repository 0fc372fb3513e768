"""Extended serving-bench rows beyond bench.py's BASELINE-named set.

Benches the LPC-YOLO tiny flagship (the fork's namesake model), yolov10x,
and large-batch v10n/v10m configs on the current deploy serving graph, with
the same in-graph dependent-loop methodology as bench.py.

Usage: python tools/bench_extra.py [lpc|v10x|b128|all]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench as B  # noqa: E402


def bench_cfg(cfg_rel, batch=32, imgsz=640, iters=48):
    from lpc_yolo_tpu.nn import build_model
    from lpc_yolo_tpu.nn.fuse import fold_preprocess, fuse_conv_bn

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = build_model(os.path.join(root, cfg_rel), dtype=jnp.bfloat16, deploy=True)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
        variables = fuse_conv_bn(variables)
    variables = jax.device_put(variables, jax.devices()[0])

    def forward(v, img_u8):
        v = fold_preprocess(v)
        return model.apply(v, img_u8.astype(jnp.bfloat16), training=False,
                           predict_only=True, input_layout="WPACK")["det"]

    img = jnp.asarray(
        (np.random.RandomState(0).rand(batch, imgsz, imgsz // 8, 24) * 255).astype(np.uint8)
    )
    best, p50 = B._bench_loop(forward, variables, img, iters)
    ips = batch * iters / best
    gflops = B._model_gflops(model, variables, batch, imgsz)
    tflops = ips * gflops / batch / 1000.0 if gflops else 0.0
    return {
        "img_s": round(ips, 1),
        "p50_ms_per_batch": round(p50, 3),
        "p50_ms_per_image": round(p50 / batch, 4),
        "gflops_fwd_batch": round(gflops, 1),
        "achieved_tflops": round(tflops, 1),
        "mfu_pct": round(100.0 * tflops / B.PEAK_BF16_TFLOPS, 1) if tflops else 0.0,
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rows = {}
    if which in ("lpc", "all"):
        rows["lpc_tiny_b32"] = bench_cfg(
            "lpc_yolo_tpu/cfg/models/v10/yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml", batch=32
        )
    if which in ("v10x", "all"):
        rows["yolov10x_b32"] = bench_cfg("lpc_yolo_tpu/cfg/models/v10/yolov10x.yaml", batch=32, iters=24)
    if which in ("bl", "all"):
        rows["yolov10b_b32"] = bench_cfg("lpc_yolo_tpu/cfg/models/v10/yolov10b.yaml", batch=32, iters=24)
        rows["yolov10l_b32"] = bench_cfg("lpc_yolo_tpu/cfg/models/v10/yolov10l.yaml", batch=32, iters=24)
    if which in ("b128", "all"):
        rows["yolov10n_b128"] = bench_cfg("lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml", batch=128, iters=24)
        rows["yolov10m_b128"] = bench_cfg("lpc_yolo_tpu/cfg/models/v10/yolov10m.yaml", batch=128, iters=12)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
