"""Profile a deploy-graph forward on the real TPU and dump top ops by time.

Usage: python tools/profile_model.py [scale=m] [batch=32] [imgsz=640] [iters=8]

Builds the requested v10 scale exactly as bench.py serves it (deploy=True,
conv+BN fused, /255+BGR folded into conv1, WPACK uint8 feed), traces a few
steps with jax.profiler, then parses the trace protobuf-json to print the
per-op time table (HLO op name + long_name with layouts). This is the
measure-first tool for serving-path optimization — see memory note
tpu-tunnel-workflow: per-fusion microseconds from the trace are exact.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    scale = kv.get("scale", "m")
    batch = int(kv.get("batch", 32))
    imgsz = int(kv.get("imgsz", 640))
    iters = int(kv.get("iters", 8))
    trace_dir = kv.get("dir", f"/tmp/jaxtrace_v10{scale}_b{batch}")

    from lpc_yolo_tpu.nn import build_model
    from lpc_yolo_tpu.nn.fuse import fold_preprocess, fuse_conv_bn

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = (
        "lpc_yolo_tpu/cfg/models/v10/yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml"
        if scale == "lpc"
        else f"lpc_yolo_tpu/cfg/models/v10/yolov10{scale}.yaml"
    )
    model = build_model(os.path.join(root, cfg), dtype=jnp.bfloat16, deploy=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    variables = fuse_conv_bn(variables)

    @jax.jit
    def step(variables, img_u8):
        variables = fold_preprocess(variables)
        x = img_u8.astype(jnp.bfloat16)
        return model.apply(variables, x, training=False, predict_only=True, input_layout="WPACK")["det"]

    img = jnp.asarray(
        (np.random.RandomState(0).rand(batch, imgsz, imgsz // 8, 24) * 255).astype(np.uint8)
    )
    print(f"compiling v10{scale} b{batch}...", flush=True)
    t0 = time.perf_counter()
    step(variables, img).block_until_ready()
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)

    # timing without profiler overhead
    for _ in range(2):
        step(variables, img).block_until_ready()
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        step(variables, img).block_until_ready()
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[len(times) // 2] * 1000
    print(f"p50 step {ms:.2f} ms  -> {batch / (ms / 1000):.0f} img/s", flush=True)

    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        step(variables, img).block_until_ready()
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert traces, f"no trace under {trace_dir}"
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # find the device pid
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    by_op = defaultdict(float)
    long_names = {}
    n_steps = 0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        by_op[name] += e.get("dur", 0)
        ln = e.get("args", {}).get("long_name")
        if ln and name not in long_names:
            long_names[name] = ln
    total = sum(by_op.values())
    print(f"\ndevice total {total / 1000:.2f} ms over {iters} steps = {total / 1000 / iters:.3f} ms/step")
    print(f"{'us/step':>9}  {'%':>5}  op")
    for name, dur in sorted(by_op.items(), key=lambda x: -x[1])[:45]:
        ln = long_names.get(name, "")[:190]
        print(f"{dur / iters:9.1f}  {100 * dur / total:5.1f}  {name[:60]}  | {ln}")


if __name__ == "__main__":
    main()
