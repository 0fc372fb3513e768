"""Per-HLO-op profile of the v10m serving step via the TPU xplane trace.

Captures a jax.profiler trace of the real serving graph (same feed as
bench.py), converts it with tensorboard_plugin_profile's hlo_stats tool, and
prints the top ops by self-time so the 37 ms/batch budget is attributed to
actual compiled ops (convs in context, layout copies, top-k, fusions) rather
than isolated micro-benchmarks.
"""

import glob
import json
import os
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lpc_yolo_tpu.nn import build_model
from lpc_yolo_tpu.nn.fuse import fuse_conv_bn, fold_preprocess

TRACE_DIR = "/tmp/jtrace_v10m"


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "m"
    batch, imgsz = 32, 640
    model = build_model(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     f"lpc_yolo_tpu/cfg/models/v10/yolov10{scale}.yaml"),
        dtype=jnp.bfloat16, deploy=True)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = fuse_conv_bn(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
        )
        vfold = fold_preprocess(variables)
    vfold = jax.device_put(vfold, jax.devices()[0])

    @jax.jit
    def step(v, x):
        return model.apply(v, x.astype(jnp.bfloat16), training=False, predict_only=True,
                           input_layout="WPACK")["det"]

    img = jnp.asarray((np.random.RandomState(0).rand(batch, imgsz, imgsz // 8, 24) * 255).astype(np.uint8))
    # compile + warm
    step(vfold, img).block_until_ready()
    step(vfold, img).block_until_ready()

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(8):
            out = step(vfold, img)
        out.block_until_ready()

    xplanes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes, flush=True)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, {})
            outp = f"/tmp/{tool}_{scale}.json"
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            with open(outp, "w") as f:
                f.write(data)
            print(f"wrote {outp} ({len(data)} bytes)", flush=True)
            break
        except Exception as e:
            print(f"{tool} failed: {e!r:.200}", flush=True)


if __name__ == "__main__":
    main()
