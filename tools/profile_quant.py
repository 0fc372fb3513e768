"""Profile int8 vs bf16 v10 serving on the real chip and bucket op times.

Usage: python tools/profile_quant.py [scale=x] [batch=32]

Builds the WPACK serving graph twice (bf16 and int8-PTQ, exactly as
bench.py's int8 rows do), traces each with jax.profiler, and prints the
per-op table so the int8 shortfall (probe says 1.65-1.83x, end-to-end says
+6-10%) can be attributed: which fusions stayed bf16, what the quantize/
dequantize epilogues cost, and whether the int8 convs themselves hit the
probe rate.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_one(tag, model, variables, img, trace_dir, iters=8):
    from lpc_yolo_tpu.nn.fuse import fold_preprocess

    @jax.jit
    def step(v, x):
        v = fold_preprocess(v)
        return model.apply(v, x.astype(jnp.bfloat16), training=False,
                           predict_only=True, input_layout="WPACK")["det"]

    step(variables, img).block_until_ready()
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            step(variables, img).block_until_ready()
    print(f"{tag}: traced {iters} steps -> {trace_dir}", flush=True)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    scale = kv.get("scale", "x")
    batch = int(kv.get("batch", 32))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    model, variables = bench._build(scale)
    img_np = (np.random.RandomState(0).rand(batch, 640, 80, 24) * 255).astype(np.uint8)
    img = jnp.asarray(img_np)

    from lpc_yolo_tpu.nn.quant import calibrate_serving

    scales = calibrate_serving(model, variables, [img_np])
    qmodel = model.clone(quant="int8", quant_scales=scales)
    print(f"calibrated {len(scales)} int8 sites", flush=True)

    d_bf = f"/tmp/jaxtrace_q_{scale}_bf16"
    d_q8 = f"/tmp/jaxtrace_q_{scale}_int8"
    trace_one("bf16", model, variables, img, d_bf)
    trace_one("int8", qmodel, variables, img, d_q8)

    import glob
    from collections import defaultdict

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_stats import op_category, op_times, pick_op_line

    for tag, d in (("bf16", d_bf), ("int8", d_q8)):
        pb = sorted(glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True))[-1]
        times = op_times(pb)
        line, _ = pick_op_line(times)
        rows = [(ps, n, name) for (ln, name), (ps, n) in times.items() if ln == line]
        total = sum(r[0] for r in rows)
        cats = defaultdict(int)
        for ps, _, name in rows:
            c = op_category(name)
            if c == "conv" and "s8[" in name:
                c = "conv-int8"
            cats[c] += ps
        print(f"\n===== {tag}: {total / 1e9:.2f} ms device total =====")
        for k in sorted(cats, key=cats.get, reverse=True):
            print(f"  {k:24s} {cats[k] / 1e9:8.2f} ms {100.0 * cats[k] / total:5.1f}%")
        print(f"top 20 ops:")
        for ps, n, name in sorted(rows, reverse=True)[:20]:
            print(f"{ps / 1e9:9.3f} ms {100.0 * ps / total:5.1f}%  x{n:<4d} {name[:140]}")


if __name__ == "__main__":
    main()
