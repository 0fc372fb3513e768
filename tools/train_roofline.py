"""Roofline ceiling analysis for the full train step.

Answers "how far is the measured train step from the hardware floor, and
where is the remaining time structural?" — the quantified version of the
train-throughput story (reference hot loop: engine/trainer.py:362-394).

Method:
  1. compile the production train step (fwd + v10 dual loss + bwd +
     clip/SGD + EMA + BN stats, bf16 compute, train_pack auto) and read
     XLA's own cost analysis of the optimized HLO: total FLOPs and total
     HBM bytes accessed (operands + outputs per fusion, i.e. the traffic
     the schedule actually pays, not a theoretical minimum);
  2. time the step with the in-graph dependent scan (the only sound
     methodology over the tunneled device — see bench.py);
  3. capture an xplane trace and bucket device self-time by op family
     (conv fusions / BN-stat reduces / layout copies / other fusions);
  4. floors: MXU floor = FLOPs / 197 TFLOP/s, HBM floor = bytes / 819 GB/s
     (v5e). roofline = max(both); report measured/roofline and per-bucket
     shares so the README claim "the remaining gap is structural" is a
     number, not an adjective.

Usage: python tools/train_roofline.py [n|s|m|lpc] [batch]
"""

import glob
import json
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK_BF16_TFLOPS = 197.0  # TPU v5e MXU peak
HBM_GBPS = 819.0  # TPU v5e HBM bandwidth
TRACE_DIR = "/tmp/jtrace_roofline"
TRACE_STEPS = 4


def build(scale="n", batch=32, imgsz=640):
    from lpc_yolo_tpu.engine.train_step import OptConfig, init_train_state, make_train_step
    from lpc_yolo_tpu.nn import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = (
        "lpc_yolo_tpu/cfg/models/v10/yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml"
        if scale == "lpc"
        else f"lpc_yolo_tpu/cfg/models/v10/yolov10{scale}.yaml"
    )
    model = build_model(
        os.path.join(root, cfg_path),
        dtype=jnp.bfloat16,
        train_pack=jax.default_backend() == "tpu",
    )
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
        cfg = OptConfig(total_steps=1000, warmup_steps=10)
        state, tx = init_train_state(model, variables, cfg)
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(model, tx, cfg)

    M = 32
    rng = np.random.RandomState(0)
    wh = rng.rand(batch, M, 2) * 200 + 8
    xy = rng.rand(batch, M, 2) * (imgsz - 260) + 10
    img_u8 = (rng.rand(batch, imgsz, imgsz, 3) * 255).astype(np.uint8)
    if getattr(model, "train_pack", False):
        img_u8 = img_u8.reshape(batch, imgsz, imgsz // 8, 24)
    batch_d = {
        "img": jnp.asarray(img_u8),
        "cls": jnp.asarray(rng.randint(0, 80, (batch, M)).astype(np.int32)),
        "bboxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "mask": jnp.asarray(np.ones((batch, M), bool)),
    }
    return step, state, batch_d


def measure_ms(step, state, batch_d, steps=24):
    @jax.jit
    def run(state, batch):
        def body(s, _):
            s2, m = step(s, batch)
            return s2, m["loss"]

        _, losses = jax.lax.scan(body, state, None, length=steps)
        return losses[-1]

    loss = float(run(state, batch_d))
    assert np.isfinite(loss), loss
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, batch_d))
        times.append(time.perf_counter() - t0)
    return min(times) / steps * 1000.0


def cost(step, state, batch_d):
    c = jax.jit(step).lower(state, batch_d).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def classify(name, batch=32):
    """Sharper step-budget attribution than xplane_stats.op_category: splits
    the conv-fusion mass into kernel-grad vs activation work and pulls the
    loss/assigner ops (anchor-count 8400 in an operand) into their own
    bucket. Shape heuristics verified by eyeballing the top-40 events of a
    v10n b32 trace (kernel-grad fusions write (k,k,Cin,Cout) outputs with
    k<=7; activation convs/grads write (32,H,W,C))."""
    import re

    from xplane_stats import op_category

    cat = op_category(name)
    if cat in ("async-dma", "layout-copy", "small-vec reduces (BN stats/grads)"):
        return cat
    if "8400" in name:
        return "loss/assigner"
    m = re.match(r"%\S+ = \(?(?:f32|bf16|u8|s32|pred|f16)\[([\d,]*)\]", name)
    s = [int(x) for x in m.group(1).split(",") if x] if m else None
    if cat in ("conv", "fusion", "other"):
        if s and len(s) == 4 and s[0] <= 7 and s[1] <= 8 and s[0] != batch:
            return "conv kernel-grads"
        if name.startswith(("%fusion", "(u8[")) and "bf16[3,3,1," in name:
            return "conv kernel-grads"  # depthwise kernel-grad tuple outputs
        if s and len(s) >= 4 and s[0] == batch:
            return "conv/act fusions"
    return cat


def trace_buckets(step, state, batch_d):
    """-> {bucket: ms/step} from an xplane capture of TRACE_STEPS chained steps."""
    from xplane_stats import op_times, pick_op_line

    @jax.jit
    def run(state, batch):
        def body(s, _):
            s2, m = step(s, batch)
            return s2, m["loss"]

        _, losses = jax.lax.scan(body, state, None, length=TRACE_STEPS)
        return losses[-1]

    float(run(state, batch_d))  # compile outside the trace
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        float(run(state, batch_d))
    pb = max(glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True), key=os.path.getmtime)
    times = op_times(pb)
    line, _ = pick_op_line(times)
    buckets = {}
    for (ln, name), (ps, _n) in times.items():
        if ln != line:
            continue
        if name.startswith(("%while", "%conditional", "%call")):
            # enclosing control-flow events span their whole body on the op
            # line — counting them double-counts the entire step
            continue
        cat = classify(name, batch=int(batch_d["cls"].shape[0]))
        buckets[cat] = buckets.get(cat, 0.0) + ps / 1e9 / TRACE_STEPS
    return buckets


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "n"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    step, state, batch_d = build(scale, batch)
    flops, bytes_acc = cost(step, state, batch_d)
    ms = measure_ms(step, state, batch_d)
    buckets = trace_buckets(step, state, batch_d)

    mxu_floor_ms = flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3
    # NOTE: XLA's "bytes accessed" counts every fusion operand per-consumer,
    # so it is an UPPER BOUND on true HBM traffic, not a floor — on this
    # model the measured step beats the naive bytes/bandwidth time, proof
    # that vmem residency/reuse across fusions is real. Report it as bound.
    hbm_upper_ms = bytes_acc / (HBM_GBPS * 1e9) * 1e3
    out = {
        "scale": scale,
        "batch": batch,
        "measured_ms_per_step": round(ms, 2),
        "img_s": round(batch / ms * 1e3, 1),
        "gflops_per_step": round(flops / 1e9, 1),
        "xla_bytes_accessed_gb": round(bytes_acc / 1e9, 2),
        "mxu_floor_ms": round(mxu_floor_ms, 2),
        "hbm_upper_bound_ms": round(hbm_upper_ms, 2),
        "x_of_mxu_floor": round(ms / mxu_floor_ms, 2),
        "train_mfu_pct": round(100.0 * (flops / 1e9 / ms) / PEAK_BF16_TFLOPS, 1),
        "buckets_ms": {k: round(v, 2) for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])},
    }
    print(json.dumps(out), flush=True)
    print(f"\n{scale} b{batch}: measured {ms:.1f} ms/step = {out['x_of_mxu_floor']}x the "
          f"pure-MXU floor ({mxu_floor_ms:.1f} ms); XLA bytes-accessed upper bound "
          f"{hbm_upper_ms:.1f} ms", flush=True)
    for k, v in out["buckets_ms"].items():
        print(f"  {v:7.2f} ms  {100 * v / ms:5.1f}%  {k}", flush=True)


if __name__ == "__main__":
    main()
