"""MXU lane-fill analysis of a model's serving graph.

Why v10x serves at 42% MFU while v10l hits 57% on the SAME architecture:
x's 1.25x width multiplier yields 80/160/320-channel convs whose output
(N) and contraction (K) dims pad to 128-lane MXU tiles at partial fill,
while l's power-of-two widths (64/128/256/512) tile exactly. This script
quantifies that: it traces every conv in the deploy serving graph
(monkeypatching lax.conv_general_dilated during an abstract eval_shape
trace, so no device time is used), computes each conv's tile fill

    fill = (N / ceil128(N)) * (K / ceil128(K)),   K = kh*kw*Cin

and reports the FLOP-weighted mean. If the measured MFU ratio
MFU(x)/MFU(l) matches fill(x)/fill(l), the x gap is MXU-geometry-bound —
no graph rewrite that preserves the model's widths can close it. (The
companion experiment, fractional width-repacking onto 128-multiple lanes,
was measured on-chip and LOSES 1.02-2.02x on every dominant x conv shape:
the scattered packed kernel multiplies real FLOPs faster than the fill
improves — see docs/tpu-design.md.)

Usage:  python tools/lane_fill.py [scale ...]   (default: n s m b l x)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def ceil128(n):
    return int(np.ceil(n / 128.0) * 128)


def conv_inventory(scale: str, batch: int = 32, imgsz: int = 640):
    """Trace the deploy serving graph abstractly; record every conv."""
    from lpc_yolo_tpu.nn.compiler import build_model

    cfg = (Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" /
           "models" / "v10" / f"yolov10{scale}.yaml")
    model = build_model(str(cfg), deploy=True, dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), training=True))
    records = []
    orig = jax.lax.conv_general_dilated

    def recording(lhs, rhs, window_strides, padding, **kw):
        out = orig(lhs, rhs, window_strides, padding, **kw)
        # NHWC/HWIO: rhs = (kh, kw, Cin/g, Cout)
        kh, kw, cin, cout = rhs.shape
        b, ho, wo = out.shape[0], out.shape[1], out.shape[2]
        records.append(dict(k=(kh, kw), cin=int(cin), cout=int(cout),
                            m=int(b * ho * wo),
                            flops=2.0 * b * ho * wo * kh * kw * cin * cout))
        return out

    jax.lax.conv_general_dilated = recording
    try:
        # WPACK feed (uint8 in the real path; bf16 here so the abstract trace
        # doesn't depend on the fold-normalize-into-conv variable rewrite)
        img = jnp.zeros((batch, imgsz, imgsz // 8, 24), jnp.bfloat16)
        jax.eval_shape(
            lambda v, x: model.apply(v, x, training=False, predict_only=True,
                                     input_layout="WPACK"),
            variables, img)
    finally:
        jax.lax.conv_general_dilated = orig
    return records


def analyze(scale: str):
    recs = conv_inventory(scale)
    tot = sum(r["flops"] for r in recs)
    wfill = 0.0
    worst = []
    for r in recs:
        K = r["k"][0] * r["k"][1] * r["cin"]
        N = r["cout"]
        fill = (N / ceil128(N)) * (K / ceil128(K))
        wfill += r["flops"] / tot * fill
        worst.append((r["flops"] * (1 - fill), r, fill))
    worst.sort(key=lambda t: -t[0])
    return dict(scale=scale, convs=len(recs), gflops=tot / 1e9,
                flop_weighted_fill=wfill, worst=worst[:4])


def main(scales):
    rows = [analyze(s) for s in scales]
    print(f"{'scale':6} {'convs':>5} {'GF/b32':>8} {'FLOP-weighted tile fill':>24}")
    for r in rows:
        print(f"{r['scale']:6} {r['convs']:>5} {r['gflops']:>8.1f} "
              f"{r['flop_weighted_fill']*100:>23.1f}%")
    for r in rows:
        if r["flop_weighted_fill"] < 0.98:
            print(f"\n  {r['scale']}: largest padded-FLOP sites")
            for wasted, rec, fill in r["worst"]:
                print(f"    {rec['k'][0]}x{rec['k'][1]} {rec['cin']}->{rec['cout']}"
                      f"  fill {fill*100:.0f}%  ({rec['flops']/1e9:.1f} GF)")
    if {"l", "x"} <= set(scales):
        fl = next(r for r in rows if r["scale"] == "l")["flop_weighted_fill"]
        fx = next(r for r in rows if r["scale"] == "x")["flop_weighted_fill"]
        print(f"\npredicted MFU ratio x/l from geometry alone: {fx/fl:.2f}"
              f"  (measured on v5e: 42%/57% = 0.74)")


if __name__ == "__main__":
    main(sys.argv[1:] or ["n", "s", "m", "b", "l", "x"])
