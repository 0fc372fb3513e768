"""On-chip attribution of the raw-720p e2e gap (serving vs raw-frame rows).

Round 4 measured raw-720p m at 1.76× the A100-TRT baseline vs 2.11× for the
640-serving row — the in-graph Pallas letterbox costs ~17% at m. This probe
separates that cost and measures the two letterbox rewrites:

  model_only   640 uint8-WPACK serving forward (the floor — no letterbox)
  raw_f32      old path: f32-prepared source, f32 kernel output + downstream
               bf16 cast (round-4 shipping configuration)
  raw_u8       new path: uint8 source converted in VMEM, kernel emits the
               cv2-equivalent uint8 FRAME, model side is the unmodified
               uint8-WPACK serving graph (stem folds /255)

Usage: python tools/raw720_probe.py [scale] [batch]   (default m 32)
One JSON line with all rows.
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


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "m"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    imgsz, h0, w0, iters = 640, 720, 1280, 16

    from bench import _bench_loop, _build
    from lpc_yolo_tpu.nn.fuse import fold_preprocess
    from lpc_yolo_tpu.ops.pallas_preprocess import build_letterbox_mats, letterbox_pallas

    model, variables = _build(scale)
    ry, rx, pad = map(jnp.asarray, build_letterbox_mats(h0, w0, imgsz))

    def apply_wpack(variables, x_u8):
        v = fold_preprocess(variables)  # stem absorbs /255 (bench_scale parity)
        return model.apply(
            v, x_u8.astype(jnp.bfloat16), training=False, predict_only=True,
            input_layout="WPACK",
        )["det"]

    def fwd_model_only(variables, x_u8):
        return apply_wpack(variables, x_u8)

    def fwd_raw_f32(variables, frames_u8):
        lb = jax.vmap(lambda im: letterbox_pallas(im, ry, rx, pad, size=imgsz))(frames_u8)
        x = lb.astype(jnp.bfloat16).reshape(batch, imgsz, imgsz // 8, 24)
        return model.apply(variables, x, training=False, predict_only=True,
                           input_layout="WPACK")["det"]

    def fwd_raw_u8(variables, frames_u8):
        lb = jax.vmap(
            lambda im: letterbox_pallas(im, ry, rx, pad, size=imgsz, out_dtype=jnp.uint8)
        )(frames_u8)
        return apply_wpack(variables, lb.reshape(batch, imgsz, imgsz // 8, 24))

    ry16, rx16 = ry.astype(jnp.bfloat16), rx.astype(jnp.bfloat16)

    def fwd_raw_u8_bf16(variables, frames_u8):
        # bf16 interpolation matmuls (2x MXU rate, f32 accum, <=1 LSB)
        lb = jax.vmap(
            lambda im: letterbox_pallas(im, ry16, rx16, pad, size=imgsz, out_dtype=jnp.uint8)
        )(frames_u8)
        return apply_wpack(variables, lb.reshape(batch, imgsz, imgsz // 8, 24))

    rng = np.random.RandomState(1)
    frames = jnp.asarray((rng.rand(batch, h0, w0, 3) * 255).astype(np.uint8))
    x640 = jnp.asarray(
        (rng.rand(batch, imgsz, imgsz // 8, 24) * 255).astype(np.uint8)
    )

    out = {"scale": scale, "batch": batch}
    for name, fn, feed in (
        ("model_only", fwd_model_only, x640),
        ("raw_f32", fwd_raw_f32, frames),
        ("raw_u8", fwd_raw_u8, frames),
        ("raw_u8_bf16", fwd_raw_u8_bf16, frames),
    ):
        best, p50 = _bench_loop(fn, variables, feed, iters)
        out[name] = {
            "img_s": round(batch * iters / best, 1),
            "p50_ms_per_batch": round(p50, 3),
        }
    base = out["model_only"]["p50_ms_per_batch"]
    for name in ("raw_f32", "raw_u8", "raw_u8_bf16"):
        out[name]["letterbox_overhead_ms"] = round(out[name]["p50_ms_per_batch"] - base, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
