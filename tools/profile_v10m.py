"""Per-stage timing of the v10m serving graph on the real chip.

Times sub-graphs by truncating the layer loop at checkpoints, plus micro
benchmarks of the decode/top-k stage, using the same dependent-loop
methodology as bench.py (one jitted fori_loop, scalar fetch).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lpc_yolo_tpu.nn import build_model
from lpc_yolo_tpu.nn.fuse import fuse_conv_bn, fold_preprocess


def timeit(fn, *args, iters=16, reps=5):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            x, acc = carry
            out = fn(*((a[0],) + (x,) + a[2:]))
            s = jnp.sum(out).astype(jnp.float32) if not isinstance(out, (tuple, list, dict)) else (
                sum(jnp.sum(v).astype(jnp.float32) for v in (out.values() if isinstance(out, dict) else out))
            )
            bump = (s > jnp.float32(1e30)).astype(x.dtype)
            return x + bump, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (a[1], jnp.float32(0)))
        return acc

    float(loop(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1000.0  # ms per call


def main():
    batch = 32
    imgsz = 640
    model, variables = None, None
    model = build_model(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "lpc_yolo_tpu/cfg/models/v10/yolov10m.yaml"),
        dtype=jnp.bfloat16, deploy=True)
    variables = fuse_conv_bn(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True))
    vfold = fold_preprocess(variables)

    img = jnp.asarray((np.random.RandomState(0).rand(batch, imgsz, imgsz // 8, 24) * 255).astype(np.uint8))

    def full(v, x):
        return model.apply(v, x.astype(jnp.bfloat16), training=False, predict_only=True,
                           input_layout="WPACK")["det"]

    t_full = timeit(full, vfold, img)
    print(f"full serving step: {t_full:.3f} ms/batch ({batch / t_full * 1000:.0f} img/s)")

    # no-decode: raw head feats only
    def feats_only(v, x):
        out = model.apply(v, x.astype(jnp.bfloat16), training=False, predict_only=False,
                          input_layout="WPACK")
        o = out["one2one"] if isinstance(out, dict) and "one2one" in out else out
        if isinstance(o, dict):
            o = list(o.values())
        return sum(jnp.sum(f).astype(jnp.float32) for f in o)

    try:
        t_feats = timeit(feats_only, vfold, img)
        print(f"feats only (no decode): {t_feats:.3f} ms/batch  -> decode ~{t_full - t_feats:.3f} ms")
    except Exception as e:
        print("feats-only failed:", repr(e))

    # decode micro on random feats
    from lpc_yolo_tpu.nn.heads import decode_feats_topk

    shapes = [(80, 80), (40, 40), (20, 20)]
    no = 144
    feats = [jnp.asarray(np.random.RandomState(i).randn(batch, h, w, no), jnp.bfloat16)
             for i, (h, w) in enumerate(shapes)]

    def dec(_, f0, f1, f2):
        return decode_feats_topk([f0, f1, f2], (8., 16., 32.), 80)

    t_dec = timeit(dec, jnp.zeros(()), feats[0], feats[1], feats[2])
    print(f"decode_feats_topk micro: {t_dec:.3f} ms/batch")

    # top_k micros
    x1 = jnp.asarray(np.random.RandomState(0).randn(batch, 8400), jnp.float32)
    x2 = jnp.asarray(np.random.RandomState(1).randn(batch, 300 * 80), jnp.float32)

    def tk(_, x):
        s, i = jax.lax.top_k(x, 300)
        return jnp.sum(s) + jnp.sum(i)

    print(f"top_k (B,8400)->300 f32: {timeit(tk, jnp.zeros(()), x1):.3f} ms")
    print(f"top_k (B,24000)->300 f32: {timeit(tk, jnp.zeros(()), x2):.3f} ms")

    xb1 = x1.astype(jnp.bfloat16)

    def tkb(_, x):
        s, i = jax.lax.top_k(x, 300)
        return jnp.sum(s.astype(jnp.float32)) + jnp.sum(i)

    print(f"top_k (B,8400)->300 bf16: {timeit(tkb, jnp.zeros(()), xb1):.3f} ms")

    # per-level union top-k alternative
    def tk_lvl(_, x):
        a = x[:, :6400]
        b = x[:, 6400:8000]
        c = x[:, 8000:]
        sa, ia = jax.lax.top_k(a, 300)
        sb, ib = jax.lax.top_k(b, 300)
        sc, ic = jax.lax.top_k(c, 300)
        s = jnp.concatenate([sa, sb, sc], axis=1)
        i = jnp.concatenate([ia, ib + 6400, ic + 8000], axis=1)
        s2, k = jax.lax.top_k(s, 300)
        return jnp.sum(s2) + jnp.sum(jnp.take_along_axis(i, k, axis=1))

    print(f"per-level union top_k f32: {timeit(tk_lvl, jnp.zeros(()), x1):.3f} ms")

    # uint8 convert/relayout cost
    def conv_only(_, x):
        return jnp.sum(x.astype(jnp.bfloat16).astype(jnp.float32))

    print(f"uint8->bf16 convert+sum (B,640,80,24): {timeit(conv_only, jnp.zeros(()), img):.3f} ms")

    # layer-by-layer cumulative timing via truncated graphs
    if hasattr(model, "specs"):
        n_layers = len(model.specs)
        marks = sorted(set([2, 4, 6, 8, 10] + [n_layers - 1]))
        print("layer specs:", [(i, s.module, s.args[:2]) for i, s in enumerate(model.specs)])


if __name__ == "__main__":
    main()
