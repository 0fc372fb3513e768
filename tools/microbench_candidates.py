"""Round-3 v10m candidates, measured per-op on the real chip via traces.

Questions this answers (see tools/microbench_conv.py for the harness notes):
  1. Is the 48ch@160^2 pathology about channels (lane waste) or spatial size?
     -> channel sweep at fixed 160^2 and spatial sweep at fixed 64ch.
  2. Does zero-padding channels to 64/128 beat width-packing? (exactness is
     free: zero input channels x zero kernel rows contribute nothing)
  3. Does a full 2x2 space-to-depth stage (4x FLOPs, dense lanes) win at 160^2?
  4. TopK f32[32,24000]->300: plain lax.top_k vs approx_max_k vs two-stage
     exact (group top-300 then merge).
  5. The uint8 WPACK feed convert: plain convert cost (the ~1 ms relayout).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.microbench_conv import conv, device_us, s2d, s2d_kernel  # noqa: E402


def main():
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    rows = []

    def run(name, fn, *args):
        us = device_us(fn, *args, tag=name.replace(" ", "_").replace("/", "_").replace(">", "")[:40])
        rows.append((name, us))
        print(f"{us:9.1f} us  {name}", flush=True)

    def mk(b, h, w, c):
        return jnp.asarray(rng.rand(b, h, w, c), dt)

    def mkw(k, ci, co):
        return jnp.asarray(rng.rand(k, k, ci, co) * 0.1, dt)

    # -- 1+2: channel sweep @160^2 (the v10m C2f96 stage runs 48/96 here)
    for c in (48, 64, 96, 128):
        run(f"3x3 {c}->{c} @160^2 b32", conv, mk(32, 160, 160, c), mkw(3, c, c))
    # spatial sweep at 64ch
    for hw in (80, 320):
        run(f"3x3 64->64 @{hw}^2 b32", conv, mk(32, hw, hw, 64), mkw(3, 64, 64))

    # -- 3: S2D stage for the 96ch @160^2 conv (4x FLOPs dense)
    x96 = mk(32, 160, 160, 96)
    w96 = mkw(3, 96, 96)
    run("3x3 96->96 @160^2 b32", conv, x96, w96)
    xs = jnp.asarray(s2d(np.asarray(x96, np.float32)), dt)
    ws = jnp.asarray(s2d_kernel(np.asarray(w96, np.float32)), dt)
    run("  as S2D 3x3 384->384 @80^2", conv, xs, ws)

    # -- 4: TopK variants on the decode shape
    scores = jnp.asarray(rng.rand(32, 24000).astype(np.float32))

    def topk_plain(s):
        v, i = jax.lax.top_k(s, 300)
        return v + i.astype(jnp.float32)

    def topk_approx(s):
        v, i = jax.lax.approx_max_k(s, 300, recall_target=0.95)
        return v + i.astype(jnp.float32)

    def topk_approx_exact(s):
        v, i = jax.lax.approx_max_k(s, 300, recall_target=1.0)
        return v + i.astype(jnp.float32)

    def topk_two_stage(s):
        g = s.reshape(32, 8, 3000)
        v1, i1 = jax.lax.top_k(g, 300)  # [32,8,300]
        base = (jnp.arange(8, dtype=jnp.int32) * 3000)[None, :, None]
        flat_v = v1.reshape(32, 2400)
        flat_i = (i1 + base).reshape(32, 2400)
        v2, i2 = jax.lax.top_k(flat_v, 300)
        idx = jnp.take_along_axis(flat_i, i2, axis=1)
        return v2 + idx.astype(jnp.float32)

    run("topk plain f32[32,24000]->300", topk_plain, scores)
    run("topk approx r=0.95", topk_approx, scores)
    run("topk approx r=1.0", topk_approx_exact, scores)
    run("topk two-stage 8x3000", topk_two_stage, scores)

    # -- 5: WPACK uint8 convert (the input relayout)
    u8 = jnp.asarray((rng.rand(32, 640, 80, 24) * 255).astype(np.uint8))
    run("uint8(32,640,80,24)->bf16 convert", lambda t: t.astype(jnp.bfloat16) * jnp.bfloat16(1.001), u8)

    print("\nsummary:")
    for n, us in rows:
        print(f"{us:9.1f} us  {n}")


if __name__ == "__main__":
    main()
