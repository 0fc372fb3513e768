"""Letterbox-kernel-only sweep: tile size x matmul dtype, on-chip.

The raw-720p probe showed the m-scale letterbox overhead (2.2 ms/batch) is
NOT MXU-rate-bound (bf16 mats didn't move it), pointing at per-program cost:
32 imgs x 3 channels x (640/tile) row-tiles programs per batch, each paying
the u8->i32->f32 cast of its src plane slice plus dispatch. Bigger tiles =
fewer programs = fewer repeated casts (the src plane is re-cast by every
row-tile that reads it).

Usage: python tools/letterbox_sweep.py    (one JSON line per config)
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

from lpc_yolo_tpu.ops.pallas_preprocess import build_letterbox_mats, letterbox_pallas  # noqa: E402


def main():
    batch, h0, w0, size = 32, 720, 1280, 640
    rng = np.random.RandomState(1)
    frames = jnp.asarray((rng.rand(batch, h0, w0, 3) * 255).astype(np.uint8))
    ry_np, rx_np, pad_np = build_letterbox_mats(h0, w0, size)
    pad = jnp.asarray(pad_np)

    ITERS = 24
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        ry, rx = jnp.asarray(ry_np, dt), jnp.asarray(rx_np, dt)
        for tile in (128, 320, 640):

            @jax.jit
            def run(frames):
                # in-graph dependent loop — per-call dispatch over the tunnel
                # costs ~25 ms, far more than the kernel itself (bench.py
                # methodology note)
                def body(i, carry):
                    fr, acc = carry
                    lb = jax.vmap(
                        lambda im: letterbox_pallas(
                            im, ry, rx, pad, size=size, tile=tile, out_dtype=jnp.uint8
                        )
                    )(fr)
                    s = jnp.sum(lb[:, 0].astype(jnp.int32))
                    bump = (s > jnp.int32(2**30)).astype(fr.dtype)
                    return fr + bump, acc + s

                _, acc = jax.lax.fori_loop(0, ITERS, body, (frames, jnp.int32(0)))
                return acc

            try:
                int(run(frames))  # compile + warm
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    int(run(frames))
                    times.append(time.perf_counter() - t0)
                ms = min(times) / ITERS * 1e3
                print(
                    json.dumps(
                        {"mxu_dtype": dt_name, "tile": tile, "ms_per_batch": round(ms, 3)}
                    ),
                    flush=True,
                )
            except Exception as e:
                print(
                    json.dumps(
                        {"mxu_dtype": dt_name, "tile": tile, "error": f"{type(e).__name__}: {e}"[:200]}
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
