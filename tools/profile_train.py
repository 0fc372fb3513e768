"""Per-HLO-op profile of the full train step via the TPU xplane trace.

Same methodology as profile_trace.py but for the donated training program
(fwd + v10 dual loss + bwd + clip/SGD + EMA + BN stats): captures a
jax.profiler trace of a few chained steps and prints the top ops by device
self-time, so the ms/step budget is attributed to compiled ops.

Usage: python tools/profile_train.py [n|s|m] [batch] [pack|nopack]
(default pack on TPU — same auto as the Trainer)
"""

import os
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/jtrace_train"


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "n"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    imgsz = 640
    pack = (sys.argv[3] if len(sys.argv) > 3 else
            ("pack" if jax.default_backend() == "tpu" else "nopack")) == "pack"

    from lpc_yolo_tpu.engine.train_step import OptConfig, init_train_state, make_train_step
    from lpc_yolo_tpu.nn import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = build_model(
        os.path.join(root, f"lpc_yolo_tpu/cfg/models/v10/yolov10{scale}.yaml"),
        dtype=jnp.bfloat16, train_pack=pack,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
        cfg = OptConfig(total_steps=1000, warmup_steps=10)
        state, tx = init_train_state(model, variables, cfg)
    state = jax.device_put(state, jax.devices()[0])
    train_step = make_train_step(model, tx, cfg)

    M = 32
    rng = np.random.RandomState(0)
    wh = rng.rand(batch, M, 2) * 200 + 8
    xy = rng.rand(batch, M, 2) * (imgsz - 260) + 10
    img_u8 = (rng.rand(batch, imgsz, imgsz, 3) * 255).astype(np.uint8)
    if pack:
        # width-packed feed, as the Trainer ships it on TPU
        img_u8 = img_u8.reshape(batch, imgsz, imgsz // 8, 24)
    batch_d = {
        "img": jnp.asarray(img_u8),
        "cls": jnp.asarray(rng.randint(0, 80, (batch, M)).astype(np.int32)),
        "bboxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "mask": jnp.asarray(np.ones((batch, M), bool)),
    }
    state, metrics = train_step(state, batch_d)  # compile + warm
    jax.block_until_ready(metrics["loss"])

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            state, metrics = train_step(state, batch_d)
        jax.block_until_ready(metrics["loss"])

    import glob

    from collections import defaultdict

    from xplane_stats import op_category, op_times, pick_op_line

    files = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    times = op_times(files[-1])
    line, _ = pick_op_line(times)
    rows = [(ps, n, name) for (ln, name), (ps, n) in times.items() if ln == line]
    total = sum(r[0] for r in rows)
    print(f"steps traced: 4; device total {total / 1e9:.2f} ms ({total / 4e9:.2f} ms/step)")
    cats = defaultdict(int)
    for ps, _, name in rows:
        cats[op_category(name)] += ps
    for k in sorted(cats, key=cats.get, reverse=True):
        print(f"  {k:40s} {cats[k] / 4e9:8.3f} ms/step {100.0 * cats[k] / total:5.1f}%")
    for ps, n, name in sorted(rows, reverse=True)[:40]:
        print(f"{ps / 1e9:9.3f} ms {100.0 * ps / total:5.1f}%  x{n:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
