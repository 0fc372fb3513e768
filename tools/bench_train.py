"""Training-step throughput on the real chip: f32 vs bf16 (amp) compute.

One full production train step (fwd + v10 dual loss + bwd + clip/SGD update +
EMA + BN stats) on synthetic COCO-shaped data. Steps chain through the train
state, so plain per-step dispatch timing is sound (the ~1.5 ms dispatch
overhead is <2% of a step).

Usage: python tools/bench_train.py [n|s|m] [batch]
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


def bench_train(scale="n", batch=32, imgsz=640, steps=16, dtype=jnp.float32, train_pack=False):
    from lpc_yolo_tpu.engine.train_step import OptConfig, init_train_state, make_train_step
    from lpc_yolo_tpu.nn import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = build_model(
        os.path.join(root, f"lpc_yolo_tpu/cfg/models/v10/yolov10{scale}.yaml"),
        dtype=dtype, train_pack=train_pack,
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
    batch_d = {
        "img": jnp.asarray((rng.rand(batch, imgsz, imgsz, 3) * 255).astype(np.uint8)),
        "cls": jnp.asarray(rng.randint(0, 80, (batch, M)).astype(np.int32)),
        "bboxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "mask": jnp.asarray(np.ones((batch, M), bool)),
    }
    state, metrics = train_step(state, batch_d)  # compile + step 1
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, batch_d)
    loss = float(metrics["loss"])  # fetch = sync
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    return {
        "img_s": round(batch * steps / dt, 1),
        "ms_per_step": round(dt / steps * 1000.0, 2),
        "loss": round(loss, 4),
    }


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "n"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = {
        f"train_{scale}_b{batch}_f32": bench_train(scale, batch, dtype=jnp.float32),
        f"train_{scale}_b{batch}_bf16": bench_train(scale, batch, dtype=jnp.bfloat16),
        f"train_{scale}_b{batch}_bf16_pack": bench_train(scale, batch, dtype=jnp.bfloat16, train_pack=True),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
