#!/usr/bin/env python
"""Pre-commit smoke: the minimum execution evidence before ANY snapshot commit.

Round 4 shipped an unexecuted one-line bug that broke every model build
(BENCH_r04 rc=1, MULTICHIP_r04 ok=false, 181/390 tests failing). This script
makes snapshot verification mechanical — run it before every end-of-round
commit:

    python tools/smoke.py            # CPU, ~2 min warm cache
    python tools/smoke.py --tpu      # also runs one real-chip bench iter

Checks, in order (hard-fails on the first miss):
  1. v10n builds and a forward pass runs (training + deploy-serving graphs)
  2. one bench_scale-style serving iteration executes and returns finite dets
  3. __graft_entry__.entry() compiles single-device
  4. __graft_entry__.dryrun_multichip(2) runs a sharded train step
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USE_TPU = "--tpu" in sys.argv
if not USE_TPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2 --xla_backend_optimization_level=0"
    )
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import numpy as np  # noqa: E402

import jax  # noqa: E402

if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def step(msg):
    print(f"[smoke] {msg}", flush=True)


def main():
    # 1. build + forward (training and deploy graphs)
    step("build yolov10n + forward (train & deploy graphs)")
    from lpc_yolo_tpu.nn import build_model
    from lpc_yolo_tpu.nn.fuse import fold_preprocess

    cfg = os.path.join(ROOT, "lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml")
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    out = model.apply(v, jnp.zeros((2, 64, 64, 3)), training=True, mutable=["batch_stats"])[0]
    assert isinstance(out, dict) and "one2many" in out, "training forward broke"

    # 2. one serving iteration on the real deploy path (WPACK uint8 feed)
    step("deploy-serving iteration (WPACK uint8 -> det)")
    dmodel = model.clone(deploy=True)

    @jax.jit
    def serve(v, x_u8):
        vv = fold_preprocess(v, bgr=True)
        x = x_u8.astype(dmodel.dtype)
        return dmodel.apply(vv, x, training=False, predict_only=True, input_layout="WPACK")["det"]

    imgs = (np.random.RandomState(0).rand(2, 128, 16, 24) * 255).astype(np.uint8)
    det = np.asarray(serve(v, jnp.asarray(imgs)))
    assert det.shape[0] == 2 and det.shape[-1] == 6 and np.isfinite(det).all(), "serving broke"

    # 3. graft entry compile-check
    step("__graft_entry__.entry() compile check")
    sys.path.insert(0, ROOT)
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.jit(fn).lower(*args).compile()

    # 4. 2-device sharded train step. The mesh dryrun needs virtual CPU
    # devices; in --tpu mode the backend is already the (single) real chip,
    # so run it in a fresh CPU-platform subprocess instead of in-process.
    step("dryrun_multichip(2)")
    if USE_TPU:
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2 --xla_backend_optimization_level=0"
        )
        subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as ge; ge.dryrun_multichip(2)"],
            cwd=ROOT, env=env, check=True, timeout=900,
        )
    else:
        ge.dryrun_multichip(2)

    step("ALL GREEN")


if __name__ == "__main__":
    main()
