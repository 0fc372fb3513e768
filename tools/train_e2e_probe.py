"""End-to-end train on the real chip: does the host-starvation mitigation hold?

Round 4 measured the imbalance (139 aug-img/s host vs ~736 img/s chip =
5.28 hosts/chip) but shipped no mitigation evidence. This probe runs the REAL
Trainer (facade .train(), synthetic JPEGs, full aug pipeline) on the chip,
with and without `cache_augmented` (data/shard_cache.py bounded-staleness
batch echoing), and reports each run's last-epoch `input_wait_frac` — the
fraction of epoch wall time spent blocked on next(loader) that the results
CSV records every epoch (engine/trainer.py).

Done-criterion (VERDICT r4 #4): mitigated input_wait_frac < 0.2 on THIS host.

Usage: python tools/train_e2e_probe.py [n_imgs] [epochs]   (default 192 3)
One JSON line: {"unmitigated": {...}, "mitigated": {...}}.
"""

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(yaml_path, cache_augmented, n_imgs, epochs, imgsz=640, batch=32):
    from lpc_yolo_tpu import YOLO

    run_dir = tempfile.mkdtemp(prefix="e2e_train_")
    t0 = time.perf_counter()
    try:
        m = YOLO("lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml", nc=3)
        m.train(
            data=yaml_path, epochs=epochs, batch=batch, imgsz=imgsz,
            workers=os.cpu_count() or 1, close_mosaic=0, val=False, save=False,
            save_dir=run_dir, cache="ram", cache_augmented=cache_augmented,
        )
        wall = time.perf_counter() - t0
        rows = (
            open(os.path.join(run_dir, "results.csv")).read().strip().splitlines()
        )
        head = rows[0].split(",")
        last = rows[-1].split(",")
        get = lambda k: float(last[head.index(k)])
        out = {
            "input_wait_frac": get("input_wait_frac"),
            "epochs": epochs,
            "imgs_per_epoch": n_imgs,
            "wall_s_total": round(wall, 1),
        }
        out["last_epoch_s"] = get("time_s")
        return out
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def main():
    n_imgs = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from lpc_yolo_tpu.data.synthetic import make_synthetic_dataset

    root = tempfile.mkdtemp(prefix="e2e_ds_")
    try:
        yaml_path = make_synthetic_dataset(root, n_train=n_imgs, n_val=2, imgsz=640, nc=3)
        out = {
            "unmitigated": run_one(yaml_path, False, n_imgs, epochs),
            "mitigated": run_one(yaml_path, True, n_imgs, epochs),
        }
        out["mitigated"]["ok"] = out["mitigated"]["input_wait_frac"] < 0.2
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
