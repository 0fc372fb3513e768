"""Benchmark + profiling harnesses.

Behavioral spec: reference ultralytics/utils/benchmarks.py:44-404 —
`benchmark()` exports the model to every format and measures val accuracy +
latency per format; `ProfileModels` times model files. TPU re-design: latency
measurement uses the in-graph dependent-loop method (per-call host timing over
the tunneled device is unreliable — see bench.py), and the formats are the
TPU-native export set.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def profile_forward(
    model, variables, imgsz: int = 640, batch: int = 1, iters: int = 10, with_decode: bool = True
) -> Dict[str, float]:
    """Steady-state latency/throughput of the jitted predict path.

    Runs `iters` forwards inside one jitted lax.fori_loop with an epsilon data
    dependency (defeats CSE), fetches a scalar — wall-clock measures device
    compute only.
    """
    from ..ops.postprocess import v10_detections

    def forward(img):
        out = model.apply(variables, img, training=False, predict_only=True)
        if "det" in out:  # v10 head decodes in-graph
            return jnp.sum(out["det"][:, 0, 4]).astype(jnp.float32)
        pred = out["pred"]
        if with_decode and pred.shape[-1] == 4 + model.nc:
            det = v10_detections(pred, 300, model.nc)
            return jnp.sum(det[:, 0, 4]).astype(jnp.float32)
        return jnp.sum(pred[:, 0, :4]).astype(jnp.float32)

    @jax.jit
    def loop(img):
        def body(i, carry):
            x, acc = carry
            s = forward(x)
            return x + 1e-12 * s, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (img, jnp.float32(0)))
        return acc

    img = jnp.asarray(np.random.RandomState(0).rand(batch, imgsz, imgsz, 3).astype(np.float32))
    float(loop(img))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(img))
        best = min(best, time.perf_counter() - t0)
    ms_per_img = best / iters / batch * 1e3
    return {
        "ms/img": round(ms_per_img, 4),
        "img/s": round(1e3 / ms_per_img, 1),
        "batch": batch,
        "imgsz": imgsz,
    }


def benchmark(
    yolo,
    data: Optional[str] = None,
    imgsz: int = 640,
    formats: Optional[List[str]] = None,
    out_dir: str = "runs/benchmark",
    verbose: bool = True,
) -> List[Dict]:
    """Export to each format and record size/latency (+ val mAP when `data`).

    Mirrors benchmarks.py:44-150's table; formats default to the TPU-native
    export set.
    """
    from ..engine.exporter import EXPORT_FORMATS, export_model

    rows: List[Dict] = []
    formats = formats or list(EXPORT_FORMATS)
    for fmt in formats:
        row = {"format": fmt, "status": "ok", "size_mb": None, "ms/img": None, "mAP50-95": None}
        try:
            path = export_model(yolo, fmt=fmt, imgsz=imgsz, out_dir=out_dir)
            p = Path(path)
            size = sum(f.stat().st_size for f in p.rglob("*")) if p.is_dir() else p.stat().st_size
            row["size_mb"] = round(size / 1e6, 2)
            if fmt in ("ckpt", "stablehlo"):
                prof = profile_forward(yolo.model, yolo.variables, imgsz=imgsz, batch=1, iters=5)
                row["ms/img"] = prof["ms/img"]
            if data is not None and fmt == "ckpt":
                res = yolo.val(data=data, imgsz=imgsz)
                row["mAP50-95"] = round(res.get("metrics/mAP50-95(B)", 0.0), 4)
        except (NotImplementedError, ImportError, ValueError) as e:
            row["status"] = f"skipped: {e}"
        except Exception as e:  # noqa: BLE001 — table reports per-format failures
            row["status"] = f"error: {type(e).__name__}: {e}"
        rows.append(row)
        if verbose:
            print(row)
    return rows
