"""Hyperparameter tuner: mutation-based evolution over the augment/loss space.

Behavioral spec: reference engine/tuner.py:33-242 — gaussian mutation of the
'box ... mixup' search space with per-key (min, max, gain) bounds, short
training runs scored by fitness, best genome carried forward, tune_results.csv.
"""

from __future__ import annotations

import csv
import shutil
from pathlib import Path
from typing import Dict, Optional

import numpy as np

# key: (gain, min, max) — reference tuner.py:70-95
SEARCH_SPACE = {
    "lr0": (1.0, 1e-5, 1e-1),
    "lrf": (1.0, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1.0, 0.0, 0.001),
    "warmup_epochs": (1.0, 0.0, 5.0),
    "box": (1.0, 0.02, 0.2),
    "cls": (1.0, 0.2, 4.0),
    "hsv_h": (1.0, 0.0, 0.1),
    "hsv_s": (1.0, 0.0, 0.9),
    "hsv_v": (1.0, 0.0, 0.9),
    "degrees": (1.0, 0.0, 45.0),
    "translate": (1.0, 0.0, 0.9),
    "scale": (1.0, 0.0, 0.9),
    "shear": (1.0, 0.0, 10.0),
    "perspective": (1.0, 0.0, 0.001),
    "flipud": (1.0, 0.0, 1.0),
    "fliplr": (1.0, 0.0, 1.0),
    "mosaic": (1.0, 0.0, 1.0),
    "mixup": (1.0, 0.0, 1.0),
}


class Tuner:
    def __init__(self, save_dir: str = "runs/detect/tune", seed: int = 0):
        self.save_dir = Path(save_dir)
        self.rng = np.random.RandomState(seed)
        self.results = []

    def mutate(self, hyp: Dict[str, float], parent_fitness_csv: Optional[Path] = None, sigma: float = 0.2) -> Dict[str, float]:
        """Mutate ~30% of keys by gaussian factors, clipped to bounds
        (tuner.py _mutate)."""
        out = dict(hyp)
        while True:
            factors = np.ones(len(SEARCH_SPACE))
            mutate_mask = self.rng.random(len(SEARCH_SPACE)) < 0.3
            if mutate_mask.any():
                break
        for (k, (gain, lo, hi)), m in zip(SEARCH_SPACE.items(), mutate_mask):
            base = out.get(k, (lo + hi) / 2)
            if m:
                base = base * (1 + self.rng.randn() * sigma * gain)
            out[k] = float(np.clip(base, lo, hi))
        return out

    def __call__(self, yolo_factory, data: str, iterations: int = 10, epochs: int = 10, **train_kw) -> Dict:
        """Run `iterations` mutated short trainings; returns the best hyp dict.

        yolo_factory: () -> fresh YOLO (a fresh model per trial).
        """
        self.save_dir.mkdir(parents=True, exist_ok=True)
        csv_path = self.save_dir / "tune_results.csv"
        best = {"fitness": -1.0, "hyp": {}}
        hyp: Dict[str, float] = {}
        for i in range(iterations):
            hyp = self.mutate(best["hyp"] or hyp)
            yolo = yolo_factory()
            run_dir = self.save_dir / f"trial{i}"
            try:
                res = yolo.train(
                    data=data, epochs=epochs, hyp=hyp, save_dir=str(run_dir), val=True, **train_kw
                )
                fitness = float(res.get("fitness", 0.0))
            except Exception as e:  # noqa: BLE001 — a failed trial scores 0
                print(f"tuner trial {i} failed: {e}")
                fitness = 0.0
            row = {"iteration": i, "fitness": fitness, **{k: round(v, 6) for k, v in hyp.items()}}
            write_header = not csv_path.exists()
            with open(csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(row))
                if write_header:
                    w.writeheader()
                w.writerow(row)
            if fitness > best["fitness"]:
                best = {"fitness": fitness, "hyp": dict(hyp), "iteration": i}
            shutil.rmtree(run_dir / "weights", ignore_errors=True)  # keep tune runs light
            self.results.append(row)
        (self.save_dir / "best_hyperparameters.yaml").write_text(
            "\n".join(f"{k}: {v}" for k, v in best["hyp"].items()) + "\n"
        )
        return best
