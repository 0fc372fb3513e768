"""Ray Tune integration + offline fallback search.

Behavioral spec: reference utils/tuner.py:9-144 (run_ray_tune): ASHA-scheduled
search over a 20-key uniform hyperparameter space, tune.with_resources trials
calling model.train, best config returned. Ray is not installable in this
environment, so when `import ray` fails the same search space runs through a
local successive-halving loop (train short, keep the top half, extend) —
honest about being the offline analog rather than silently no-op.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# (low, high) uniform ranges — reference utils/tuner.py:61-84
DEFAULT_SPACE: Dict[str, Tuple[float, float]] = {
    "lr0": (1e-5, 1e-1),
    "lrf": (0.01, 1.0),
    "momentum": (0.6, 0.98),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "box": (0.02, 0.2),
    "cls": (0.2, 4.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "degrees": (0.0, 45.0),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.9),
    "shear": (0.0, 10.0),
    "perspective": (0.0, 0.001),
    "flipud": (0.0, 1.0),
    "fliplr": (0.0, 1.0),
    "bgr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
    "copy_paste": (0.0, 1.0),
}


def run_ray_tune(
    model_factory,
    data: str,
    space: Optional[Dict[str, Tuple[float, float]]] = None,
    grace_period: int = 10,
    max_samples: int = 10,
    seed: int = 0,
    **train_args,
):
    """Hyperparameter search; returns {'best_hyp', 'best_fitness', 'trials'}.

    model_factory: () -> fresh YOLO per trial (the reference deep-copies the
    model into each ray worker; a factory is the functional equivalent).
    With ray installed, uses tune + ASHAScheduler like the reference;
    otherwise runs local successive halving over the same space.
    """
    space = space or DEFAULT_SPACE
    try:
        import ray  # noqa: F401
        from ray import tune
        from ray.tune.schedulers import ASHAScheduler

        tune_space = {k: tune.uniform(*v) for k, v in space.items()}

        def trainable(config):
            yolo = model_factory()
            res = yolo.train(data=data, hyp=config, **train_args)
            tune.report({"fitness": float(res.get("fitness", 0.0))})

        tuner = tune.Tuner(
            trainable,
            param_space=tune_space,
            tune_config=tune.TuneConfig(
                scheduler=ASHAScheduler(metric="fitness", mode="max", grace_period=grace_period),
                num_samples=max_samples,
            ),
        )
        grid = tuner.fit()
        best = grid.get_best_result(metric="fitness", mode="max")
        return {"best_hyp": dict(best.config), "best_fitness": best.metrics["fitness"], "trials": len(grid)}
    except ImportError:
        pass

    # ---- offline successive halving over the same space ----
    rng = np.random.RandomState(seed)
    trials = [
        {k: float(rng.uniform(*v)) for k, v in space.items()} for _ in range(max_samples)
    ]
    epochs = max(1, int(train_args.pop("epochs", grace_period)))
    short = max(1, epochs // 2)
    results = []
    for hyp in trials:
        yolo = model_factory()
        res = yolo.train(data=data, epochs=short, hyp=hyp, **train_args)
        results.append({"hyp": hyp, "fitness": float(res.get("fitness", 0.0))})
    results.sort(key=lambda r: -r["fitness"])
    survivors = results[: max(1, len(results) // 2)]
    for r in survivors:  # extend the promising half to the full budget
        yolo = model_factory()
        res = yolo.train(data=data, epochs=epochs, hyp=r["hyp"], **train_args)
        r["fitness"] = float(res.get("fitness", r["fitness"]))
    survivors.sort(key=lambda r: -r["fitness"])
    best = survivors[0]
    return {"best_hyp": best["hyp"], "best_fitness": best["fitness"], "trials": len(trials)}
