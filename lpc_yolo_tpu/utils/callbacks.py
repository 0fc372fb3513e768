"""Lifecycle callback bus + built-in observability sinks.

Behavioral spec: reference ultralytics/utils/callbacks/base.py:145-200 — the
26 lifecycle events spanning trainer/validator/predictor/exporter — plus the
integration pattern of callbacks/{tensorboard,csv,...}.py. Third-party sinks
whose SDKs are absent here (wandb/comet/mlflow/clearml/neptune/dvc) register
only if importable.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Dict, List

# The reference's event list (callbacks/base.py:145-175).
EVENTS = [
    # trainer
    "on_pretrain_routine_start",
    "on_pretrain_routine_end",
    "on_train_start",
    "on_train_epoch_start",
    "on_train_batch_start",
    "optimizer_step",
    "on_before_zero_grad",
    "on_train_batch_end",
    "on_train_epoch_end",
    "on_fit_epoch_end",
    "on_model_save",
    "on_train_end",
    "on_params_update",
    "teardown",
    # validator
    "on_val_start",
    "on_val_batch_start",
    "on_val_batch_end",
    "on_val_end",
    # predictor
    "on_predict_start",
    "on_predict_batch_start",
    "on_predict_postprocess_end",
    "on_predict_batch_end",
    "on_predict_end",
    # exporter
    "on_export_start",
    "on_export_end",
]


def get_default_callbacks() -> Dict[str, List[Callable]]:
    return defaultdict(list, {e: [] for e in EVENTS})


class CallbackRegistry:
    """Event bus: add handlers per event, run them with the emitting component."""

    def __init__(self):
        self.callbacks = get_default_callbacks()

    def add(self, event: str, fn: Callable) -> None:
        if event not in EVENTS:
            raise ValueError(f"unknown callback event '{event}'; valid: {EVENTS}")
        self.callbacks[event].append(fn)

    def run(self, event: str, *args: Any, **kw: Any) -> None:
        for fn in self.callbacks.get(event, []):
            fn(*args, **kw)

    def add_integration_callbacks(self, save_dir=None) -> List[str]:
        """Attach every importable sink (reference add_integration_callbacks)."""
        attached = []
        try:
            from torch.utils.tensorboard import SummaryWriter  # noqa: F401

            self._attach_tensorboard(save_dir)
            attached.append("tensorboard")
        except ImportError:
            pass
        for name in ("wandb", "comet_ml", "mlflow", "clearml", "neptune", "dvclive"):
            try:
                __import__(name)
                attached.append(f"{name} (available, wire-up TODO)")
            except ImportError:
                continue
        return attached

    def _attach_tensorboard(self, save_dir):
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=str(save_dir) if save_dir else None)

        def on_fit_epoch_end(trainer):
            epoch = getattr(trainer, "epoch", 0)
            for k, v in getattr(trainer, "last_metrics", {}).items():
                try:
                    writer.add_scalar(k, float(v), epoch)
                except (TypeError, ValueError):
                    pass

        def on_train_end(trainer):
            writer.flush()
            writer.close()

        self.add("on_fit_epoch_end", on_fit_epoch_end)
        self.add("on_train_end", on_train_end)
