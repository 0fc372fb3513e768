"""lpc_yolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) detection framework.

Re-designed from-scratch implementation of the capabilities of the reference
Ethan6612/LPC-YOLO (an Ultralytics v8.1.34 / THU-MIG YOLOv10 fork with the LPC
block family). NHWC layouts, static shapes, jit/pjit compute paths throughout.

Public API mirrors the reference package facade (ultralytics/__init__.py):
    from lpc_yolo_tpu import YOLO
    YOLO('yolov10n.yaml').predict('image.jpg')
"""

__version__ = "0.1.0"

from . import losses, nn, ops, parallel  # noqa: F401
from .engine import YOLO, Predictor, Results  # noqa: F401

YOLOv10 = YOLO  # alias matching the reference's YOLOv10 facade


class YOLOWorld(YOLO):
    """Open-vocabulary world-model facade (reference ultralytics/__init__.py
    exports YOLOWorld; models/yolo/model.py). Defaults to yolov8s-world."""

    def __init__(self, model="yolov8s-world.yaml", **kw):
        super().__init__(model, **kw)


def __getattr__(name):  # lazy heavyweight families (reference exports them eagerly)
    if name == "SAM":
        from .models.sam import SAM

        return SAM
    if name == "FastSAM":
        from .models.fastsam import FastSAM

        return FastSAM
    if name == "NAS":
        from .models.nas import NAS

        return NAS
    if name == "RTDETR":
        return YOLO  # rtdetr task resolves from the YAML/ckpt head
    if name == "Explorer":
        from .data.explorer import Explorer

        return Explorer
    if name == "settings":
        # persisted user settings singleton (reference ultralytics/__init__.py
        # exports `settings = SettingsManager()`); cached on first access
        from .utils.infra import SettingsManager

        s = SettingsManager()
        globals()["settings"] = s
        return s
    raise AttributeError(name)


__all__ = [
    "YOLO", "YOLOv10", "YOLOWorld", "SAM", "FastSAM", "NAS", "RTDETR",
    "Explorer", "settings",
    "Predictor", "Results", "ops", "nn", "losses", "parallel", "__version__",
]
