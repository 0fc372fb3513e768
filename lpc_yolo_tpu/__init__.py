"""lpc_yolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) detection framework.

Re-designed from-scratch implementation of the capabilities of the reference
Ethan6612/LPC-YOLO (an Ultralytics v8.1.34 / THU-MIG YOLOv10 fork with the LPC
block family). NHWC layouts, static shapes, jit/pjit compute paths throughout.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401

__all__ = ["ops", "__version__"]
