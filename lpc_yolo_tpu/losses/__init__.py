"""Training losses: task-aligned assignment + v8/v10 detection losses."""

from .detection import LossItems, v8_detection_loss, v10_detect_loss
from .tal import AssignResult, task_aligned_assigner

__all__ = [
    "LossItems",
    "v8_detection_loss",
    "v10_detect_loss",
    "AssignResult",
    "task_aligned_assigner",
]
