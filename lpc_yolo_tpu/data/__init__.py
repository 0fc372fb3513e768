"""Data layer: YOLO-format datasets, augmentation, fixed-shape batch loading."""

from .augment import DEFAULT_HYP, SegTrainTransforms, TrainTransforms, ValTransforms
from .build import DataLoader, collate
from .dataset import YOLODataset, check_det_dataset, img2label_path
from .synthetic import make_synthetic_dataset

__all__ = [
    "DEFAULT_HYP",
    "TrainTransforms",
    "SegTrainTransforms",
    "ValTransforms",
    "DataLoader",
    "collate",
    "YOLODataset",
    "check_det_dataset",
    "img2label_path",
    "make_synthetic_dataset",
]
