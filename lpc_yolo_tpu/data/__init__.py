"""Data layer: YOLO-format datasets, augmentation, fixed-shape batch loading."""

from .augment import DEFAULT_HYP, OBBTrainTransforms, PoseTrainTransforms, SegTrainTransforms, TrainTransforms, ValTransforms
from .build import DataLoader, collate
from .classify import ClassificationDataset, ClsTransforms, check_cls_dataset
from .dataset import YOLODataset, check_det_dataset, img2label_path
from .hub_stats import HUBDatasetStats
from .synthetic import make_synthetic_dataset

__all__ = [
    "HUBDatasetStats",
    "DEFAULT_HYP",
    "TrainTransforms",
    "SegTrainTransforms",
    "PoseTrainTransforms",
    "OBBTrainTransforms",
    "ValTransforms",
    "DataLoader",
    "collate",
    "YOLODataset",
    "ClassificationDataset",
    "ClsTransforms",
    "check_cls_dataset",
    "check_det_dataset",
    "img2label_path",
    "make_synthetic_dataset",
]
