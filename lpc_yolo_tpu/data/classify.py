"""Classification dataset + transforms (folder-per-class ImageNet layout).

Behavioral spec: reference ultralytics/data/dataset.py:228-310
(ClassificationDataset over torchvision ImageFolder layout) and
data/augment.py:973-1060 (classify_transforms / classify_augmentations,
simplified: resize + random flip + HSV for train, center resize for eval).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .dataset import IMG_SUFFIXES


def check_cls_dataset(root: Union[str, Path]) -> Dict:
    """Resolve a classification dataset root: <root>/{train,val,test}/<class>/*.jpg."""
    root = Path(root)
    out: Dict = {"path": str(root)}
    names: List[str] = []
    for split in ("train", "val", "test"):
        d = root / split
        if d.is_dir():
            out[split] = str(d)
            if not names:
                names = sorted(p.name for p in d.iterdir() if p.is_dir())
    if not names:
        raise FileNotFoundError(f"no class folders under {root}/{{train,val,test}}")
    out["names"] = dict(enumerate(names))
    out["nc"] = len(names)
    return out


class ClassificationDataset:
    def __init__(self, split_dir: Union[str, Path], imgsz: int = 224, names: Optional[Dict[int, str]] = None):
        self.root = Path(split_dir)
        self.imgsz = imgsz
        classes = sorted(p.name for p in self.root.iterdir() if p.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            for f in sorted((self.root / c).rglob("*")):
                if f.suffix.lower() in IMG_SUFFIXES:
                    self.samples.append((str(f), self.class_to_idx[c]))
        if not self.samples:
            raise FileNotFoundError(f"no images under {self.root}")
        self.names = names or dict(enumerate(classes))

    def __len__(self) -> int:
        return len(self.samples)

    def load_image(self, i: int) -> np.ndarray:
        import cv2

        im = cv2.imread(self.samples[i][0])
        if im is None:
            raise FileNotFoundError(self.samples[i][0])
        return im

    def get_item_raw(self, i: int) -> Dict:
        return {"img": self.load_image(i), "label": self.samples[i][1], "path": self.samples[i][0]}


class ClsTransforms:
    """Square resize (+ flip for train) -> {'img' uint8, 'label' int32}."""

    def __init__(self, imgsz: int = 224, augment: bool = False, fliplr: float = 0.5):
        self.imgsz = imgsz
        self.augment = augment
        self.fliplr = fliplr

    def close_mosaic(self):
        """No mosaic in classification; hook for trainer compatibility."""

    def __call__(self, dataset, idx: int, rng: np.random.RandomState) -> Dict:
        import cv2

        item = dataset.get_item_raw(idx)
        img = cv2.resize(item["img"], (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        if self.augment and rng.rand() < self.fliplr:
            img = np.ascontiguousarray(np.fliplr(img))
        return {"img": img, "label": np.int32(item["label"])}
