"""HUB dataset statistics + preview images.

Behavioral spec: reference ultralytics/data/utils.py:424-585 (HUBDatasetStats:
per-split instance/image stats, rounded label dump, stats.json, compressed
preview images) — zip handling via stdlib zipfile, image compression via cv2
instead of PIL.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path
from typing import Dict, Optional

import numpy as np

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def find_dataset_yaml(path: Path) -> Path:
    """Locate the single dataset YAML under a directory (data/utils.py:300s)."""
    files = list(path.glob("*.yaml")) or list(path.rglob("*.yaml"))
    assert files, f"No YAML found in {path}"
    if len(files) > 1:
        files = [f for f in files if f.stem == path.stem] or files
    return files[0]


def compress_one_image(f: Path, out: Path, max_dim: int = 1920, quality: int = 50) -> None:
    """Downscale + JPEG-compress one image for HUB previews (data/utils.py:385)."""
    import cv2

    im = cv2.imread(str(f))
    if im is None:
        return
    r = max_dim / max(im.shape[:2])
    if r < 1.0:
        im = cv2.resize(im, (int(im.shape[1] * r), int(im.shape[0] * r)), interpolation=cv2.INTER_AREA)
    out.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(out.with_suffix(".jpg")), im, [cv2.IMWRITE_JPEG_QUALITY, quality])


class HUBDatasetStats:
    """Per-split dataset statistics for HUB upload (reference data/utils.py:424).

    Produces `stats.json` with nc/names and, per split: instance totals and
    per-class counts, image totals/unlabelled/per-class presence, and the
    rounded label rows; `process_images` writes compressed previews into
    `<dataset>-hub/images`.
    """

    def __init__(self, path: str = "data.yaml", task: str = "detect"):
        from .dataset import YOLODataset, check_det_dataset

        p = Path(path).resolve()
        self.task = task
        if str(p).endswith(".zip"):
            unzip_dir = p.parent / p.stem
            with zipfile.ZipFile(p) as z:
                z.extractall(p.parent)
            assert unzip_dir.is_dir(), f"{p} must unzip to {unzip_dir}"
            yaml_path = find_dataset_yaml(unzip_dir)
        else:
            yaml_path = p
        data = check_det_dataset(str(yaml_path))
        self.data = data
        self.hub_dir = Path(str(data["path"]) + "-hub")
        self.im_dir = self.hub_dir / "images"
        names = data["names"]
        self.stats: Dict = {"nc": len(names), "names": [str(names[k]) for k in sorted(names)]}
        self._dataset_cls = YOLODataset

    def _round(self, label: Dict):
        if self.task == "detect":
            coords = label["bboxes"]
        elif self.task == "segment":
            coords = [np.asarray(s).flatten() for s in label.get("segments", [])]
        elif self.task == "pose":
            k = label["keypoints"]
            coords = np.concatenate([label["bboxes"], k.reshape(len(k), -1)], 1)
        else:
            raise ValueError(f"Undefined dataset task {self.task}")
        return [
            [int(c), *(round(float(x), 4) for x in np.asarray(pts).flatten())]
            for c, pts in zip(np.asarray(label["cls"]).flatten(), coords)
        ]

    def get_json(self, save: bool = False) -> Dict:
        nc = self.data.get("nc") or len(self.data["names"])
        for split in ("train", "val", "test"):
            self.stats[split] = None
            path = self.data.get(split)
            if not path or not Path(path).exists():
                continue
            ds = self._dataset_cls(path, names=self.data["names"],
                                   kpt_shape=self.data.get("kpt_shape"))
            x = np.array(
                [np.bincount(lb["cls"].astype(int).flatten(), minlength=nc) for lb in ds.labels]
            ).reshape(-1, nc)  # keep (0, nc) when the split has no labeled images
            self.stats[split] = {
                "instance_stats": {"total": int(x.sum()), "per_class": x.sum(0).tolist()},
                "image_stats": {
                    "total": len(ds),
                    "unlabelled": int(np.all(x == 0, 1).sum()),
                    "per_class": (x > 0).sum(0).tolist(),
                },
                "labels": [
                    {Path(f).name: self._round(lb)} for f, lb in zip(ds.im_files, ds.labels)
                ],
            }
        if save:
            self.hub_dir.mkdir(parents=True, exist_ok=True)
            (self.hub_dir / "stats.json").write_text(json.dumps(self.stats))
        return self.stats

    def process_images(self) -> Optional[Path]:
        """Compress every split's images into <dataset>-hub/images."""
        self.im_dir.mkdir(parents=True, exist_ok=True)
        for split in ("train", "val", "test"):
            path = self.data.get(split)
            if not path or not Path(path).exists():
                continue
            for f in Path(path).rglob("*.*"):
                if f.suffix[1:].lower() in IMG_FORMATS:
                    compress_one_image(f, self.im_dir / f.name)
        return self.im_dir
