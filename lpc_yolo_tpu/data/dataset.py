"""YOLO-format detection dataset: image scan, label parse, npz label cache.

Behavioral spec: reference ultralytics/data/base.py:21-311 (BaseDataset scan +
cache) and data/dataset.py:23-227 (YOLODataset label loading, cache with hash
invalidation), data/utils.py:251-344 (dataset YAML parsing).

Layout (identical to the reference's):
    <root>/images/<split>/*.jpg
    <root>/labels/<split>/*.txt   # rows: cls cx cy w h  (normalized xywh)
    data.yaml: {path, train, val, names, nc}
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import yaml

IMG_SUFFIXES = {".bmp", ".dng", ".jpeg", ".jpg", ".mpo", ".png", ".tif", ".tiff", ".webp"}


def check_det_dataset(data: Union[str, Path, Dict]) -> Dict:
    """Parse a dataset YAML into {path, train, val, names, nc} (data/utils.py:251).

    Bare names ('coco8.yaml') resolve against the bundled family in
    cfg/datasets/ (the reference's third YAML family, cfg/datasets/*); a
    bundled config's relative `path:` is resolved against the persisted
    `settings datasets_dir` like the reference's DATASETS_DIR, while a user
    YAML's relative `path:` stays relative to the YAML itself.
    """
    bundled = False
    if not isinstance(data, dict):
        p = Path(data)
        if not p.exists() and p.suffix in (".yaml", ".yml") and p.name == str(data):
            cand = Path(__file__).parent.parent / "cfg" / "datasets" / p.name
            if cand.exists():
                data, bundled = cand, True
    if isinstance(data, dict):
        d = dict(data)
    else:
        d = yaml.safe_load(Path(data).read_text())
        d.setdefault("path", str(Path(data).parent))
    root = Path(d.get("path", "."))
    if not root.is_absolute() and not isinstance(data, dict):
        if bundled:
            from ..utils.infra import SettingsManager

            root = (Path(SettingsManager()["datasets_dir"]) / root).resolve()
        else:
            root = Path(data).parent / root

    def _resolve(p):
        p = Path(p)
        return str(p if p.is_absolute() else root / p)

    out = {"path": str(root)}
    for split in ("train", "val", "test"):
        if d.get(split):
            v = d[split]
            out[split] = [_resolve(x) for x in v] if isinstance(v, list) else _resolve(v)
    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    out["names"] = {int(k): str(v) for k, v in (names or {}).items()}
    out["nc"] = int(d.get("nc", len(out["names"])))
    if d.get("kpt_shape"):
        out["kpt_shape"] = tuple(d["kpt_shape"])
    if d.get("flip_idx"):
        out["flip_idx"] = list(d["flip_idx"])
    if not out["names"]:
        out["names"] = {i: str(i) for i in range(out["nc"])}
    return out


def img2label_path(img_path: str) -> str:
    """images/... -> labels/... with .txt (data/utils.py img2label_paths)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(img_path.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


class YOLODataset:
    """Detection dataset over YOLO-format image/label folders."""

    def __init__(
        self,
        img_path: Union[str, Path],
        imgsz: int = 640,
        augment: bool = False,
        hyp: Optional[Dict] = None,
        cache: bool = True,
        names: Optional[Dict[int, str]] = None,
        kpt_shape: Optional[Tuple[int, int]] = None,
        obb: bool = False,
        cache_images: Union[bool, str] = False,
    ):
        self.img_path = (
            [str(p) for p in img_path] if isinstance(img_path, (list, tuple)) else str(img_path)
        )
        self.kpt_shape = tuple(kpt_shape) if kpt_shape else None
        self.obb = obb
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp or {}
        self.names = names or {}
        self.im_files = self._scan_images()
        self.label_files = [img2label_path(f) for f in self.im_files]
        self.labels = self._load_labels(cache)
        # image cache: 'ram' keeps decoded BGR arrays in memory; 'disk'
        # persists decoded .npy beside each image (reference base.py
        # cache_images / cache_images_to_disk)
        self.cache_images = "ram" if cache_images is True else (cache_images or None)
        self._ram: List[Optional[np.ndarray]] = [None] * len(self.im_files)
        if self.cache_images == "disk":
            self._npy_files = [Path(f).with_suffix(".npy") for f in self.im_files]

    def _scan_images(self) -> List[str]:
        # dir, .txt listing, or a LIST of those (reference base.py:21 accepts
        # all three — e.g. VOC.yaml's train: [images/train2012, ...])
        parts = self.img_path if isinstance(self.img_path, (list, tuple)) else [self.img_path]
        files: List[str] = []
        for part in parts:
            p = Path(part)
            if p.is_dir():
                files += sorted(str(f) for f in p.rglob("*") if f.suffix.lower() in IMG_SUFFIXES)
            elif p.is_file() and p.suffix == ".txt":  # file listing image paths
                files += [l.strip() for l in p.read_text().splitlines() if l.strip()]
            else:
                raise FileNotFoundError(f"dataset path {p} not found")
        if not files:
            raise FileNotFoundError(f"no images found in {self.img_path}")
        return files

    def _cache_path(self) -> Path:
        base = self.img_path[0] if isinstance(self.img_path, list) else self.img_path
        return Path(base).with_suffix(".labels.npz")

    def _hash(self) -> str:
        h = hashlib.sha1()
        for f in self.im_files + self.label_files:
            h.update(f.encode())
            try:
                h.update(str(os.path.getmtime(f)).encode())
            except OSError:
                pass
        return h.hexdigest()

    def _load_labels(self, cache: bool) -> List[Dict]:
        cpath, key = self._cache_path(), self._hash()
        if cache and cpath.exists():
            try:
                z = np.load(cpath, allow_pickle=True)
                if str(z["hash"]) == key:
                    return list(z["labels"])
            except Exception:
                pass
        labels = []
        nkd = self.kpt_shape[0] * self.kpt_shape[1] if self.kpt_shape else -1
        for lf in self.label_files:
            cls_list, box_list, seg_list, kpt_list, rbox_list = [], [], [], [], []
            if os.path.exists(lf):
                for line in Path(lf).read_text().splitlines():
                    vals = line.split()
                    if not vals:
                        continue
                    c = int(float(vals[0]))
                    coords = np.array(vals[1:], np.float32)
                    if self.kpt_shape and len(coords) == 4 + nkd:
                        # pose row: cls cx cy w h (x y [v])*nkpt
                        cls_list.append(c)
                        box_list.append(coords[:4])
                        seg_list.append(np.zeros((0, 2), np.float32))
                        kpt_list.append(coords[4:].reshape(self.kpt_shape))
                    elif len(coords) == 4:  # box row: cls cx cy w h
                        cls_list.append(c)
                        box_list.append(coords)
                        seg_list.append(np.zeros((0, 2), np.float32))
                        kpt_list.append(np.zeros(self.kpt_shape or (0, 0), np.float32))
                    elif self.obb and len(coords) == 8:
                        # DOTA row: 4 corner points -> minAreaRect rbox
                        import cv2

                        pts = coords.reshape(4, 2)
                        (cx, cy), (bw, bh), ang = cv2.minAreaRect(pts.astype(np.float32))
                        cls_list.append(c)
                        box_list.append(np.array([cx, cy, bw, bh], np.float32))
                        seg_list.append(pts)
                        kpt_list.append(np.zeros(self.kpt_shape or (0, 0), np.float32))
                        rbox_list.append(np.array([cx, cy, bw, bh, np.deg2rad(ang)], np.float32))
                        continue
                    elif len(coords) >= 6 and len(coords) % 2 == 0:  # polygon row
                        pts = coords.reshape(-1, 2)
                        lo, hi = pts.min(0), pts.max(0)
                        cls_list.append(c)
                        box_list.append(
                            np.array([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]], np.float32)
                        )
                        seg_list.append(pts)
                        kpt_list.append(np.zeros(self.kpt_shape or (0, 0), np.float32))
            entry = {
                "cls": np.array(cls_list, np.int32),
                "bboxes": np.array(box_list, np.float32).reshape(-1, 4),
                "segments": seg_list,
            }
            if self.kpt_shape:
                entry["keypoints"] = (
                    np.stack(kpt_list) if kpt_list else np.zeros((0,) + self.kpt_shape, np.float32)
                )
            if self.obb:
                entry["rboxes"] = (
                    np.stack(rbox_list) if rbox_list else np.zeros((0, 5), np.float32)
                )
            labels.append(entry)
        if cache:
            try:
                np.savez_compressed(cpath, hash=key, labels=np.array(labels, dtype=object))
            except OSError:
                pass
        return labels

    def __len__(self) -> int:
        return len(self.im_files)

    def load_image(self, i: int) -> np.ndarray:
        import cv2

        if self.cache_images == "ram" and self._ram[i] is not None:
            return self._ram[i]
        if self.cache_images == "disk" and self._npy_files[i].exists():
            return np.load(self._npy_files[i])
        im = cv2.imread(self.im_files[i])
        if im is None:
            raise FileNotFoundError(self.im_files[i])
        if self.cache_images == "ram":
            self._ram[i] = im
        elif self.cache_images == "disk":
            np.save(self._npy_files[i], im)
        return im

    def get_item_raw(self, i: int) -> Dict:
        """One un-augmented sample: BGR image + normalized xywh labels."""
        out = {
            "img": self.load_image(i),
            "cls": self.labels[i]["cls"].copy(),
            "bboxes": self.labels[i]["bboxes"].copy(),
            "segments": [s.copy() for s in self.labels[i].get("segments", [])],
            "path": self.im_files[i],
        }
        if "keypoints" in self.labels[i]:
            out["keypoints"] = self.labels[i]["keypoints"].copy()
        if "rboxes" in self.labels[i]:
            out["rboxes"] = self.labels[i]["rboxes"].copy()
        return out
