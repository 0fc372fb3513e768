"""DOTA image/label splitter: tile huge aerial images into training crops.

Behavioral spec: reference data/split_dota.py (288 LoC): sliding windows of
`crop_size` with `gap` overlap (windows keeping <60% image area dropped,
unless none qualify), objects assigned to windows by IoF >= 0.7 (polygon area
inside the window / polygon area), labels shifted+renormalized per crop, crop
files named `{stem}__{size}__{x}___{y}`.

Dependency note: the reference computes polygon-window intersection with
shapely; shapely is absent here, so the exact area comes from a numpy
Sutherland-Hodgman clip of the quad against the axis-aligned window —
identical results for the (convex) DOTA quads.
"""

from __future__ import annotations

import itertools
from math import ceil
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np


def _polygon_area(pts: np.ndarray) -> float:
    """Shoelace area of an (n, 2) polygon."""
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _clip_halfplane(pts: List[np.ndarray], axis: int, bound: float, keep_less: bool) -> List[np.ndarray]:
    """Sutherland-Hodgman clip against one axis-aligned half-plane."""
    out: List[np.ndarray] = []
    n = len(pts)
    for i in range(n):
        cur, nxt = pts[i], pts[(i + 1) % n]
        cin = (cur[axis] <= bound) if keep_less else (cur[axis] >= bound)
        nin = (nxt[axis] <= bound) if keep_less else (nxt[axis] >= bound)
        if cin:
            out.append(cur)
        if cin != nin:
            t = (bound - cur[axis]) / (nxt[axis] - cur[axis] + 1e-12)
            out.append(cur + t * (nxt - cur))
    return out


def poly_rect_intersection_area(poly: np.ndarray, rect: Sequence[float]) -> float:
    """Exact area of (4, 2) polygon ∩ axis-aligned rect [x1, y1, x2, y2]."""
    pts = [p.astype(np.float64) for p in poly]
    for axis, bound, keep_less in ((0, rect[0], False), (0, rect[2], True), (1, rect[1], False), (1, rect[3], True)):
        pts = _clip_halfplane(pts, axis, bound, keep_less)
        if not pts:
            return 0.0
    return _polygon_area(np.stack(pts))


def bbox_iof(polygons: np.ndarray, windows: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """(n, 8) polygons x (m, 4) windows -> (n, m) intersection-over-foreground
    (split_dota.py:20-54 semantics, exact polygon areas)."""
    polys = polygons.reshape(-1, 4, 2)
    n, m = len(polys), len(windows)
    out = np.zeros((n, m), np.float32)
    # cheap reject via polygon AABBs
    lt, rb = polys.min(axis=1), polys.max(axis=1)
    for i in range(n):
        area = max(_polygon_area(polys[i]), eps)
        for j in range(m):
            x1, y1, x2, y2 = windows[j]
            if lt[i, 0] >= x2 or lt[i, 1] >= y2 or rb[i, 0] <= x1 or rb[i, 1] <= y1:
                continue
            out[i, j] = poly_rect_intersection_area(polys[i], (x1, y1, x2, y2)) / area
    return out


def get_windows(
    im_size: Tuple[int, int],
    crop_sizes: Sequence[int] = (1024,),
    gaps: Sequence[int] = (200,),
    im_rate_thr: float = 0.6,
    eps: float = 0.01,
) -> np.ndarray:
    """Sliding-window coordinates (split_dota.py:89-130)."""
    h, w = im_size
    windows = []
    for crop_size, gap in zip(crop_sizes, gaps):
        assert crop_size > gap, f"invalid crop_size gap pair [{crop_size} {gap}]"
        step = crop_size - gap
        xn = 1 if w <= crop_size else ceil((w - crop_size) / step + 1)
        xs = [step * i for i in range(xn)]
        if len(xs) > 1 and xs[-1] + crop_size > w:
            xs[-1] = w - crop_size
        yn = 1 if h <= crop_size else ceil((h - crop_size) / step + 1)
        ys = [step * i for i in range(yn)]
        if len(ys) > 1 and ys[-1] + crop_size > h:
            ys[-1] = h - crop_size
        start = np.array(list(itertools.product(xs, ys)), np.int64)
        stop = start + crop_size
        windows.append(np.concatenate([start, stop], axis=1))
    win = np.concatenate(windows, axis=0)

    clipped = win.copy()
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
    im_areas = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    win_areas = (win[:, 2] - win[:, 0]) * (win[:, 3] - win[:, 1])
    rates = im_areas / win_areas
    if not (rates > im_rate_thr).any():
        rates[np.abs(rates - rates.max()) < eps] = 1
    return win[rates > im_rate_thr]


def get_window_obj(label: np.ndarray, im_size: Tuple[int, int], windows: np.ndarray, iof_thr: float = 0.7):
    """Assign labels (cls + normalized 8-coord polygons) to windows."""
    h, w = im_size
    if not len(label):
        return [np.zeros((0, 9), np.float32) for _ in range(len(windows))]
    label = label.copy()
    label[:, 1::2] *= w
    label[:, 2::2] *= h
    iofs = bbox_iof(label[:, 1:], windows)
    return [label[iofs[:, i] >= iof_thr] for i in range(len(windows))]


def crop_and_save(filepath: str, windows: np.ndarray, window_objs, im_dir: Path, lb_dir: Path):
    """Write crops + shifted/renormalized labels (split_dota.py:146-188)."""
    import cv2

    im = cv2.imread(str(filepath))
    name = Path(filepath).stem
    for i, window in enumerate(windows):
        x_start, y_start, x_stop, y_stop = window.tolist()
        new_name = f"{name}__{x_stop - x_start}__{x_start}___{y_start}"
        patch = im[y_start:y_stop, x_start:x_stop]
        ph, pw = patch.shape[:2]
        cv2.imwrite(str(Path(im_dir) / f"{new_name}.jpg"), patch)
        label = window_objs[i].copy()
        if len(label) == 0:
            continue
        label[:, 1::2] -= x_start
        label[:, 2::2] -= y_start
        label[:, 1::2] /= pw
        label[:, 2::2] /= ph
        with open(Path(lb_dir) / f"{new_name}.txt", "w") as f:
            for lb in label:
                coords = ["{:.6g}".format(c) for c in lb[1:]]
                f.write(f"{int(lb[0])} {' '.join(coords)}\n")


def split_images_and_labels(
    data_root: str,
    save_dir: str,
    split: str = "train",
    crop_sizes: Sequence[int] = (1024,),
    gaps: Sequence[int] = (200,),
):
    """Split one DOTA split (split_dota.py:190-218); expects
    data_root/{images,labels}/{split}."""
    from PIL import Image

    im_out = Path(save_dir) / "images" / split
    lb_out = Path(save_dir) / "labels" / split
    im_out.mkdir(parents=True, exist_ok=True)
    lb_out.mkdir(parents=True, exist_ok=True)
    im_dir = Path(data_root) / "images" / split
    lb_dir = Path(data_root) / "labels" / split
    assert im_dir.exists(), f"Can't find {im_dir}"
    for im_file in sorted(im_dir.iterdir()):
        if im_file.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"):
            continue
        w, h = Image.open(im_file).size
        lb_file = lb_dir / (im_file.stem + ".txt")
        if lb_file.exists():
            rows = [r.split() for r in lb_file.read_text().strip().splitlines() if r]
            label = np.array(rows, np.float32) if rows else np.zeros((0, 9), np.float32)
        else:
            label = np.zeros((0, 9), np.float32)
        windows = get_windows((h, w), crop_sizes, gaps)
        objs = get_window_obj(label, (h, w), windows)
        crop_and_save(str(im_file), windows, objs, im_out, lb_out)


def split_trainval(data_root: str, save_dir: str, crop_size: int = 1024, gap: int = 200, rates: Sequence[float] = (1.0,)):
    """Split train + val at multiple scale rates (split_dota.py:220-248)."""
    crop_sizes, gaps = [], []
    for r in rates:
        crop_sizes.append(int(crop_size / r))
        gaps.append(int(gap / r))
    for split in ("train", "val"):
        split_images_and_labels(data_root, save_dir, split, crop_sizes, gaps)


def split_test(data_root: str, save_dir: str, crop_size: int = 1024, gap: int = 200, rates: Sequence[float] = (1.0,)):
    """Split unlabeled test images (split_dota.py:250-288)."""
    import cv2
    from PIL import Image

    crop_sizes, gaps = [], []
    for r in rates:
        crop_sizes.append(int(crop_size / r))
        gaps.append(int(gap / r))
    im_dir = Path(data_root) / "images" / "test"
    assert im_dir.exists(), f"Can't find {im_dir}"
    im_out = Path(save_dir) / "images" / "test"
    im_out.mkdir(parents=True, exist_ok=True)
    for im_file in sorted(im_dir.iterdir()):
        w, h = Image.open(im_file).size
        windows = get_windows((h, w), crop_sizes, gaps)
        im = cv2.imread(str(im_file))
        name = im_file.stem
        for window in windows:
            x_start, y_start, x_stop, y_stop = window.tolist()
            new_name = f"{name}__{x_stop - x_start}__{x_start}___{y_start}"
            cv2.imwrite(str(im_out / f"{new_name}.jpg"), im[y_start:y_stop, x_start:x_stop])
