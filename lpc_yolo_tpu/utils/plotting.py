"""Plotting: training curves, confusion matrix, batch mosaics, PR curves.

Behavioral spec: reference ultralytics/utils/plotting.py:702-900 (plot_images
train-batch mosaics, plot_results curve grids) and utils/metrics.py:450-497
(confusion-matrix and PR plots). Matplotlib 'Agg' backend, file outputs only.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_results(csv_path: str, out_path: Optional[str] = None) -> str:
    """Grid of loss/metric curves from a trainer results.csv (plotting.py:842)."""
    plt = _plt()
    csv_path = Path(csv_path)
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise ValueError(f"empty results csv {csv_path}")
    keys = [k for k in rows[0] if k not in ("epoch", "time_s") and rows[0][k] != ""]
    epochs = [int(r["epoch"]) for r in rows]
    n = len(keys)
    cols = min(5, n)
    rws = (n + cols - 1) // cols
    fig, axes = plt.subplots(rws, cols, figsize=(3 * cols, 2.5 * rws), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        vals = [float(r[k]) if r[k] else np.nan for r in rows]
        ax.plot(epochs, vals, marker=".", lw=1)
        ax.set_title(k, fontsize=8)
        ax.tick_params(labelsize=7)
    for j in range(n, rws * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    out = out_path or str(csv_path.with_name("results.png"))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_confusion_matrix(
    matrix: np.ndarray, names: Dict[int, str], out_path: str, normalize: bool = True
) -> str:
    """Confusion matrix heatmap (metrics.py:450-497)."""
    plt = _plt()
    m = matrix.astype(float)
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    nc = m.shape[0]
    fig, ax = plt.subplots(figsize=(max(6, nc * 0.5), max(5, nc * 0.45)))
    im = ax.imshow(m, cmap="Blues")
    labels = [names.get(i, str(i)) for i in range(nc - 1)] + ["background"]
    ax.set_xticks(range(nc))
    ax.set_yticks(range(nc))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.colorbar(im, ax=ax, fraction=0.045)
    if nc <= 30:
        for i in range(nc):
            for j in range(nc):
                if m[i, j] > 0.005:
                    ax.text(j, i, f"{m[i, j]:.2f}", ha="center", va="center", fontsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_pr_curve(
    p_curve: np.ndarray, r_curve: np.ndarray, ap50: np.ndarray, names: Dict[int, str], out_path: str
) -> str:
    """PR curves per class + mean (metrics.py plot_pr_curve)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    x = np.linspace(0, 1, p_curve.shape[1])
    for i in range(min(len(p_curve), 20)):
        ax.plot(r_curve[i], p_curve[i], lw=0.8, alpha=0.5)
    ax.plot(r_curve.mean(0), p_curve.mean(0), lw=2, color="b", label=f"all classes mAP@.5 {ap50.mean():.3f}")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_images(
    images: np.ndarray,  # (B, H, W, 3) uint8
    cls: np.ndarray,  # (B, M)
    bboxes: np.ndarray,  # (B, M, 4) xyxy pixels
    mask: np.ndarray,  # (B, M)
    out_path: str,
    names: Optional[Dict[int, str]] = None,
    max_subplots: int = 16,
) -> str:
    """Tiled grid of (augmented) training images with their boxes
    (plotting.py:702-800)."""
    import cv2

    B = min(len(images), max_subplots)
    n = int(np.ceil(np.sqrt(B)))
    h, w = images.shape[1:3]
    canvas = np.full((n * h, n * w, 3), 255, np.uint8)
    for i in range(B):
        r, c = divmod(i, n)
        tile = images[i].copy()
        for j in range(bboxes.shape[1]):
            if not mask[i, j]:
                continue
            x1, y1, x2, y2 = bboxes[i, j].astype(int)
            cid = int(cls[i, j])
            color = tuple(int(v) for v in np.random.RandomState(cid + 3).randint(64, 255, 3))
            cv2.rectangle(tile, (x1, y1), (x2, y2), color, 2)
            label = (names or {}).get(cid, str(cid))
            cv2.putText(tile, label, (x1, max(y1 - 3, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = tile
    cv2.imwrite(out_path, canvas)
    return out_path


# ---------------------------------------------------------------------------
# Annotator (reference plotting.py:20-335: Colors palette, box_label, masks
# alpha compositing, COCO-skeleton kpts, rotated-box polygons)
# ---------------------------------------------------------------------------


class Colors:
    """Ultralytics color palette (reference plotting.py:20-97); call with a
    class index -> BGR (bgr=True) or RGB tuple."""

    HEXS = (
        "FF3838", "FF9D97", "FF701F", "FFB21D", "CFD231", "48F90A", "92CC17",
        "3DDB86", "1A9334", "00D4BB", "2C99A8", "00C2FF", "344593", "6473FF",
        "0018EC", "8438FF", "520085", "CB38FF", "FF95C8", "FF37C7",
    )
    POSE = np.array(
        [
            [255, 128, 0], [255, 153, 51], [255, 178, 102], [230, 230, 0],
            [255, 153, 255], [153, 204, 255], [255, 102, 255], [255, 51, 255],
            [102, 178, 255], [51, 153, 255], [255, 153, 153], [255, 102, 102],
            [255, 51, 51], [153, 255, 153], [102, 255, 102], [51, 255, 51],
            [0, 255, 0], [0, 0, 255], [255, 0, 0], [255, 255, 255],
        ],
        dtype=np.uint8,
    )

    def __init__(self):
        self.palette = [tuple(int(h[i:i + 2], 16) for i in (0, 2, 4)) for h in self.HEXS]
        self.n = len(self.palette)

    def __call__(self, i: int, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()

# COCO 17-keypoint skeleton (reference plotting.py:137-158)
SKELETON = [
    [16, 14], [14, 12], [17, 15], [15, 13], [12, 13], [6, 12], [7, 13],
    [6, 7], [6, 8], [7, 9], [8, 10], [9, 11], [2, 3], [1, 2], [1, 3],
    [2, 4], [3, 5], [4, 6], [5, 7],
]
LIMB_COLOR_IDX = [9, 9, 9, 9, 7, 7, 7, 0, 0, 0, 0, 0, 16, 16, 16, 16, 16, 16, 16]
KPT_COLOR_IDX = [16, 16, 16, 16, 16, 0, 0, 0, 0, 0, 0, 9, 9, 9, 9, 9, 9]


class Annotator:
    """cv2-based annotator: boxes, labels with filled background, rotated
    polygons, alpha-composited masks, pose keypoints with skeleton."""

    def __init__(self, im: np.ndarray, line_width: Optional[int] = None):
        self.im = im if im.flags.writeable else im.copy()
        self.lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)
        self.tf = max(self.lw - 1, 1)  # text thickness
        self.sf = self.lw / 3  # text scale

    def box_label(self, box, label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255), rotated: bool = False):
        """One xyxy box (or 4x2 polygon if rotated) + filled-background label."""
        import cv2

        if rotated:
            pts = np.asarray(box, dtype=int).reshape(-1, 2)
            cv2.polylines(self.im, [pts], True, color, self.lw)
            p1 = tuple(pts[0])
        else:
            p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
            cv2.rectangle(self.im, p1, p2, color, thickness=self.lw, lineType=cv2.LINE_AA)
        if label:
            w, h = cv2.getTextSize(label, 0, fontScale=self.sf, thickness=self.tf)[0]
            outside = p1[1] - h >= 3
            p2 = p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3
            cv2.rectangle(self.im, p1, p2, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                0, self.sf, txt_color, thickness=self.tf, lineType=cv2.LINE_AA,
            )

    def masks(self, masks: np.ndarray, mask_colors, alpha: float = 0.5):
        """Alpha-composite (n, h, w) masks over the image — the reference's
        cumprod blend (plotting.py:207-241) in numpy. Masks are resized to
        the image if given at proto resolution."""
        import cv2

        if len(masks) == 0:
            return
        h, w = self.im.shape[:2]
        m = np.stack(
            [cv2.resize(mk.astype(np.float32), (w, h), interpolation=cv2.INTER_LINEAR) for mk in masks]
        )
        m = (m > 0.5).astype(np.float32)[..., None]  # (n, h, w, 1)
        cols = np.asarray(mask_colors, np.float32)[:, None, None] / 255.0  # (n,1,1,3)
        masks_color = m * (cols * alpha)
        inv_alpha = np.cumprod(1 - m * alpha, axis=0)
        mcs = masks_color.max(axis=0)
        im01 = self.im.astype(np.float32) / 255.0
        out = im01 * inv_alpha[-1] + mcs
        self.im[:] = (out * 255).astype(np.uint8)

    def kpts(self, kpts: np.ndarray, radius: int = 5, kpt_line: bool = True, conf_thres: float = 0.5):
        """Pose keypoints (K, 2|3) with the COCO skeleton when K == 17."""
        import cv2

        nkpt, ndim = kpts.shape
        is_pose = nkpt == 17 and ndim in (2, 3)
        kpt_line &= is_pose
        h, w = self.im.shape[:2]
        for i, k in enumerate(kpts):
            if ndim == 3 and k[2] < conf_thres:
                continue
            x, y = int(k[0]), int(k[1])
            if 0 < x < w and 0 < y < h:
                ck = tuple(int(v) for v in Colors.POSE[KPT_COLOR_IDX[i]]) if is_pose else colors(i)
                cv2.circle(self.im, (x, y), radius, ck, -1, lineType=cv2.LINE_AA)
        if kpt_line:
            for i, (a, b) in enumerate(SKELETON):
                ka, kb = kpts[a - 1], kpts[b - 1]
                if ndim == 3 and (ka[2] < conf_thres or kb[2] < conf_thres):
                    continue
                p1, p2 = (int(ka[0]), int(ka[1])), (int(kb[0]), int(kb[1]))
                if not (0 < p1[0] < w and 0 < p1[1] < h and 0 < p2[0] < w and 0 < p2[1] < h):
                    continue
                cl = tuple(int(v) for v in Colors.POSE[LIMB_COLOR_IDX[i]])
                cv2.line(self.im, p1, p2, cl, thickness=2, lineType=cv2.LINE_AA)

    def text(self, xy, label: str, txt_color=(255, 255, 255)):
        import cv2

        cv2.putText(self.im, label, (int(xy[0]), int(xy[1])), 0, self.sf, txt_color,
                    thickness=self.tf, lineType=cv2.LINE_AA)

    def result(self) -> np.ndarray:
        return self.im


def save_one_box(xyxy, im: np.ndarray, file="im.jpg", gain: float = 1.02,
                 pad: int = 10, square: bool = False, save: bool = True) -> np.ndarray:
    """Crop a box from an image with gain/pad margins and optionally save it
    (reference plotting.py:653-702 save_one_box). Returns the crop (BGR)."""
    from pathlib import Path

    b = np.asarray(xyxy, np.float32).reshape(4)
    cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
    w, h = (b[2] - b[0]) * gain + pad, (b[3] - b[1]) * gain + pad
    if square:
        w = h = max(w, h)
    x1 = int(max(0, cx - w / 2))
    y1 = int(max(0, cy - h / 2))
    x2 = int(min(im.shape[1], cx + w / 2))
    y2 = int(min(im.shape[0], cy + h / 2))
    crop = im[y1:y2, x1:x2]
    if save:
        import cv2

        f = Path(file)
        f.parent.mkdir(parents=True, exist_ok=True)
        # unique suffix like the reference's increment behavior
        out = f
        i = 1
        while out.exists():
            out = f.with_name(f"{f.stem}{i}{f.suffix}")
            i += 1
        cv2.imwrite(str(out), crop)
    return crop
