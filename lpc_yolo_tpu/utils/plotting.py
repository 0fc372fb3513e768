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
