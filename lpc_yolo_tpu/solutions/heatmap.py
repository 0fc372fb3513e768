"""Detection-density heatmaps over a stream (reference solutions/heatmap.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class Heatmap:
    def __init__(self, shape: Tuple[int, int], decay: float = 0.99):
        self.acc = np.zeros(shape, np.float32)
        self.decay = decay

    def update(self, result) -> "Heatmap":
        self.acc *= self.decay
        if result.boxes is not None:
            h, w = self.acc.shape
            for row in result.boxes.xyxy:
                x1, y1, x2, y2 = np.clip(row, 0, [w, h, w, h]).astype(int)
                self.acc[y1:y2, x1:x2] += 1.0
        return self

    def render(self, img: Optional[np.ndarray] = None, alpha: float = 0.5) -> np.ndarray:
        import cv2

        norm = self.acc / (self.acc.max() + 1e-9)
        heat = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
        if img is None:
            return heat
        return cv2.addWeighted(img, 1 - alpha, heat, alpha, 0)
