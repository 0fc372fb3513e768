"""Track-based speed estimation (reference solutions/speed_estimation.py):
pixel displacement of track centers across frames scaled to real units."""

from __future__ import annotations

from collections import deque
from typing import Dict

import numpy as np


class SpeedEstimator:
    def __init__(self, fps: float = 30.0, pixels_per_meter: float = 10.0, window: int = 5):
        self.fps = fps
        self.ppm = pixels_per_meter
        self.window = window
        self.history: Dict[int, deque] = {}
        self.speeds: Dict[int, float] = {}

    def update(self, result) -> Dict[int, float]:
        """Consume one tracked frame; returns {track_id: km/h}."""
        boxes = result.boxes
        if boxes is None or boxes.id is None:
            return self.speeds
        for row, tid in zip(boxes.xyxy, boxes.id.astype(int)):
            center = np.array([(row[0] + row[2]) / 2, (row[1] + row[3]) / 2])
            hist = self.history.setdefault(tid, deque(maxlen=self.window))
            hist.append(center)
            if len(hist) >= 2:
                dist_px = float(np.linalg.norm(hist[-1] - hist[0]))
                dt = (len(hist) - 1) / self.fps
                m_per_s = dist_px / self.ppm / max(dt, 1e-9)
                self.speeds[tid] = m_per_s * 3.6  # km/h
        return self.speeds
