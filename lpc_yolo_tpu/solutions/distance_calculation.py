"""Distance estimation between tracked objects (reference
solutions/distance_calculation.py): pixel centroid distance scaled to meters."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


class DistanceCalculation:
    def __init__(self, pixels_per_meter: float = 10.0):
        self.ppm = pixels_per_meter
        self.centroids: Dict[int, np.ndarray] = {}

    def update(self, result) -> Dict[Tuple[int, int], float]:
        """Consume a tracked frame; returns pairwise distances (meters) between
        all tracked ids in it."""
        boxes = result.boxes
        self.centroids = {}
        if boxes is None or boxes.id is None:
            return {}
        for row, tid in zip(boxes.xyxy, boxes.id.astype(int)):
            self.centroids[tid] = np.array([(row[0] + row[2]) / 2, (row[1] + row[3]) / 2])
        ids = sorted(self.centroids)
        out = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                out[(a, b)] = float(np.linalg.norm(self.centroids[a] - self.centroids[b]) / self.ppm)
        return out

    def annotate(self, img: np.ndarray, distances: Dict[Tuple[int, int], float]) -> np.ndarray:
        import cv2

        im = img.copy()
        for (a, b), d in distances.items():
            pa, pb = self.centroids[a].astype(int), self.centroids[b].astype(int)
            cv2.line(im, tuple(pa), tuple(pb), (255, 128, 0), 2)
            mid = ((pa + pb) / 2).astype(int)
            cv2.putText(im, f"{d:.1f} m", tuple(mid), cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 128, 0), 2)
        return im
