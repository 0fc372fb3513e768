"""Region/line object counting over a tracked stream.

Behavioral spec: reference solutions/object_counter.py — counts tracked
objects crossing a line or entering a polygon region, in/out tallies per
class, annotated frames.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _point_in_polygon(pt: Tuple[float, float], poly: np.ndarray) -> bool:
    """Ray-casting point-in-polygon."""
    x, y = pt
    inside = False
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi + 1e-12) + xi:
            inside = not inside
        j = i
    return inside


class ObjectCounter:
    """Counts tracked objects crossing into/out of a region (polygon) or
    across a line (2-point region)."""

    def __init__(self, region: Sequence[Tuple[float, float]], names: Optional[Dict[int, str]] = None):
        self.region = np.asarray(region, np.float32)
        self.is_line = len(self.region) == 2
        self.names = names or {}
        self.in_count = 0
        self.out_count = 0
        self.class_counts: Dict[str, Dict[str, int]] = {}
        self._last_side: Dict[int, bool] = {}
        self.counted_ids: set = set()

    def set_region(self, region: Sequence[Tuple[float, float]]) -> "ObjectCounter":
        """Move/replace the counting geometry mid-stream — the headless
        equivalent of the reference's mouse-drag region editing
        (object_counter.py:128-160). Accumulated counts are kept; per-track
        side memory is reset so the move itself never registers a crossing
        (each track re-establishes its side on the next frame)."""
        self.region = np.asarray(region, np.float32)
        self.is_line = len(self.region) == 2
        self._last_side.clear()
        return self

    def _side(self, pt: Tuple[float, float]) -> bool:
        if self.is_line:
            (x1, y1), (x2, y2) = self.region
            return (x2 - x1) * (pt[1] - y1) - (y2 - y1) * (pt[0] - x1) > 0
        return _point_in_polygon(pt, self.region)

    def update(self, result) -> "ObjectCounter":
        """Consume one tracked Results frame (boxes must carry ids)."""
        boxes = result.boxes
        if boxes is None or boxes.id is None:
            return self
        for row, tid, c in zip(boxes.xyxy, boxes.id.astype(int), boxes.cls.astype(int)):
            center = ((row[0] + row[2]) / 2, (row[1] + row[3]) / 2)
            side = self._side(center)
            prev = self._last_side.get(tid)
            if prev is not None and side != prev:
                name = self.names.get(c, str(c))
                cc = self.class_counts.setdefault(name, {"in": 0, "out": 0})
                if side:
                    self.in_count += 1
                    cc["in"] += 1
                else:
                    self.out_count += 1
                    cc["out"] += 1
                self.counted_ids.add(tid)
            self._last_side[tid] = side
        return self

    def annotate(self, img: np.ndarray) -> np.ndarray:
        import cv2

        im = img.copy()
        pts = self.region.astype(int)
        if self.is_line:
            cv2.line(im, tuple(pts[0]), tuple(pts[1]), (0, 255, 255), 2)
        else:
            cv2.polylines(im, [pts], True, (0, 255, 255), 2)
        cv2.putText(im, f"in {self.in_count} out {self.out_count}", (12, 28),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 255), 2)
        return im
