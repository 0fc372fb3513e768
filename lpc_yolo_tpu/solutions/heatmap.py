"""Detection-density heatmaps over a tracked stream.

Behavioral spec: reference solutions/heatmap.py:66-160 (set_args shape /
colormap / decay / counting-region options) and :160-240 (generate_heatmap:
per-track circle-or-rect accumulation with decay, plus in/out counting
against a 2-point line or 4-point region). The reference derives its
geometry from shapely (Polygon.contains / Point.distance); here the same
predicates are a few lines of numpy, and the count attribution rule is the
reference's: a newly-counted track is "in" when its box x1 is right of the
region centroid, "out" otherwise (heatmap.py:210-224).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _point_in_polygon(pt: Tuple[float, float], poly: np.ndarray) -> bool:
    """Ray-casting point-in-polygon (shared with object_counter)."""
    x, y = pt
    inside = False
    j = len(poly) - 1
    for i in range(len(poly)):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi + 1e-12) + xi:
            inside = not inside
        j = i
    return inside


def _point_segment_distance(pt: Tuple[float, float], a, b) -> float:
    p = np.asarray(pt, np.float32)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = b - a
    t = float(np.clip(np.dot(p - a, d) / (np.dot(d, d) + 1e-12), 0.0, 1.0))
    return float(np.linalg.norm(p - (a + t * d)))


class Heatmap:
    """Accumulates per-detection heat with decay; optionally counts tracked
    objects against a line (2 points) or region (4 points).

    Args:
        shape: image (H, W) to accumulate over.
        decay: per-frame multiplicative decay (reference decay_factor).
        heat_shape: "circle" adds heat inside the box's inscribed circle,
            "rect" over the whole box (reference set_args shape).
        count_reg_pts: optional 2-point line or 4-point region for in/out
            counting; editable later via set_region().
        line_dist_thresh: distance threshold for the line counter.
    """

    def __init__(self, shape: Tuple[int, int], decay: float = 0.99,
                 heat_shape: str = "circle",
                 count_reg_pts: Optional[Sequence[Tuple[float, float]]] = None,
                 line_dist_thresh: float = 15.0,
                 view_in_counts: bool = True, view_out_counts: bool = True):
        self.acc = np.zeros(shape, np.float32)
        self.decay = decay
        if heat_shape not in ("circle", "rect"):  # reference heatmap.py:153-156
            heat_shape = "circle"
        self.heat_shape = heat_shape
        self.line_dist_thresh = line_dist_thresh
        self.view_in_counts = view_in_counts
        self.view_out_counts = view_out_counts
        self.in_counts = 0
        self.out_counts = 0
        self.counted_ids: set = set()
        self.region: Optional[np.ndarray] = None
        if count_reg_pts is not None:
            self.set_region(count_reg_pts)

    def set_region(self, points: Sequence[Tuple[float, float]]) -> "Heatmap":
        """(Re)place the counting geometry; 2 points = line, 4 = region."""
        pts = np.asarray(points, np.float32)
        if len(pts) not in (2, 4):
            raise ValueError("count region needs 2 (line) or 4 (region) points")
        self.region = pts
        return self

    def _splat(self, x1, y1, x2, y2):
        h, w = self.acc.shape
        # circle center/radius come from the UNCLIPPED box (reference derives
        # them from the raw track box); only the accumulation window clips
        cx, cy = (int(x1) + int(x2)) // 2, (int(y1) + int(y2)) // 2
        r = min(int(x2) - int(x1), int(y2) - int(y1)) // 2
        x1, y1 = max(int(x1), 0), max(int(y1), 0)
        x2, y2 = min(int(x2), w), min(int(y2), h)
        if x2 <= x1 or y2 <= y1:
            return
        if self.heat_shape == "rect":
            self.acc[y1:y2, x1:x2] += 2.0
            return
        ys, xs = np.ogrid[y1:y2, x1:x2]
        self.acc[y1:y2, x1:x2] += 2.0 * ((xs - cx) ** 2 + (ys - cy) ** 2 <= r * r)

    def update(self, result) -> "Heatmap":
        """Consume one (optionally tracked) Results frame."""
        self.acc *= self.decay
        boxes = result.boxes
        if boxes is None:
            return self
        ids = boxes.id.astype(int) if getattr(boxes, "id", None) is not None else None
        for i, row in enumerate(np.asarray(boxes.xyxy)):
            x1, y1, x2, y2 = row
            self._splat(x1, y1, x2, y2)
            if self.region is None or ids is None:
                continue
            tid = int(ids[i])
            if tid in self.counted_ids:
                continue
            center = ((x1 + x2) / 2.0, (y1 + y2) / 2.0)
            if len(self.region) == 4:
                hit = _point_in_polygon(center, self.region)
            else:
                hit = _point_segment_distance(center, self.region[0],
                                              self.region[1]) < self.line_dist_thresh
            if hit:
                self.counted_ids.add(tid)
                # reference attribution: x1 left of the region's AREA centroid
                # (shapely Polygon.centroid, not the vertex mean — these differ
                # for non-rectangular 4-point regions) -> out, else in
                if x1 < self._centroid_x():
                    self.out_counts += 1
                else:
                    self.in_counts += 1
        return self

    def _centroid_x(self) -> float:
        """x of the counting geometry's centroid: polygon area centroid for
        4-point regions (shoelace), midpoint for 2-point lines."""
        pts = self.region
        if len(pts) == 2:
            return float(pts[:, 0].mean())
        x, y = pts[:, 0].astype(np.float64), pts[:, 1].astype(np.float64)
        xn, yn = np.roll(x, -1), np.roll(y, -1)
        cross = x * yn - xn * y
        area = cross.sum() / 2.0
        if abs(area) < 1e-9:  # degenerate polygon: fall back to vertex mean
            return float(x.mean())
        return float(((x + xn) * cross).sum() / (6.0 * area))

    def render(self, img: Optional[np.ndarray] = None, alpha: float = 0.5) -> np.ndarray:
        import cv2

        norm = self.acc / (self.acc.max() + 1e-9)
        heat = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
        out = heat if img is None else cv2.addWeighted(img, 1 - alpha, heat, alpha, 0)
        if self.region is not None:
            pts = self.region.astype(int)
            if len(pts) == 2:
                cv2.line(out, tuple(pts[0]), tuple(pts[1]), (255, 0, 255), 5)
            else:
                cv2.polylines(out, [pts], True, (255, 0, 255), 5)
            label = []
            if self.view_in_counts:
                label.append(f"in {self.in_counts}")
            if self.view_out_counts:
                label.append(f"out {self.out_counts}")
            if label:
                cv2.putText(out, " ".join(label), (12, 28),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        return out
