"""Region counter: count tracked objects inside user-defined polygon regions.

Mirrors the reference example (examples/YOLOv8-Region-Counter/
yolov8_region_counter.py:1-251): per-frame `model.track(..., persist=True)`,
then a point-in-polygon test of each track's box center against every
region; a track increments a region's count once per entry.

Usage:
    python main.py model.yaml video.mp4
(Regions below are demo rectangles/polygons in frame coordinates; edit
REGIONS or pass your own to `RegionCounter`.)
"""

from __future__ import annotations

import sys
from typing import Dict, List, Sequence, Tuple

import numpy as np

REGIONS: List[Dict] = [
    {"name": "region-1", "polygon": [(50, 80), (250, 20), (450, 80), (400, 350), (100, 350)]},
    {"name": "region-2", "polygon": [(500, 60), (900, 60), (900, 400), (500, 400)]},
]


def point_in_polygon(pt: Tuple[float, float], poly: Sequence[Tuple[float, float]]) -> bool:
    """Ray-casting test (the reference uses shapely; this is dependency-free)."""
    x, y = pt
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            x_cross = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < x_cross:
                inside = not inside
    return inside


class RegionCounter:
    """Stateful per-region counting over a stream of track results."""

    def __init__(self, regions: List[Dict] = REGIONS):
        self.regions = [dict(r, count=0, inside=set()) for r in regions]

    def update(self, boxes_xyxy: np.ndarray, track_ids: Sequence[int]) -> List[int]:
        """Feed one frame's tracked boxes; returns current per-region counts."""
        centers = (boxes_xyxy[:, :2] + boxes_xyxy[:, 2:4]) / 2 if len(boxes_xyxy) else []
        for region in self.regions:
            now = {
                int(tid)
                for c, tid in zip(centers, track_ids)
                if point_in_polygon((float(c[0]), float(c[1])), region["polygon"])
            }
            region["count"] += len(now - region["inside"])  # count each track once per entry
            region["inside"] = now
        return [r["count"] for r in self.regions]


def main():
    import cv2

    from lpc_yolo_tpu import YOLO

    model_name = sys.argv[1] if len(sys.argv) > 1 else "yolov10n.yaml"
    source = sys.argv[2]
    model = YOLO(model_name)
    counter = RegionCounter()

    for r in model.track(source, stream=True, persist=True):
        boxes = r.boxes
        ids = boxes.id if boxes.id is not None else []
        counts = counter.update(np.asarray(boxes.xyxy), ids)
        frame = r.plot()
        for region, count in zip(counter.regions, counts):
            pts = np.asarray(region["polygon"], np.int32)
            cv2.polylines(frame, [pts], True, (255, 144, 30), 2)
            cv2.putText(frame, f"{region['name']}: {count}", tuple(pts[0]),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 144, 30), 2)
        cv2.imwrite("region_counts.jpg", frame)
    print({r["name"]: r["count"] for r in counter.regions})


if __name__ == "__main__":
    main()
