"""Tracker <-> predictor integration.

Behavioral spec: reference ultralytics/trackers/track.py:17-89 — tracker built
from cfg/trackers/*.yaml, fed each frame's postprocessed detections, Results
updated with track ids (boxes grow a 7th column: [xyxy, id, conf, cls]).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Union

import numpy as np
import yaml

from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}
_CFG_DIR = Path(__file__).resolve().parents[1] / "cfg" / "trackers"


def make_tracker(tracker: Union[str, dict] = "bytetrack.yaml", frame_rate: int = 30):
    """Build a tracker from a config name/path/dict (track.py:17-45)."""
    if isinstance(tracker, dict):
        cfg = dict(tracker)
    else:
        p = Path(tracker)
        if not p.exists():
            p = _CFG_DIR / p.name
        cfg = yaml.safe_load(p.read_text())
    ttype = cfg.pop("tracker_type", "bytetrack")
    if ttype not in TRACKER_MAP:
        raise ValueError(f"tracker_type must be one of {list(TRACKER_MAP)}, got {ttype}")
    if ttype == "botsort" and cfg.get("with_reid") and "encoder" not in cfg:
        from .reid import build_encoder

        cfg["encoder"] = build_encoder(cfg.pop("reid_encoder", "hist"))
    else:
        cfg.pop("reid_encoder", None)
    return TRACKER_MAP[ttype](frame_rate=frame_rate, **cfg)


def track_stream(results_iter, tracker_cfg: Union[str, dict] = "bytetrack.yaml", persist: bool = False) -> Iterator:
    """Wrap a Results stream with per-frame tracker updates (track.py:47-77).

    Yields Results whose boxes carry [x1,y1,x2,y2,id,conf,cls] for tracked
    detections (frames with no confirmed tracks yield empty boxes).
    """
    tracker = make_tracker(tracker_cfg)
    for r in results_iter:
        det = r.boxes.data if r.boxes is not None else np.zeros((0, 6), np.float32)
        tracks = tracker.update(det[:, :4], det[:, -2], det[:, -1], r.orig_img)
        if len(tracks):
            # reference Boxes-with-id layout: [x1, y1, x2, y2, id, conf, cls]
            r.boxes.data = np.concatenate(
                [tracks[:, :4], tracks[:, 4:5], tracks[:, 5:6], tracks[:, 6:7]], axis=1
            ).astype(np.float32)
        else:
            r.boxes.data = np.zeros((0, 7), np.float32)
        yield r
