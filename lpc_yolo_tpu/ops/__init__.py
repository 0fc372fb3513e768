"""Pure-function ops/math layer (boxes, anchors, decode, NMS, letterbox)."""

from .anchors import bbox2dist, dfl_expectation, dist2bbox, make_anchors
from .boxes import (
    bbox_iou,
    box_iou,
    clip_boxes,
    ltwh2xyxy,
    scale_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
    xyxy2xywhn,
)
from .postprocess import non_max_suppression, v10_detections, v10_postprocess

__all__ = [
    "bbox2dist",
    "dfl_expectation",
    "dist2bbox",
    "make_anchors",
    "bbox_iou",
    "box_iou",
    "clip_boxes",
    "ltwh2xyxy",
    "scale_boxes",
    "xywh2xyxy",
    "xywhn2xyxy",
    "xyxy2ltwh",
    "xyxy2xywh",
    "xyxy2xywhn",
    "non_max_suppression",
    "v10_detections",
    "v10_postprocess",
]
