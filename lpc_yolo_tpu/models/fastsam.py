"""FastSAM: segment-everything via a YOLOv8-seg graph + prompt selection.

Behavioral spec: reference models/fastsam/ (591 LoC) — FastSAM is a
single-class yolov8-seg model (model.py:9-33); FastSAMPredictor runs the
standard segmentation predict with nc=1 and full-frame masks (predict.py:
24-86); FastSAMPrompt then selects masks by box IoU / point membership / CLIP
text score (prompt.py:284-355).

Here the model is our yolov8-seg compiled graph (one class); prompts are
numpy post-selection over Results. Text prompts require a CLIP-style image
encoder and are env-gated like the reference's `import clip`.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class FastSAM:
    """`FastSAM('FastSAM-s.pt'|'fastsam-s.yaml')` -> .predict(source) with
    everything-masks; combine with FastSAMPrompt for prompt selection."""

    def __init__(self, model: str = "fastsam-s.yaml"):
        from ..engine.model import YOLO

        name = str(model)
        if name.endswith(".pt"):
            self._yolo = YOLO(name)
        else:
            # FastSAM-s/x are yolov8s/x-seg graphs with nc=1 (model.py:9)
            scale = "x" if "x" in name.lower().replace("fastsam", "") else "s"
            self._yolo = YOLO(f"yolov8{scale}-seg.yaml", nc=1)
        self._yolo.names = {0: "object"}
        self.names = self._yolo.names

    def predict(self, source, conf: float = 0.4, iou: float = 0.9, retina_masks: bool = True, **kw):
        """Reference FastSAM defaults: conf=0.4, iou=0.9 (predict.py:45)."""
        return self._yolo.predict(source, conf=conf, iou=iou, **kw)

    def __call__(self, source, **kw):
        return self.predict(source, **kw)

    @property
    def model(self):
        return self._yolo.model

    @property
    def variables(self):
        return self._yolo.variables


class FastSAMPrompt:
    """Mask selection over FastSAM results (prompt.py:15-366)."""

    def __init__(self, source, results, device=None):
        self.source = source
        self.results = results

    @staticmethod
    def _mask_data(result) -> Optional[np.ndarray]:
        if result.masks is None:
            return None
        m = np.asarray(result.masks)
        return (m > 0.5).astype(np.float32)

    def box_prompt(self, bbox: List[float]):
        """Keep the mask with max IoU against the box (prompt.py:284-317)."""
        r = self.results[0]
        masks = self._mask_data(r)
        if masks is None:
            return self.results
        th, tw = r.orig_shape
        h, w = masks.shape[1:]
        b = [
            max(round(bbox[0] * w / tw), 0),
            max(round(bbox[1] * h / th), 0),
            min(round(bbox[2] * w / tw), w),
            min(round(bbox[3] * h / th), h),
        ]
        bbox_area = (b[3] - b[1]) * (b[2] - b[0])
        inter = masks[:, b[1] : b[3], b[0] : b[2]].sum(axis=(1, 2))
        areas = masks.sum(axis=(1, 2))
        iou = inter / np.maximum(bbox_area + areas - inter, 1e-9)
        best = int(np.argmax(iou))
        r.masks = masks[best : best + 1]
        return self.results

    def point_prompt(self, points, pointlabel):
        """Union of masks containing positive points minus negative ones
        (prompt.py:319-341)."""
        r = self.results[0]
        masks = self._mask_data(r)
        if masks is None:
            return self.results
        th, tw = r.orig_shape
        h, w = masks.shape[1:]
        pts = [[int(p[0] * w / tw), int(p[1] * h / th)] for p in points]
        one = np.zeros((h, w), np.float32)
        for m in masks:
            for p, l in zip(pts, pointlabel):
                if m[p[1], p[0]] == 1 and l == 1:
                    one += m
                if m[p[1], p[0]] == 1 and l == 0:
                    one -= m
        r.masks = (one >= 1).astype(np.float32)[None]
        return self.results

    def text_prompt(self, text):
        raise NotImplementedError(
            "text prompts need a CLIP image/text encoder; install clip and pass "
            "embeddings (the reference downloads ViT-B/32 — unavailable offline)"
        )

    def everything_prompt(self):
        return self.results
