"""YOLO-NAS facade.

Behavioral spec: reference models/nas/ (200 LoC) — a predict/val-only facade
over super-gradients pretrained checkpoints (model.py:41-60: `.pt` torch-load
or `super_gradients.training.models.get`; YAML configs are explicitly
rejected). The architecture itself is not defined in the reference; it comes
from the checkpoint. Mirroring that: this facade loads a checkpoint when one
exists and implements the NAS postprocessing (predict.py:34-60: raw
(boxes_xyxy, cls_scores) pair -> xywh+scores -> class-offset NMS -> Results);
without weights it raises the same way the reference does offline.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np


class NAS:
    """`NAS('yolo_nas_s.pt')` -> .predict(source). Pretrained-only, like the
    reference (model.py:52: YAML is asserted away)."""

    def __init__(self, model: str = "yolo_nas_s.pt"):
        assert Path(model).suffix not in (".yaml", ".yml"), "YOLO-NAS models only support pre-trained models."
        self.model_name = str(model)
        self.task = "detect"
        self.names = {i: str(i) for i in range(80)}
        if Path(model).exists():
            self._load(str(model))
        else:
            raise FileNotFoundError(
                f"{model} not found. YOLO-NAS ships only as pretrained checkpoints "
                "(reference fetches them via super_gradients, which needs network "
                "access); place the .pt locally and retry."
            )

    def _load(self, weights: str):
        import torch

        self.torch_model = torch.load(weights, map_location="cpu", weights_only=False)
        names = getattr(self.torch_model, "names", None)
        if isinstance(names, dict):
            self.names = {int(k): str(v) for k, v in names.items()}

    def predict(self, source, conf: float = 0.25, iou: float = 0.45, max_det: int = 300, imgsz: int = 640, **kw):
        """Run the torch checkpoint host-side, postprocess with our ops."""
        import cv2
        import torch

        from ..engine.results import Results
        from ..ops.letterbox import letterbox_image

        img = cv2.imread(str(source)) if isinstance(source, str) else np.asarray(source)
        boxed, gain, pad = letterbox_image(img, (imgsz, imgsz))
        x = torch.from_numpy(boxed[..., ::-1].astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
        with torch.no_grad():
            out = self.torch_model(x)
        rows = nas_postprocess(out, conf, iou, max_det)
        rows[:, :4] = (rows[:, :4] - np.array([pad[0], pad[1], pad[0], pad[1]])) / gain
        return [Results(orig_img=img, path=str(source), names=self.names, boxes=rows)]

    def __call__(self, source, **kw):
        return self.predict(source, **kw)


def nas_postprocess(preds_in, conf: float = 0.25, iou: float = 0.45, max_det: int = 300) -> np.ndarray:
    """NASPredictor.postprocess semantics (predict.py:34-60): raw
    (boxes_xyxy (B, A, 4), scores (B, A, nc)) -> NMS'd rows (n, 6)."""
    import jax.numpy as jnp

    from ..ops.postprocess import non_max_suppression

    boxes = np.asarray(preds_in[0][0] if isinstance(preds_in[0], (list, tuple)) else preds_in[0])
    scores = np.asarray(preds_in[0][1] if isinstance(preds_in[0], (list, tuple)) else preds_in[1])
    if boxes.ndim == 2:
        boxes, scores = boxes[None], scores[None]
    # our NMS consumes (B, A, 4+nc) with xywh boxes
    xywh = np.concatenate(
        [(boxes[..., :2] + boxes[..., 2:]) / 2, boxes[..., 2:] - boxes[..., :2]], axis=-1
    )
    pred = jnp.asarray(np.concatenate([xywh, scores], axis=-1), jnp.float32)
    det = np.asarray(non_max_suppression(pred, conf, iou, max_det))[0]
    return det[det[:, 4] > conf]
