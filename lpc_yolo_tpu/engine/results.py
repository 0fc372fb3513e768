"""Prediction result containers — the reference's Results/Boxes API surface
(engine/results.py:21-523) rebuilt as plain-numpy host objects.

Device arrays never live here: the predictor converts once at the device
boundary, so downstream user code (plot/save/json/track) is framework-free.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import numpy as np



class Boxes:
    """Detection boxes (N, 6) = [x1, y1, x2, y2, conf, cls], or (N, 7) with a
    track id inserted at column 4 (mirrors engine/results.py:433-522)."""

    def __init__(self, data: np.ndarray, orig_shape: Tuple[int, int]):
        data = np.asarray(data, dtype=np.float32)
        if data.ndim == 1:
            data = data.reshape(-1, 6) if data.size % 7 else data.reshape(-1, 7)
        assert data.shape[-1] in (6, 7), f"expected 6 or 7 box columns, got {data.shape}"
        self.data = data
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx) -> "Boxes":
        return Boxes(self.data[idx], self.orig_shape)

    @property
    def xyxy(self) -> np.ndarray:
        return self.data[:, :4]

    @property
    def conf(self) -> np.ndarray:
        return self.data[:, -2]

    @property
    def cls(self) -> np.ndarray:
        return self.data[:, -1]

    @property
    def xywh(self) -> np.ndarray:
        b = self.xyxy
        return np.concatenate(
            [(b[:, :2] + b[:, 2:]) / 2, b[:, 2:] - b[:, :2]], axis=-1
        )

    @property
    def xyxyn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h], dtype=np.float32)

    @property
    def xywhn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h], dtype=np.float32)

    # track id column sits at index 4 when present (7-column layout)
    @property
    def id(self) -> Optional[np.ndarray]:
        return self.data[:, 4] if self.data.shape[1] == 7 else None

    def cpu(self):
        return self

    def numpy(self):
        return self

    # host-resident numpy containers: device moves are identity ops here
    # (reference BaseTensor.cuda/.to move torch tensors)
    def cuda(self):
        return self

    def to(self, *args, **kwargs):
        return self


class OBBoxes:
    """Oriented bounding boxes (N, 7) = [cx, cy, w, h, angle, conf, cls]
    (mirrors the reference's OBB results container, engine/results.py OBB)."""

    def __init__(self, data: np.ndarray, orig_shape: Tuple[int, int]):
        data = np.asarray(data, dtype=np.float32)
        if data.ndim == 1:
            data = data.reshape(-1, 7)
        assert data.shape[-1] == 7, f"expected 7 obb columns, got {data.shape}"
        self.data = data
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx) -> "OBBoxes":
        return OBBoxes(self.data[idx], self.orig_shape)

    @property
    def xywhr(self) -> np.ndarray:
        return self.data[:, :5]

    @property
    def conf(self) -> np.ndarray:
        return self.data[:, 5]

    @property
    def cls(self) -> np.ndarray:
        return self.data[:, 6]

    @property
    def xyxyxyxy(self) -> np.ndarray:
        """(N, 4, 2) corner points."""
        rb = self.data
        c, s = np.cos(rb[:, 4]), np.sin(rb[:, 4])
        v1 = np.stack([rb[:, 2] / 2 * c, rb[:, 2] / 2 * s], axis=-1)
        v2 = np.stack([-rb[:, 3] / 2 * s, rb[:, 3] / 2 * c], axis=-1)
        ctr = rb[:, :2]
        return np.stack([ctr + v1 + v2, ctr + v1 - v2, ctr - v1 - v2, ctr - v1 + v2], axis=1)

    @property
    def xyxyxyxyn(self) -> np.ndarray:
        """(N, 4, 2) corner points normalized by the original frame size."""
        h, w = self.orig_shape
        return self.xyxyxyxy / np.array([w, h], self.data.dtype)

    @property
    def xyxy(self) -> np.ndarray:
        """Axis-aligned hulls (N, 4)."""
        pts = self.xyxyxyxy
        return np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1)


class Masks:
    """Instance masks (N, H, W) with xy/xyn polygon accessors (reference
    engine/results.py:523-570)."""

    def __init__(self, data: np.ndarray, orig_shape: Tuple[int, int]):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx):
        # int index yields the raw (H, W) mask array (ndarray duck-typing for
        # existing consumers); slices keep the container
        if isinstance(idx, (int, np.integer)):
            return self.data[idx]
        return Masks(self.data[idx], self.orig_shape)

    def __array__(self, dtype=None):
        return np.asarray(self.data, dtype=dtype)

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def cpu(self):
        return self

    def numpy(self):
        return self

    # host-resident numpy containers: device moves are identity ops here
    # (reference BaseTensor.cuda/.to move torch tensors)
    def cuda(self):
        return self

    def to(self, *args, **kwargs):
        return self

    @property
    def xy(self):
        """Per-mask largest contour as pixel-space (K, 2) polygons."""
        import cv2

        out = []
        h0, w0 = self.orig_shape
        for m in self.data:
            mm = (np.asarray(m) > 0.5).astype(np.uint8)
            cs, _ = cv2.findContours(mm, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if not cs:
                out.append(np.zeros((0, 2), np.float32))
                continue
            c = max(cs, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            c[:, 0] *= w0 / mm.shape[1]
            c[:, 1] *= h0 / mm.shape[0]
            out.append(c)
        return out

    @property
    def xyn(self):
        h0, w0 = self.orig_shape
        return [p / np.array([w0, h0], np.float32) for p in self.xy]


class Probs(np.ndarray):
    """Classification probabilities with top-1/top-5 accessors (reference
    engine/results.py Probs). An ndarray subclass, so existing array uses
    (shape/sum/indexing/np.asarray) keep working."""

    def __new__(cls, data):
        return np.asarray(data, np.float32).view(cls)

    @property
    def data(self) -> np.ndarray:
        return np.asarray(self)

    @property
    def top1(self) -> int:
        return int(np.argmax(np.asarray(self)))

    @property
    def top5(self):
        return np.argsort(-np.asarray(self))[:5].tolist()

    @property
    def top1conf(self) -> float:
        return float(np.asarray(self)[self.top1])

    @property
    def top5conf(self) -> np.ndarray:
        return np.asarray(self)[self.top5]

    def cpu(self):
        return self

    def numpy(self):
        return self

    # host-resident numpy containers: device moves are identity ops here
    # (reference BaseTensor.cuda/.to move torch tensors)
    def cuda(self):
        return self

    def to(self, *args, **kwargs):
        return self


class Results:
    """One image's predictions (mirrors engine/results.py:66-430)."""

    def __init__(
        self,
        orig_img: np.ndarray,
        path: str,
        names: Dict[int, str],
        boxes: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        probs: Optional[np.ndarray] = None,
        keypoints: Optional[np.ndarray] = None,
        obb: Optional[np.ndarray] = None,
        speed: Optional[Dict[str, float]] = None,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.keypoints = keypoints
        self.obb = OBBoxes(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {}

    def __len__(self) -> int:
        return len(self.boxes) if self.boxes is not None else 0

    def __iter__(self) -> Iterator["Results"]:
        for i in range(len(self)):
            yield self[i]

    def __getitem__(self, idx) -> "Results":
        r = Results(self.orig_img, self.path, self.names, speed=self.speed)
        if self.boxes is not None:
            r.boxes = self.boxes[idx]
        return r

    def update(self, boxes: Optional[np.ndarray] = None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        return self

    def plot(
        self,
        line_width: Optional[int] = None,
        font_scale: float = 0.5,
        conf: bool = True,
        labels: bool = True,
        boxes: bool = True,
        masks: bool = True,
        kpt_line: bool = True,
        img: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Render detections (boxes, masks, keypoints, classification top-5)
        onto a copy of the original image; returns BGR ndarray. Reference
        Results.plot semantics (engine/results.py:280-360) via Annotator."""
        from ..utils.plotting import Annotator, colors

        im = (img if img is not None else self.orig_img).copy()
        ann = Annotator(im, line_width=line_width)
        if masks and self.masks is not None and len(self.masks):
            cls_ids = (
                [int(c) for c in self.boxes.data[:, -1]] if self.boxes is not None else range(len(self.masks))
            )
            ann.masks(np.asarray(self.masks.data), [colors(c, bgr=True) for c in cls_ids])
        if boxes and self.boxes is not None:
            ids = self.boxes.id
            for i, row in enumerate(self.boxes.data):
                cf, c = row[-2], row[-1]
                color = colors(int(c), bgr=True)
                name = self.names.get(int(c), str(int(c)))
                if ids is not None:
                    name = f"id:{int(ids[i])} {name}"
                txt = (f"{name} {cf:.2f}" if conf else name) if labels else ""
                rotated = row.shape[0] >= 10  # xyxyxyxy + conf + cls
                ann.box_label(row[:8] if rotated else row[:4], txt, color=color, rotated=rotated)
        if self.keypoints is not None:
            for k in np.asarray(self.keypoints):
                ann.kpts(k, kpt_line=kpt_line)
        if self.probs is not None:
            top5 = np.argsort(-np.asarray(self.probs))[:5]
            text = "\n".join(f"{self.names.get(int(j), j)} {float(self.probs[j]):.2f}" for j in top5)
            for li, line in enumerate(text.split("\n")):
                ann.text((6, 28 + 22 * li), line)
        return ann.result()

    def save(self, filename: str) -> str:
        import cv2

        cv2.imwrite(filename, self.plot())
        return filename

    def save_crop(self, save_dir, file_name: str = "im.jpg"):
        """Save each detection's crop to save_dir/<class-name>/<file_name>
        (reference engine/results.py:366 + plotting.save_one_box: box grown
        by gain 1.02 + 10 px pad, clipped to the frame)."""
        if self.probs is not None:
            return  # classify has no boxes (reference warns and returns)
        if self.boxes is None:
            return
        from ..utils.plotting import save_one_box

        for row in self.boxes.data:
            c = int(row[-1])
            name = self.names.get(c, str(c))
            save_one_box(
                row[:4], self.orig_img,
                file=Path(save_dir) / name / file_name,
            )

    def summary(self, normalize: bool = False, decimals: int = 5) -> list:
        """Per-detection dicts (reference Results.summary: name/class/
        confidence/box + segments xy + keypoints; classify -> its top-1)."""
        h, w = self.orig_shape

        def rnd(v, d=decimals):
            return round(float(v), d)

        if self.probs is not None:
            return [{
                "name": self.names.get(self.probs.top1, str(self.probs.top1)),
                "class": self.probs.top1,
                "confidence": rnd(self.probs.top1conf),
            }]
        rows = []
        if self.boxes is None:
            return rows
        ids = self.boxes.id
        kpts = np.asarray(self.keypoints) if self.keypoints is not None else None
        seg_xy = self.masks.xy if self.masks is not None else None
        for i, row in enumerate(np.asarray(self.boxes.data)):
            x1, y1, x2, y2 = row[:4].tolist()
            cf, c = float(row[-2]), int(row[-1])
            if normalize:
                x1, x2, y1, y2 = x1 / w, x2 / w, y1 / h, y2 / h
            d = {
                "name": self.names.get(c, str(c)),
                "class": c,
                "confidence": rnd(cf),
                "box": {"x1": rnd(x1), "y1": rnd(y1), "x2": rnd(x2), "y2": rnd(y2)},
            }
            if ids is not None:
                d["track_id"] = int(ids[i])
            if seg_xy is not None and i < len(seg_xy) and len(seg_xy[i]):
                pts = np.asarray(seg_xy[i], np.float64)
                if normalize:
                    pts = pts / [w, h]
                d["segments"] = {"x": [rnd(v) for v in pts[:, 0]],
                                 "y": [rnd(v) for v in pts[:, 1]]}
            if kpts is not None and i < len(kpts):
                kp = kpts[i].astype(np.float64)
                x, y = kp[:, 0], kp[:, 1]
                if normalize:
                    x, y = x / w, y / h
                d["keypoints"] = {"x": [rnd(v) for v in x], "y": [rnd(v) for v in y]}
                if kp.shape[1] > 2:
                    d["keypoints"]["visible"] = [rnd(v) for v in kp[:, 2]]
            rows.append(d)
        return rows

    def tojson(self, normalize: bool = False, decimals: int = 5) -> str:
        """JSON of summary() (reference Results.tojson)."""
        return json.dumps(self.summary(normalize=normalize, decimals=decimals), indent=2)

    # original spelling of this port, kept as an alias
    to_json = tojson

    def verbose(self) -> str:
        """Per-class count string '3 persons, 1 car, ' (reference Results.verbose)."""
        if self.probs is not None:
            return ", ".join(
                f"{self.names.get(j, str(j))} {float(np.asarray(self.probs)[j]):.2f}"
                for j in self.probs.top5
            ) + ", "
        if self.boxes is None or len(self.boxes) == 0:
            return "(no detections), "
        cls = np.asarray(self.boxes.data)[:, -1].astype(int)
        return "".join(
            f"{n} {self.names.get(int(c), str(c))}{'s' * (n > 1)}, "
            for c, n in zip(*np.unique(cls, return_counts=True))
        )

    def show(self):
        """Display the annotated image (reference Results.show via PIL)."""
        from PIL import Image

        Image.fromarray(self.plot()[..., ::-1]).show()

    def new(self) -> "Results":
        """Empty Results over the same frame (reference Results.new)."""
        return Results(self.orig_img, self.path, self.names, speed=self.speed)

    def save_txt(self, txt_file: str, save_conf: bool = False) -> str:
        lines = []
        if self.boxes is not None:
            h, w = self.orig_shape
            for row in self.boxes.data:
                x1, y1, x2, y2 = row[:4]
                cf, c = row[-2], row[-1]
                xc, yc = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
                bw, bh = (x2 - x1) / w, (y2 - y1) / h
                line = f"{int(c)} {xc:.6f} {yc:.6f} {bw:.6f} {bh:.6f}"
                if save_conf:
                    line += f" {cf:.6f}"
                lines.append(line)
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return txt_file

    def cpu(self):
        return self

    def numpy(self):
        return self

    # host-resident numpy containers: device moves are identity ops here
    # (reference BaseTensor.cuda/.to move torch tensors)
    def cuda(self):
        return self

    def to(self, *args, **kwargs):
        return self
