"""Streaming predictor: sources -> letterbox -> jitted forward+decode -> Results.

Behavioral spec: reference engine/predictor.py:63-397 (BasePredictor:
pre_transform/letterbox, /255 normalize, stream_inference generator, per-stage
Profile timers, Results assembly) + models/yolov10/predict.py:8-38 (v10
postprocess: top-k rows filtered by conf, boxes rescaled to original frame).

TPU-first differences:
  * one jit-compiled program covers normalize -> backbone -> head -> decode ->
    top-k; the host only decodes images and letterboxes (cv2).
  * static batch shapes: the predictor pads the last partial batch to the
    compiled batch size instead of re-tracing (XLA compile cache friendly).
  * images cross PCIe as uint8 NHWC; fp32 conversion happens on-device.
"""

from __future__ import annotations

import glob as _glob
import os
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.boxes import scale_boxes
from ..ops.letterbox import device_preprocess_wpack, letterbox_image
from ..ops.masks import process_mask
from ..ops.postprocess import non_max_suppression
from .results import Results

IMG_SUFFIXES = {".bmp", ".dng", ".jpeg", ".jpg", ".mpo", ".png", ".tif", ".tiff", ".webp", ".pfm"}
VID_SUFFIXES = {".asf", ".avi", ".gif", ".m4v", ".mkv", ".mov", ".mp4", ".mpeg", ".mpg", ".ts", ".wmv", ".webm"}


def load_source(source) -> List[Tuple[str, np.ndarray]]:
    """Resolve a source into [(path, BGR ndarray)] frames.

    Handles: ndarray, PIL image, file path, directory, glob, list of any of
    these, and video files (all frames). Mirrors data/loaders.py behaviors for
    the non-stream sources.
    """
    import cv2

    out: List[Tuple[str, np.ndarray]] = []
    if isinstance(source, (list, tuple)):
        for s in source:
            out.extend(load_source(s))
        return out
    if isinstance(source, np.ndarray):
        return [("image0.jpg", source)]
    if source.__class__.__name__ == "Image":  # PIL without hard dep
        arr = np.asarray(source.convert("RGB"))[..., ::-1]  # to BGR
        return [("image0.jpg", np.ascontiguousarray(arr))]
    p = str(source)
    if any(c in p for c in "*?[") and not os.path.exists(p):
        files = sorted(_glob.glob(p, recursive=True))
    elif os.path.isdir(p):
        files = sorted(
            str(f) for f in Path(p).iterdir() if f.suffix.lower() in IMG_SUFFIXES | VID_SUFFIXES
        )
    else:
        files = [p]
    for f in files:
        suffix = Path(f).suffix.lower()
        if suffix in VID_SUFFIXES:
            cap = cv2.VideoCapture(f)
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                out.append((f"{f}#frame{i}", frame))
                i += 1
            cap.release()
        else:
            im = cv2.imread(f)
            if im is None:
                raise FileNotFoundError(f"cannot read image {f}")
            out.append((f, im))
    return out


class Predictor:
    """Compiled-batch predictor for a built DetectionModel + variables."""

    def __init__(
        self,
        model,
        variables,
        task: str = "v10",
        imgsz: int = 640,
        batch: int = 1,
        conf: float = 0.25,
        iou: float = 0.45,
        max_det: int = 300,
        names: Optional[Dict[int, str]] = None,
        text: Optional[jnp.ndarray] = None,
        save: bool = False,
        save_txt: bool = False,
        save_conf: bool = False,
        save_crop: bool = False,
        save_dir: Optional[str] = None,
        project: Optional[str] = None,
        name: Optional[str] = None,
        exist_ok: bool = False,
    ):
        # serve the deploy graph: inference-only block rewrites (e.g. the
        # slice/concat-free C2f, nn/modules.py) over the SAME variable tree
        self.model = model.clone(deploy=True) if hasattr(model, "deploy") else model
        self.variables = variables
        self.task = task
        self.imgsz = imgsz
        self.batch = batch
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.names = names or {i: str(i) for i in range(model.nc)}
        self.text = text  # (1, M, 512) open-vocab class embeddings (world)
        # result persistence (reference predictor.py save_preds/write_results:
        # annotated media into an incremented runs/{task}/predict{N} dir, txt
        # labels under labels/, crops under crops/)
        self.save, self.save_txt = save, save_txt
        self.save_conf, self.save_crop = save_conf, save_crop
        self.save_dir: Optional[Path] = None
        if save or save_txt or save_crop:
            from ..utils.infra import get_save_dir

            dir_task = {"v10": "detect", "v8": "detect", "world": "detect",
                        "rtdetr": "detect"}.get(task, task)
            self.save_dir = (
                Path(save_dir) if save_dir
                else get_save_dir(dir_task, "predict", project, name, exist_ok)
            )
        self._writers: Dict[str, object] = {}
        self._predict_jit = jax.jit(self._predict_fn)

    def _predict_fn(self, variables, imgs_u8):
        # width-packed uint8 feed (byte-identical to NHWC): the low-channel
        # stem runs on dense 128-lane tiles (compiler._wpack_prefix)
        if getattr(self.model, "specs", None) and self.model.specs[0].module == "Conv":
            # /255 + BGR->RGB fold into the first conv kernel (fuse.py):
            # the image-side chain is a bare uint8->bf16 convert, removing
            # the normalize fusion's ~1 ms layout copy (profiled)
            from ..nn.fuse import fold_preprocess

            variables = fold_preprocess(variables, bgr=True)
            x = imgs_u8.astype(getattr(self.model, "dtype", jnp.float32))
        else:
            x = device_preprocess_wpack(imgs_u8, bgr=True)  # BGR->RGB + /255 on device
        if self.task == "world":
            txt = jnp.broadcast_to(self.text, (x.shape[0],) + self.text.shape[1:])
            out = self.model.apply(
                variables, x, training=False, predict_only=True, text=txt, input_layout="WPACK"
            )
            return non_max_suppression(out["pred"], self.conf, self.iou, self.max_det)
        out = self.model.apply(variables, x, training=False, predict_only=True, input_layout="WPACK")
        if self.task == "v10":
            return out["det"]  # fused top-k decode inside the model graph
        if self.task == "classify":
            return out["probs"]
        pred = out["pred"]
        if self.task == "rtdetr":
            # DETR: no NMS; normalized cxcywh -> letterbox pixels, best class
            from ..ops.boxes import xywh2xyxy

            boxes = xywh2xyxy(pred[..., :4]) * self.imgsz
            scores = pred[..., 4:]
            best = jnp.max(scores, axis=-1)
            labels = jnp.argmax(scores, axis=-1).astype(boxes.dtype)
            return jnp.concatenate([boxes, best[..., None], labels[..., None]], axis=-1)
        if self.task == "pose":
            det, aidx = non_max_suppression(
                pred, self.conf, self.iou, self.max_det, return_anchor_idx=True
            )
            kpt = jnp.take_along_axis(out["kpt"], aidx[..., None], axis=1)  # (B, max_det, nk)
            return det, kpt
        if self.task == "obb":
            # rotated probIoU fast-NMS on the true rotated boxes (reference
            # ops.nms_rotated via non_max_suppression(rotated=True))
            from ..ops.postprocess import nms_rotated

            rb = jnp.concatenate([pred[..., :4], pred[..., -1:]], axis=-1)
            return nms_rotated(
                rb, pred[..., 4 : 4 + self.model.nc], self.conf, self.iou, self.max_det
            )  # (B, max_det, 7) [cx, cy, w, h, angle, conf, cls]
        if self.task == "segment":
            det, aidx = non_max_suppression(
                pred, self.conf, self.iou, self.max_det, return_anchor_idx=True
            )
            mc = jnp.take_along_axis(out["mc"], aidx[..., None], axis=1)  # (B, max_det, nm)
            hw = (self.imgsz, self.imgsz)
            masks = jax.vmap(lambda p, c, b: process_mask(p, c, b, hw, upsample=True))(
                out["proto"], mc, det[..., :4]
            )  # (B, max_det, H, W) sigmoid masks
            return det, masks
        return non_max_suppression(pred, self.conf, self.iou, self.max_det)

    def __call__(self, source, stream: bool = False):
        gen = self.stream_inference(source)
        return gen if stream else list(gen)

    def stream_inference(self, source) -> Iterator[Results]:
        if self.save_dir is None:
            yield from self._stream(source)
            return
        try:
            for r in self._stream(source):
                self._persist(r)
                yield r
        finally:
            for w in self._writers.values():
                w.release()
            self._writers.clear()

    def _persist(self, r: Results) -> None:
        """Write one result per the save flags (reference write_results)."""
        import cv2

        self.save_dir.mkdir(parents=True, exist_ok=True)
        path = str(r.path)
        vid, _, frame = path.partition("#frame")
        stem = Path(vid).stem or "image0"
        if self.save:
            im = r.plot()
            if frame:  # video frame: append to a per-video writer
                w = self._writers.get(vid)
                if w is None:
                    cap = cv2.VideoCapture(vid)
                    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                    cap.release()
                    w = cv2.VideoWriter(
                        str(self.save_dir / f"{stem}.avi"),
                        cv2.VideoWriter_fourcc(*"MJPG"), max(fps, 1.0),
                        (im.shape[1], im.shape[0]),
                    )
                    self._writers[vid] = w
                w.write(im)
            else:
                cv2.imwrite(str(self.save_dir / (Path(path).name or "image0.jpg")), im)
        if self.save_txt:
            txt_dir = self.save_dir / "labels"
            txt_dir.mkdir(parents=True, exist_ok=True)
            txt = f"{stem}_{frame}.txt" if frame else f"{stem}.txt"
            r.save_txt(str(txt_dir / txt), save_conf=self.save_conf)
        if self.save_crop:
            r.save_crop(str(self.save_dir / "crops"), file_name=f"{stem}.jpg")

    def _stream(self, source) -> Iterator[Results]:
        frames = load_source(source)
        B = self.batch
        for i in range(0, len(frames), B):
            chunk = frames[i : i + B]
            t0 = time.perf_counter()
            batch_u8 = np.full((B, self.imgsz, self.imgsz // 8, 24), 114, np.uint8)
            metas = []
            for j, (path, im0) in enumerate(chunk):
                lb, gain, pad = letterbox_image(im0, (self.imgsz, self.imgsz))
                # width-packed feed: same bytes as HWC, zero-copy reshape
                batch_u8[j] = lb.reshape(self.imgsz, self.imgsz // 8, 24)
                metas.append((path, im0))
            t1 = time.perf_counter()
            out = self._predict_jit(self.variables, jnp.asarray(batch_u8))
            masks_all, extra_kind, extra_all, probs_all = None, None, None, None
            if self.task == "classify":
                probs_all = np.asarray(jax.block_until_ready(out))
                det = None
            elif isinstance(out, tuple):
                det, payload = out
                if self.task == "segment":
                    masks_all = np.asarray(jax.block_until_ready(payload))
                else:  # pose: keypoints; obb: angles
                    extra_kind = "kpt" if self.task == "pose" else "angle"
                    extra_all = np.asarray(jax.block_until_ready(payload))
                det = np.asarray(det)
            else:
                det = np.asarray(jax.block_until_ready(out))  # (B, max_det, 6)
            t2 = time.perf_counter()
            for j, (path, im0) in enumerate(metas):
                if self.task == "classify":
                    n = max(len(chunk), 1)
                    yield Results(
                        im0, path, self.names, probs=probs_all[j],
                        speed={"preprocess": (t1 - t0) * 1e3 / n,
                               "inference": (t2 - t1) * 1e3 / n,
                               "postprocess": 0.0},
                    )
                    continue
                rows = det[j]
                if self.task == "obb":
                    # (max_det, 7) [cx, cy, w, h, angle, conf, cls]: undo the
                    # letterbox on the rotated params (angle is scale-invariant)
                    keep = rows[:, 5] > self.conf
                    rows = rows[keep]
                    gain = min(self.imgsz / im0.shape[0], self.imgsz / im0.shape[1])
                    pw = (self.imgsz - im0.shape[1] * gain) / 2
                    ph = (self.imgsz - im0.shape[0] * gain) / 2
                    rb = rows[:, :5].copy()
                    rb[:, 0] = (rb[:, 0] - pw) / gain
                    rb[:, 1] = (rb[:, 1] - ph) / gain
                    rb[:, 2:4] /= gain
                    packed7 = np.concatenate([rb, rows[:, 5:7]], axis=-1)
                    c, s = np.cos(rb[:, 4]), np.sin(rb[:, 4])
                    dx = np.abs(rb[:, 2] / 2 * c) + np.abs(rb[:, 3] / 2 * s)
                    dy = np.abs(rb[:, 2] / 2 * s) + np.abs(rb[:, 3] / 2 * c)
                    hull = np.stack(
                        [rb[:, 0] - dx, rb[:, 1] - dy, rb[:, 0] + dx, rb[:, 1] + dy], axis=-1
                    )
                    n = max(len(chunk), 1)
                    yield Results(
                        im0, path, self.names,
                        boxes=np.concatenate([hull, rows[:, 5:7]], axis=-1),
                        obb=packed7,
                        speed={"preprocess": (t1 - t0) * 1e3 / n,
                               "inference": (t2 - t1) * 1e3 / n,
                               "postprocess": (time.perf_counter() - t2) * 1e3 / n},
                    )
                    continue
                keep = rows[:, 4] > self.conf
                rows = rows[keep]
                boxes = np.asarray(
                    scale_boxes((self.imgsz, self.imgsz), jnp.asarray(rows[:, :4]), im0.shape[:2])
                )
                packed = np.concatenate([boxes, rows[:, 4:6]], axis=-1)
                masks = None
                if masks_all is not None and keep.any():
                    import cv2

                    m = masks_all[j][keep]  # (n, imgsz, imgsz) in letterbox space
                    gain = min(self.imgsz / im0.shape[0], self.imgsz / im0.shape[1])
                    pw, ph = (self.imgsz - im0.shape[1] * gain) / 2, (self.imgsz - im0.shape[0] * gain) / 2
                    y1, y2 = int(round(ph)), int(round(self.imgsz - ph))
                    x1, x2 = int(round(pw)), int(round(self.imgsz - pw))
                    m = m[:, y1:y2, x1:x2]
                    masks = np.stack(
                        [cv2.resize(mi, (im0.shape[1], im0.shape[0])) > 0.5 for mi in m]
                    ) if len(m) else None
                keypoints = None
                if extra_kind == "kpt" and keep.any():
                    nk = extra_all.shape[-1]
                    kp = extra_all[j][keep].reshape(len(rows), nk // 3, 3).copy()
                    gain = min(self.imgsz / im0.shape[0], self.imgsz / im0.shape[1])
                    pw, ph = (self.imgsz - im0.shape[1] * gain) / 2, (self.imgsz - im0.shape[0] * gain) / 2
                    kp[..., 0] = (kp[..., 0] - pw) / gain
                    kp[..., 1] = (kp[..., 1] - ph) / gain
                    keypoints = kp
                n = max(len(chunk), 1)
                yield Results(
                    im0,
                    path,
                    self.names,
                    boxes=packed,
                    masks=masks,
                    keypoints=keypoints,
                    speed={
                        "preprocess": (t1 - t0) * 1e3 / n,
                        "inference": (t2 - t1) * 1e3 / n,
                        "postprocess": (time.perf_counter() - t2) * 1e3 / n,
                    },
                )
