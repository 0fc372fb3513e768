"""Validator: batched eval loop -> TP matching at 10 IoUs -> mAP.

Behavioral spec: reference engine/validator.py:106-260 (BaseValidator loop +
match_predictions) and models/yolo/detect/val.py:17-299 (DetectionValidator:
preprocess, v10/v8 postprocess, update_metrics, get_stats). COCO-JSON export
mirrors detect/val.py:259-297 (pred_to_json).

TPU notes: forward + decode run as one jitted program per static batch; the
IoU/threshold matching runs host-side numpy per image (small tensors), so
device work streams ahead of metric accumulation. GT/pred matching happens in
letterbox space — IoU is invariant under the uniform scale+shift, so mAP is
identical to matching in native space.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..data import DataLoader, ValTransforms, YOLODataset, check_det_dataset
from ..ops.letterbox import device_preprocess_wpack
from ..ops.postprocess import non_max_suppression
from ..utils.metrics import ConfusionMatrix, DetMetrics, box_iou_np, match_predictions


class Validator:
    def __init__(
        self,
        yolo=None,
        imgsz: int = 640,
        batch: int = 8,
        conf: float = 0.001,
        iou: float = 0.7,
        max_det: int = 300,
        max_gt: int = 128,
        workers: int = 4,
        save_json: bool = False,
        save_dir: Optional[str] = None,
        plots: bool = False,
        anno_json: Optional[str] = None,
        mesh=None,
    ):
        self.yolo = yolo
        self.imgsz = imgsz
        self.batch = batch
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.max_gt = max_gt
        self.workers = workers
        self.save_json = save_json
        self.anno_json = anno_json
        self.save_dir = Path(save_dir) if save_dir else None
        self.plots = plots
        # mesh-sharded batch inference: params replicated, batch axis sharded
        # over the 'data' mesh axis; XLA's SPMD partitioner splits the whole
        # forward+decode per chip (no collectives — detection outputs are
        # per-image). Pass a jax.sharding.Mesh, or leave None to auto-use all
        # chips on a multi-chip TPU host (the reference's DDP has no inference
        # analog; this is the TPU-native equivalent of its --device 0,1,2,3).
        self.mesh = mesh
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.speed = {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0}
        self._predict_cache: Dict[int, object] = {}

    def _make_predict(self, model, variables):
        """Build (or reuse) the jitted forward+decode for this model.

        Memoized on id(model): a fresh @jax.jit closure per __call__ would
        recompile the full forward+NMS every epoch during training.
        """
        key = id(model)  # key on the ORIGINAL model: the clone below gets a new id
        cached = self._predict_cache.get(key)
        if cached is not None:
            return cached
        task = self.yolo.task if self.yolo is not None else "v10"
        # serve the deploy graph, fed the width-packed WPACK layout (see
        # Predictor): host reshape to (B, H, W/P, P*C) is byte-free, and the
        # packed stem avoids the 3->128 lane-padding HBM waste
        if hasattr(model, "deploy"):
            model = model.clone(deploy=True)

        @jax.jit
        def predict(variables, imgs_u8):
            if getattr(model, "specs", None) and model.specs[0].module == "Conv":
                from ..nn.fuse import fold_preprocess

                variables = fold_preprocess(variables, bgr=True)
                x = imgs_u8.astype(getattr(model, "dtype", jnp.float32))
            else:
                x = device_preprocess_wpack(imgs_u8, bgr=True)
            out = model.apply(variables, x, training=False, predict_only=True, input_layout="WPACK")
            if task == "v10":
                return out["det"]
            if task == "rtdetr":
                from ..ops.boxes import xywh2xyxy

                pred = out["pred"]
                boxes = xywh2xyxy(pred[..., :4]) * self.imgsz
                best = jnp.max(pred[..., 4:], axis=-1)
                labels = jnp.argmax(pred[..., 4:], axis=-1).astype(boxes.dtype)
                return jnp.concatenate([boxes, best[..., None], labels[..., None]], axis=-1)
            if task == "obb":
                # rotated probIoU fast-NMS (reference ops.nms_rotated), then
                # rotated probIoU matching like the reference OBBValidator;
                # det keeps the [hull_xyxy, conf, cls] layout for the shared
                # confusion-matrix/plot consumers
                from ..ops.boxes import rbox_hull
                from ..ops.postprocess import nms_rotated

                pred = out["pred"]
                rb = jnp.concatenate([pred[..., :4], pred[..., -1:]], axis=-1)
                det7 = nms_rotated(
                    rb, pred[..., 4 : 4 + model.nc], self.conf, self.iou, self.max_det,
                    multi_label=True,
                )
                rbox = det7[..., :5]
                hull = rbox_hull(rbox)
                det = jnp.concatenate([hull, det7[..., 5:7]], axis=-1)
                return det, rbox
            if task == "segment":
                from ..ops.masks import process_mask

                det, aidx = non_max_suppression(
                    out["pred"], self.conf, self.iou, self.max_det,
                    multi_label=True, return_anchor_idx=True,
                )
                mc = jnp.take_along_axis(out["mc"], aidx[..., None], axis=1)
                hw = (self.imgsz, self.imgsz)
                masks = jax.vmap(lambda p, c, b: process_mask(p, c, b, hw, upsample=True))(
                    out["proto"], mc, det[..., :4]
                )
                return det, masks > 0.5
            if task == "pose":
                det, aidx = non_max_suppression(
                    out["pred"], self.conf, self.iou, self.max_det,
                    multi_label=True, return_anchor_idx=True,
                )
                kpt = jnp.take_along_axis(out["kpt"], aidx[..., None], axis=1)
                return det, kpt
            return non_max_suppression(
                out["pred"], self.conf, self.iou, self.max_det, multi_label=True
            )

        self._predict_cache[key] = predict
        return predict

    def _gt_masks(self, dataset, ds_idx: int, batch, j: int) -> np.ndarray:
        """Rasterize GT polygons at letterbox resolution (host-side).

        The val loader is sequential (shuffle=False), so ds_idx maps batch
        position back to the dataset row holding the raw segments.
        """
        import cv2

        lab = dataset.labels[ds_idx]
        segs = lab.get("segments", [])
        h0, w0 = batch["orig_shape"][j]
        gain = float(batch["gain"][j])
        pad = batch["pad"][j]
        out = np.zeros((len(segs), self.imgsz, self.imgsz), np.uint8)
        for i, poly in enumerate(segs):
            p = np.asarray(poly, np.float32) * np.array([w0 * gain, h0 * gain], np.float32)
            p += np.asarray(pad, np.float32)
            cv2.fillPoly(out[i], [p.astype(np.int32)], 1)
        return out

    def _gt_kpts(self, dataset, ds_idx: int, batch, j: int) -> np.ndarray:
        """GT keypoints in letterbox pixel space: (M, K, 3) with visibility."""
        lab = dataset.labels[ds_idx]
        k = np.asarray(lab.get("keypoints", np.zeros((0, 17, 3))), np.float32).copy()
        if len(k) == 0:
            return k
        h0, w0 = batch["orig_shape"][j]
        gain = float(batch["gain"][j])
        pad = batch["pad"][j]
        k[..., 0] = k[..., 0] * (w0 * gain) + float(pad[0])
        k[..., 1] = k[..., 1] * (h0 * gain) + float(pad[1])
        return k

    def _gt_rboxes(self, dataset, ds_idx: int, batch, j: int) -> np.ndarray:
        """GT rotated boxes in letterbox space: (M, 5) [cx, cy, w, h, angle]."""
        rb = np.asarray(dataset.labels[ds_idx].get("rboxes", np.zeros((0, 5))), np.float32).copy()
        if len(rb) == 0:
            return rb
        h0, w0 = batch["orig_shape"][j]
        gain = float(batch["gain"][j])
        pad = batch["pad"][j]
        rb[:, 0] = rb[:, 0] * (w0 * gain) + float(pad[0])
        rb[:, 1] = rb[:, 1] * (h0 * gain) + float(pad[1])
        rb[:, 2] *= w0 * gain
        rb[:, 3] *= h0 * gain
        return rb

    def __call__(self, data, model=None, variables=None) -> Dict[str, float]:
        model = model if model is not None else self.yolo.model
        variables = variables if variables is not None else self.yolo.variables
        info = check_det_dataset(data)
        task = self.yolo.task if self.yolo is not None else "v10"
        dataset = YOLODataset(
            info["val"], imgsz=self.imgsz, names=info["names"],
            kpt_shape=info.get("kpt_shape"), obb=(task == "obb"),
        )
        loader = DataLoader(
            dataset,
            ValTransforms(self.imgsz, self.max_gt),
            batch_size=self.batch,
            shuffle=False,
            workers=self.workers,
            infinite=False,
        )
        predict = self._make_predict(model, variables)

        mesh = self.mesh
        if mesh is None and jax.default_backend() == "tpu" and len(jax.devices()) > 1:
            from ..parallel.mesh import data_parallel_mesh

            mesh = data_parallel_mesh(batch_size=self.batch)
        batch_sharding = None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.batch % mesh.size:
                raise ValueError(f"val batch {self.batch} must divide the mesh size {mesh.size}")
            variables = jax.device_put(variables, NamedSharding(mesh, P()))  # replicate once
            batch_sharding = NamedSharding(mesh, P("data"))

        stats: Dict[str, List[np.ndarray]] = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        # task-specific second criterion: mask IoU (segment) / OKS (pose),
        # mirroring reference SegmentationValidator/PoseValidator
        stats_x: Dict[str, List[np.ndarray]] = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        cm = ConfusionMatrix(nc=info["nc"], conf=self.conf)
        json_preds: List[Dict] = []
        seen = 0
        for batch in loader:
            t0 = time.perf_counter()
            b_, h_, w_, _ = batch["img"].shape
            imgs = batch["img"].reshape(b_, h_, w_ // 8, 24)
            imgs = jax.device_put(imgs, batch_sharding) if batch_sharding is not None else jnp.asarray(imgs)
            t1 = time.perf_counter()
            out = predict(variables, imgs)
            extra = None
            if isinstance(out, tuple):
                det, extra = np.asarray(out[0]), np.asarray(out[1])
            else:
                det = np.asarray(out)  # (B, max_det, 6)
            t2 = time.perf_counter()
            n_real = det.shape[0] - batch["pad_count"]
            for j in range(n_real):
                ds_idx = seen + j
                rows = det[j]
                keep = rows[:, 4] > self.conf
                rows = rows[keep]
                gt_boxes = batch["bboxes"][j][batch["mask"][j]]
                gt_cls = batch["cls"][j][batch["mask"][j]]
                if len(rows) == 0:
                    if len(gt_cls):
                        two = extra is not None and task in ("segment", "pose")
                        for st in (stats, stats_x) if two else (stats,):
                            st["tp"].append(np.zeros((0, len(self.iouv)), bool))
                            st["conf"].append(np.zeros(0))
                            st["pred_cls"].append(np.zeros(0))
                            st["target_cls"].append(gt_cls)
                        cm.process_batch(None, gt_boxes, gt_cls)
                    continue
                if task == "obb" and extra is not None:
                    # rotated probIoU matching (reference obb/val.py _process_batch)
                    from ..utils.metrics import probiou_matrix_np

                    gt_rb = self._gt_rboxes(dataset, ds_idx, batch, j)
                    iou = probiou_matrix_np(gt_rb, extra[j][keep])
                else:
                    iou = box_iou_np(gt_boxes, rows[:, :4])
                tp = match_predictions(rows[:, 5], gt_cls, iou, self.iouv)
                stats["tp"].append(tp)
                stats["conf"].append(rows[:, 4])
                stats["pred_cls"].append(rows[:, 5])
                stats["target_cls"].append(gt_cls)
                cm.process_batch(rows, gt_boxes, gt_cls)
                if extra is not None and task == "segment":
                    from ..utils.metrics import mask_iou_np

                    gt_m = self._gt_masks(dataset, ds_idx, batch, j)
                    iou_m = mask_iou_np(gt_m, extra[j][keep])
                    stats_x["tp"].append(match_predictions(rows[:, 5], gt_cls, iou_m, self.iouv))
                    stats_x["conf"].append(rows[:, 4])
                    stats_x["pred_cls"].append(rows[:, 5])
                    stats_x["target_cls"].append(gt_cls)
                elif extra is not None and task == "pose":
                    from ..losses.pose import OKS_SIGMA
                    from ..utils.metrics import kpt_iou_np

                    gt_k = self._gt_kpts(dataset, ds_idx, batch, j)
                    nk = gt_k.shape[1] if len(gt_k) else 17
                    kd = (info.get("kpt_shape") or [17, 3])[1]
                    pk = extra[j][keep].reshape(len(rows), -1, kd)[:, :nk]
                    area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]) * 0.53
                    iou_k = kpt_iou_np(gt_k, pk, area, np.asarray(OKS_SIGMA[:nk]))
                    stats_x["tp"].append(match_predictions(rows[:, 5], gt_cls, iou_k, self.iouv))
                    stats_x["conf"].append(rows[:, 4])
                    stats_x["pred_cls"].append(rows[:, 5])
                    stats_x["target_cls"].append(gt_cls)
                if self.save_json:
                    json_preds.extend(self._to_coco_json(rows, batch, j))
            seen += n_real
            t3 = time.perf_counter()
            self.speed["preprocess"] += t1 - t0
            self.speed["inference"] += t2 - t1
            self.speed["postprocess"] += t3 - t2

        metrics = DetMetrics(names=info["names"])
        if stats["tp"]:
            metrics.process(
                np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool),
                np.concatenate(stats["conf"]),
                np.concatenate(stats["pred_cls"]),
                np.concatenate(stats["target_cls"]),
            )
        self.metrics = metrics
        self.confusion_matrix = cm
        results = metrics.results_dict()
        if stats_x["tp"]:
            # second-criterion mAP: masks (M) for segment, OKS pose (P) —
            # reference SegmentMetrics/PoseMetrics results_dict keys
            mx = DetMetrics(names=info["names"])
            mx.process(
                np.concatenate(stats_x["tp"]),
                np.concatenate(stats_x["conf"]),
                np.concatenate(stats_x["pred_cls"]),
                np.concatenate(stats_x["target_cls"]),
            )
            sfx = "M" if task == "segment" else "P"
            for k, v in mx.results_dict().items():
                if k != "fitness":
                    results[k.replace("(B)", f"({sfx})")] = v
            self.metrics_extra = mx
        if self.save_json and self.save_dir:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            (self.save_dir / "predictions.json").write_text(json.dumps(json_preds))
        if self.save_json:
            # COCOeval rescoring (detect/val.py:275-297 eval_json); the
            # annotation source is an instances_val JSON when present, else
            # the dataset labels themselves.
            from ..utils.cocoeval import eval_json, yolo_dataset_to_coco

            anno = self.anno_json
            if anno is None:
                cand = Path(info["path"]) / "annotations" / "instances_val2017.json"
                anno = str(cand) if cand.is_file() else yolo_dataset_to_coco(dataset)
            coco = eval_json(json_preds, anno)
            results["metrics/mAP50-95(COCO)"] = coco["mAP50-95"]
            results["metrics/mAP50(COCO)"] = coco["mAP50"]
            self.coco_stats = coco
        return results

    @staticmethod
    def _to_coco_json(rows: np.ndarray, batch: Dict, j: int) -> List[Dict]:
        """COCO-format rows (detect/val.py:259-274): xywh with top-left origin,
        boxes unscaled to the original image."""
        gain, pad = batch["gain"][j], batch["pad"][j]
        path = batch["path"][j]
        image_id = Path(path).stem
        image_id = int(image_id) if image_id.isnumeric() else image_id
        out = []
        for r in rows:
            b = (r[:4] - np.array([pad[0], pad[1], pad[0], pad[1]])) / gain
            out.append(
                {
                    "image_id": image_id,
                    "category_id": int(r[5]),
                    "bbox": [round(float(b[0]), 3), round(float(b[1]), 3), round(float(b[2] - b[0]), 3), round(float(b[3] - b[1]), 3)],
                    "score": round(float(r[4]), 5),
                }
            )
        return out
