"""Seg / pose / OBB val-pipeline mAP agreement vs the torch reference.

Same recipe as test_val_agreement.py (detect): identical random-init weights
ported torch->jax, identical on-disk images whose GT is derived from the
reference model's own strongest predictions (so TPs exist at high IoU), then
both val pipelines run end-to-end with their own components and the resulting
mAPs must agree:

  segment: box mAP(B) + mask mAP(M)  (reference segment/val.py _process_batch)
  pose:    box mAP(B) + OKS mAP(P)   (reference pose/val.py kpt_iou matching)
  obb:     rotated mAP(B)            (reference obb/val.py batch_probiou)
"""

import types
from pathlib import Path

import numpy as np
import pytest

from test_ops import HAS_REF, REF, _ref_ultralytics

pytestmark = pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")

IMGSZ = 160
N_IMG = 4
CFG = Path(__file__).resolve().parents[1] / "lpc_yolo_tpu" / "cfg" / "models"
# conf threshold for BOTH pipelines: at 0.001 a random-init model floods the
# reference's CPU NMS with ~30k candidates and its 2-second time-limit bails
# WITHOUT suppressing (ops.py:298-300) — a degenerate comparison. 0.15 keeps
# candidate sets small enough that both NMS implementations fully run.
CONF = 0.15


def _ported_pair(ref_yaml: str, our_yaml: str, model_cls_name: str, seed_bias: bool = True):
    """torch reference task model + our jax twin on ported weights."""
    _ref_ultralytics()
    import torch
    from ultralytics.nn import tasks as t_tasks

    import jax
    import jax.numpy as jnp
    from lpc_yolo_tpu.nn import build_model
    from lpc_yolo_tpu.utils.torch_port import port_state_dict

    torch.manual_seed(0)
    tm = getattr(t_tasks, model_cls_name)(f"{REF}/ultralytics/cfg/models/{ref_yaml}", verbose=False)
    if seed_bias:
        g = torch.Generator().manual_seed(3)
        with torch.no_grad():
            for name, p in tm.named_parameters():
                if "cv3" in name and name.endswith(".bias") and p.ndim == 1:
                    p.copy_(torch.empty_like(p).uniform_(-4.0, -1.0, generator=g))
                if "cv2" in name and name.endswith(".bias") and p.ndim == 1 and p.numel() % 16 == 0:
                    # shape the DFL logits so random-init boxes come out
                    # small (~1-2 strides) instead of reg_max-sized: GT
                    # derived from these dets then fits inside the image
                    b = torch.full_like(p, -2.0)
                    b.view(-1, 16)[:, 1] = 3.0
                    p.copy_(b)
    tm.eval()

    m = build_model(CFG / our_yaml)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    v = port_state_dict(tm.state_dict(), v)
    return tm, m, v


def _write_dataset(root, names, label_lines_per_img, images, extra_yaml=None):
    import cv2
    import yaml

    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    for i, (img, lines) in enumerate(zip(images, label_lines_per_img)):
        cv2.imwrite(str(root / "images" / "val" / f"{i}.png"), img)
        (root / "labels" / "val" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    data = {"path": str(root), "val": "images/val", "nc": len(names),
            "names": {i: n for i, n in enumerate(names)}}
    if extra_yaml:
        data.update(extra_yaml)
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump(data))
    return yml


def _install_real_nms():
    """The torchvision stub (_AutoStub) returns a dummy for ops.nms; install a
    real greedy NMS with exact torchvision semantics so the reference
    non-rotated val path works."""
    import sys

    import torch

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        keep = []
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            x1 = torch.maximum(boxes[i, 0], boxes[:, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[:, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[:, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[:, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            iou = inter / (areas[i] + areas - inter).clamp(min=1e-9)
            suppressed |= iou > iou_threshold
            suppressed[i] = True
        return torch.tensor(keep, dtype=torch.int64)

    sys.modules["torchvision.ops"].nms = nms
    # the parent stub's __getattr__ shadows the submodule: link it explicitly
    sys.modules["torchvision"].ops = sys.modules["torchvision.ops"]


def _torch_forward(tm, img):
    import torch

    x = img[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
    with torch.no_grad():
        return tm(torch.tensor(np.ascontiguousarray(x)))


def _ap_mean(tp, conf, pred_cls, target_cls):
    from ultralytics.utils.metrics import ap_per_class

    res = ap_per_class(
        np.concatenate(tp), np.concatenate(conf), np.concatenate(pred_cls),
        np.concatenate(target_cls), names={},
    )
    return float(res[5].mean())


def _shim():
    import torch

    return types.SimpleNamespace(iouv=torch.linspace(0.5, 0.95, 10))


# ----------------------------------------------------------------- OBB
@pytest.fixture(scope="module")
def obb_setup(tmp_path_factory):
    _ref_ultralytics()
    import torch
    from ultralytics.utils import ops as t_ops

    tm, m, v = _ported_pair("v8/yolov8-obb.yaml", "v8/yolov8-obb.yaml", "OBBModel")
    root = tmp_path_factory.mktemp("obbagree")
    rng = np.random.RandomState(11)
    images, labels = [], []
    for i in range(N_IMG):
        img = (rng.rand(IMGSZ, IMGSZ, 3) * 255).astype(np.uint8)
        preds = _torch_forward(tm, img)
        dets = t_ops.non_max_suppression(
            preds, CONF, 0.7, nc=tm.yaml["nc"], multi_label=True, max_det=300, rotated=True
        )[0]
        # rows: [cx, cy, w, h, conf, cls, angle]
        lines = []
        for row in dets[:3].numpy():
            cx, cy, w, h, conf, cls_, ang = row
            # sanitize into the image so the polygon stays a true rectangle
            # (clipping corners would mangle it and the two polygon->xywhr
            # converters would disagree on the GT)
            w = float(np.clip(w, 8.0, 56.0))
            h = float(np.clip(h, 8.0, 56.0))
            m_ = np.hypot(w, h) / 2 + 2
            cx = float(np.clip(cx, m_, IMGSZ - m_))
            cy = float(np.clip(cy, m_, IMGSZ - m_))
            c, s = np.cos(ang), np.sin(ang)
            v1 = np.array([w / 2 * c, w / 2 * s])
            v2 = np.array([-h / 2 * s, h / 2 * c])
            ctr = np.array([cx, cy])
            pts = np.stack([ctr + v1 + v2, ctr + v1 - v2, ctr - v1 - v2, ctr - v1 + v2]) / IMGSZ
            lines.append(f"{int(cls_)} " + " ".join(f"{p:.6f}" for p in pts.reshape(-1)))
        if not lines:
            lines = ["0 0.2 0.2 0.4 0.2 0.4 0.4 0.2 0.4"]
        images.append(img)
        labels.append(lines)
    yml = _write_dataset(root, [str(i) for i in range(tm.yaml["nc"])], labels, images)
    return tm, m, v, yml, root


def _reference_obb_map(tm, root) -> float:
    import cv2
    import torch
    from ultralytics.engine.validator import BaseValidator
    from ultralytics.utils import ops as t_ops
    from ultralytics.utils.metrics import batch_probiou

    shim = _shim()
    tp, conf, pred_cls, target_cls = [], [], [], []
    for f in sorted((root / "images" / "val").iterdir()):
        img = cv2.imread(str(f))
        preds = _torch_forward(tm, img)
        det = t_ops.non_max_suppression(
            preds, CONF, 0.7, nc=tm.yaml["nc"], multi_label=True, max_det=300, rotated=True
        )[0]
        lab = np.loadtxt(str(root / "labels" / "val" / f"{f.stem}.txt"), ndmin=2)
        gt_cls = torch.tensor(lab[:, 0])
        # polygon -> xywhr via the reference's own converter
        polys = torch.tensor(lab[:, 1:].reshape(-1, 4, 2), dtype=torch.float32) * IMGSZ
        gt_rb = t_ops.xyxyxyxy2xywhr(polys)
        iou = batch_probiou(gt_rb, torch.cat([det[:, :4], det[:, -1:]], dim=-1))
        correct = BaseValidator.match_predictions(shim, det[:, 5], gt_cls, iou)
        tp.append(correct.numpy())
        conf.append(det[:, 4].numpy())
        pred_cls.append(det[:, 5].numpy())
        target_cls.append(gt_cls.numpy())
    return _ap_mean(tp, conf, pred_cls, target_cls)


@pytest.mark.slow
def test_obb_val_map_agreement(obb_setup):
    # ~9 min on the 1-vCPU runner (torch reference OBB val + ours); the seg
    # and pose agreement tests below stay in the default suite as the fast
    # representatives of the same harness.
    tm, m, v, yml, root = obb_setup
    from lpc_yolo_tpu import YOLO

    y = YOLO("yolov8-obb.yaml", nc=tm.yaml["nc"])
    y.model, y.variables, y.task = m, v, "obb"
    res = y.val(data=str(yml), imgsz=IMGSZ, batch=N_IMG, conf=CONF)
    ours = float(res["metrics/mAP50-95(B)"])
    ref = _reference_obb_map(tm, root)
    assert ref > 0.0 and ours > 0.0, (ours, ref)
    assert abs(ours - ref) < 5e-3, (ours, ref)


# ----------------------------------------------------------------- Pose
@pytest.fixture(scope="module")
def pose_setup(tmp_path_factory):
    _ref_ultralytics()
    _install_real_nms()
    import torch
    from ultralytics.utils import ops as t_ops

    tm, m, v = _ported_pair("v8/yolov8-pose.yaml", "v8/yolov8-pose.yaml", "PoseModel")
    root = tmp_path_factory.mktemp("poseagree")
    rng = np.random.RandomState(13)
    images, labels = [], []
    for i in range(N_IMG):
        img = (rng.rand(IMGSZ, IMGSZ, 3) * 255).astype(np.uint8)
        preds = _torch_forward(tm, img)
        det = t_ops.non_max_suppression(
            preds[0] if isinstance(preds, tuple) else preds, CONF, 0.7,
            nc=1, multi_label=True, max_det=300,
        )[0]
        lines = []
        rows = det.numpy()
        # GT only from detections fully inside the frame: clipping an
        # edge-crossing box would leave it <0.5 IoU from its own detection
        inside = (rows[:, 0] >= 1) & (rows[:, 1] >= 1) & (rows[:, 2] <= IMGSZ - 1) & (rows[:, 3] <= IMGSZ - 1)
        rows = rows[inside]
        for row in rows[:2]:
            x1, y1, x2, y2 = row[:4]
            if x2 - x1 < 12:
                x2 = min(x1 + 12, IMGSZ - 2)
            if y2 - y1 < 12:
                y2 = min(y1 + 12, IMGSZ - 2)
            kpt = row[6:].reshape(17, 3)
            kx = np.clip(kpt[:, 0], 1, IMGSZ - 1) / IMGSZ
            ky = np.clip(kpt[:, 1], 1, IMGSZ - 1) / IMGSZ
            vis = np.full(17, 2.0)
            kstr = " ".join(f"{a:.6f} {b:.6f} {int(c)}" for a, b, c in zip(kx, ky, vis))
            xc, yc = (x1 + x2) / 2 / IMGSZ, (y1 + y2) / 2 / IMGSZ
            w, h = (x2 - x1) / IMGSZ, (y2 - y1) / IMGSZ
            lines.append(f"0 {xc:.6f} {yc:.6f} {w:.6f} {h:.6f} {kstr}")
        if not lines:
            kstr = " ".join("0.5 0.5 2" for _ in range(17))
            lines = [f"0 0.5 0.5 0.4 0.4 {kstr}"]
        images.append(img)
        labels.append(lines)
    yml = _write_dataset(root, ["person"], labels, images, extra_yaml={"kpt_shape": [17, 3]})
    return tm, m, v, yml, root


def _reference_pose_maps(tm, root):
    import cv2
    import torch
    from ultralytics.engine.validator import BaseValidator
    from ultralytics.utils import ops as t_ops
    from ultralytics.utils.metrics import OKS_SIGMA, box_iou, kpt_iou

    shim = _shim()
    agg = {k: [] for k in ("tp", "tp_p", "conf", "pred_cls", "target_cls")}
    for f in sorted((root / "images" / "val").iterdir()):
        img = cv2.imread(str(f))
        preds = _torch_forward(tm, img)
        det = t_ops.non_max_suppression(
            preds[0] if isinstance(preds, tuple) else preds, CONF, 0.7,
            nc=1, multi_label=True, max_det=300,
        )[0]
        lab = np.loadtxt(str(root / "labels" / "val" / f"{f.stem}.txt"), ndmin=2)
        gt_cls = torch.tensor(lab[:, 0])
        gt_xyxy = t_ops.xywh2xyxy(torch.tensor(lab[:, 1:5], dtype=torch.float32) * IMGSZ)
        gt_kpts = torch.tensor(lab[:, 5:].reshape(len(lab), 17, 3), dtype=torch.float32)
        gt_kpts = gt_kpts.clone()
        gt_kpts[..., 0] *= IMGSZ
        gt_kpts[..., 1] *= IMGSZ
        pred_kpts = det[:, 6:].reshape(len(det), 17, 3)

        iou_b = box_iou(gt_xyxy, det[:, :4])
        agg["tp"].append(BaseValidator.match_predictions(shim, det[:, 5], gt_cls, iou_b).numpy())
        area = t_ops.xyxy2xywh(gt_xyxy)[:, 2:].prod(1) * 0.53
        iou_p = kpt_iou(gt_kpts, pred_kpts, sigma=OKS_SIGMA, area=area)
        agg["tp_p"].append(BaseValidator.match_predictions(shim, det[:, 5], gt_cls, iou_p).numpy())
        agg["conf"].append(det[:, 4].numpy())
        agg["pred_cls"].append(det[:, 5].numpy())
        agg["target_cls"].append(gt_cls.numpy())
    map_b = _ap_mean(agg["tp"], agg["conf"], agg["pred_cls"], agg["target_cls"])
    map_p = _ap_mean(agg["tp_p"], agg["conf"], agg["pred_cls"], agg["target_cls"])
    return map_b, map_p


def test_pose_val_map_agreement(pose_setup):
    tm, m, v, yml, root = pose_setup
    from lpc_yolo_tpu import YOLO

    y = YOLO("yolov8-pose.yaml")
    y.model, y.variables, y.task = m, v, "pose"
    res = y.val(data=str(yml), imgsz=IMGSZ, batch=N_IMG, conf=CONF)
    ours_b = float(res["metrics/mAP50-95(B)"])
    ours_p = float(res["metrics/mAP50-95(P)"])
    ref_b, ref_p = _reference_pose_maps(tm, root)
    assert ref_b > 0.0 and ours_b > 0.0, (ours_b, ref_b)
    assert abs(ours_b - ref_b) < 5e-3, (ours_b, ref_b)
    assert ref_p > 0.0 and ours_p > 0.0, (ours_p, ref_p)
    assert abs(ours_p - ref_p) < 5e-3, (ours_p, ref_p)


# ----------------------------------------------------------------- Segment
@pytest.fixture(scope="module")
def seg_setup(tmp_path_factory):
    _ref_ultralytics()
    _install_real_nms()
    import cv2
    import torch
    from ultralytics.utils import ops as t_ops

    tm, m, v = _ported_pair("v8/yolov8-seg.yaml", "v8/yolov8-seg.yaml", "SegmentationModel")
    root = tmp_path_factory.mktemp("segagree")
    rng = np.random.RandomState(17)
    images, labels = [], []
    for i in range(N_IMG):
        img = (rng.rand(IMGSZ, IMGSZ, 3) * 255).astype(np.uint8)
        preds = _torch_forward(tm, img)
        proto = preds[1][-1] if len(preds[1]) == 3 else preds[1]
        det = t_ops.non_max_suppression(
            preds[0], CONF, 0.7, nc=80, multi_label=True, max_det=300
        )[0]
        lines = []
        if len(det):
            masks = t_ops.process_mask(
                proto[0], det[:, 6:], det[:, :4], (IMGSZ, IMGSZ), upsample=True
            ).numpy() > 0.5
            rows = det.numpy()
            # GT only from detections that are (a) fully inside the frame
            # (an edge-crossing box sits <0.5 IoU from its clipped polygon's
            # bbox — the same failure the pose fixture hits) and (b) whose
            # mask fills the box (contour-bbox IoU >= 0.55), so the GT box
            # derived from the polygon can actually match its own detection
            inside = (
                (rows[:, 0] >= 1) & (rows[:, 1] >= 1)
                & (rows[:, 2] <= IMGSZ - 1) & (rows[:, 3] <= IMGSZ - 1)
            )
            for j in np.where(inside)[0]:
                if len(lines) >= 3:
                    break
                row, mk = rows[j], masks[j]
                cnts, _ = cv2.findContours(
                    mk.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
                )
                if not cnts:
                    continue
                cnt = max(cnts, key=cv2.contourArea)
                if cv2.contourArea(cnt) < 60 or len(cnt) < 3:
                    continue
                x, y, w, h = cv2.boundingRect(cnt)
                ix1 = max(x, row[0]); iy1 = max(y, row[1])
                ix2 = min(x + w, row[2]); iy2 = min(y + h, row[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                bbox_iou = inter / (
                    w * h + (row[2] - row[0]) * (row[3] - row[1]) - inter + 1e-9
                )
                if bbox_iou < 0.55:
                    continue
                poly = (cnt.reshape(-1, 2).astype(np.float32) / IMGSZ).clip(0.002, 0.998)
                lines.append(
                    f"{int(row[5])} " + " ".join(f"{p:.6f}" for p in poly.reshape(-1))
                )
        if not lines:
            lines = ["0 0.2 0.2 0.6 0.2 0.6 0.6 0.2 0.6"]
        images.append(img)
        labels.append(lines)
    yml = _write_dataset(root, [str(i) for i in range(80)], labels, images)
    return tm, m, v, yml, root


def _reference_seg_maps(tm, root):
    import cv2
    import torch
    import torch.nn.functional as F
    from ultralytics.engine.validator import BaseValidator
    from ultralytics.utils import ops as t_ops
    from ultralytics.utils.metrics import box_iou, mask_iou

    shim = _shim()
    agg = {k: [] for k in ("tp", "tp_m", "conf", "pred_cls", "target_cls")}
    for f in sorted((root / "images" / "val").iterdir()):
        img = cv2.imread(str(f))
        preds = _torch_forward(tm, img)
        proto = preds[1][-1] if len(preds[1]) == 3 else preds[1]
        det = t_ops.non_max_suppression(
            preds[0], CONF, 0.7, nc=80, multi_label=True, max_det=300
        )[0]
        pred_masks = t_ops.process_mask(
            proto[0], det[:, 6:], det[:, :4], (IMGSZ, IMGSZ), upsample=True
        ).gt_(0.5).float()
        # GT: rasterize label polygons at full val resolution
        lab_lines = (root / "labels" / "val" / f"{f.stem}.txt").read_text().strip().splitlines()
        gt_cls_l, gt_boxes_l, gt_masks_l = [], [], []
        for ln in lab_lines:
            vals = np.array(ln.split(), np.float32)
            cls_, poly = int(vals[0]), vals[1:].reshape(-1, 2) * IMGSZ
            mk = np.zeros((IMGSZ, IMGSZ), np.uint8)
            cv2.fillPoly(mk, [poly.astype(np.int32)], 1)
            gt_masks_l.append(mk)
            gt_cls_l.append(cls_)
            gt_boxes_l.append([poly[:, 0].min(), poly[:, 1].min(), poly[:, 0].max(), poly[:, 1].max()])
        gt_cls = torch.tensor(np.array(gt_cls_l, np.float32))
        gt_boxes = torch.tensor(np.array(gt_boxes_l, np.float32))
        gt_masks = torch.tensor(np.stack(gt_masks_l).astype(np.float32))

        iou_b = box_iou(gt_boxes, det[:, :4])
        agg["tp"].append(BaseValidator.match_predictions(shim, det[:, 5], gt_cls, iou_b).numpy())
        iou_m = mask_iou(gt_masks.view(len(gt_masks), -1), pred_masks.view(len(pred_masks), -1))
        agg["tp_m"].append(BaseValidator.match_predictions(shim, det[:, 5], gt_cls, iou_m).numpy())
        agg["conf"].append(det[:, 4].numpy())
        agg["pred_cls"].append(det[:, 5].numpy())
        agg["target_cls"].append(gt_cls.numpy())
    map_b = _ap_mean(agg["tp"], agg["conf"], agg["pred_cls"], agg["target_cls"])
    map_m = _ap_mean(agg["tp_m"], agg["conf"], agg["pred_cls"], agg["target_cls"])
    return map_b, map_m


def test_segment_val_map_agreement(seg_setup):
    tm, m, v, yml, root = seg_setup
    from lpc_yolo_tpu import YOLO

    y = YOLO("yolov8-seg.yaml")
    y.model, y.variables, y.task = m, v, "segment"
    res = y.val(data=str(yml), imgsz=IMGSZ, batch=N_IMG, conf=CONF)
    ours_b = float(res["metrics/mAP50-95(B)"])
    ours_m = float(res["metrics/mAP50-95(M)"])
    ref_b, ref_m = _reference_seg_maps(tm, root)
    assert ref_b > 0.0 and ours_b > 0.0, (ours_b, ref_b)
    assert abs(ours_b - ref_b) < 5e-3, (ours_b, ref_b)
    assert ref_m > 0.0 and ours_m > 0.0, (ours_m, ref_m)
    assert abs(ours_m - ref_m) < 5e-3, (ours_m, ref_m)
