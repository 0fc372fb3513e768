"""End-to-end val-pipeline mAP agreement vs the torch reference.

Composes the already-tested parity links into one run: identical random-init
weights (ported torch->jax), identical on-disk images, then

  reference: torch forward -> ops.v10postprocess -> BaseValidator
             .match_predictions -> metrics.ap_per_class        (val.py path)
  ours:      YOLO facade -> Validator (deploy WPACK width-packed predict, decode,
             matching, DetMetrics)

and asserts the resulting mAP50-95 agree. This is the metric-level proof the
round-1 verdict asked for ("end-to-end val-pipeline agreement run").
"""

import types
from pathlib import Path

import numpy as np
import pytest

from test_ops import HAS_REF, REF, _ref_ultralytics

pytestmark = pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")

IMGSZ = 160
N_IMG = 6


@pytest.fixture(scope="module")
def models():
    return _models()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory, models):
    """Tiny on-disk YOLO dataset: PNG noise images whose GT labels are the
    reference model's own strongest (mutually non-overlapping) detections —
    so both val pipelines have real TPs at high IoU thresholds and the mAP
    comparison is non-degenerate."""
    import cv2
    import torch
    import yaml

    from ultralytics.utils import ops as t_ops

    tm = models[0]
    root = tmp_path_factory.mktemp("valagree")
    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    rng = np.random.RandomState(7)
    for i in range(N_IMG):
        img = (rng.rand(IMGSZ, IMGSZ, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / "val" / f"{i}.png"), img)
        x = img[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
        with torch.no_grad():
            out = tm(torch.tensor(np.ascontiguousarray(x)))
        pred = out["one2one"][0].transpose(-1, -2)
        boxes, scores, labels = t_ops.v10postprocess(pred, 300, 80)
        xyxy = t_ops.xywh2xyxy(boxes)[0].numpy()
        lab = labels[0].numpy()
        # greedy IoU-diverse top dets -> GT
        from lpc_yolo_tpu.utils.metrics import box_iou_np

        keep = []
        for j in range(len(xyxy)):
            b = np.clip(xyxy[j], 1.0, IMGSZ - 1)
            if (b[2] - b[0]) < 8 or (b[3] - b[1]) < 8:
                continue
            if keep and box_iou_np(np.stack([k[0] for k in keep]), b[None]).max() > 0.4:
                continue
            keep.append((b, int(lab[j])))
            if len(keep) == 3:
                break
        if not keep:  # degenerate random-init boxes: anchor on the best det
            b = np.clip(xyxy[0], 1.0, IMGSZ - 1)
            b[2] = max(b[2], b[0] + 9)
            b[3] = max(b[3], b[1] + 9)
            keep = [(b, int(lab[0]))]
        lines = []
        for b, c in keep:
            xc, yc = (b[0] + b[2]) / 2 / IMGSZ, (b[1] + b[3]) / 2 / IMGSZ
            w, h = (b[2] - b[0]) / IMGSZ, (b[3] - b[1]) / IMGSZ
            lines.append(f"{c} {xc:.6f} {yc:.6f} {w:.6f} {h:.6f}")
        (root / "labels" / "val" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    data = {"path": str(root), "val": "images/val", "nc": 80,
            "names": {i: str(i) for i in range(80)}}
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump(data))
    return yml, root


def _models():
    """Reference torch v10n + our jax twin on ported weights, with the cls
    biases randomized so an untrained model still produces a meaningful
    score distribution (default bias init puts every score ~5e-5)."""
    _ref_ultralytics()
    import torch
    from ultralytics.nn.tasks import YOLOv10DetectionModel

    import jax
    import jax.numpy as jnp
    from lpc_yolo_tpu.nn import build_model
    from lpc_yolo_tpu.utils.torch_port import port_state_dict

    torch.manual_seed(0)  # reference model init draws from torch's GLOBAL rng
    tm = YOLOv10DetectionModel(f"{REF}/ultralytics/cfg/models/v10/yolov10n.yaml", verbose=False)
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "one2one_cv3" in name and name.endswith(".bias"):
                p.copy_(torch.empty_like(p).uniform_(-4.0, -1.0, generator=g))
    tm.eval()

    m = build_model(Path("lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml"))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    v = port_state_dict(tm.state_dict(), v)
    return tm, m, v


def _reference_map(tm, root) -> float:
    """The reference val pipeline, run with its own components."""
    import cv2
    import torch
    from ultralytics.engine.validator import BaseValidator
    from ultralytics.utils import ops as t_ops
    from ultralytics.utils.metrics import ap_per_class, box_iou

    iouv = torch.linspace(0.5, 0.95, 10)
    shim = types.SimpleNamespace(iouv=iouv)
    tp, conf, pred_cls, target_cls = [], [], [], []
    for f in sorted((root / "images" / "val").iterdir()):
        img = cv2.imread(str(f))
        x = img[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
        with torch.no_grad():
            out = tm(torch.tensor(np.ascontiguousarray(x)))
        pred = out["one2one"][0].transpose(-1, -2)  # (1, A, 84) decoded
        boxes, scores, labels = t_ops.v10postprocess(pred, 300, 80)
        det = torch.cat(
            [t_ops.xywh2xyxy(boxes), scores.unsqueeze(-1), labels.unsqueeze(-1).float()], dim=-1
        )[0]
        det = det[det[:, 4] > 0.001]
        lab = np.loadtxt(str(root / "labels" / "val" / f"{f.stem}.txt"), ndmin=2)
        gt_cls = torch.tensor(lab[:, 0])
        gt_xywh = torch.tensor(lab[:, 1:], dtype=torch.float32) * IMGSZ
        gt_xyxy = t_ops.xywh2xyxy(gt_xywh)
        iou = box_iou(gt_xyxy, det[:, :4])
        correct = BaseValidator.match_predictions(shim, det[:, 5], gt_cls, iou)
        tp.append(correct.numpy())
        conf.append(det[:, 4].numpy())
        pred_cls.append(det[:, 5].numpy())
        target_cls.append(gt_cls.numpy())
    res = ap_per_class(
        np.concatenate(tp),
        np.concatenate(conf),
        np.concatenate(pred_cls),
        np.concatenate(target_cls),
        names={},
    )
    ap = res[5]  # (nc, 10) AP per class per IoU
    return float(ap.mean())


def test_val_pipeline_map_agreement(dataset, models):
    yml, root = dataset
    tm, m, v = models

    from lpc_yolo_tpu import YOLO

    y = YOLO("yolov10n.yaml")
    y.model, y.variables, y.task = m, v, "v10"
    res = y.val(data=str(yml), imgsz=IMGSZ, batch=N_IMG, conf=0.001)
    ours = float(res["metrics/mAP50-95(B)"])

    ref = _reference_map(tm, root)
    assert ref > 0.0, (ours, ref)  # non-degenerate: real TPs exist
    assert ours > 0.0, (ours, ref)
    assert abs(ours - ref) < 5e-3, (ours, ref)
