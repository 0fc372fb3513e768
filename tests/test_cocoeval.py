"""COCOeval-protocol rescoring tests + reference mAP agreement harness.

1. Hand-computable COCOeval scenarios (perfect, FP-first, crowd, maxDets).
2. Exact agreement between our matching+metric stack and the torch
   reference's (BaseValidator.match_predictions + ap_per_class) on identical
   synthetic predictions — the metric half of the VERDICT's end-to-end mAP
   agreement requirement (forward parity is covered by test_models.py).
"""

import numpy as np
import pytest

from lpc_yolo_tpu.utils.cocoeval import COCOEvaluator, eval_json, yolo_dataset_to_coco
from lpc_yolo_tpu.utils.metrics import DetMetrics, box_iou_np, match_predictions

from test_ops import HAS_REF, _ref_ultralytics


def _anno(boxes_per_img, crowd=()):
    """boxes_per_img: {img_id: [(cat, x, y, w, h), ...]}"""
    images = [{"id": i, "width": 640, "height": 640} for i in boxes_per_img]
    anns, aid = [], 1
    for i, boxes in boxes_per_img.items():
        for (c, x, y, w, h) in boxes:
            anns.append(
                {"id": aid, "image_id": i, "category_id": c, "bbox": [x, y, w, h],
                 "area": w * h, "iscrowd": int(aid in crowd)}
            )
            aid += 1
    cats = sorted({a["category_id"] for a in anns})
    return {"images": images, "annotations": anns, "categories": [{"id": c, "name": str(c)} for c in cats]}


def test_cocoeval_perfect_predictions():
    anno = _anno({1: [(0, 100, 100, 50, 50), (0, 300, 300, 80, 40)]})
    preds = [
        {"image_id": 1, "category_id": 0, "bbox": [100, 100, 50, 50], "score": 0.9},
        {"image_id": 1, "category_id": 0, "bbox": [300, 300, 80, 40], "score": 0.8},
    ]
    r = eval_json(preds, anno)
    assert abs(r["mAP50-95"] - 1.0) < 1e-9
    assert abs(r["mAP50"] - 1.0) < 1e-9


def test_cocoeval_fp_before_tp_halves_ap():
    """1 gt; an FP at higher score than the TP -> 101-pt AP = 0.5."""
    anno = _anno({1: [(0, 100, 100, 50, 50)]})
    preds = [
        {"image_id": 1, "category_id": 0, "bbox": [500, 500, 50, 50], "score": 0.95},
        {"image_id": 1, "category_id": 0, "bbox": [100, 100, 50, 50], "score": 0.60},
    ]
    r = eval_json(preds, anno)
    assert abs(r["mAP50-95"] - 0.5) < 1e-9


def test_cocoeval_crowd_is_ignored_not_fp():
    """A det matching only a crowd gt is ignored: with one real gt hit, AP=1
    despite the extra crowd-matched det."""
    anno = _anno({1: [(0, 100, 100, 50, 50), (0, 300, 300, 100, 100)]}, crowd={2})
    preds = [
        {"image_id": 1, "category_id": 0, "bbox": [310, 310, 40, 40], "score": 0.95},  # inside crowd
        {"image_id": 1, "category_id": 0, "bbox": [100, 100, 50, 50], "score": 0.9},
    ]
    r = eval_json(preds, anno)
    assert abs(r["mAP50-95"] - 1.0) < 1e-9


def test_cocoeval_maxdets_limits_recall():
    anno = _anno({1: [(0, 100 * k, 100, 50, 50) for k in range(1, 4)]})
    preds = [
        {"image_id": 1, "category_id": 0, "bbox": [100 * k, 100, 50, 50], "score": 0.9 - 0.1 * k}
        for k in range(1, 4)
    ]
    ev = COCOEvaluator(anno, preds)
    stats = ev.evaluate()
    assert abs(stats[6] - 1 / 3) < 1e-9  # AR@1
    assert abs(stats[8] - 1.0) < 1e-9  # AR@100


def test_cocoeval_matches_internal_metrics_on_clean_scenario():
    """Exact dets + disjoint FPs: COCOeval and ultralytics-style ap_per_class
    share the same P/R curve, so mAP must agree closely."""
    rng = np.random.RandomState(0)
    boxes_per_img, preds = {}, []
    tp_list, conf_list, cls_list, tgt_list = [], [], [], []
    iouv = np.linspace(0.5, 0.95, 10)
    for i in range(1, 65):
        gts = []
        dets = []
        for j in range(4):
            x, y = 60 + 130 * j, 60 + 60 * (i % 3)
            w, h = 50, 40
            gts.append((0, x, y, w, h))
            # exact hit for every gt: recall reaches 1.0, where the
            # ultralytics sentinel ramp to (1, 0) vanishes and the two AP
            # definitions converge (they differ below full recall by design)
            dets.append(([x, y, w, h], 0.5 + 0.5 * rng.rand(), True))
        if rng.rand() < 0.5:  # a far-away FP
            dets.append(([600, 600, 30, 30], 0.3 + 0.4 * rng.rand(), False))
        boxes_per_img[i] = gts
        for b, s, _ in dets:
            preds.append({"image_id": i, "category_id": 0, "bbox": list(map(float, b)), "score": float(s)})
        # internal-metrics bookkeeping (xyxy)
        det_rows = np.array(
            [[b[0], b[1], b[0] + b[2], b[1] + b[3], s, 0] for b, s, _ in dets], np.float32
        ).reshape(-1, 6)
        gt_boxes = np.array([[x, y, x + w, y + h] for (_, x, y, w, h) in gts], np.float32)
        gt_cls = np.zeros(len(gts))
        iou = box_iou_np(gt_boxes, det_rows[:, :4])
        tp_list.append(match_predictions(det_rows[:, 5], gt_cls, iou, iouv))
        conf_list.append(det_rows[:, 4])
        cls_list.append(det_rows[:, 5])
        tgt_list.append(gt_cls)
    anno = _anno(boxes_per_img)
    r = eval_json(preds, anno)
    m = DetMetrics(names={0: "a"})
    m.process(np.concatenate(tp_list), np.concatenate(conf_list), np.concatenate(cls_list), np.concatenate(tgt_list))
    ours = m.results_dict()["metrics/mAP50-95(B)"]
    # COCO 101-pt mean vs ultralytics trapz-of-interp differ slightly by
    # construction; on a dense curve they converge
    assert abs(r["mAP50-95"] - ours) < 0.02, (r["mAP50-95"], ours)


def test_yolo_dataset_to_coco_roundtrip(tmp_path):
    import cv2

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(img_dir / f"{i}.jpg"), np.full((100, 200, 3), 128, np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.2 0.4\n")
    from lpc_yolo_tpu.data import YOLODataset

    ds = YOLODataset(str(img_dir), imgsz=64, cache=False)
    coco = yolo_dataset_to_coco(ds)
    assert len(coco["images"]) == 2 and len(coco["annotations"]) == 2
    b = coco["annotations"][0]["bbox"]
    np.testing.assert_allclose(b, [80, 30, 40, 40])  # (0.5-0.1)*200, (0.5-0.2)*100, 0.2*200, 0.4*100


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_matching_and_map_agree_with_reference():
    """Identical synthetic (preds, gts) through our match_predictions +
    ap_per_class vs the reference's -> same mAP50-95 to 1e-9."""
    import torch

    ref = _ref_ultralytics()
    from ultralytics.engine.validator import BaseValidator
    from ultralytics.utils.metrics import ap_per_class as ref_ap_per_class

    rng = np.random.RandomState(42)
    iouv = np.linspace(0.5, 0.95, 10)

    tp_o, tp_r, confs, pcls, tcls = [], [], [], [], []
    for _ in range(12):
        n_gt, n_det = rng.randint(1, 8), rng.randint(0, 10)
        gt = rng.rand(n_gt, 4) * 500
        gt[:, 2:] = gt[:, :2] + 20 + rng.rand(n_gt, 2) * 120
        gt_c = rng.randint(0, 3, n_gt).astype(np.float32)
        det = np.zeros((n_det, 6), np.float32)
        for d in range(n_det):
            if rng.rand() < 0.6 and n_gt:
                j = rng.randint(n_gt)
                jitter = rng.randn(4) * 6
                det[d, :4] = gt[j] + jitter
                det[d, 5] = gt_c[j] if rng.rand() < 0.9 else rng.randint(0, 3)
            else:
                det[d, :4] = np.sort(rng.rand(2, 2) * 600, axis=0).T.reshape(-1)[[0, 2, 1, 3]]
                det[d, 5] = rng.randint(0, 3)
            det[d, 4] = rng.rand()
        iou_np = box_iou_np(gt.astype(np.float32), det[:, :4])
        tp_o.append(match_predictions(det[:, 5], gt_c, iou_np, iouv))

        # reference path (torch)
        stub = type("S", (), {"iouv": torch.linspace(0.5, 0.95, 10)})()
        tpr = BaseValidator.match_predictions(
            stub,
            torch.from_numpy(det[:, 5]),
            torch.from_numpy(gt_c),
            torch.from_numpy(iou_np.astype(np.float32)),
        )
        tp_r.append(tpr.numpy())
        confs.append(det[:, 4])
        pcls.append(det[:, 5])
        tcls.append(gt_c)

    tp_o, tp_r = np.concatenate(tp_o), np.concatenate(tp_r)
    conf, pc, tc = np.concatenate(confs), np.concatenate(pcls), np.concatenate(tcls)
    assert (tp_o == tp_r).all(), "TP matrices diverge from reference matching"

    m = DetMetrics(names={0: "a", 1: "b", 2: "c"})
    m.process(tp_o, conf, pc, tc)
    ours = m.results_dict()["metrics/mAP50-95(B)"]
    ref_out = ref_ap_per_class(tp_r, conf, pc, tc, names={0: "a", 1: "b", 2: "c"})
    ref_map = ref_out[5].mean()  # ap (nc, 10) is the 6th return
    assert abs(ours - float(ref_map)) < 1e-9, (ours, ref_map)


@pytest.mark.skipif(not HAS_REF, reason="torch reference not mounted")
def test_mask_kpt_iou_parity_vs_reference():
    """mask_iou_np / kpt_iou_np match the reference metrics (metrics.py:137,156)."""
    import torch

    _ref_ultralytics()
    from ultralytics.utils.metrics import kpt_iou as t_kpt_iou
    from ultralytics.utils.metrics import mask_iou as t_mask_iou

    from lpc_yolo_tpu.utils.metrics import kpt_iou_np, mask_iou_np

    rng = np.random.RandomState(0)
    g = (rng.rand(3, 16, 16) > 0.5).astype(np.float32)
    p = (rng.rand(4, 16, 16) > 0.5).astype(np.float32)
    ref = t_mask_iou(torch.tensor(g.reshape(3, -1)), torch.tensor(p.reshape(4, -1))).numpy()
    np.testing.assert_allclose(mask_iou_np(g, p), ref, atol=1e-6)

    K = 17
    gk = rng.rand(3, K, 3).astype(np.float32) * 100
    gk[..., 2] = (rng.rand(3, K) > 0.3).astype(np.float32) * 2
    pk = rng.rand(5, K, 3).astype(np.float32) * 100
    area = rng.rand(3).astype(np.float32) * 500 + 50
    sig = np.linspace(0.02, 0.1, K).astype(np.float32)
    ref = t_kpt_iou(torch.tensor(gk), torch.tensor(pk), torch.tensor(area), sig.tolist()).numpy()
    np.testing.assert_allclose(kpt_iou_np(gk, pk, area, sig), ref, atol=1e-5)
