"""Engine tests: trainer/validator/predictor wiring, checkpoint resume,
metrics math — mirrors the reference tests/test_engine.py strategy (direct
component construction on tiny real data) using the synthetic coco8-style
dataset (no downloads in this environment).
"""

from pathlib import Path

import numpy as np
import pytest

import jax

from lpc_yolo_tpu import YOLO

ASSETS = Path(__file__).resolve().parent / "assets"
from lpc_yolo_tpu.data import DataLoader, TrainTransforms, ValTransforms, YOLODataset, check_det_dataset, make_synthetic_dataset
from lpc_yolo_tpu.utils.metrics import DetMetrics, ap_per_class, box_iou_np, match_predictions


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("synds")
    yaml_path = make_synthetic_dataset(root / "ds", n_train=8, n_val=4, imgsz=128, nc=3)
    return yaml_path


def test_dataset_and_loader(ds):
    info = check_det_dataset(ds)
    assert info["nc"] == 3 and len(info["names"]) == 3
    dataset = YOLODataset(info["train"], imgsz=128)
    assert len(dataset) == 8
    item = dataset.get_item_raw(0)
    assert item["img"].shape == (128, 128, 3)
    assert item["bboxes"].shape[1] == 4

    loader = DataLoader(dataset, TrainTransforms(128, max_gt=16), batch_size=4, workers=2)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 128, 128, 3) and batch["img"].dtype == np.uint8
    assert batch["bboxes"].shape == (4, 16, 4)
    assert batch["mask"].any()

    # val loader pads the last partial batch and reports pad_count
    vloader = DataLoader(
        YOLODataset(info["val"], imgsz=128), ValTransforms(128, 16), batch_size=3, shuffle=False, infinite=False
    )
    batches = list(vloader)
    assert len(batches) == 2
    assert batches[-1]["pad_count"] == 2


def test_label_cache_roundtrip(ds):
    info = check_det_dataset(ds)
    d1 = YOLODataset(info["train"], imgsz=128)
    d2 = YOLODataset(info["train"], imgsz=128)  # second load hits .labels.npz
    for a, b in zip(d1.labels, d2.labels):
        np.testing.assert_array_equal(a["bboxes"], b["bboxes"])


def test_metrics_perfect_predictions():
    """Predictions identical to gts must give mAP ~1."""
    gts = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float32)
    cls = np.array([0.0, 1.0])
    iou = box_iou_np(gts, gts)
    tp = match_predictions(cls, cls, iou, np.linspace(0.5, 0.95, 10))
    assert tp.all()
    m = DetMetrics().process(tp, np.array([0.9, 0.8]), cls, cls)
    assert m.map > 0.99 and m.map50 > 0.99
    assert 0.99 < m.fitness <= 1.0


def test_metrics_wrong_class_is_fp():
    gts = np.array([[10, 10, 50, 50]], np.float32)
    iou = box_iou_np(gts, gts)
    tp = match_predictions(np.array([1.0]), np.array([0.0]), iou, np.linspace(0.5, 0.95, 10))
    assert not tp.any()


def test_train_val_predict_resume(ds, tmp_path):
    """2-epoch train -> metrics dict + ckpts -> resume 1 epoch -> predict."""
    m = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    run = tmp_path / "run"
    res = m.train(
        data=ds, epochs=2, batch=2, imgsz=64, workers=0, max_gt=8,
        close_mosaic=1, save_dir=str(run), patience=50,
    )
    assert set(res) >= {"metrics/mAP50(B)", "metrics/mAP50-95(B)", "fitness"}
    assert (run / "weights" / "last.ckpt").exists()
    assert (run / "weights" / "best.ckpt").exists()
    csv_text = (run / "results.csv").read_text()
    assert csv_text.count("\n") >= 3  # header + 2 epochs
    # host-pipeline starvation visibility: every epoch row records the
    # fraction of wall time spent blocked on next(loader)
    assert "input_wait_frac" in csv_text.splitlines()[0]
    wait = float(csv_text.splitlines()[1].split(",")[-1])
    assert 0.0 <= wait <= 1.0

    # resume continues from epoch 2
    res2 = m.train(
        data=ds, epochs=3, batch=2, imgsz=64, workers=0, max_gt=8,
        close_mosaic=1, save_dir=str(run), patience=50, resume=True,
    )
    assert (run / "results.csv").read_text().count("epoch") >= 1

    out = m.predict(str(Path(ds).parent / "images" / "val" / "im000.jpg"), imgsz=64)
    assert len(out) == 1  # Results object produced (detections may be empty)


def test_save_flags(ds, tmp_path):
    """save=False skips per-epoch ckpts (final epoch still saved); save_period
    writes epoch{N}.ckpt snapshots (reference trainer.py:500-507 semantics)."""
    m = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    run = tmp_path / "run"
    m.train(
        data=ds, epochs=3, batch=2, imgsz=64, workers=0, max_gt=8,
        close_mosaic=0, save_dir=str(run), val=False, save_period=2,
    )
    w = run / "weights"
    assert (w / "last.ckpt").exists()
    assert (w / "epoch2.ckpt").exists() and not (w / "epoch1.ckpt").exists()

    run2 = tmp_path / "run2"
    m2 = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    m2.train(
        data=ds, epochs=2, batch=2, imgsz=64, workers=0, max_gt=8,
        close_mosaic=0, save_dir=str(run2), val=False, save=False,
    )
    # only the final epoch is persisted when save=False
    assert (run2 / "weights" / "last.ckpt").exists()
    assert not (run2 / "weights" / "epoch1.ckpt").exists()


def test_v8_train_and_nms_predict(ds, tmp_path):
    """The classic v8 Detect head trains (v8 loss) and predicts via the NMS path."""
    m = YOLO(ASSETS / "tiny-detect.yaml", nc=3)
    assert m.task == "v8"
    res = m.train(
        data=ds, epochs=1, batch=2, imgsz=64, workers=0, max_gt=8,
        close_mosaic=0, save_dir=str(tmp_path / "run"), optimizer="sgd",
    )
    assert "train/box" in (tmp_path / "run" / "results.csv").read_text()
    out = m.predict(str(Path(ds).parent / "images" / "val" / "im000.jpg"), imgsz=64)
    assert len(out) == 1


def test_validator_standalone(ds):
    m = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    res = m.val(data=ds, imgsz=64, batch=2, max_gt=8)
    assert set(res) >= {"metrics/precision(B)", "metrics/mAP50-95(B)"}
    assert all(np.isfinite(v) for v in res.values())


def test_extended_augmentations(ds):
    """Mosaic9 / MixUp / CopyPaste produce valid fixed-shape samples."""
    from lpc_yolo_tpu.data.augment import TrainTransforms, copy_paste, mixup, mosaic4, mosaic9

    info = check_det_dataset(ds)
    dataset = YOLODataset(info["train"], imgsz=128)
    rng = np.random.RandomState(0)

    m9 = mosaic9(dataset, 0, rng, 128)
    assert m9["img"].shape == (256, 256, 3)
    assert (m9["bboxes_xyxy"] >= 0).all() and (m9["bboxes_xyxy"] <= 256).all()

    a = mosaic4(dataset, 0, rng, 128)
    b = mosaic4(dataset, 1, rng, 128)
    mx = mixup(a, b, rng)
    assert mx["img"].shape == a["img"].shape
    assert len(mx["cls"]) == len(a["cls"]) + len(b["cls"])

    img, boxes, cls = copy_paste(a["img"], a["bboxes_xyxy"], a["cls"], rng, p=1.0)
    assert len(boxes) >= len(a["bboxes_xyxy"])

    # full pipeline with all extras enabled stays fixed-shape
    tf = TrainTransforms(128, {"mosaic9": 0.5, "mixup": 1.0, "copy_paste": 0.5}, max_gt=32)
    for i in range(4):
        s = tf(dataset, i, np.random.RandomState(i))
        assert s["img"].shape == (128, 128, 3)
        assert s["bboxes"].shape == (32, 4)
