"""End-to-end learning proof (slow): the full training stack must LEARN.

mAP *parity* with the torch reference is proven component-wise
(test_val_agreement*.py); this is the complementary system-level claim the
reference demonstrates with its COCO logs (/root/reference/logs/yolov10n.csv):
from-scratch yolov10n trained on a synthetic rectangles dataset reaches high
mAP on a held-out split. tools/train_convergence.py is the full-strength run
(120 epochs -> mAP50 0.92 / mAP50-95 0.83 in ~7 min on the v5e chip); this
gated test uses a shortened budget with a correspondingly lower bar so the
--slow suite stays tractable.
"""

import os

import pytest

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.data import make_synthetic_dataset


@pytest.mark.slow
def test_training_converges(tmp_path):
    data = make_synthetic_dataset(tmp_path / "ds", n_train=256, n_val=32, imgsz=160, nc=3, max_boxes=4, seed=3)
    m = YOLO("yolov10n.yaml", nc=3)
    epochs = 60
    m.train(
        data=data, epochs=epochs, batch=16, imgsz=160, workers=2, max_gt=8,
        cache="ram", close_mosaic=epochs // 3, patience=epochs, val=False,
        save=False, save_dir=str(tmp_path / "run"),
    )
    metrics = m.val(data=data, imgsz=160, batch=16)
    map50 = float(metrics.get("metrics/mAP50(B)", 0.0))
    # 120 epochs reaches 0.92; 60 epochs must clear half the bar with margin
    assert map50 > 0.5, f"training failed to learn: mAP50={map50:.3f}"
