"""Integration-callback sinks write real, tool-readable layouts.

Reference: ultralytics/utils/callbacks/{mlflow,dvc}.py semantics, implemented
dependency-free (MLflow file-store + DVCLive directory layouts).
"""

import json
from types import SimpleNamespace

import pytest

from lpc_yolo_tpu.utils.callbacks import CallbackRegistry


def _fake_trainer(save_dir, epoch, metrics):
    return SimpleNamespace(
        save_dir=str(save_dir), epoch=epoch, last_metrics=metrics,
        args={"epochs": 2, "imgsz": 64},
    )


def test_sinks_attach_and_write(tmp_path):
    reg = CallbackRegistry()
    attached = reg.add_integration_callbacks(save_dir=tmp_path)
    assert "mlflow-filestore" in attached
    assert "dvclive" in attached
    assert "jsonl" in attached
    assert not any("TODO" in a for a in attached)

    for epoch in range(2):
        t = _fake_trainer(tmp_path, epoch, {"metrics/mAP50-95(B)": 0.1 * (epoch + 1), "train/box_loss": 2.0 - epoch})
        reg.run("on_fit_epoch_end", t)
    reg.run("on_train_end", _fake_trainer(tmp_path, 1, {}))

    # MLflow file-store layout
    exp = tmp_path / "mlruns" / "0"
    assert (exp / "meta.yaml").exists()
    runs = [d for d in exp.iterdir() if d.is_dir()]
    assert len(runs) == 1
    run = runs[0]
    assert (run / "meta.yaml").exists()
    metric_file = run / "metrics" / "metrics_mAP50-95B"
    assert metric_file.exists()
    lines = metric_file.read_text().strip().splitlines()
    assert len(lines) == 2
    ts, val, step = lines[1].split()
    assert float(val) == 0.2 and step == "1"
    assert "status: 3" in (run / "meta.yaml").read_text()  # FINISHED

    # DVCLive layout
    dvc = tmp_path / "dvclive"
    latest = json.loads((dvc / "metrics.json").read_text())
    assert latest["step"] == 1
    assert abs(latest["metrics_mAP50-95(B)"] - 0.2) < 1e-9
    tsv = (dvc / "plots" / "metrics" / "train_box_loss.tsv").read_text().splitlines()
    assert tsv[0].startswith("step\t") and len(tsv) == 3

    # JSONL events
    recs = [json.loads(l) for l in (tmp_path / "events.jsonl").read_text().splitlines()]
    assert len(recs) == 2 and recs[1]["epoch"] == 1


def test_trainer_emits_to_sinks(tmp_path):
    """End-to-end: a real (tiny) training run populates all three sinks."""
    from lpc_yolo_tpu import YOLO
    from lpc_yolo_tpu.data import make_synthetic_dataset

    from pathlib import Path as _P

    data = make_synthetic_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=64, nc=2)
    y = YOLO(_P(__file__).resolve().parent / "assets" / "tiny-detect.yaml", nc=2)
    y.train(data=data, epochs=1, imgsz=64, batch=2, save_dir=tmp_path / "run", workers=0)
    run_dir = tmp_path / "run"
    assert (run_dir / "events.jsonl").exists()
    assert (run_dir / "dvclive" / "metrics.json").exists()
    assert (run_dir / "mlruns" / "0").exists()
