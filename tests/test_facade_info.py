"""Facade parity helpers: Model.info() summary (reference torch_utils
model_info), from_pretrained local loading (reference HF-Hub mixin on
YOLOv10), and the import-gated albumentations bridge (augment.py:819)."""

from pathlib import Path

import numpy as np
import pytest

from lpc_yolo_tpu import YOLO

ASSETS = Path(__file__).resolve().parent / "assets"


def test_info_reports_layers_params_gflops(capsys):
    m = YOLO(ASSETS / "tiny-detect.yaml", nc=3)
    out = m.info(imgsz=64)
    assert out["layers"] == 5 and out["parameters"] == m.n_params
    assert out["GFLOPs"] > 0
    assert "summary" in capsys.readouterr().out


def test_from_pretrained_local_ckpt(tmp_path):
    m = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    path = m.export(format="ckpt", imgsz=64, out_dir=tmp_path)
    m2 = YOLO.from_pretrained(path)
    a = np.concatenate([x.ravel() for x in map(np.asarray, __import__("jax").tree.leaves(m.variables["params"]))])
    b = np.concatenate([x.ravel() for x in map(np.asarray, __import__("jax").tree.leaves(m2.variables["params"]))])
    np.testing.assert_array_equal(a, b)

    m3 = YOLO.from_pretrained(str(tmp_path))  # directory form
    assert m3.model.nc == 3

    with pytest.raises(FileNotFoundError, match="network egress"):
        YOLO.from_pretrained("some/hub-repo-id")


def test_albumentations_bridge_gates_on_import():
    from lpc_yolo_tpu.data.augment import AlbumentationsBridge, TrainTransforms

    bridge = AlbumentationsBridge()
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    out = bridge(img, np.random.RandomState(0))
    assert out.shape == img.shape  # identity when package absent, valid image otherwise
    assert TrainTransforms(64).albumentations is not None


def test_profile_per_layer_table(capsys):
    m = YOLO(ASSETS / "tiny-detect.yaml", nc=3)
    rows = m.profile(imgsz=64, verbose=True)
    assert len(rows) == 5
    assert sum(r["params"] for r in rows) == m.n_params
    assert all(r["gflops"] >= 0 for r in rows)
    assert rows[2]["module"] == "C2f" and rows[2]["gflops"] > 0
    assert "GFLOPs" in capsys.readouterr().out
