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


def test_facade_save_load_reset(tmp_path):
    """Model.save/.load/.reset_weights (reference engine/model.py:283-310):
    save round-trips through YOLO(); load transfers shape-matching leaves."""
    import jax
    import numpy as np

    m = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    path = m.save(tmp_path / "w.ckpt")
    m2 = YOLO(path)
    for a, b in zip(jax.tree.leaves(m.variables), jax.tree.leaves(m2.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert m2.task == m.task and m2.model.nc == 3

    m3 = YOLO(ASSETS / "tiny-v10.yaml", nc=3).reset_weights()
    before = np.asarray(jax.tree.leaves(m3.variables["params"])[0]).copy()
    m3.load(m)  # transfer m's weights in
    leaves_m = jax.tree.leaves(m.variables["params"])
    leaves_3 = jax.tree.leaves(m3.variables["params"])
    for a, b in zip(leaves_m, leaves_3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    del before


def test_facade_callbacks_merge_into_trainer():
    from lpc_yolo_tpu.engine.trainer import Trainer

    m = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    seen = []
    m.add_callback("on_train_start", lambda t: seen.append("start"))
    t = Trainer(m, data="unused.yaml", save_dir="/tmp/unused_run")
    t.callbacks.run("on_train_start", t)
    assert seen == ["start"]
    m.clear_callback("on_train_start")
    assert m.callbacks["on_train_start"] == []
    m.reset_callbacks()
    assert m.callbacks == {}


def test_facade_embed_device_helpers(tmp_path):
    import numpy as np

    m = YOLO(ASSETS / "tiny-v10.yaml", nc=3)
    imgs = [(np.random.RandomState(i).rand(40, 56, 3) * 255).astype(np.uint8) for i in range(3)]
    embs = m.embed(imgs, imgsz=32, batch=2)
    assert len(embs) == 3 and embs[0].ndim == 1
    np.testing.assert_allclose(np.linalg.norm(embs[0]), 1.0, atol=1e-4)
    # identical image -> identical embedding; different image -> different
    e2 = m.embed([imgs[0]], imgsz=32)[0]
    np.testing.assert_allclose(e2, embs[0], atol=1e-5)
    assert np.abs(embs[0] - embs[1]).max() > 1e-6

    assert ":" in m.device
    assert "detect" in m.task_map and "trainer" in m.task_map["detect"]
    assert YOLO.is_hub_model("https://hub.ultralytics.com/models/abc123")
    assert not YOLO.is_hub_model("yolov10n.yaml")
    assert YOLO.is_triton_model("http://localhost:8000/v2/models/yolo")
    assert not YOLO.is_triton_model("yolov10n.pt")
