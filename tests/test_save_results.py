"""Result persistence: increment_path/get_save_dir run-dir semantics
(reference utils/files.py:85, cfg/__init__.py get_save_dir) and the
Predictor's save/save_txt/save_crop outputs (reference predictor.py
write_results/save_preds)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.utils.infra import get_save_dir, increment_path


@pytest.fixture(scope="module")
def tiny_yolo():
    return YOLO("yolov10n.yaml", nc=3)


def test_increment_path(tmp_path):
    d = tmp_path / "exp"
    assert increment_path(d) == d  # absent -> unchanged
    d.mkdir()
    assert increment_path(d) == tmp_path / "exp2"
    (tmp_path / "exp2").mkdir()
    assert increment_path(d) == tmp_path / "exp3"
    assert increment_path(d, exist_ok=True) == d
    f = tmp_path / "a.txt"
    f.write_text("x")
    assert increment_path(f).name == "a2.txt"  # files keep their extension


def test_get_save_dir(tmp_path):
    p = get_save_dir("detect", "train", project=str(tmp_path / "proj"))
    assert p == tmp_path / "proj" / "train"
    p.mkdir(parents=True)
    assert get_save_dir("detect", "train", project=str(tmp_path / "proj")).name == "train2"
    assert get_save_dir("detect", "train", project=str(tmp_path / "proj"),
                        name="exp").name == "exp"


def test_predict_save_image_and_txt(tiny_yolo, tmp_path):
    img = (np.random.RandomState(0).rand(48, 80, 3) * 255).astype(np.uint8)
    rs = tiny_yolo.predict(img, imgsz=64, conf=0.0, save=True, save_txt=True,
                           save_conf=True, project=str(tmp_path), name="p")
    assert len(rs) == 1
    out = tmp_path / "p"
    saved = cv2.imread(str(out / "image0.jpg"))
    assert saved is not None and saved.shape == img.shape
    txt = (out / "labels" / "image0.txt").read_text().strip().splitlines()
    assert len(txt) == len(rs[0])  # one line per detection
    assert len(txt[0].split()) == 6  # cls + xywhn + conf (save_conf)
    # second run with the same project/name increments to p2
    tiny_yolo.predict(img, imgsz=64, conf=0.0, save=True,
                      project=str(tmp_path), name="p")
    assert (tmp_path / "p2" / "image0.jpg").exists()


def test_predict_save_video(tiny_yolo, tmp_path):
    vid = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10, (80, 48))
    rng = np.random.RandomState(1)
    for _ in range(3):
        w.write((rng.rand(48, 80, 3) * 255).astype(np.uint8))
    w.release()
    rs = tiny_yolo.predict(vid, imgsz=64, conf=0.0, save=True,
                           project=str(tmp_path), name="v")
    assert len(rs) == 3
    cap = cv2.VideoCapture(str(tmp_path / "v" / "clip.avi"))
    assert cap.isOpened() and int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()


def test_trainer_save_dir_increments(tiny_yolo, tmp_path):
    from lpc_yolo_tpu.engine.trainer import Trainer

    t1 = Trainer(tiny_yolo, data="unused.yaml", project=str(tmp_path / "runs"))
    assert t1.save_dir == tmp_path / "runs" / "train"
    t1.save_dir.mkdir(parents=True)
    t2 = Trainer(tiny_yolo, data="unused.yaml", project=str(tmp_path / "runs"))
    assert t2.save_dir.name == "train2"
    t3 = Trainer(tiny_yolo, data="unused.yaml", project=str(tmp_path / "runs"),
                 name="train", exist_ok=True)
    assert t3.save_dir.name == "train"


def test_cli_predict_saves_by_default(tmp_path, capsys):
    """`yolo predict` persists annotated results by default (reference
    Model.predict save=is_cli); save=False on the command line disables it."""
    from lpc_yolo_tpu.cfg import entrypoint

    src = tmp_path / "in.jpg"
    cv2.imwrite(str(src), (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8))
    entrypoint([
        "predict", "model=tests/assets/tiny-v10.yaml", f"source={src}",
        "imgsz=64", "conf=0.0", f"project={tmp_path / 'runs'}", "name=cli",
    ])
    assert (tmp_path / "runs" / "cli" / "in.jpg").exists()
    capsys.readouterr()
    entrypoint([
        "predict", "model=tests/assets/tiny-v10.yaml", f"source={src}",
        "imgsz=64", "conf=0.0", "save=False", f"project={tmp_path / 'runs'}", "name=off",
    ])
    assert not (tmp_path / "runs" / "off").exists()
    capsys.readouterr()
