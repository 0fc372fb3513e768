"""FastSAM (everything + prompts) and NAS facade tests."""

import numpy as np
import pytest

from lpc_yolo_tpu import FastSAM, NAS
from lpc_yolo_tpu.models.fastsam import FastSAMPrompt
from lpc_yolo_tpu.models.nas import nas_postprocess


def test_fastsam_everything_and_prompts():
    import cv2

    img = np.full((96, 128, 3), 30, np.uint8)
    cv2.rectangle(img, (20, 20), (60, 70), (240, 240, 240), -1)
    fs = FastSAM("fastsam-s.yaml")
    assert fs.names == {0: "object"}
    res = fs.predict(img, imgsz=64, conf=0.0)
    assert len(res) == 1
    r = res[0]
    if r.masks is None:  # random init may produce no masks above conf 0
        pytest.skip("random-init model produced no masks")
    # prompts operate on whatever masks exist
    p = FastSAMPrompt(img, res)
    out = p.box_prompt([20, 20, 60, 70])
    assert out[0].masks.shape[0] == 1
    out = p.everything_prompt()
    assert out is res


def test_fastsam_prompt_selection_logic():
    """Prompt math on synthetic masks (no model)."""

    class R:
        pass

    r = R()
    masks = np.zeros((2, 10, 10), np.float32)
    masks[0, 1:4, 1:4] = 1  # small top-left
    masks[1, 5:9, 5:9] = 1  # big bottom-right
    r.masks = masks
    r.orig_shape = (10, 10)
    p = FastSAMPrompt("x", [r])
    out = p.box_prompt([5, 5, 9, 9])
    assert (out[0].masks[0] == masks[1]).all()

    r2 = R()
    r2.masks = masks.copy()
    r2.orig_shape = (10, 10)
    p2 = FastSAMPrompt("x", [r2])
    out2 = p2.point_prompt([[2, 2]], [1])
    assert (out2[0].masks[0] == (masks[0] >= 1)).all()


def test_nas_requires_checkpoint():
    with pytest.raises(AssertionError):
        NAS("yolo_nas_s.yaml")
    with pytest.raises(FileNotFoundError):
        NAS("yolo_nas_s.pt")


def test_nas_postprocess_shapes():
    rng = np.random.RandomState(0)
    A, nc = 50, 3
    boxes = np.sort(rng.rand(1, A, 4) * 100, axis=-1)[..., [0, 2, 1, 3]].astype(np.float32)
    boxes[..., 2:] += 5
    scores = rng.rand(1, A, nc).astype(np.float32) * 0.5
    rows = nas_postprocess([(boxes, scores)], conf=0.25, iou=0.45)
    assert rows.ndim == 2 and rows.shape[1] == 6
    assert (rows[:, 4] > 0.25).all()
