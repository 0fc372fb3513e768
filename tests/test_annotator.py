"""Auto-annotator tests: polygon extraction + end-to-end label writing."""

import numpy as np

from lpc_yolo_tpu.data.annotator import auto_annotate, mask_to_polygon


def test_mask_to_polygon_square():
    m = np.zeros((64, 64), np.float32)
    m[10:30, 20:50] = 1.0
    poly = mask_to_polygon(m)
    assert len(poly) >= 4
    assert poly[:, 0].min() >= 19 and poly[:, 0].max() <= 50
    assert poly[:, 1].min() >= 9 and poly[:, 1].max() <= 30


def test_auto_annotate_runs(tmp_path, monkeypatch):
    """End-to-end with stub models: detector emits one box, SAM one mask."""
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.full((80, 100, 3), 50, np.uint8)
    cv2.rectangle(img, (20, 20), (60, 60), (250, 250, 250), -1)
    cv2.imwrite(str(img_dir / "a.jpg"), img)

    class Boxes:
        xyxy = np.array([[20, 20, 60, 60]], np.float32)
        cls = np.array([2.0])

        def __len__(self):
            return 1

    class DetResult:
        boxes = Boxes()
        path = str(img_dir / "a.jpg")

    class Det:
        def predict(self, im, **kw):
            return [DetResult()]

    class SegResult:
        def __init__(self, h, w):
            m = np.zeros((1, h, w), np.float32)
            m[0, 20:60, 20:60] = 1.0
            self.masks = m

    class Sam:
        def predict(self, im, bboxes=None, **kw):
            return [SegResult(*im.shape[:2])]

    out = auto_annotate(str(img_dir), det_model=Det(), sam_model=Sam(), output_dir=str(tmp_path / "labels"))
    txt = (tmp_path / "labels" / "a.txt").read_text().strip().split("\n")
    assert len(txt) == 1
    vals = txt[0].split()
    assert vals[0] == "2"
    coords = np.array(vals[1:], np.float32).reshape(-1, 2)
    assert (coords >= 0).all() and (coords <= 1).all()
    # polygon hugs the box
    assert abs(coords[:, 0].min() * 100 - 20) < 3 and abs(coords[:, 0].max() * 100 - 60) < 3
