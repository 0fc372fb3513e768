"""DOTA splitter tests: window math, IoF geometry, end-to-end tiling."""

import numpy as np

from lpc_yolo_tpu.data.split_dota import (
    bbox_iof,
    get_window_obj,
    get_windows,
    poly_rect_intersection_area,
    split_trainval,
)


def test_poly_rect_intersection_exact():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    assert abs(poly_rect_intersection_area(sq, (0, 0, 10, 10)) - 100) < 1e-9
    assert abs(poly_rect_intersection_area(sq, (5, 5, 20, 20)) - 25) < 1e-9
    assert poly_rect_intersection_area(sq, (20, 20, 30, 30)) == 0.0
    # rotated 45-degree square of diagonal 10 centered at (5,5), area 50
    rot = np.array([[5, 0], [10, 5], [5, 10], [0, 5]], np.float64)
    assert abs(poly_rect_intersection_area(rot, (0, 0, 10, 10)) - 50) < 1e-9
    assert abs(poly_rect_intersection_area(rot, (5, 0, 10, 10)) - 25) < 1e-9


def test_bbox_iof():
    polys = np.array([[0, 0, 10, 0, 10, 10, 0, 10]], np.float32)
    wins = np.array([[0, 0, 10, 10], [5, 0, 15, 10], [50, 50, 60, 60]], np.float32)
    iof = bbox_iof(polys, wins)
    np.testing.assert_allclose(iof[0], [1.0, 0.5, 0.0], atol=1e-6)


def test_get_windows_cover_and_threshold():
    wins = get_windows((2000, 3000), crop_sizes=(1024,), gaps=(200,))
    assert (wins[:, 2] - wins[:, 0] == 1024).all()
    assert wins[:, 0].min() == 0 and wins[:, 2].max() == 3000
    assert wins[:, 1].min() == 0 and wins[:, 3].max() == 2000
    small = get_windows((500, 500), crop_sizes=(1024,), gaps=(200,))
    assert len(small) == 1  # sub-crop image keeps its best window


def test_split_trainval_end_to_end(tmp_path):
    import cv2

    for split in ("train", "val"):
        (tmp_path / "images" / split).mkdir(parents=True)
        (tmp_path / "labels" / split).mkdir(parents=True)
        img = np.full((1400, 1600, 3), 100, np.uint8)
        cv2.rectangle(img, (100, 100), (300, 250), (250, 250, 250), -1)
        cv2.imwrite(str(tmp_path / "images" / split / "P0001.jpg"), img)
        # one OBB quad over that rectangle, normalized
        poly = np.array([100, 100, 300, 100, 300, 250, 100, 250], np.float32)
        poly[0::2] /= 1600
        poly[1::2] /= 1400
        (tmp_path / "labels" / split / "P0001.txt").write_text(
            "0 " + " ".join(f"{v:.6g}" for v in poly) + "\n"
        )
    out = tmp_path / "split"
    split_trainval(str(tmp_path), str(out), crop_size=1024, gap=200)
    crops = sorted((out / "images" / "train").glob("*.jpg"))
    labels = sorted((out / "labels" / "train").glob("*.txt"))
    assert len(crops) == 4  # 2x2 windows for 1600x1400 @1024/824
    assert len(labels) >= 1
    # the window at (0,0) contains the whole object: label renormalized to crop
    lb = (out / "labels" / "train" / "P0001__1024__0___0.txt").read_text().split()
    vals = np.array(lb[1:], np.float32)
    np.testing.assert_allclose(vals[0::2] * 1024, [100, 300, 300, 100], atol=0.5)
    np.testing.assert_allclose(vals[1::2] * 1024, [100, 100, 250, 250], atol=0.5)
