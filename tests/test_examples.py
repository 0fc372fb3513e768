"""The examples/ deployment clients (reference examples/ tree): each consumes
an exported artifact or the track API with its own pre/post pipeline."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"


def _load(rel: str, name: str):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_region_counter_counts_entries_once():
    rc = _load("region-counter/main.py", "example_region_counter")
    counter = rc.RegionCounter(
        [{"name": "r", "polygon": [(0, 0), (100, 0), (100, 100), (0, 100)]}]
    )
    inside = np.array([[10, 10, 30, 30]], float)  # center (20, 20) in region
    outside = np.array([[200, 200, 220, 220]], float)

    assert counter.update(inside, [1]) == [1]
    assert counter.update(inside, [1]) == [1]  # same track, still inside: no recount
    assert counter.update(outside, [1]) == [1]  # left
    assert counter.update(inside, [1]) == [2]  # re-entry counts again
    assert counter.update(np.zeros((0, 4)), []) == [2]


def test_point_in_polygon_concave():
    rc = sys.modules.get("example_region_counter") or _load(
        "region-counter/main.py", "example_region_counter"
    )
    poly = [(0, 0), (10, 0), (10, 10), (5, 5), (0, 10)]  # concave notch at top
    assert rc.point_in_polygon((2, 2), poly)
    assert not rc.point_in_polygon((5, 9), poly)  # inside the notch


def test_opencv_onnx_client_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from lpc_yolo_tpu import YOLO
    from lpc_yolo_tpu.engine.exporter import export_model

    client = _load("opencv-onnx-python/main.py", "example_onnx_client")
    yolo = YOLO("yolov8.yaml", nc=3)
    path = export_model(yolo, fmt="onnx", imgsz=64, out_dir=tmp_path)
    img = (np.random.RandomState(0).rand(80, 60, 3) * 255).astype(np.uint8)
    dets = client.detect(path, img, conf=0.0, iou=0.45, imgsz=64)
    assert len(dets) > 0
    h, w = img.shape[:2]
    for d in dets:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= w and 0 <= x2 <= w and 0 <= y1 <= h and 0 <= y2 <= h
        assert 0 <= d["cls"] < 3


def test_segmentation_onnx_client_end_to_end(tmp_path):
    """The seg client consumes the task-complete ONNX artifact (pred+mc+proto
    — reference examples/YOLOv8-Segmentation-ONNXRuntime-Python) and returns
    per-instance boxes + full-resolution boolean masks."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from lpc_yolo_tpu import YOLO
    from lpc_yolo_tpu.engine.exporter import export_model

    client = _load("segmentation-onnx-python/main.py", "example_seg_client")
    yolo = YOLO("yolov8n-seg.yaml", nc=3)
    path = export_model(yolo, fmt="onnx", imgsz=64, out_dir=tmp_path)
    img = (np.random.RandomState(0).rand(80, 60, 3) * 255).astype(np.uint8)
    dets = client.segment(path, img, conf=0.0, iou=0.45, imgsz=64)
    assert len(dets) > 0
    h, w = img.shape[:2]
    for d in dets:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= w and 0 <= x2 <= w and 0 <= y1 <= h and 0 <= y2 <= h
        assert d["mask"].shape == (h, w) and d["mask"].dtype == bool
        # mask pixels (if any) concentrate inside the (slightly padded) box
        ys, xs = np.nonzero(d["mask"])
        if len(ys):
            assert xs.min() >= x1 - 2 and xs.max() <= x2 + 2
            assert ys.min() >= y1 - 2 and ys.max() <= y2 + 2


def test_onnx_client_nms_matches_greedy_semantics():
    client = _load("opencv-onnx-python/main.py", "example_onnx_client")
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float
    )
    keep = client.nms(boxes, np.array([0.9, 0.8, 0.7]), iou_thres=0.5)
    assert keep == [0, 2]  # overlapping second box suppressed


@pytest.mark.slow
def test_tflite_client_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    pytest.importorskip("tensorflow")
    from lpc_yolo_tpu import YOLO
    from lpc_yolo_tpu.engine.exporter import export_model

    client = _load("tflite-int8-python/main.py", "example_tflite_client")
    yolo = YOLO("yolov8.yaml", nc=3)
    path = export_model(yolo, fmt="tflite-int8", imgsz=64, out_dir=tmp_path)
    img = (np.random.RandomState(0).rand(80, 60, 3) * 255).astype(np.uint8)
    dets = client.run_tflite(path, img, conf=0.0)
    assert isinstance(dets, list)
    for d in dets:
        assert len(d["box"]) == 4 and 0 <= d["cls"] < 3
