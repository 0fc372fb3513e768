"""ONNX export: jaxpr->ONNX converter validated by an INDEPENDENT decoder and
runtime — OpenCV's dnn ONNX importer (cv2 ships its own protobuf parser, so
a parity-passing forward proves both the hand-rolled wire format and the
graph semantics). Mirrors the reference's OpenCV-DNN example client
(examples/YOLOv8-CPP-Inference/inference.cpp) consuming the exported model.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.engine.exporter import export_model

cv2 = pytest.importorskip("cv2")


def _export_and_compare(yolo, tmp_path, imgsz=64, tol=5e-4):
    path = export_model(yolo, fmt="onnx", imgsz=imgsz, out_dir=tmp_path)
    img = np.random.rand(1, 3, imgsz, imgsz).astype(np.float32)
    ref = np.asarray(
        yolo.model.apply(yolo.variables, jnp.asarray(img), training=False, input_layout="NCHW")["pred"]
    )
    net = cv2.dnn.readNetFromONNX(path)
    net.setInput(img, "images")
    out = net.forward()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=tol, rtol=1e-3)
    return path


@pytest.fixture(scope="module")
def v8_onnx(tmp_path_factory):
    yolo = YOLO("yolov8.yaml", nc=3)
    tmp = tmp_path_factory.mktemp("onnx_v8")
    path = _export_and_compare(yolo, tmp)
    return yolo, path


def test_onnx_v8_cv2_parity(v8_onnx):
    _, path = v8_onnx
    sidecar = json.loads(open(path + ".json").read())
    assert sidecar["nc"] == 3


def test_onnx_v10_cv2_parity(tmp_path):
    """v10n stresses PSA attention (MatMul/Softmax/Transpose), SCDown, CIB."""
    _export_and_compare(YOLO("yolov10n.yaml", nc=3), tmp_path)


def test_onnx_lpc_cv2_parity(tmp_path):
    """The fork's namesake: space_to_depth / SPDConv / SPCA / LPC / CBAM."""
    _export_and_compare(YOLO("yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml", nc=3), tmp_path)


def test_autobackend_onnx_runtime(v8_onnx):
    """AutoBackend's OpenCV-DNN row: raw ONNX head + host top-k decode agree
    with the in-framework predict path (reference autobackend.py cv2.dnn)."""
    from lpc_yolo_tpu.nn.autobackend import AutoBackend
    from lpc_yolo_tpu.ops.postprocess import v10_detections

    yolo, path = v8_onnx
    backend = AutoBackend(path, imgsz=64)
    img = np.random.rand(1, 64, 64, 3).astype(np.float32)
    det = backend.forward(img)
    assert det.shape == (1, 300, 6)
    pred = yolo.model.apply(yolo.variables, jnp.asarray(img), training=False)["pred"]
    want = np.asarray(v10_detections(pred, 300, yolo.model.nc))
    np.testing.assert_allclose(det[:, :, 4], want[:, :, 4], atol=1e-3)  # scores
    assert (det[0, :, 5] == want[0, :, 5]).mean() > 0.99  # labels (ties tolerated)
