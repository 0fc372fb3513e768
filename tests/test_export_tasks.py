"""Task-complete export: seg/pose artifacts carry mask/keypoint outputs.

Reference parity: the reference Exporter traces whatever the head emits in
export mode — a seg model's ONNX carries mask coefficients + protos
(reference nn/modules/head.py:104-128 Segment.forward returns (x, mc, p);
engine/exporter.py:241-243 traces it), consumed by its seg ONNX client
(examples/YOLOv8-Segmentation-ONNXRuntime-Python/main.py). Here the same
task-complete trace exports through every converter, and AutoBackend loads
the artifacts back with named outputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.engine.exporter import export_model, load_stablehlo
from lpc_yolo_tpu.nn.autobackend import AutoBackend

IMGSZ = 64


@pytest.fixture(scope="module")
def seg_yolo():
    return YOLO("yolov8n-seg.yaml", nc=3)


@pytest.fixture(scope="module")
def pose_yolo():
    return YOLO("yolov8n-pose.yaml", nc=1)


def test_stablehlo_seg_outputs(seg_yolo, tmp_path):
    path = export_model(seg_yolo, fmt="stablehlo", imgsz=IMGSZ, out_dir=tmp_path)
    out = load_stablehlo(path)(jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32))
    assert set(out) == {"pred", "mc", "proto"}
    A = out["pred"].shape[1]
    assert out["mc"].shape == (1, A, 32)
    assert out["proto"].shape[0] == 1 and out["proto"].shape[-1] == 32


def test_onnx_seg_roundtrip(seg_yolo, tmp_path):
    """Seg ONNX artifact loads back through AutoBackend with mc/proto intact
    and matches the live graph."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841

    path = export_model(seg_yolo, fmt="onnx", imgsz=IMGSZ, out_dir=tmp_path)
    backend = AutoBackend(path, imgsz=IMGSZ)
    x = np.random.RandomState(0).rand(1, IMGSZ, IMGSZ, 3).astype(np.float32)
    out = backend.forward(x)
    assert isinstance(out, dict) and set(out) == {"pred", "mc", "proto"}

    live = seg_yolo.model.apply(
        seg_yolo.variables, jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)),
        training=False, input_layout="NCHW",
    )
    np.testing.assert_allclose(out["pred"], np.asarray(live["pred"]), atol=2e-3)
    np.testing.assert_allclose(out["mc"], np.asarray(live["mc"]), atol=2e-3)
    np.testing.assert_allclose(
        out["proto"], np.asarray(live["proto"], np.float32), atol=2e-3
    )


def test_torchscript_pose_roundtrip(pose_yolo, tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841

    path = export_model(pose_yolo, fmt="torchscript", imgsz=IMGSZ, out_dir=tmp_path)
    backend = AutoBackend(path, imgsz=IMGSZ)
    x = np.random.RandomState(1).rand(1, IMGSZ, IMGSZ, 3).astype(np.float32)
    out = backend.forward(x)
    assert isinstance(out, dict) and set(out) == {"pred", "kpt"}
    A = out["pred"].shape[1]
    assert out["kpt"].shape == (1, A, 17 * 3)

    live = pose_yolo.model.apply(
        pose_yolo.variables, jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)),
        training=False, input_layout="NCHW",
    )
    np.testing.assert_allclose(out["pred"], np.asarray(live["pred"]), atol=2e-3)
    np.testing.assert_allclose(out["kpt"], np.asarray(live["kpt"]), atol=2e-2)


def test_torchscript_seg_roundtrip(seg_yolo, tmp_path):
    """Exercises the lhs-dilated (transposed) conv path in the torch
    interpreter (Proto head upsample)."""
    torch = pytest.importorskip("torch")  # noqa: F841

    path = export_model(seg_yolo, fmt="torchscript", imgsz=IMGSZ, out_dir=tmp_path)
    backend = AutoBackend(path, imgsz=IMGSZ)
    x = np.random.RandomState(2).rand(1, IMGSZ, IMGSZ, 3).astype(np.float32)
    out = backend.forward(x)
    assert isinstance(out, dict) and set(out) == {"pred", "mc", "proto"}
    live = seg_yolo.model.apply(
        seg_yolo.variables, jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)),
        training=False, input_layout="NCHW",
    )
    np.testing.assert_allclose(
        out["proto"], np.asarray(live["proto"], np.float32), atol=2e-3
    )


@pytest.mark.slow
def test_saved_model_seg_outputs(seg_yolo, tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841

    path = export_model(seg_yolo, fmt="saved_model", imgsz=IMGSZ, out_dir=tmp_path)
    backend = AutoBackend(path, imgsz=IMGSZ)
    out = backend.forward(np.zeros((1, IMGSZ, IMGSZ, 3), np.float32))
    assert isinstance(out, dict) and set(out) == {"pred", "mc", "proto"}


def test_obb_export_single_output(tmp_path):
    """OBB artifacts stay single-output: the angle rides as pred's last column."""
    yolo = YOLO("yolov8n-obb.yaml", nc=3)
    path = export_model(yolo, fmt="stablehlo", imgsz=IMGSZ, out_dir=tmp_path)
    out = load_stablehlo(path)(jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32))
    out = np.asarray(out)
    assert out.ndim == 3 and out.shape[-1] == 4 + 3 + 1  # xywh + nc + angle
