"""TorchScript export: jaxpr->torch interpreter validated by an INDEPENDENT
runtime — the artifact is executed by torch.jit.load (LibTorch's serialized
module format, no JAX in the loop). Mirrors the reference's
format='torchscript' export (engine/exporter.py:308-330) whose C++ examples
consume the same artifact via torch::jit::load.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.engine.exporter import export_model

torch = pytest.importorskip("torch")


def _export_and_compare(yolo, tmp_path, imgsz=64):
    path = export_model(yolo, fmt="torchscript", imgsz=imgsz, out_dir=tmp_path)
    img = np.random.rand(1, 3, imgsz, imgsz).astype(np.float32)
    ref = np.asarray(
        yolo.model.apply(yolo.variables, jnp.asarray(img), training=False, input_layout="NCHW")["pred"]
    )
    extra = {"config.txt": ""}
    mod = torch.jit.load(path, _extra_files=extra)
    with torch.no_grad():
        out = mod(torch.from_numpy(img)).numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
    meta = json.loads(extra["config.txt"])
    assert meta["nc"] == yolo.model.nc
    return path


@pytest.fixture(scope="module")
def v10_ts(tmp_path_factory):
    """v10n stresses PSA attention (matmul/softmax/permute), SCDown, CIB."""
    yolo = YOLO("yolov10n.yaml", nc=3)
    tmp = tmp_path_factory.mktemp("ts_v10")
    path = _export_and_compare(yolo, tmp)
    return yolo, path


def test_torchscript_v10_parity(v10_ts):
    _, path = v10_ts
    assert path.endswith(".torchscript")


def test_torchscript_lpc_parity(tmp_path):
    """The fork's namesake graph: space_to_depth / SPDConv / SPCA / LPC / CBAM
    (strided-slice gathers + maxpool + attention all in one trace)."""
    _export_and_compare(YOLO("yolov10-SPD-Conv-Tiny-CBAM-LPC.yaml", nc=3), tmp_path)


def test_autobackend_torchscript_runtime(v10_ts):
    """AutoBackend's torchscript row: LibTorch-format module + host top-k
    decode agree with the in-framework predict path."""
    from lpc_yolo_tpu.nn.autobackend import AutoBackend
    from lpc_yolo_tpu.ops.postprocess import v10_detections

    yolo, path = v10_ts
    backend = AutoBackend(path, imgsz=64)
    img = np.random.rand(1, 64, 64, 3).astype(np.float32)
    det = backend.forward(img)
    assert det.shape == (1, 300, 6)
    pred = yolo.model.apply(yolo.variables, jnp.asarray(img), training=False)["pred"]
    want = np.asarray(v10_detections(pred, 300, yolo.model.nc))
    np.testing.assert_allclose(det[:, :, 4], want[:, :, 4], atol=1e-3)  # scores
    assert (det[0, :, 5] == want[0, :, 5]).mean() > 0.99  # labels (ties tolerated)
