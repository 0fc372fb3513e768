"""Export tests: stablehlo round-trip, SavedModel/TFLite artifacts, gating."""

import numpy as np
import pytest

import jax.numpy as jnp

from lpc_yolo_tpu import YOLO
from lpc_yolo_tpu.engine.exporter import EXPORT_FORMATS, export_model, load_stablehlo


@pytest.fixture(scope="module")
def small_yolo():
    return YOLO("yolov10n.yaml", nc=3)


def test_stablehlo_roundtrip(small_yolo, tmp_path):
    path = export_model(small_yolo, fmt="stablehlo", imgsz=64, out_dir=tmp_path)
    fn = load_stablehlo(path)
    out = fn(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert np.asarray(out).shape == (1, 300, 6)


def test_ckpt_export(small_yolo, tmp_path):
    path = export_model(small_yolo, fmt="ckpt", imgsz=64, out_dir=tmp_path)
    assert path.endswith(".ckpt")


def test_facade_export_method(small_yolo, tmp_path):
    """YOLO.export() parity with reference Model.export (engine/model.py:561)."""
    path = small_yolo.export(format="stablehlo", imgsz=64, out_dir=tmp_path)
    assert path.endswith(".stablehlo")
    fn = load_stablehlo(path)
    assert np.asarray(fn(jnp.zeros((1, 64, 64, 3), jnp.float32))).shape == (1, 300, 6)


def test_facade_benchmark_method(small_yolo, tmp_path):
    rows = small_yolo.benchmark(imgsz=64, formats=["ckpt"], out_dir=str(tmp_path))
    assert rows and rows[0]["format"] == "ckpt" and rows[0]["status"] == "ok"


def test_unsupported_format_raises(small_yolo, tmp_path):
    with pytest.raises(NotImplementedError):
        export_model(small_yolo, fmt="engine", out_dir=tmp_path)
    with pytest.raises(ValueError):
        export_model(small_yolo, fmt="bogus", out_dir=tmp_path)


@pytest.mark.slow
def test_pb_export_and_autobackend(small_yolo, tmp_path):
    """Frozen-GraphDef export (reference exporter.py:808 'pb' flavor) loads
    back through AutoBackend and agrees with the live predict graph."""
    import tensorflow as tf  # noqa: F401  (skip naturally if missing)

    from lpc_yolo_tpu.nn.autobackend import AutoBackend

    path = export_model(small_yolo, fmt="pb", imgsz=64, out_dir=tmp_path)
    assert path.endswith(".pb")
    backend = AutoBackend(path, imgsz=64)
    assert backend.kind == "pb"
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    out = backend.forward(x)
    assert out.shape == (1, 300, 6)
    from lpc_yolo_tpu.engine.exporter import _predict_fn

    ref = np.asarray(_predict_fn(small_yolo.model, small_yolo.variables)(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.slow
def test_tflite_export(small_yolo, tmp_path):
    import tensorflow as tf  # noqa: F401  (skip naturally if missing)

    path = export_model(small_yolo, fmt="tflite", imgsz=64, out_dir=tmp_path)
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], np.zeros((1, 64, 64, 3), np.float32))
    interp.invoke()
    out = interp.get_tensor(interp.get_output_details()[0]["index"])
    assert out.shape == (1, 300, 6)
