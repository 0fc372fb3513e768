"""int8 post-training quantization of the deploy serving graph (nn/quant.py).

Reference parity: the torch reference deploys int8 via TFLite/TensorRT
calibration (reference engine/exporter.py:657-700 TRT int8, :845-880 TFLite
representative-dataset int8). Here the same PTQ contract runs natively on the
TPU serving graph: record pass captures per-site activation ranges, the
quantized pass runs eligible convs as int8 x int8 -> int32 on the MXU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpc_yolo_tpu.nn.compiler import build_model
from lpc_yolo_tpu.nn.quant import calibrate_serving

CFG = "lpc_yolo_tpu/cfg/models/v10/yolov10n.yaml"
IMGSZ = 128  # big enough that the >=64-channel stages exist at n-scale width


@pytest.fixture(scope="module")
def served():
    model = build_model(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    rng = np.random.RandomState(0)
    imgs = (rng.rand(2, IMGSZ, IMGSZ // 8, 24) * 255).astype(np.uint8)
    return model, variables, imgs


def _serve(model, variables, imgs_u8):
    """The WPACK uint8 serving trace (same as Predictor/Validator)."""
    from lpc_yolo_tpu.nn.fuse import fold_preprocess

    base = model.clone(deploy=True)

    @jax.jit
    def predict(v, x_u8):
        v = fold_preprocess(v, bgr=True)
        x = x_u8.astype(base.dtype)
        return base.apply(v, x, training=False, predict_only=True, input_layout="WPACK")["det"]

    return np.asarray(predict(variables, jnp.asarray(imgs_u8)))


def test_calibrate_records_positive_scales(served):
    model, variables, imgs = served
    scales = calibrate_serving(model, variables, [imgs])
    assert len(scales) > 0, "v10n at 128px must have >=64-channel quantizable convs"
    assert all(np.isfinite(s) and s >= 0 for s in scales)
    assert max(scales) > 0  # at least one site saw live activations


def test_int8_serving_agrees_with_bf16(served):
    """Decode agreement on fixed weights: the int8 graph's top detections
    match the f32 graph's within quantization tolerance."""
    model, variables, imgs = served
    scales = calibrate_serving(model, variables, [imgs])
    qmodel = model.clone(quant="int8", quant_scales=scales)

    det_f = _serve(model, variables, imgs)
    det_q = _serve(qmodel, variables, imgs)
    assert det_q.shape == det_f.shape
    # scores are sigmoid-bounded; random-init weights give a flat score field
    # so exact top-k ORDER is not stable, but score/box magnitudes must agree
    s_f, s_q = det_f[..., 4], det_q[..., 4]
    assert abs(float(s_f.mean()) - float(s_q.mean())) < 0.02
    assert float(np.abs(np.sort(s_f, axis=-1) - np.sort(s_q, axis=-1)).max()) < 0.05
    b_f, b_q = det_f[..., :4], det_q[..., :4]
    assert abs(float(b_f.mean()) - float(b_q.mean())) / (abs(float(b_f.mean())) + 1e-9) < 0.05


def test_build_model_quant_requires_deploy():
    with pytest.raises(ValueError, match="deploy"):
        build_model(CFG, quant="int8")


def test_missing_scales_raise(served):
    model, variables, imgs = served
    qmodel = model.clone(quant="int8", quant_scales=(1.0,))  # too few sites
    with pytest.raises(ValueError, match="calibrated scales"):
        _serve(qmodel, variables, imgs)


def test_facade_quantize_int8(tmp_path):
    """YOLO(...).quantize_int8(calib).predict(...) end-to-end."""
    import cv2

    from lpc_yolo_tpu import YOLO

    rng = np.random.RandomState(1)
    calib = tmp_path / "calib.jpg"
    cv2.imwrite(str(calib), (rng.rand(96, 128, 3) * 255).astype(np.uint8))

    yolo = YOLO(CFG)
    yolo.quantize_int8(str(calib), imgsz=IMGSZ, batch=1)
    assert yolo.model.quant == "int8"
    assert len(yolo.model.quant_scales) > 0
    res = yolo.predict((rng.rand(100, 140, 3) * 255).astype(np.uint8), imgsz=IMGSZ)
    assert len(res) == 1  # served through the quantized graph without error
