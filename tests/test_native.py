"""Native C++ pre/post pipeline tests: build, letterbox/NMS parity, CLI demo."""

import shutil
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++ toolchain")


def test_build_and_letterbox_parity():
    from lpc_yolo_tpu.native import letterbox
    from lpc_yolo_tpu.ops.letterbox import letterbox_image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (211, 347, 3), np.uint8)
    a, ga, pa = letterbox(img, 320)
    b, gb, pb = letterbox_image(img, (320, 320))
    assert abs(ga - gb) < 1e-5
    assert pa == pb
    # bilinear rounding differs by at most 1 LSB from cv2
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_native_nms_matches_jax():
    from lpc_yolo_tpu.native import nms
    from lpc_yolo_tpu.ops.postprocess import non_max_suppression

    rng = np.random.RandomState(1)
    A, nc = 256, 4
    preds = np.concatenate(
        [rng.rand(1, A, 2) * 400, rng.rand(1, A, 2) * 60 + 10, rng.rand(1, A, nc) * 0.9], -1
    ).astype(np.float32)
    jout = np.asarray(non_max_suppression(jnp.asarray(preds), 0.25, 0.45, 300))
    jrows = jout[0][jout[0, :, 4] > 0]

    xy, wh, sc = preds[0, :, :2], preds[0, :, 2:4], preds[0, :, 4:]
    best, cls = sc.max(-1), sc.argmax(-1)
    m = best > 0.25
    cand = np.concatenate(
        [xy[m] - wh[m] / 2, xy[m] + wh[m] / 2, best[m, None], cls[m, None].astype(np.float32)], -1
    )
    nrows = nms(cand, 0.45, 300)
    assert len(nrows) == len(jrows)
    js = set(map(tuple, np.round(jrows[:, :4], 2)))
    ns = set(map(tuple, np.round(nrows[:, :4], 2)))
    assert js == ns


def test_decode_v8_head_layouts():
    from lpc_yolo_tpu.native import decode_v8_head

    A, nc = 16, 3
    v8 = np.zeros((4 + nc, A), np.float32)
    v8[:4, 0] = [50, 50, 20, 20]
    v8[4 + 1, 0] = 0.9  # class 1
    rows = decode_v8_head(v8, nc, conf=0.25)
    assert len(rows) == 1
    np.testing.assert_allclose(rows[0], [40, 40, 60, 60, 0.9, 1], atol=1e-5)

    v5 = np.zeros((A, 5 + nc), np.float32)
    v5[0, :4] = [50, 50, 20, 20]
    v5[0, 4] = 0.8  # objectness
    v5[0, 5 + 2] = 0.9
    rows = decode_v8_head(v5, nc, conf=0.25, v5_layout=True)
    assert len(rows) == 1
    assert abs(rows[0, 4] - 0.72) < 1e-5 and rows[0, 5] == 2


def test_demo_cli(tmp_path):
    from lpc_yolo_tpu.native import build_native

    lib = build_native()
    demo_bin = tmp_path / "demo"
    import lpc_yolo_tpu.native as native_mod

    src_dir = lib.parent
    subprocess.run(
        ["g++", "-O3", "-std=c++17", str(src_dir / "demo_main.cc"), str(lib), "-o", str(demo_bin),
         f"-Wl,-rpath,{src_dir}"],
        check=True,
    )
    img = np.random.RandomState(0).randint(0, 255, (100, 150, 3), np.uint8)
    ppm = tmp_path / "x.ppm"
    with open(ppm, "wb") as f:
        f.write(f"P6 150 100 255\n".encode())
        f.write(img.tobytes())
    out = subprocess.run([str(demo_bin), str(ppm), "320"], capture_output=True, text=True, check=True)
    assert "letterbox: 150x100 -> 320x320" in out.stdout
    assert "normalized" in out.stdout


@pytest.mark.slow
def test_tf_client_executes_exported_model(tmp_path):
    """The native client must RUN the exported SavedModel (image -> letterbox
    -> model -> detections, no Python) and agree with the JAX predict path
    (reference analog: examples/YOLOv8-CPP-Inference/inference.cpp:30-41)."""
    import cv2

    from lpc_yolo_tpu import YOLO
    from lpc_yolo_tpu.engine.exporter import export_model
    from lpc_yolo_tpu.native import build_tf_client

    rng = np.random.RandomState(7)
    img_bgr = rng.randint(0, 255, (80, 100, 3), np.uint8)
    cv2.rectangle(img_bgr, (20, 20), (60, 60), (255, 255, 255), -1)
    ppm = tmp_path / "img.ppm"
    with open(ppm, "wb") as f:
        f.write(b"P6\n100 80\n255\n")
        f.write(img_bgr[..., ::-1].tobytes())  # PPM stores RGB

    y = YOLO("yolov10n.yaml", nc=3)
    sm = export_model(y, fmt="saved_model", imgsz=64, out_dir=tmp_path)
    client = build_tf_client()
    out = subprocess.run(
        [str(client), sm, str(ppm), "64", "0.0"],
        capture_output=True, text=True, timeout=600, check=True,
    )
    rows = np.array([[float(v) for v in ln.split()] for ln in out.stdout.strip().splitlines()])
    assert rows.shape == (300, 6), f"client did not emit 300 detections:\n{out.stderr[-500:]}"

    # JAX reference path on the identical image
    res = y.predict(img_bgr, imgsz=64, conf=0.0, max_det=300)[0]
    jb = np.asarray(res.boxes.data)  # (300, 6) xyxy conf cls in original space
    order_c = np.lexsort((rows[:, 0], -rows[:, 4]))
    order_j = np.lexsort((jb[:, 0], -jb[:, 4]))
    a, b = rows[order_c][:20], jb[order_j][:20]
    np.testing.assert_allclose(a[:, 4], b[:, 4], atol=2e-3)  # confidences
    np.testing.assert_allclose(a[:, :4], b[:, :4], atol=1.5)  # boxes (px)
    assert (a[:, 5] == b[:, 5]).mean() > 0.9  # classes
