"""Demo app: the dependency-free stdlib HTTP UI over the predict API
(reference app.py's Gradio demo; gradio is absent here so the fallback
frontend is the tested surface)."""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def demo_server():
    import app as demo_app

    server = demo_app.make_stdlib_demo("yolov10n.yaml", port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_demo_page_and_info(demo_server):
    page = urllib.request.urlopen(demo_server + "/").read().decode()
    assert "Detect" in page and "/api/predict" in page
    info = json.loads(urllib.request.urlopen(demo_server + "/api/info").read())
    assert info["model"] == "yolov10n.yaml"


def test_demo_predict_roundtrip(demo_server):
    img = (np.random.rand(80, 120, 3) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    payload = json.dumps(
        {"image": base64.b64encode(enc.tobytes()).decode(), "conf": 0.0, "imgsz": 64}
    ).encode()
    req = urllib.request.Request(demo_server + "/api/predict", data=payload, method="POST")
    resp = json.loads(urllib.request.urlopen(req).read())
    assert "error" not in resp
    annotated = cv2.imdecode(
        np.frombuffer(base64.b64decode(resp["image"]), np.uint8), cv2.IMREAD_COLOR
    )
    assert annotated.shape == img.shape  # plot() draws on the original frame
    assert isinstance(resp["boxes"], list)
    if resp["boxes"]:
        b = resp["boxes"][0]
        assert set(b) == {"xyxy", "conf", "cls"} and len(b["xyxy"]) == 4


def test_demo_predict_bad_image_errors(demo_server):
    payload = json.dumps({"image": base64.b64encode(b"junk").decode()}).encode()
    req = urllib.request.Request(demo_server + "/api/predict", data=payload, method="POST")
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTP 500")
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "error" in json.loads(e.read())
