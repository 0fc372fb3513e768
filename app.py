"""Interactive detection demo (reference app.py:1-184).

The reference renders with Gradio. Gradio is not bundled in this environment,
so the demo has two equivalent frontends over the same predict API:

  * :func:`build_demo` — the Gradio Blocks UI, used when gradio is installed
    (same layout as the reference: image input, confidence + image-size
    sliders, annotated output).
  * :func:`run_stdlib_demo` — a dependency-free stdlib HTTP app
    (ThreadingHTTPServer + one embedded HTML page) exposing the same
    controls; `python app.py` always serves something.

Endpoints of the stdlib app (loopback-tested in tests/test_app.py):

    GET  /             single-page client (file picker, conf/imgsz sliders)
    GET  /api/info     model name + class names
    POST /api/predict  {"image": <base64 jpg/png>, "conf": f, "imgsz": n}
                       -> {"image": <base64 annotated jpg>, "boxes": [...]}
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>LPC-YOLO TPU demo</title>
<style>
body { font-family: system-ui, sans-serif; margin: 0; background: #111; color: #eee; }
header { padding: 10px 16px; background: #1b1b1b; }
header h1 { font-size: 16px; margin: 0; }
main { display: flex; gap: 16px; padding: 16px; flex-wrap: wrap; }
.panel { background: #1b1b1b; border-radius: 8px; padding: 16px; min-width: 320px; flex: 1; }
label { display: block; margin: 10px 0 4px; font-size: 13px; color: #9ca3af; }
input[type=range] { width: 100%; }
button { margin-top: 12px; padding: 8px 16px; background: #2563eb; color: #fff; border: 0; border-radius: 4px; cursor: pointer; }
img { max-width: 100%; border-radius: 4px; }
#status { color: #9ca3af; font-size: 13px; margin-top: 8px; min-height: 18px; }
</style></head><body>
<header><h1>LPC-YOLO / YOLOv10 — TPU-native detection</h1></header>
<main>
  <div class="panel">
    <label>input image</label><input id="file" type="file" accept="image/*">
    <label>confidence: <span id="confv">0.25</span></label>
    <input id="conf" type="range" min="0" max="1" step="0.01" value="0.25"
           oninput="confv.textContent=this.value">
    <label>image size: <span id="szv">640</span></label>
    <input id="sz" type="range" min="224" max="1280" step="32" value="640"
           oninput="szv.textContent=this.value">
    <button onclick="detect()">Detect</button>
    <div id="status"></div>
  </div>
  <div class="panel"><label>detections</label><img id="out"></div>
</main>
<script>
async function detect() {
  const f = document.getElementById('file').files[0];
  if (!f) { status.textContent = 'pick an image first'; return; }
  status.textContent = 'running...';
  const b64 = await new Promise(res => {
    const r = new FileReader();
    r.onload = () => res(r.result.split(',')[1]);
    r.readAsDataURL(f);
  });
  const resp = await fetch('/api/predict', {method: 'POST',
    body: JSON.stringify({image: b64, conf: +conf.value, imgsz: +sz.value})});
  const j = await resp.json();
  if (j.error) { status.textContent = j.error; return; }
  document.getElementById('out').src = 'data:image/jpeg;base64,' + j.image;
  status.textContent = j.boxes.length + ' detections, ' + j.speed_ms.toFixed(1) + ' ms';
}
</script></body></html>"""


def build_demo(model_name: str = "yolov10n.yaml"):
    """Gradio Blocks UI (requires gradio; reference app.py layout)."""
    import gradio as gr

    from lpc_yolo_tpu import YOLO

    model = YOLO(model_name)

    def predict_image(image: np.ndarray, conf: float, imgsz: int):
        if image is None:
            return None
        bgr = image[..., ::-1]  # gradio gives RGB
        r = model.predict(np.ascontiguousarray(bgr), conf=conf, imgsz=int(imgsz))[0]
        return r.plot()[..., ::-1]

    with gr.Blocks(title="LPC-YOLO TPU") as demo:
        gr.Markdown("## LPC-YOLO / YOLOv10 — TPU-native detection")
        with gr.Row():
            with gr.Column():
                inp = gr.Image(type="numpy", label="input")
                conf = gr.Slider(0.0, 1.0, value=0.25, label="confidence")
                imgsz = gr.Slider(224, 1280, value=640, step=32, label="image size")
                btn = gr.Button("Detect")
            out = gr.Image(type="numpy", label="detections")
        btn.click(predict_image, [inp, conf, imgsz], out)
    return demo


def make_stdlib_demo(model_name: str = "yolov10n.yaml", host: str = "127.0.0.1", port: int = 0):
    """Build (but don't block on) the stdlib HTTP demo; returns the server.

    Serve with `server.serve_forever()`; the bound port is
    `server.server_address[1]` (port=0 picks a free one, used by tests).
    """
    import cv2

    from lpc_yolo_tpu import YOLO

    model = YOLO(model_name)
    lock = threading.Lock()  # Predictor state (per-stage timers) isn't concurrent

    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/api/info":
                self._json({"model": model_name, "nc": model.model.nc,
                            "names": getattr(model, "names", None)})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path != "/api/predict":
                self._json({"error": "not found"}, 404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                raw = base64.b64decode(req["image"])
                img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
                if img is None:
                    raise ValueError("could not decode image")
                with lock:
                    r = model.predict(img, conf=float(req.get("conf", 0.25)),
                                      imgsz=int(req.get("imgsz", 640)))[0]
                annotated = r.plot()
                ok, jpg = cv2.imencode(".jpg", annotated)
                boxes = [
                    {"xyxy": [float(v) for v in b[:4]], "conf": float(b[4]), "cls": int(b[5])}
                    for b in np.asarray(r.boxes.data)
                ]
                speed = float(sum(v for v in (r.speed or {}).values() if v))
                self._json({"image": base64.b64encode(jpg.tobytes()).decode(),
                            "boxes": boxes, "speed_ms": speed})
            except Exception as e:  # noqa: BLE001 — surface errors to the client
                self._json({"error": f"{type(e).__name__}: {e}"}, 500)

        def log_message(self, *a):
            pass

    return ThreadingHTTPServer((host, port), Handler)


def run_stdlib_demo(model_name: str = "yolov10n.yaml", host: str = "127.0.0.1", port: int = 7860):
    server = make_stdlib_demo(model_name, host, port)
    print(f"LPC-YOLO demo: http://{host}:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    try:
        build_demo().launch()
    except ImportError:
        run_stdlib_demo()
