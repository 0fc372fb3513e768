"""TritonRemoteModel tests against a local KServe-v2 stub server.

(The reference's own triton test spins a docker server, tests/
test_integrations.py:66; here a stdlib stub speaks the same REST protocol.)
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from lpc_yolo_tpu.utils.triton import TritonRemoteModel


class _Stub(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        assert self.path.endswith("/config")
        cfg = {
            "input": [{"name": "images", "data_type": "TYPE_FP32"}],
            "output": [{"name": "output0", "data_type": "TYPE_FP32"}],
        }
        body = json.dumps(cfg).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        hlen = int(self.headers["Inference-Header-Content-Length"])
        payload = self.rfile.read(n)
        meta = json.loads(payload[:hlen])
        blob = payload[hlen:]
        inp = meta["inputs"][0]
        arr = np.frombuffer(blob[: inp["parameters"]["binary_data_size"]], np.float32).reshape(inp["shape"])
        out = (arr * 2.0).astype(np.float32)  # the "model"
        ob = out.tobytes()
        header = json.dumps(
            {
                "outputs": [
                    {
                        "name": "output0",
                        "datatype": "FP32",
                        "shape": list(out.shape),
                        "parameters": {"binary_data_size": len(ob)},
                    }
                ]
            }
        ).encode()
        self.send_response(200)
        self.send_header("Inference-Header-Content-Length", str(len(header)))
        self.send_header("Content-Length", str(len(header) + len(ob)))
        self.end_headers()
        self.wfile.write(header + ob)


@pytest.fixture()
def stub_server():
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_triton_remote_model_roundtrip(stub_server):
    m = TritonRemoteModel(f"http://{stub_server}/yolov10n")
    assert m.endpoint == "yolov10n"
    assert m.input_names == ["images"] and m.output_names == ["output0"]
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    (y,) = m(x)
    np.testing.assert_allclose(y, x * 2.0)


def test_triton_grpc_requires_client(stub_server):
    with pytest.raises(ImportError):
        TritonRemoteModel(f"grpc://{stub_server}/model")
