"""HUB client transport against a loopback HTTP server.

Validates the reference session semantics (hub/session.py): metric queue
flush on success, queue retention on failure, model upload with flags, and
smart_request's retry-on-408/502/504 behavior.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from lpc_yolo_tpu.hub import Auth, HUBTrainingSession, smart_request


class _Handler(BaseHTTPRequestHandler):
    store = None  # set per-test: dict with 'requests' list and 'fail_next'

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self.store["requests"].append(
            {"path": self.path, "headers": dict(self.headers), "body": body}
        )
        if self.store.get("fail_next", 0) > 0:
            self.store["fail_next"] -= 1
            self.send_response(502)
            self.end_headers()
            return
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    store = {"requests": [], "fail_next": 0}
    handler = type("H", (_Handler,), {"store": store})
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", store
    srv.shutdown()


def test_metrics_flush_and_auth_header(server):
    root, store = server
    s = HUBTrainingSession("abc123", auth=Auth("key-1"), api_root=root, offline=False)
    s.upload_metrics(0, {"loss": 1.5, "mAP50": 0.2})
    assert s.metrics_queue == {}  # flushed on 200
    req = store["requests"][0]
    assert req["path"] == "/v1/models/abc123/metrics"
    headers = {k.lower(): v for k, v in req["headers"].items()}
    assert headers.get("x-api-key") == "key-1"
    payload = json.loads(req["body"])
    assert json.loads(payload["metrics"]["0"])["loss"] == 1.5


def test_metrics_queue_retained_on_failure_then_retried(server):
    root, store = server
    s = HUBTrainingSession("m", api_root=root, offline=False)
    store["fail_next"] = 10  # every attempt 502s
    s.upload_metrics(0, {"loss": 2.0})
    assert 0 in s.metrics_queue  # retained for next epoch
    store["fail_next"] = 0
    s.upload_metrics(1, {"loss": 1.0})
    assert s.metrics_queue == {}  # both flushed together
    payload = json.loads(store["requests"][-1]["body"])
    assert set(payload["metrics"]) == {"0", "1"}


def test_model_upload_final(server, tmp_path):
    root, store = server
    w = tmp_path / "best.ckpt"
    w.write_bytes(b"\x00weights\x01")
    s = HUBTrainingSession("m2", api_root=root, offline=False)
    s.upload_model(7, str(w), is_best=True, final=True)  # final -> synchronous
    req = store["requests"][-1]
    assert req["path"] == "/v1/models/m2/upload?epoch=7&best=1&final=1"
    assert req["body"] == b"\x00weights\x01"


def test_smart_request_retries_on_502(server):
    root, store = server
    store["fail_next"] = 1  # first attempt 502s, second succeeds
    status, _ = smart_request("POST", f"{root}/v1/models/x/metrics", json_data={}, retry=2)
    assert status == 200
    assert len(store["requests"]) == 2


def test_offline_default_queues_without_network():
    s = HUBTrainingSession("m3")  # no api_root, no env -> offline
    assert s.offline
    s.upload_metrics(0, {"loss": 3.0})
    assert 0 in s.metrics_queue
    s.upload_model(0, "/nonexistent.ckpt")
    assert s.uploaded[0]["epoch"] == 0
