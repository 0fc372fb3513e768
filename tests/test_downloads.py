"""Download machinery against a loopback HTTP server (zero-egress env):
retry/backoff, min-size rejection, sha256 pinning, atomic .part rename,
zip extraction incl. the doubled-top-dir guard and zip-slip rejection,
and release-asset name resolution. Spec: reference utils/downloads.py.
"""

import io
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

import pytest

from lpc_yolo_tpu.utils.downloads import (
    attempt_download_asset,
    download,
    is_url,
    safe_download,
    unzip_file,
    url2file,
)


class _Handler(BaseHTTPRequestHandler):
    store = None  # {'files': {path: bytes}, 'fail_next': int, 'hits': []}

    def do_GET(self):
        self.store["hits"].append(self.path)
        if self.store.get("fail_next", 0) > 0:
            self.store["fail_next"] -= 1
            self.send_response(502)
            self.end_headers()
            return
        body = self.store["files"].get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    store = {"files": {}, "fail_next": 0, "hits": []}
    handler = type("H", (_Handler,), {"store": store})
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", store
    srv.shutdown()


def test_url_helpers():
    assert is_url("https://example.com/w.pt")
    assert not is_url("not a url")
    assert not is_url("weights/w.pt")
    assert url2file("https://example.com/a/b/yolov10n.pt?token=x") == "yolov10n.pt"


def test_safe_download_with_retry(server, tmp_path, monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    base, store = server
    store["files"]["/w.bin"] = b"x" * 1000
    store["fail_next"] = 2  # two 502s, then success
    out = safe_download(f"{base}/w.bin", dir=tmp_path, retry=3, progress=False)
    assert out.read_bytes() == b"x" * 1000
    assert len(store["hits"]) == 3
    assert not list(tmp_path.glob("*.part"))  # atomic rename, no leftovers


def test_safe_download_min_bytes_and_exhausted_retries(server, tmp_path, monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    base, store = server
    store["files"]["/tiny.bin"] = b"err"  # e.g. an HTML error page
    with pytest.raises(ConnectionError):
        safe_download(f"{base}/tiny.bin", dir=tmp_path, retry=1, min_bytes=100, progress=False)
    assert not (tmp_path / "tiny.bin").exists()


def test_safe_download_sha256(server, tmp_path, monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    base, store = server
    import hashlib

    store["files"]["/w.bin"] = b"payload"
    good = hashlib.sha256(b"payload").hexdigest()
    out = safe_download(f"{base}/w.bin", dir=tmp_path, sha256=good, progress=False)
    assert out.exists()
    with pytest.raises(ConnectionError):
        safe_download(f"{base}/w.bin", file="w2.bin", dir=tmp_path, sha256="0" * 64, retry=0, progress=False)


def _zip_bytes(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in members.items():
            z.writestr(name, data)
    return buf.getvalue()


def test_download_and_unzip_topdir(server, tmp_path):
    base, store = server
    store["files"]["/data.zip"] = _zip_bytes({"data/a.txt": "A", "data/sub/b.txt": "B"})
    (out,) = download(f"{base}/data.zip", dir=tmp_path, unzip=True, delete=True)
    assert out == tmp_path / "data"  # no data/data doubling
    assert (out / "sub/b.txt").read_text() == "B"
    assert not (tmp_path / "data.zip").exists()  # delete=True


def test_unzip_flat_archive_gets_stem_dir(tmp_path):
    p = tmp_path / "flat.zip"
    p.write_bytes(_zip_bytes({"a.txt": "A", "b.txt": "B"}))
    out = unzip_file(p)
    assert out == tmp_path / "flat"
    assert (out / "a.txt").read_text() == "A"


def test_unzip_rejects_zip_slip(tmp_path):
    p = tmp_path / "evil.zip"
    p.write_bytes(_zip_bytes({"../evil.txt": "x"}))
    with pytest.raises(ValueError):
        unzip_file(p)


def test_attempt_download_asset(server, tmp_path, monkeypatch):
    base, store = server
    store["files"]["/yolov10n.pt"] = b"W" * 64
    got = attempt_download_asset("yolov10n.pt", repo_url=base, release_dir=str(tmp_path / "weights"))
    assert Path(got).read_bytes() == b"W" * 64
    # second call resolves locally without a fetch
    hits = len(store["hits"])
    assert attempt_download_asset("yolov10n.pt", repo_url=base, release_dir=str(tmp_path / "weights")) == got
    assert len(store["hits"]) == hits
    # non-assets pass through untouched
    assert attempt_download_asset("yolov10n.yaml") == "yolov10n.yaml"
