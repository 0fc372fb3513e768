"""Explorer GUI: browser dashboard over the dataset :class:`Explorer`.

Behavioral spec: reference ultralytics/data/explorer/gui/dash.py (268 LoC) —
a dataset image grid, a SQL query form, similarity search from a selected
image, and embedding-build progress. The reference renders with Streamlit,
which is not in this environment, so the dashboard is a dependency-free
stdlib HTTP app (ThreadingHTTPServer + one embedded HTML/JS page) exposing
the same operations as JSON endpoints:

    GET  /                  the single-page client
    GET  /api/info          dataset name, size, class names
    GET  /api/images        image rows (idx, file, label names), paged
    GET  /api/sql?q=...     Explorer.sql_query rows
    GET  /api/similar?idx=  Explorer.get_similar neighbors
    GET  /api/progress      embedding-build progress in [0, 1]
    GET  /img/<idx>         JPEG thumbnail of dataset image <idx>

Launch from the CLI with `yolo explorer data=coco8.yaml` (reference:
cfg/__init__.py:412 handle_explorer) or via :func:`run_dash`.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>LPC-YOLO Explorer</title>
<style>
body { font-family: system-ui, sans-serif; margin: 0; background: #111; color: #eee; }
header { padding: 10px 16px; background: #1b1b1b; display: flex; gap: 12px; align-items: center; }
header h1 { font-size: 16px; margin: 0 16px 0 0; }
input[type=text] { flex: 1; padding: 6px 8px; background: #222; color: #eee; border: 1px solid #444; border-radius: 4px; }
button { padding: 6px 12px; background: #2563eb; color: white; border: 0; border-radius: 4px; cursor: pointer; }
#status { padding: 4px 16px; color: #9ca3af; font-size: 13px; min-height: 18px; }
#grid { display: grid; grid-template-columns: repeat(auto-fill, minmax(148px, 1fr)); gap: 8px; padding: 12px 16px; }
.card { background: #1b1b1b; border-radius: 6px; overflow: hidden; cursor: pointer; }
.card img { width: 100%; display: block; aspect-ratio: 1; object-fit: cover; }
.card .cap { padding: 4px 6px; font-size: 11px; color: #9ca3af; overflow: hidden; text-overflow: ellipsis; white-space: nowrap; }
</style></head><body>
<header>
  <h1>Explorer</h1>
  <input id="q" type="text" value="SELECT * FROM 'table' LIMIT 50"
         title="SQL query over the labels table">
  <button onclick="runSQL()">Query</button>
  <button onclick="loadGrid()">All images</button>
</header>
<div id="status"></div>
<div id="grid"></div>
<script>
const grid = document.getElementById('grid'), status = document.getElementById('status');
function render(rows, capFn) {
  grid.innerHTML = '';
  for (const r of rows) {
    const d = document.createElement('div'); d.className = 'card';
    d.innerHTML = `<img loading="lazy" src="/img/${r.idx}"><div class="cap">${capFn(r)}</div>`;
    d.onclick = () => similar(r.idx);
    grid.appendChild(d);
  }
}
async function loadGrid() {
  const j = await (await fetch('/api/images?limit=200')).json();
  status.textContent = `${j.total} images — click one for similar`;
  render(j.rows, r => r.labels.join(', ') || '(no labels)');
}
async function runSQL() {
  const q = document.getElementById('q').value;
  const j = await (await fetch('/api/sql?q=' + encodeURIComponent(q))).json();
  if (j.error) { status.textContent = 'SQL error: ' + j.error; return; }
  status.textContent = `${j.rows.length} rows`;
  render(j.rows, r => r.labels.join(', ') || '(no labels)');
}
async function similar(idx) {
  status.textContent = 'computing embeddings…';
  const poll = setInterval(async () => {
    const p = await (await fetch('/api/progress')).json();
    status.textContent = `computing embeddings… ${(p.progress * 100) | 0}%`;
  }, 300);
  const j = await (await fetch(`/api/similar?idx=${idx}&limit=24`)).json();
  clearInterval(poll);
  status.textContent = `images similar to #${idx}`;
  render(j.rows, r => r.similarity.toFixed(3));
}
loadGrid();
</script></body></html>"""


class ExplorerDash:
    """Serve an :class:`~lpc_yolo_tpu.data.explorer.Explorer` over HTTP."""

    def __init__(self, explorer):
        self.explorer = explorer
        self._by_file = {f: i for i, f in enumerate(explorer.dataset.im_files)}
        self._lock = threading.Lock()
        self.server: Optional[ThreadingHTTPServer] = None

    # -- JSON endpoint payloads (also the programmatic API the tests drive) --

    def info(self):
        ds = self.explorer.dataset
        return {
            "dataset": str(ds.img_path),
            "total": len(ds),
            "names": {int(k): str(v) for k, v in (ds.names or {}).items()},
        }

    def _row(self, idx):
        ds = self.explorer.dataset
        names = ds.names or {}
        cls = [int(c) for c in np.asarray(ds.labels[idx]["cls"]).flatten()]
        return {
            "idx": idx,
            "im_file": ds.im_files[idx],
            "labels": [str(names.get(c, c)) for c in cls],
        }

    def images(self, offset=0, limit=200):
        n = len(self.explorer.dataset)
        rows = [self._row(i) for i in range(offset, min(n, offset + limit))]
        return {"total": n, "rows": rows}

    def sql(self, query):
        rows = self.explorer.sql_query(query)
        for r in rows:
            r["idx"] = self._by_file.get(r["im_file"], -1)
            r.pop("cls", None)
        return {"rows": rows}

    def similar(self, idx, limit=24):
        with self._lock:  # one embedding build even under concurrent requests
            rows = self.explorer.get_similar(idx, limit=limit)
        for r in rows:
            r.update(self._row(r["idx"]), similarity=r["similarity"])
        return {"rows": rows}

    def thumbnail(self, idx, size=256):
        import cv2

        im = self.explorer.dataset.load_image(idx)
        h, w = im.shape[:2]
        s = size / max(h, w)
        if s < 1:
            im = cv2.resize(im, (max(1, int(w * s)), max(1, int(h * s))))
        ok, buf = cv2.imencode(".jpg", im)
        assert ok, "thumbnail encode failed"
        return buf.tobytes()

    # -- server plumbing --

    def _handler(self):
        dash = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet; the CLI prints the URL once
                pass

            def _send(self, body, ctype="application/json", code=200):
                if isinstance(body, (dict, list)):
                    body = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    if u.path == "/":
                        self._send(_PAGE.encode(), "text/html")
                    elif u.path == "/api/info":
                        self._send(dash.info())
                    elif u.path == "/api/images":
                        self._send(dash.images(int(q.get("offset", 0)), int(q.get("limit", 200))))
                    elif u.path == "/api/sql":
                        try:
                            self._send(dash.sql(q.get("q", "")))
                        except (ValueError, AssertionError) as e:
                            self._send({"error": str(e)})
                    elif u.path == "/api/similar":
                        self._send(dash.similar(int(q["idx"]), int(q.get("limit", 24))))
                    elif u.path == "/api/progress":
                        self._send({"progress": float(getattr(dash.explorer, "progress", 0.0))})
                    elif u.path.startswith("/img/"):
                        self._send(dash.thumbnail(int(u.path[5:])), "image/jpeg")
                    else:
                        self._send({"error": "not found"}, code=404)
                except Exception as e:  # keep the dashboard alive on bad input
                    self._send({"error": f"{type(e).__name__}: {e}"}, code=500)

        return Handler

    def start(self, host="127.0.0.1", port=0) -> int:
        """Start serving in a daemon thread; returns the bound port."""
        self.server = ThreadingHTTPServer((host, port), self._handler())
        threading.Thread(target=self.server.serve_forever, daemon=True).start()
        return self.server.server_address[1]

    def stop(self):
        if self.server is not None:
            self.server.shutdown()
            self.server.server_close()
            self.server = None


def run_dash(data: str, model: str = "yolov10n.yaml", host: str = "127.0.0.1",
             port: int = 8501, block: bool = True) -> ExplorerDash:
    """CLI entry: build an Explorer for `data` and serve the dashboard
    (reference handle_explorer, cfg/__init__.py:412; port matches the
    Streamlit default)."""
    from .explorer import Explorer

    dash = ExplorerDash(Explorer(data, model=model))
    bound = dash.start(host=host, port=port)
    from ..utils.infra import LOGGER

    LOGGER.info(f"Explorer dashboard: http://{host}:{bound}/")
    if block:  # pragma: no cover - interactive mode
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            dash.stop()
    return dash
