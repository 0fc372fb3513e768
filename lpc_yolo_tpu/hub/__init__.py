"""HUB client (reference ultralytics/hub/: auth, training sessions, model
upload, telemetry Events) with a real stdlib-HTTP transport.

API root comes from `ULTRALYTICS_HUB_API` (reference hub/utils.py:31); auth
is an `x-api-key` header. `smart_request` reproduces the reference's retry
semantics (session.py:211-275): bounded retries with 2**i exponential
backoff, retry only on 408/502/504, overall timeout budget. The transport is
urllib-only so it carries no dependency; in the zero-egress build it is
exercised against a loopback server (tests/test_hub.py).
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.error
import urllib.request
from collections import deque
from pathlib import Path
from typing import Any, Dict, Optional

HUB_API_ROOT = os.environ.get("ULTRALYTICS_HUB_API", "https://api.ultralytics.com")
RETRY_CODES = {408, 502, 504}


class Auth:
    """API-key auth holder (reference hub/auth.py)."""

    def __init__(self, api_key: str = ""):
        self.api_key = api_key

    @property
    def authenticated(self) -> bool:
        return bool(self.api_key)

    def headers(self) -> Dict[str, str]:
        return {"x-api-key": self.api_key} if self.api_key else {}


def login(api_key: str = "", save: bool = True) -> Auth:
    """Authenticate with an API key, persisting it to settings like the
    reference (`hub/__init__.py login` -> SETTINGS.update(api_key=...))."""
    import lpc_yolo_tpu

    key = api_key or lpc_yolo_tpu.settings.get("api_key", "")
    auth = Auth(key)
    if save and api_key:
        lpc_yolo_tpu.settings.update(api_key=api_key)
    return auth


def logout() -> None:
    """Clear the persisted API key (reference hub/__init__.py:logout)."""
    import lpc_yolo_tpu

    lpc_yolo_tpu.settings.update(api_key="")


def request(
    method: str,
    url: str,
    json_data: Optional[Dict] = None,
    data: Optional[bytes] = None,
    headers: Optional[Dict[str, str]] = None,
    timeout: float = 30.0,
):
    """One HTTP request via urllib; returns (status, body_bytes)."""
    hdrs = dict(headers or {})
    body = data
    if json_data is not None:
        body = json.dumps(json_data).encode()
        hdrs["Content-Type"] = "application/json"
    req = urllib.request.Request(url, data=body, headers=hdrs, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def smart_request(
    method: str,
    url: str,
    retry: int = 3,
    timeout: float = 30.0,
    thread: bool = False,
    **kw,
):
    """Request with the reference's retry loop (session.py:219-266): up to
    `retry` extra attempts, 2**i backoff, only for RETRY_CODES, bounded by a
    total `timeout` budget. thread=True fires it in a daemon thread."""

    def run():
        t0 = time.time()
        status, body = None, b""
        for i in range(retry + 1):
            if time.time() - t0 > timeout:
                break
            try:
                status, body = request(method, url, timeout=timeout, **kw)
            except Exception:  # noqa: BLE001 — connection errors retry like 5xx
                status, body = None, b""
            if status is not None and status < 300:
                return status, body
            if status is not None and status not in RETRY_CODES:
                return status, body
            if i < retry:
                time.sleep(2**i)
        return status, body

    if thread:
        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t
    return run()


class Events:
    """Anonymous telemetry queue (reference hub/utils.py Events) — disabled
    by default; when enabled, batches are POSTed at most every `rate_limit`
    seconds."""

    URL = "https://www.google-analytics.com/mp/collect"

    def __init__(self, enabled: bool = False, url: Optional[str] = None, rate_limit: float = 30.0):
        self.enabled = enabled
        self.url = url or self.URL
        self.rate_limit = rate_limit
        self.queue: deque = deque(maxlen=100)
        self.t = 0.0

    def __call__(self, event: str, **meta: Any) -> None:
        if not self.enabled:
            return
        self.queue.append({"name": event, "params": meta})
        now = time.time()
        if now - self.t < self.rate_limit:
            return
        payload = {"client_id": "lpc-yolo-tpu", "events": list(self.queue)}
        self.queue.clear()
        self.t = now
        smart_request("POST", self.url, json_data=payload, retry=0, thread=True)


events = Events()


class HUBTrainingSession:
    """Training session (reference hub/session.py): per-epoch metric upload
    with an offline retry queue, checkpoint upload with best/final flags.

    Endpoints (reference model API):
      POST {root}/v1/models/{id}/metrics   json {epoch: json-metrics, ...}
      POST {root}/v1/models/{id}/upload    octet-stream + query flags
    """

    def __init__(
        self,
        model_id: str = "",
        auth: Optional[Auth] = None,
        api_root: Optional[str] = None,
        offline: Optional[bool] = None,
    ):
        self.model_id = model_id
        self.auth = auth or Auth()
        self.api_root = (api_root or HUB_API_ROOT).rstrip("/")
        # zero-egress default: offline unless an explicit local/custom root
        self.offline = (
            offline
            if offline is not None
            else not (api_root or os.environ.get("ULTRALYTICS_HUB_API"))
        )
        self.metrics_queue: Dict[int, str] = {}
        self.uploaded: list = []

    def _url(self, tail: str) -> str:
        return f"{self.api_root}/v1/models/{self.model_id}/{tail}"

    def upload_metrics(self, epoch: int, metrics: Dict[str, float]) -> None:
        """Queue metrics; flush the whole queue (failed epochs retry later)."""
        self.metrics_queue[epoch] = json.dumps(metrics)
        if self.offline:
            return
        status, _ = smart_request(
            "POST",
            self._url("metrics"),
            json_data={"metrics": self.metrics_queue.copy()},
            headers=self.auth.headers(),
            retry=2,
        )
        if status is not None and status < 300:
            self.metrics_queue.clear()

    def upload_model(self, epoch: int, weights: str, is_best: bool = False, final: bool = False) -> None:
        entry = {"epoch": epoch, "weights": str(Path(weights)), "best": is_best, "final": final}
        self.uploaded.append(entry)
        if self.offline or not Path(weights).is_file():
            return
        blob = Path(weights).read_bytes()
        q = f"upload?epoch={epoch}&best={int(is_best)}&final={int(final)}"
        smart_request(
            "POST",
            self._url(q),
            data=blob,
            headers={**self.auth.headers(), "Content-Type": "application/octet-stream"},
            retry=10 if final else 2,
            timeout=3600 if final else 30,
            thread=not final,
        )
