"""Hub client surface (reference ultralytics/hub/: auth, training sessions,
model upload, telemetry Events).

This environment is zero-egress and the Ultralytics HUB service targets the
torch stack, so the client is a faithful *interface* with queuing semantics
but network sends disabled: callers get the same API (login, HUBTrainingSession
with metric/model upload queues) and can plug a transport later.
"""

from __future__ import annotations

import json
import time
from collections import deque
from pathlib import Path
from typing import Any, Dict, Optional


class Auth:
    """API-key auth holder (hub/auth.py). No network in this build."""

    def __init__(self, api_key: str = ""):
        self.api_key = api_key

    @property
    def authenticated(self) -> bool:
        return bool(self.api_key)


def login(api_key: str = "") -> Auth:
    return Auth(api_key)


class Events:
    """Anonymous telemetry queue (hub/utils.py Events) — disabled by default,
    events accumulate locally and are dropped unless a transport is attached."""

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.queue: deque = deque(maxlen=100)

    def __call__(self, event: str, **meta: Any) -> None:
        if self.enabled:
            self.queue.append({"event": event, "t": time.time(), **meta})


events = Events()


class HUBTrainingSession:
    """Training-session shim (hub/session.py:17): collects per-epoch metrics
    and checkpoint references with the reference's retry-queue semantics;
    `transport` (callable) may be attached to actually send."""

    def __init__(self, model_id: str = "", auth: Optional[Auth] = None, transport=None):
        self.model_id = model_id
        self.auth = auth or Auth()
        self.transport = transport
        self.metrics_queue: Dict[int, str] = {}
        self.uploaded: list = []

    def upload_metrics(self, epoch: int, metrics: Dict[str, float]) -> None:
        self.metrics_queue[epoch] = json.dumps(metrics)
        if self.transport:
            try:
                self.transport("metrics", {"epoch": epoch, "metrics": metrics})
                self.metrics_queue.pop(epoch, None)
            except Exception:  # noqa: BLE001 — retried next epoch like the reference
                pass

    def upload_model(self, epoch: int, weights: str, is_best: bool = False, final: bool = False) -> None:
        entry = {"epoch": epoch, "weights": str(Path(weights)), "best": is_best, "final": final}
        self.uploaded.append(entry)
        if self.transport:
            try:
                self.transport("model", entry)
            except Exception:  # noqa: BLE001
                pass
