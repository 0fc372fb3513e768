"""Checkpoint save/resume.

Behavioral spec: reference engine/trainer.py:479-506 (ckpt dict: epoch,
best_fitness, model/EMA weights, optimizer state, train_args, metrics) and
:633-685 (resume semantics). Storage is flax msgpack (single file, atomic
rename) — the functional analog of the torch pickle; the EMA params play the
reference's fp16-EMA role as the deploy/val weights.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
from flax import serialization


def save_checkpoint(path: Path, state, meta: Dict[str, Any]) -> None:
    """Serialize (train state pytree, json meta) atomically to `path`."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    blob = serialization.to_bytes(host_state)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        meta_b = json.dumps(meta).encode()
        f.write(len(meta_b).to_bytes(8, "little"))
        f.write(meta_b)
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: Path, template_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore a state pytree (shaped like `template_state`) + meta dict."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    state = serialization.from_bytes(template_state, blob)
    return state, meta
