"""Sanity checks: imgsz validation, version parsing, precision sanity.

Behavioral spec: reference ultralytics/utils/checks.py — check_imgsz (stride
rounding), check_version, check_amp (bad-hardware precision probe). The AMP
probe becomes a bf16-vs-fp32 agreement test on a tiny conv (TPUs don't have
the broken-fp16 GPU families, but the tunnel/driver path deserves the same
sanity gate).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Union

from .infra import LOGGER


def check_imgsz(
    imgsz: Union[int, Sequence[int]], stride: int = 32, min_dim: int = 1, floor: int = 0
) -> Union[int, List[int]]:
    """Round image size up to a multiple of the max stride (checks.py check_imgsz)."""
    vals = [imgsz] if isinstance(imgsz, int) else list(imgsz)
    out = [max(int(-(-v // stride) * stride), max(floor, stride)) for v in vals]
    if out != vals:
        LOGGER.warning(f"imgsz {vals} must be multiple of stride {stride}; using {out}")
    return out[0] if isinstance(imgsz, int) and min_dim == 1 else out


def parse_version(v: str) -> tuple:
    return tuple(int(x) for x in re.findall(r"\d+", v)[:3] or (0,))


def check_version(current: str, required: str = "0.0.0", name: str = "version", hard: bool = False) -> bool:
    """current >= required (checks.py check_version, >= semantics only)."""
    ok = parse_version(current) >= parse_version(required)
    if not ok and hard:
        raise AssertionError(f"{name} {required} required, found {current}")
    return ok


def check_bf16() -> bool:
    """bf16 compute sanity probe — the analog of the reference's check_amp
    (checks.py check_amp): run a conv in fp32 and bf16, require agreement.
    Returns True if bf16 is safe (falls back to fp32 when not)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    try:
        x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 8).astype(np.float32))
        conv32 = nn.Conv(8, (3, 3), padding="SAME", dtype=jnp.float32)
        conv16 = nn.Conv(8, (3, 3), padding="SAME", dtype=jnp.bfloat16)
        v = conv32.init(jax.random.PRNGKey(0), x)
        a = conv32.apply(v, x)
        b = conv16.apply(v, x).astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        ok = rel < 0.05  # bf16 has ~3 decimal digits; 5% headroom
        if not ok:
            LOGGER.warning(f"bf16 sanity check failed (rel err {rel:.3f}); using fp32")
        return ok
    except Exception as e:  # noqa: BLE001
        LOGGER.warning(f"bf16 check errored ({e}); using fp32")
        return False
