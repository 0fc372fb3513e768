"""Automatic batch-size selection from compiled memory analysis.

Behavioral spec: reference ultralytics/utils/autobatch.py:13-70 — find the
batch that fits a fraction (default 60%) of accelerator memory. CUDA's
empirical try-and-OOM probing becomes exact on TPU: XLA's ahead-of-time
`compiled.memory_analysis()` reports the program's peak temp+argument bytes
without running it, so the search never risks an OOM.
"""

from __future__ import annotations

from typing import Callable

import jax


def device_memory_bytes(device=None) -> int:
    """Best-effort accelerator memory limit (bytes)."""
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    # v5e default: 16 GB HBM per chip
    return 16 * 1024**3


def program_memory_bytes(fn: Callable, *args) -> int:
    """Peak memory of the compiled program for `fn(*args)` (AOT, no execution)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return -1
    total = 0
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes", "output_size_in_bytes", "generated_code_size_in_bytes"):
        total += int(getattr(ma, attr, 0) or 0)
    return total


def autobatch(
    make_fn: Callable[[int], tuple],
    max_batch: int = 128,
    fraction: float = 0.60,
    device=None,
    verbose: bool = True,
) -> int:
    """Largest power-of-two batch whose compiled program fits `fraction` of HBM.

    Args:
        make_fn: batch_size -> (fn, example_args) for the training/predict step.
    """
    limit = int(device_memory_bytes(device) * fraction)
    best = 1
    b = 1
    while b <= max_batch:
        fn, args = make_fn(b)
        used = program_memory_bytes(fn, *args)
        if verbose:
            print(f"autobatch: batch={b} peak={used / 1e9:.2f} GB (limit {limit / 1e9:.2f} GB)")
        if used < 0 or used > limit:
            break
        best = b
        b *= 2
    return best
