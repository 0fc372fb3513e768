"""Multi-host initialization + control-plane helpers.

Behavioral spec: SURVEY.md §2.3/§5 — the reference's DDP machinery
(utils/dist.py subprocess re-exec, NCCL process group, rank broadcasts of the
AMP/stop flags, zero-first dataset-cache barrier) mapped to single-program
multi-host JAX:

  * jax.distributed.initialize()   <- torch.distributed.run + init_process_group
  * mesh over all global devices   <- DDP wrap; XLA psum over ICI/DCN <- allreduce
  * broadcast_one_to_all           <- dist.broadcast / broadcast_object_list
  * process-0 build + barrier      <- torch_distributed_zero_first
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX if requested via args/env; returns process_index.

    Safe no-op on a single host (the common case in this environment)."""
    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def broadcast_scalar(value: float, is_source: Optional[bool] = None) -> float:
    """Agree on a scalar across hosts (the stop-flag broadcast,
    trainer.py:458-462). Single-host: identity."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    import jax.numpy as jnp

    arr = multihost_utils.broadcast_one_to_all(jnp.asarray(value))
    return float(arr)


def sync_hosts(name: str = "barrier") -> None:
    """Global barrier (the zero-first cache barrier, torch_utils.py:37)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


@contextlib.contextmanager
def main_process_first(name: str = "cache"):
    """Process 0 runs the body first (dataset cache build), others wait —
    torch_distributed_zero_first semantics."""
    if is_main_process():
        yield
        sync_hosts(name)
    else:
        sync_hosts(name)
        yield
