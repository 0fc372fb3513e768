"""Mesh construction + sharding utilities.

The reference is data-parallel only (SURVEY.md §2.3): DDP over NCCL with
per-rank DistributedSampler shards. TPU-native equivalent: a 1-D 'data' mesh
over all chips; the batch axis is sharded, params are replicated, and the
SPMD partitioner turns the grad contraction into a psum over ICI. A 'model'
axis is reserved for future tensor-parallel experiments.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(
    devices: Optional[Sequence[jax.Device]] = None, batch_size: Optional[int] = None
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    If batch_size is given, uses the largest device count that divides it so
    the batch axis shards evenly (small debug batches on big meshes just use
    fewer devices instead of erroring).
    """
    devices = list(devices) if devices is not None else jax.devices()
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n:
            n -= 1
        devices = devices[:n]
    return Mesh(np.array(devices), axis_names=("data",))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in a batch pytree along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
