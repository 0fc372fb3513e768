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


def data_parallel_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("data",))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in a batch pytree along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
