"""Device-mesh parallelism: sharding helpers for data-parallel (and future
model-parallel) training over ICI/DCN.

Replaces the reference's DDP machinery (utils/dist.py subprocess re-exec +
NCCL process groups, SURVEY.md §2.3): in the TPU design there is one program,
a jax.sharding.Mesh, and XLA inserts the gradient all-reduce.
"""

from .mesh import data_parallel_mesh, replicate, shard_batch

__all__ = ["data_parallel_mesh", "replicate", "shard_batch"]
