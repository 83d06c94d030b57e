"""Parallelism (replaces the reference's nn.DataParallel — SURVEY.md §3.4).

No NCCL/scatter-gather translation: a jax.sharding.Mesh + NamedSharding on
the batch axis makes XLA insert the gradient psums over ICI.
"""

from nemar_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]
