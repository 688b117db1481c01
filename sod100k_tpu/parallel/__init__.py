"""Mesh / sharding helpers for data and data x spatial parallelism."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["DATA_AXIS", "batch_sharding", "make_mesh", "replicate",
           "replicated", "shard_batch"]
