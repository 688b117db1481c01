"""Device mesh + sharding helpers (the reference is single-device; this is the
TPU-native replacement: data parallelism over ICI via jax.sharding, with XLA
inserting the collectives).

The flagship recipe shards the batch over a 1-D "data" axis and replicates the
~100K-parameter model — at CSNet scale, gradient all-reduce over ICI is
negligible next to the conv work, so pure DP is the speed-of-light layout.
Batch-stat normalization under jit+NamedSharding computes *global* batch
statistics automatically (XLA turns the mean over the sharded batch axis into
a psum), which generalizes the reference's single-device BN faithfully.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding for image/target arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
