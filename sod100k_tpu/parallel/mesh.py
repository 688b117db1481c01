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
SPATIAL_AXIS = "spatial"

# Measured XLA GSPMD validity boundary (jax 0.9.0, virtual CPU mesh, f64
# probes — see docs/DESIGN.md §10 and
# tests/test_parallel.py::test_stride2_conv_spatial_shard_boundary):
# a TRUE strided conv whose input is sharded along a spatial axis silently
# computes a WRONG forward (rel-err up to 1.0, no error raised) when the
# input extent on that axis is <= 4; it is bit-exact at extent >= 6 for 2-
# and 4-way sharding. Pools (reduce_window fwd+bwd incl. select_and_scatter),
# bilinear up/resampling and dilated stride-1 convs measured exact at every
# probed extent (>= 2). Spatial sharding must therefore keep every stride-2
# conv input at >= this extent on the sharded axis.
MIN_STRIDE2_INPUT = 6


def check_spatial_extent(image_h: int, stride2_factor: int, spatial: int,
                         what: str = "model") -> None:
    """Reject H-sharded meshes that would enter the measured-broken GSPMD
    regime (silent wrong numerics, see MIN_STRIDE2_INPUT).

    ``stride2_factor`` is the model's cumulative downsampling at the input
    of its DEEPEST true strided conv: 16 for CSF+Res2Net (layer4's stride-2
    conv sees H/16), 4 for CSNet (the stage-4 opener sees H/4). The deepest
    feature (one more /2) must also hold at least one row per spatial shard.
    """
    if spatial <= 1:
        return
    deepest_in = image_h // stride2_factor
    need_h = stride2_factor * MIN_STRIDE2_INPUT
    if deepest_in < MIN_STRIDE2_INPUT:
        raise ValueError(
            f"spatial sharding of {what} at image height {image_h} is in the "
            f"measured-broken XLA GSPMD regime: the deepest stride-2 conv "
            f"input would be {deepest_in} rows (< {MIN_STRIDE2_INPUT}), where "
            f"sharded strided convs silently compute wrong values. Use "
            f"image height >= {need_h}, or a 1-D data mesh.")
    if image_h // (2 * stride2_factor) < spatial:
        raise ValueError(
            f"spatial sharding of {what} at image height {image_h} over "
            f"{spatial} shards leaves the deepest feature "
            f"({image_h // (2 * stride2_factor)} rows) with fewer rows than "
            f"shards; use at most {image_h // (2 * stride2_factor)} spatial "
            f"shards or a larger image.")


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(data: int, spatial: int) -> Mesh:
    """2-D data x spatial mesh: batch sharded over `data`, image H over
    `spatial` (GSPMD inserts the halo exchanges for convs/pools/resampling).
    This is the lever for small-batch recipes — e.g. the CSF 336^2
    batch-1 x iter_size-10 schedule (CSF+Res2Net/solver.py:104-110), where
    data parallelism alone cannot use a slice."""
    need = data * spatial
    devs = jax.devices()
    if len(devs) < need:
        raise ValueError(f"mesh shape {data}x{spatial} needs {need} devices, "
                         f"only {len(devs)} visible")
    return Mesh(np.asarray(devs[:need]).reshape(data, spatial),
                (DATA_AXIS, SPATIAL_AXIS))


def parse_mesh_shape(spec: str) -> tuple[int, int]:
    """'4x2' -> (4, 2) (data x spatial). Raises on malformed specs."""
    try:
        d, s = (int(v) for v in spec.lower().split("x"))
        if d < 1 or s < 1:
            raise ValueError
    except ValueError:
        raise ValueError(
            f"mesh shape must look like '4x2' (data x spatial, both >= 1), "
            f"got {spec!r}") from None
    return d, s


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding for image/target arrays."""
    return NamedSharding(mesh, P(axis))


def feed_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for a feed array of the given rank: batch on the data axis
    and, when the mesh has a spatial axis, H (axis 1) on the spatial axis
    for image-like arrays (rank >= 3). Rank-1/2 arrays (per-sample scalars,
    (N,2) hw pairs) shard on data only."""
    if SPATIAL_AXIS in mesh.shape and ndim >= 3:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def epoch_feed_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding to constrain image-like batches gathered ON DEVICE inside a
    resident epoch scan (data/resident.py `batch_sharding=`): batch on the
    data axis and, on a 2-D mesh, H on the spatial axis — so the per-step
    work inside the one-dispatch epoch uses the whole mesh instead of
    leaving the spatial axis idle. Exactly the image-like feed_sharding."""
    return feed_sharding(mesh, 3)


def shard_feed(batch: dict, mesh: Mesh) -> dict:
    """device_put every array in a feed dict with its feed_sharding."""
    return {k: (jax.device_put(v, feed_sharding(mesh, np.ndim(v)))
                if isinstance(v, (np.ndarray, jax.Array)) else v)
            for k, v in batch.items()}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree over the mesh. Multi-host safe: device_put cannot
    target non-addressable devices, so under multiple processes every process
    supplies its full local copy instead (parallel/multihost.py)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
