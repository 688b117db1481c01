"""Multi-host (multi-process) SPMD support.

The reference is strictly single-process / single-GPU (SURVEY §5.8:
``os.environ["CUDA_VISIBLE_DEVICES"]``, train.py:28). The TPU-native scale-out
story has two tiers:

1. single-process, multi-device — ``parallel.mesh`` (1-D data / 2-D
   data x spatial meshes over ``jax.devices()``), which covers one host of a
   v5e slice and the virtual-CPU test mesh; and
2. **multi-host** — one process per host of a pod slice, coordinated through
   ``jax.distributed``, with ONE global mesh spanning every chip and XLA
   riding ICI/DCN for the collectives. This module is tier 2.

Design (the standard JAX multi-controller recipe):

- every process runs the SAME program (same jit closures, same mesh built
  from the globally-ordered ``jax.devices()``);
- feeds are assembled with ``jax.make_array_from_process_local_data``: each
  host materializes only ITS rows of the global batch and the runtime stitches
  the global ``jax.Array`` without any cross-host data movement;
- the host data pipelines are index-deterministic (crop/flip draws keyed on
  (seed, epoch, index) — data/pipeline.py), so every process derives the SAME
  global batch order independently and ``process_slice`` picks disjoint rows
  with no coordination;
- scalars read back by the drivers (losses, val MAE) come out of jit fully
  replicated, so ``float(...)`` works unchanged on every host.

Initialization is driven by environment variables so every CLI driver gains
multi-host support without new flags (cli/common.py:data_mesh_for calls
``init_from_env`` before building any mesh):

- ``SOD100K_MULTIHOST=auto`` — ``jax.distributed.initialize()`` with no
  arguments (TPU pod metadata supplies coordinator/count/id); or
- ``SOD100K_COORDINATOR=host:port`` + ``SOD100K_NUM_PROCESSES`` +
  ``SOD100K_PROCESS_ID`` — explicit (also how the CPU multi-process test
  harness launches, tests/test_multihost.py).

Constraint kept checked rather than assumed: the data axis must be the only
mesh axis that crosses process boundaries (a spatial axis spanning hosts would
need H-sliced host feeds; reject loudly instead of silently misfeeding).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .mesh import feed_sharding, replicate, shard_feed

_INITIALIZED = False


def init_from_env(log=print) -> bool:
    """Initialize jax.distributed from SOD100K_* env vars (idempotent).

    Returns True when running multi-process after the call. Must run before
    any backend-initializing jax call in the process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("SOD100K_COORDINATOR", "")
    auto = os.environ.get("SOD100K_MULTIHOST", "").lower() == "auto"
    if not (coord or auto):
        return False
    kwargs = {}
    if coord:
        try:
            kwargs = dict(
                coordinator_address=coord,
                num_processes=int(os.environ["SOD100K_NUM_PROCESSES"]),
                process_id=int(os.environ["SOD100K_PROCESS_ID"]),
            )
        except KeyError as e:
            raise SystemExit(
                f"SOD100K_COORDINATOR={coord} also needs "
                f"SOD100K_NUM_PROCESSES and SOD100K_PROCESS_ID (missing {e})")
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    log(f"multi-host: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global "
        f"devices")
    return jax.process_count() > 1


def is_multihost() -> bool:
    return jax.process_count() > 1


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this named barrier (coordination
    service RPC — no device collective involved). No-op single-process.

    Use before the FIRST dispatch of a program containing collectives when
    processes may be skewed by compilation: the backend's collective-context
    setup has its own short handshake timeout (measured ~30 s for the CPU
    gloo transport), so a process arriving minutes late — e.g. an XLA compile
    that missed the cache — fails the whole job without this.
    """
    if not is_multihost():
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        # jax.process_count() > 1 without a coordination client should be
        # impossible; if a jax upgrade moves the private client attribute,
        # fail loudly — a silently skipped barrier turns into data races on
        # shared-FS files and gloo rendezvous timeouts far from here.
        raise RuntimeError(
            "multi-host run but no coordination-service client found "
            "(jax._src.distributed.global_state.client is None); the "
            "barrier cannot be skipped safely")
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def compile_barrier(jitted, *args, name: str = "first-dispatch",
                    log=print) -> None:
    """AOT-compile a jitted program, then barrier — call right before the
    FIRST dispatch of any program containing collectives.

    The CPU gloo transport (and, less tightly, the TPU runtime) sets up its
    collective context at first *execution* with a short rendezvous timeout
    (measured ~30 s: ``GetKeyValue() timed out``). An XLA compile that misses
    the persistent cache easily exceeds that, so a process arriving at the
    rendezvous minutes after its peers kills the whole job. Compiling first
    (local, no transport traffic) and then meeting at a coordination-service
    barrier (600 s default) bounds the dispatch skew to RPC latency.

    No-op single-process. The subsequent real call hits the in-memory jit
    cache — nothing is compiled twice, and donated buffers are untouched
    (lowering never executes).
    """
    if not is_multihost():
        return
    jitted.lower(*args).compile()
    barrier("compile/" + name)


def is_primary() -> bool:
    """The one process that writes checkpoints/reports on a shared FS."""
    return jax.process_index() == 0


def process_slice(n: int) -> slice:
    """This process's contiguous rows of a length-``n`` global batch axis.

    Valid because meshes are built from the globally-ordered ``jax.devices()``
    (process-contiguous) with the data axis leading, so data shards owned by a
    process are a contiguous block of the batch. Checked per-mesh in
    check_mesh_process_layout.
    """
    nproc = jax.process_count()
    if n % nproc:
        raise ValueError(
            f"global batch {n} must divide evenly over {nproc} processes")
    per = n // nproc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def check_mesh_process_layout(mesh) -> None:
    """Reject meshes whose non-data axes cross process boundaries.

    Multi-host feeds slice the BATCH per process (process_slice); that is only
    the whole story when every other mesh axis (spatial) stays within one
    process. Also verifies the device order is process-contiguous so
    process_slice's contiguity assumption holds.
    """
    if not is_multihost():
        return
    procs = [d.process_index for d in mesh.devices.flat]
    if procs != sorted(procs):
        raise ValueError(
            "multi-host mesh devices must be process-contiguous in mesh "
            "order; build meshes from jax.devices() (parallel.mesh helpers)")
    # every row of the device grid along axis 0 (data) must live in 1 process
    grid = mesh.devices.reshape(mesh.devices.shape[0], -1)
    for row in grid:
        owners = {d.process_index for d in row}
        if len(owners) > 1:
            raise ValueError(
                f"mesh {dict(mesh.shape)} spreads a non-data axis across "
                f"processes {sorted(owners)}; with {jax.process_count()} "
                f"processes keep spatial <= {jax.local_device_count()} and "
                f"local devices divisible by it (data is the only axis that "
                f"may cross hosts)")


def local_slice_feed(batch: dict, n_global: int | None = None) -> dict:
    """Take this process's rows of a deterministic GLOBAL batch dict.

    Every feed array is batch-leading (images, targets, per-sample h/w), so
    one slice applies uniformly. No-op single-process.
    """
    if not is_multihost():
        return batch
    if n_global is None:
        n_global = next(len(v) for v in batch.values()
                        if isinstance(v, (np.ndarray, jax.Array)))
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and len(v) != n_global:
            raise ValueError(
                f"local_slice_feed: feed array {k!r} has leading dim "
                f"{len(v)} != global batch {n_global}; every feed array "
                "must be batch-leading (replicate non-batch arrays "
                "explicitly outside the feed)")
    sl = process_slice(n_global)
    return {k: (v[sl] if isinstance(v, (np.ndarray, jax.Array)) else v)
            for k, v in batch.items()}


def global_feed(batch: dict, mesh) -> dict:
    """Multi-host generalization of mesh.shard_feed: assemble global arrays
    from this process's LOCAL rows (after local_slice_feed). Single-process it
    is exactly shard_feed."""
    if not is_multihost():
        return shard_feed(batch, mesh)
    check_mesh_process_layout(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            sh = feed_sharding(mesh, np.ndim(v))
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        else:
            out[k] = v
    return out


def put_replicated(x, sharding):
    """device_put with a replicated sharding, multi-host safe (device_put
    cannot target non-addressable devices; every process supplies its full
    local copy instead)."""
    if not is_multihost():
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


# mesh.replicate is itself multi-host aware; re-exported for callers reading
# this module as the multi-host API surface.
replicate_global = replicate
