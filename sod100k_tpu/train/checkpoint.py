"""Native checkpointing via Orbax (TPU-side of reference C25).

The drivers write reference-format .pth.tar checkpoints for interop; this
module adds an Orbax path for fast native save/restore of the full training
state (trainable, bn/frozen state, optax state, epoch) — sharded-array-aware
and atomic, the right tool for long multi-chip runs. Layer configs stay in
the reference's pickle format next to the step dirs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_native(path: str, trainable, state, opt_state, epoch: int) -> None:
    """Atomic Orbax save of the full train state under `path` (a directory)."""
    payload = {
        "trainable": trainable,
        "state": state,
        "opt_state": opt_state,
        "epoch": np.int64(epoch),
    }
    _ckptr().save(os.path.abspath(path), payload, force=True)


def restore_native(path: str, like: Optional[dict] = None) -> dict:
    """Restore a save_native checkpoint.

    `like` (same-structure pytree of arrays) restores with matching
    shardings/dtypes. Without `like`, leaves restore as host numpy arrays —
    explicit RestoreArgs built from the checkpoint metadata, so Orbax never
    has to guess (or warn about) device shardings; callers re-place the
    tree with the current topology's shardings (the drivers' replicate()).
    That is exactly the multi-topology resume story: restore is
    placement-free, placement is the live mesh's job."""
    import orbax.checkpoint as ocp

    ckptr = _ckptr()
    path = os.path.abspath(path)
    if like is not None:
        restore_args = jax.tree.map(
            lambda a: ocp.ArrayRestoreArgs(sharding=getattr(a, "sharding", None)),
            like,
        )
        return ckptr.restore(path, restore_args=restore_args)
    md = ckptr.metadata(path)
    # orbax >= 0.6 wraps the pytree metadata in StepMetadata.item_metadata
    tree = getattr(getattr(md, "item_metadata", md), "tree", None)
    if tree is None:
        tree = md
    restore_args = jax.tree.map(
        lambda _meta: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)
