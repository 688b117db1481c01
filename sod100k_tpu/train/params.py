"""Parameter pytree partitioning: trainable leaves vs. non-trainable state.

The reference keeps BN running statistics inside module buffers; our pytree
holds everything together, so training splits it into (trainable, state) with
identical nesting and merges them inside the loss. State = BN running
mean/var; everything else (conv kernels, BN scale/offset, PReLU alphas, biases)
is trainable, matching ``model.parameters()`` in torch.
"""

from __future__ import annotations

from typing import Callable

STATE_LEAVES = ("mean", "var")


def partition(params: dict) -> tuple[dict, dict]:
    """Split nested dict into (trainable, state); empty dicts are dropped."""
    trainable: dict = {}
    state: dict = {}

    def walk(node, t_out, s_out):
        for k, v in node.items():
            if isinstance(v, dict):
                t_sub: dict = {}
                s_sub: dict = {}
                walk(v, t_sub, s_sub)
                if t_sub:
                    t_out[k] = t_sub
                if s_sub:
                    s_out[k] = s_sub
            elif k in STATE_LEAVES:
                s_out[k] = v
            else:
                t_out[k] = v

    walk(params, trainable, state)
    return trainable, state


def merge(trainable: dict, state: dict) -> dict:
    """Inverse of :func:`partition` (state wins on key conflicts — none exist)."""
    out: dict = {}

    def copy_into(node, dst):
        for k, v in node.items():
            if isinstance(v, dict):
                copy_into(v, dst.setdefault(k, {}))
            else:
                dst[k] = v

    copy_into(trainable, out)
    copy_into(state, out)
    return out


def update_state(state: dict, bn_stats: dict[str, dict]) -> dict:
    """Fold ApplyCtx.bn_stats ({'stage0.0.conv1x1.bns.0': {'mean','var'}})
    into a new state tree (pure; original untouched)."""
    import copy

    new_state = copy.deepcopy(state) if not bn_stats else _shallow_clone(state)
    for path, stats in bn_stats.items():
        node = new_state
        for part in path.split("."):
            node = node[part]
        node["mean"] = stats["mean"]
        node["var"] = stats["var"]
    return new_state


def _shallow_clone(node: dict) -> dict:
    return {
        k: _shallow_clone(v) if isinstance(v, dict) else v for k, v in node.items()
    }


def map_with_path(fn: Callable[[str, object], object], tree: dict, prefix: str = "") -> dict:
    """tree_map that exposes dotted paths (for masks and penalties)."""
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        out[k] = map_with_path(fn, v, path) if isinstance(v, dict) else fn(path, v)
    return out
