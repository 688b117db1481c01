"""PyTorch checkpoint interop: reference .pth.tar state_dicts <-> JAX pytrees.

The reference saves ``{'epoch','arch','state_dict','optimizer'}`` dicts
(train.py:171-181) with module-path keys like
``stage1.2.conv1x1.bns.0.running_mean``. Because our param pytree mirrors the
reference's module naming, conversion is a pure per-key rename + layout
transpose:

    conv weights   OIHW -> HWIO            (torch -> TPU-friendly layout)
    bn weight/bias/running_mean/running_var -> scale/offset/mean/var
    prelu weight   -> alpha
    cls_layer / conv weight -> kernel
    num_batches_tracked     -> dropped

This module is the parity lynchpin called out in SURVEY.md §7.3: loading the
two shipped checkpoints through here must reproduce the reference saliency
maps to MAE <= 1e-3 (verified by tests/test_model_parity.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np

_BN_RENAME = {
    "weight": "scale",
    "bias": "offset",
    "running_mean": "mean",
    "running_var": "var",
}


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def state_dict_to_pytree(state_dict: dict[str, Any], dtype=np.float32) -> dict:
    """Convert a reference CSNet state_dict into our nested param pytree."""
    params: dict = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        arr = _to_numpy(tensor).astype(dtype)
        parent = parts[:-1]
        # classify the leaf
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            new_leaf = "kernel"
        elif leaf in _BN_RENAME and (
            parent and (parent[-1].isdigit() and len(parent) >= 2 and parent[-2] in ("bns",))
            or (parent and parent[-1] in ("bn",))
        ):
            new_leaf = _BN_RENAME[leaf]
        elif leaf == "weight" and parent and (
            (parent[-1].isdigit() and len(parent) >= 2 and parent[-2] == "prelus")
            or parent[-1] == "prelu"
        ):
            new_leaf = "alpha"
        elif leaf == "bias":
            new_leaf = "bias"
        elif leaf == "weight":
            # 1-D/2-D non-norm weights (none expected in CSNet, keep name)
            new_leaf = "weight"
        else:
            new_leaf = _BN_RENAME.get(leaf, leaf)
        node = params
        for p in parent:
            node = node.setdefault(p, {})
        node[new_leaf] = arr
    return params


def pytree_to_state_dict(params: dict, torch_module=None) -> dict:
    """Convert our pytree back to a reference-layout state_dict (numpy values).

    Inverse of :func:`state_dict_to_pytree`; BN ``num_batches_tracked`` entries
    are not synthesized (the reference loads with them present but they do not
    affect inference).
    """
    flat: dict[str, np.ndarray] = {}

    def walk(node, prefix):
        for k, v in node.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
                continue
            arr = np.asarray(v)
            if k == "kernel":
                flat[f"{prefix}.weight" if prefix else "weight"] = (
                    arr.transpose(3, 2, 0, 1)
                )
            elif k == "alpha":
                flat[f"{prefix}.weight"] = arr
            elif k in ("scale", "offset", "mean", "var"):
                inv = {v2: k2 for k2, v2 in _BN_RENAME.items()}
                flat[f"{prefix}.{inv[k]}"] = arr
            else:
                flat[path] = arr

    walk(params, "")
    return flat


def load_checkpoint(path: str, dtype=np.float32) -> tuple[dict, dict]:
    """Load a reference .pth.tar; returns (param pytree, metadata dict).

    Accepts both the training-driver format {'epoch','arch','state_dict',...}
    (train.py:174-181) and bare state_dicts (CSF solver.py:121).
    """
    import torch  # local import: torch is interop-only, never on the TPU path

    ck = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ck, dict) and "state_dict" in ck:
        meta = {k: v for k, v in ck.items() if k != "state_dict"}
        sd = ck["state_dict"]
    else:
        meta, sd = {}, ck
    return state_dict_to_pytree(sd, dtype=dtype), meta
