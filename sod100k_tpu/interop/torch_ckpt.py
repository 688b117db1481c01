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
    """Convert a reference state_dict into our nested param pytree.

    Two passes: build the raw nested tree (4-D weights transposed to HWIO
    "kernel"; the CSF gOctConv's plural ``weights`` included), then classify
    each module node *structurally*:

    - has running_mean  -> BatchNorm: weight/bias/running_* -> scale/offset/mean/var
    - 1-D weight + bias -> affine norm without stats (GroupNorm) -> scale/offset
    - 1-D weight alone  -> PReLU -> alpha
    - kernel (+bias)    -> convolution, names kept

    Works for CSNet, the CSF head, and the Res2Net backbone (incl. Sequential
    stem / downsample indices).
    """
    params: dict = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        arr = _to_numpy(tensor).astype(dtype)
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            leaf = "kernel"
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = arr

    def classify(node: dict) -> None:
        for v in node.values():
            if isinstance(v, dict):
                classify(v)
        leaves = {k for k, v in node.items() if not isinstance(v, dict)}
        if "running_mean" in leaves:
            for old, new in _BN_RENAME.items():
                if old in node:
                    node[new] = node.pop(old)
        elif leaves == {"weight", "bias"} and node["weight"].ndim == 1:
            node["scale"] = node.pop("weight")
            node["offset"] = node.pop("bias")
        elif leaves == {"weight"} and node["weight"].ndim == 1:
            node["alpha"] = node.pop("weight")

    classify(params)
    return params


# The CSF gOctConv names its dense weight `weights` (gOctConv.py:21). These
# exact module paths exist only at the top level of the CSF model (CSNet's
# head lives under `oct_fuse.`), so the inverse conversion emits the plural
# form for them — keeping pytree_to_state_dict a true inverse for CSF trees
# (a strict reference load would otherwise leave fuse/fuse1x1 at random
# init with no error under the reference's strict=False style).
_CSF_PLURAL_WEIGHT_MODULES = ("fuse.conv", "fuse1x1.conv")


def pytree_to_state_dict(params: dict) -> dict:
    """Convert our pytree back to a reference-layout state_dict (numpy values).

    Inverse of :func:`state_dict_to_pytree` (including the CSF gOctConv
    plural-``weights`` naming); BN ``num_batches_tracked`` entries
    are not synthesized (the reference loads with them present but they do not
    affect inference).
    """
    flat: dict[str, np.ndarray] = {}
    inv_bn = {v2: k2 for k2, v2 in _BN_RENAME.items()}

    def walk(node, prefix):
        for k, v in node.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
                continue
            arr = np.asarray(v)
            if k == "kernel":
                wname = ("weights" if prefix in _CSF_PLURAL_WEIGHT_MODULES
                         else "weight")
                flat[f"{prefix}.{wname}" if prefix else wname] = (
                    arr.transpose(3, 2, 0, 1)
                )
            elif k == "alpha":
                flat[f"{prefix}.weight" if prefix else "weight"] = arr
            elif k in ("scale", "offset", "mean", "var"):
                name = inv_bn[k]
                flat[f"{prefix}.{name}" if prefix else name] = arr
            else:
                flat[path] = arr

    walk(params, "")
    return flat


def load_pretrained(params: dict, path: str, dtype=np.float32) -> dict:
    """Key-intersection partial load (reference utils/utils.py:6-25): leaves
    present in both trees with matching shapes are taken from the checkpoint,
    everything else keeps the current value."""
    loaded, _ = load_checkpoint(path, dtype=dtype)

    def overlay(cur: dict, new: dict) -> dict:
        out = {}
        for k, v in cur.items():
            if k in new and isinstance(v, dict) and isinstance(new[k], dict):
                out[k] = overlay(v, new[k])
            elif (k in new and not isinstance(v, dict)
                  and getattr(new[k], "shape", None) == getattr(v, "shape", None)):
                out[k] = new[k]
            else:
                out[k] = v
        return out

    return overlay(params, loaded)


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
