"""Channel pruning: BN-gamma thresholding -> slim layer_config -> weight gather.

Functional equivalent of the reference's finetune machinery
(/root/reference/CSNet_training/model/csnet.py):

- ``derive_pruned_config`` mirrors finetune_model (:821-879): walk the 21
  prunable layers (each ILBlock's leading CBR, then the CSF head's fuse /
  PallMS / fuse1x1), concatenate their per-branch BN gammas, zero channels with
  |gamma| < thres, and emit the new per-branch splits — including the MSBlock
  per-dilation remap (get_CSFHead_dliconf, :526-538) and the CSF fuse input
  re-stitch from the three stage-end widths (:857-865).
- ``gather_pruned_params`` mirrors build_model_with_weight + the per-module
  copiers (:571-818), but as pure channel gathers on the pytree: surviving
  output channels index the old tensors; input channels follow the previous
  layer's mask (the CSF fuse input mask is the concat of the three stage-end
  masks, :789-803).

An ILBlock's depthwise conv3x3_1/conv3x3_2 and their norms are sliced by the
same mask as its leading CBR's outputs (the splits are shared).
"""

from __future__ import annotations

import numpy as np

from ..arch.layer_config import Entry, LayerConfig

Mask = list[np.ndarray]  # per-branch 0/1 arrays


def _get(params: dict, path: str) -> dict:
    node = params
    for p in path.split("."):
        node = node[p]
    return node


def _layer_paths(lc: LayerConfig) -> list[str]:
    """Prunable-layer paths in the reference's module order."""
    paths = [f"{p.stage}.{p.index}.conv1x1" for p in lc.block_plans()]
    paths += ["oct_fuse.fuse", "oct_fuse.ms", "oct_fuse.fuse1x1"]
    return paths


def _collect_gammas(params: dict, lc: LayerConfig, path: str, entry: Entry) -> np.ndarray:
    """Concatenated BN gammas across branches, in branch order (csnet.py:836-841)."""
    node = _get(params, path)
    parts = []
    if path.endswith(".ms"):
        for j in range(len(entry.out_split)):
            if str(j) in node["convs"]:
                parts.append(np.asarray(node["convs"][str(j)]["bn"]["scale"]))
    else:
        for j in range(len(entry.out_split)):
            if str(j) in node["bns"]:
                parts.append(np.asarray(node["bns"][str(j)]["scale"]))
    return np.concatenate(parts)


def derive_pruned_config(
    params: dict, lc: LayerConfig, thres: float
) -> tuple[LayerConfig, list[Mask]]:
    """New slim LayerConfig + per-layer masks (split per branch)."""
    paths = _layer_paths(lc)
    n = len(lc.entries)
    new_entries: list[Entry | None] = [None] * n
    masks: list[Mask] = [None] * n  # type: ignore[list-item]
    stages = lc.stages

    for layer, path in enumerate(paths):
        entry = lc.entries[layer]
        gammas = _collect_gammas(params, lc, path, entry)
        mask_flat = (np.abs(gammas) >= thres).astype(np.int64)
        split_pts = np.cumsum(entry.out_split)[:-1]
        mask = np.split(mask_flat, split_pts)
        new_out = tuple(int(m.sum()) for m in mask)
        masks[layer] = mask
        if sum(new_out) == 0:
            # Neither the reference (csnet.py:836-853 builds torch convs
            # from the counts — a 0-channel conv is unrepresentable) nor
            # our apply can express a block with no surviving channels;
            # fail loudly instead of emitting a broken pytree.
            raise ValueError(
                f"pruning at thres={thres:g} leaves layer {layer} ({path}) "
                f"with ZERO surviving channels (max |gamma| = "
                f"{float(np.abs(gammas).max()):.3g}); lower FINETUNE.THRES "
                f"or keep at least one channel per block alive.")

        if layer == 0:
            new_in: tuple[int, ...] = (3,)
        elif layer == n - 3:  # CSF fuse: stage-end widths (csnet.py:857-865)
            side4 = sum(new_entries[layer - 1].out_split)
            side3 = sum(new_entries[layer - stages[3] - 1].out_split)
            side2 = sum(new_entries[layer - stages[3] - stages[2] - 1].out_split)
            new_in = (side2, side3, side4)
        else:
            new_in = new_entries[layer - 1].out_split

        dil = None
        if entry.dil_split is not None:  # PallMS remap (get_CSFHead_dliconf)
            dil = []
            for j, branch_dil in enumerate(entry.dil_split):
                offs = 0
                row = []
                for width in branch_dil:
                    row.append(int(mask[j][offs:offs + width].sum()))
                    offs += width
                dil.append(tuple(row))
            dil = tuple(dil)
        new_entries[layer] = Entry(new_in, new_out, dil)

    return LayerConfig(tuple(new_entries), stages), masks


def _idx(mask_parts) -> np.ndarray:
    return np.nonzero(np.concatenate(mask_parts))[0]


def _gather_bn(bn: dict, keep: np.ndarray) -> dict:
    """Gather surviving BN channels. Reference semantics (load_BN_weight,
    csnet.py:633-651): only weight/bias (scale/offset) are copied — the
    rebuilt model keeps FRESH running statistics (mean=0, var=1), which the
    finetune phase then re-estimates. Carrying the old gathered stats
    instead was a measured divergence: pruned-model forwards differed from
    the reference's before any finetuning."""
    out = {}
    for k, v in bn.items():
        a = np.asarray(v)
        if k == "mean":
            out[k] = np.zeros(len(keep), a.dtype)
        elif k == "var":
            out[k] = np.ones(len(keep), a.dtype)
        else:
            out[k] = a[keep]
    return out


def _gather_cbr(node: dict, in_keep: np.ndarray, mask: Mask) -> dict:
    out_keep = _idx(mask)
    kernel = np.asarray(node["conv"]["kernel"])[:, :, in_keep][:, :, :, out_keep]
    new = {"conv": {"kernel": kernel}, "bns": {}, "prelus": {}}
    if "bias" in node["conv"]:
        new["conv"]["bias"] = np.asarray(node["conv"]["bias"])[out_keep]
    for j, m in enumerate(mask):
        if str(j) not in node["bns"] or int(m.sum()) == 0:
            continue
        keep_j = np.nonzero(m)[0]
        new["bns"][str(j)] = _gather_bn(node["bns"][str(j)], keep_j)
        new["prelus"][str(j)] = {
            "alpha": np.asarray(node["prelus"][str(j)]["alpha"])[keep_j]
        }
    return new


def _gather_dw(node: dict, mask: Mask) -> dict:
    """SimplifiedGOctConvBR: depthwise per-branch kernels (C in HWIO dim 3)."""
    new = {"convs": {}, "bns": {}, "prelus": {}}
    for j, m in enumerate(mask):
        if str(j) not in node["convs"] or int(m.sum()) == 0:
            continue
        keep = np.nonzero(m)[0]
        new["convs"][str(j)] = {
            "kernel": np.asarray(node["convs"][str(j)]["kernel"])[:, :, :, keep]
        }
        new["bns"][str(j)] = _gather_bn(node["bns"][str(j)], keep)
        new["prelus"][str(j)] = {
            "alpha": np.asarray(node["prelus"][str(j)]["alpha"])[keep]
        }
    return new


def _gather_ms(node: dict, entry: Entry, in_mask: Mask, mask: Mask) -> dict:
    """PallMSBlock: per-branch MSBlock (dilated convs + whole-branch BN/PReLU)."""
    new = {"convs": {}}
    for j, branch_dil in enumerate(entry.dil_split):
        if str(j) not in node["convs"] or int(mask[j].sum()) == 0:
            continue
        ms = node["convs"][str(j)]
        in_keep = np.nonzero(in_mask[j])[0]
        out_keep = np.nonzero(mask[j])[0]
        nb = {"msconv": {},
              "bn": _gather_bn(ms["bn"], out_keep),
              "prelu": {"alpha": np.asarray(ms["prelu"]["alpha"])[out_keep]}}
        offs = 0
        for d, width in enumerate(branch_dil):
            dmask = mask[j][offs:offs + width]
            offs += width
            if str(d) not in ms["msconv"] or int(dmask.sum()) == 0:
                continue
            dkeep = np.nonzero(dmask)[0]
            k = np.asarray(ms["msconv"][str(d)]["kernel"])
            nb["msconv"][str(d)] = {"kernel": k[:, :, in_keep][:, :, :, dkeep]}
        new["convs"][str(j)] = nb
    return new


def gather_pruned_params(
    params: dict, lc: LayerConfig, masks: list[Mask]
) -> dict:
    """Rematerialize the slim parameter pytree by gathering surviving channels."""
    stages = lc.stages
    plans = lc.block_plans()
    new: dict = {s: {} for s in ("stage0", "stage1", "stage2", "stage3", "stage4")}

    for i, plan in enumerate(plans):
        block = params[plan.stage][str(plan.index)]
        in_keep = (np.arange(3) if i == 0 else _idx(masks[i - 1]))
        new[plan.stage][str(plan.index)] = {
            "conv1x1": _gather_cbr(block["conv1x1"], in_keep, masks[i]),
            "conv3x3_1": _gather_dw(block["conv3x3_1"], masks[i]),
            "conv3x3_2": _gather_dw(block["conv3x3_2"], masks[i]),
        }

    nb = lc.num_blocks
    fuse_in = [
        masks[nb - stages[3] - stages[2] - 1][0],
        masks[nb - stages[3] - 1][0],
        masks[nb - 1][0],
    ]
    head = params["oct_fuse"]
    new["oct_fuse"] = {
        "fuse": _gather_cbr(head["fuse"], _idx(fuse_in), masks[nb]),
        "ms": _gather_ms(head["ms"], lc.ms, masks[nb], masks[nb + 1]),
        "fuse1x1": _gather_cbr(head["fuse1x1"], _idx(masks[nb + 1]), masks[nb + 2]),
    }
    cls_keep = _idx(masks[nb + 2])
    new["cls_layer"] = {
        "kernel": np.asarray(params["cls_layer"]["kernel"])[:, :, cls_keep],
        "bias": np.asarray(params["cls_layer"]["bias"]),
    }
    return new


def prune(params: dict, lc: LayerConfig, thres: float) -> tuple[dict, LayerConfig, list[Mask]]:
    """One-call prune: returns (slim params, slim layer_config, masks)."""
    new_lc, masks = derive_pruned_config(params, lc, thres)
    new_params = gather_pruned_params(params, lc, masks)
    return new_params, new_lc, masks
