"""CSNet: ~100K-parameter salient-object-detection network, functional JAX.

Graph structure mirrors the reference CSNet (csnet.py:209-387): a stage0 stem
ILBlock, four stages of ILBlocks ([3,4,6,4] by default, stride-2 opening
stages 2-4), a Cross-Stage-Fusion head over the branch-0 outputs of stages
2/3/4 treated as a 3-octave set, a 1x1 classifier conv, and a bilinear upsample
back to input resolution.

Params are a nested dict pytree whose keys mirror the reference's module names
(stage1.0.conv1x1.conv.weight -> params["stage1"]["0"]["conv1x1"]["conv"]
["kernel"]), making checkpoint interop a pure key mapping and channel pruning a
pure gather. Conv weights are HWIO; activations NHWC.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from ..ops.goct import ApplyCtx, goct_cbr, pall_ms_block, simplified_goct_cbr
from ..ops.resample import resize_bilinear
from .layer_config import Entry, LayerConfig

# cumulative downsampling at the input of the deepest TRUE strided conv:
# stages 2-4 open with stride-2 single-branch CBRs (layer_config.py:99), so
# the stage-4 opener sees H/4 (multi-branch stride-2 gOctConvs avg-pool
# instead of striding, ops/goct.py:122, and are exempt); spatial-sharding
# validity checks key off this (parallel.mesh.check_spatial_extent)
DEEPEST_STRIDE2_FACTOR = 4


# --------------------------------------------------------------------------
# initialization (matches torch kaiming_uniform_(a=sqrt(5)) + module defaults)
# --------------------------------------------------------------------------

def _kaiming_uniform(key, kh, kw, cin, cout, groups=1, dtype=jnp.float32):
    """torch's default conv init: uniform(+-sqrt(1/fan_in)), fan_in=cin/groups*kh*kw
    (conv2d.py:73-78, csnet.py:1006-1012)."""
    fan_in = (cin // groups) * kh * kw
    # fan_in == 0 happens on aggressively-pruned configs where a surviving
    # MS/dil row's input branch was fully pruned (the apply path propagates
    # that branch as None); the kernel is then 0-sized and any bound works
    bound = math.sqrt(1.0 / fan_in) if fan_in else 0.0
    return jax.random.uniform(key, (kh, kw, cin // groups, cout), dtype,
                              minval=-bound, maxval=bound)


def _bn_init(c, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "offset": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def _prelu_init(c, dtype=jnp.float32):
    return {"alpha": jnp.full((c,), 0.25, dtype)}


def _cbr_init(key, e_in, e_out, kernel, dtype=jnp.float32):
    cin, cout = sum(e_in), sum(e_out)
    p = {"conv": {"kernel": _kaiming_uniform(key, kernel, kernel, cin, cout, dtype=dtype)},
         "bns": {}, "prelus": {}}
    for j, c in enumerate(e_out):
        if c:
            p["bns"][str(j)] = _bn_init(c, dtype)
            p["prelus"][str(j)] = _prelu_init(c, dtype)
    return p


def _sgocbr_init(key, split, dtype=jnp.float32):
    p = {"convs": {}, "bns": {}, "prelus": {}}
    keys = jax.random.split(key, max(len(split), 1))
    for i, c in enumerate(split):
        if c:
            p["convs"][str(i)] = {
                "kernel": _kaiming_uniform(keys[i], 3, 3, c, c, groups=c, dtype=dtype)
            }
            p["bns"][str(i)] = _bn_init(c, dtype)
            p["prelus"][str(i)] = _prelu_init(c, dtype)
    return p


def _ilblock_init(key, entry: Entry, kernel: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1x1": _cbr_init(k1, entry.in_split, entry.out_split, kernel, dtype),
        "conv3x3_1": _sgocbr_init(k2, entry.out_split, dtype),
        "conv3x3_2": _sgocbr_init(k3, entry.out_split, dtype),
    }


def _msblock_init(key, cin, dil_split, dtype=jnp.float32):
    cout = sum(dil_split)
    p = {"msconv": {}, "bn": _bn_init(cout, dtype), "prelu": _prelu_init(cout, dtype)}
    keys = jax.random.split(key, len(dil_split))
    for i, c in enumerate(dil_split):
        if c:
            p["msconv"][str(i)] = {
                "kernel": _kaiming_uniform(keys[i], 3, 3, cin, c, dtype=dtype)
            }
    return p


def csnet_init(key: jax.Array, lc: LayerConfig, dtype=jnp.float32) -> dict:
    """Fresh CSNet parameters with torch-equivalent init distributions."""
    params: dict = {"stage0": {}, "stage1": {}, "stage2": {}, "stage3": {},
                    "stage4": {}}
    plans = lc.block_plans()
    keys = jax.random.split(key, len(plans) + 4)
    for p_i, plan in enumerate(plans):
        params[plan.stage][str(plan.index)] = _ilblock_init(
            keys[p_i], lc.entries[plan.entry], plan.kernel, dtype
        )
    kf, km, k1, kc = keys[len(plans):]
    fuse, ms, f1 = lc.fuse, lc.ms, lc.fuse1x1
    head = {
        "fuse": _cbr_init(kf, fuse.in_split, fuse.out_split, 1, dtype),
        "ms": {"convs": {}},
        "fuse1x1": _cbr_init(k1, f1.in_split, f1.out_split, 1, dtype),
    }
    mkeys = jax.random.split(km, len(ms.dil_split))
    for i, ds in enumerate(ms.dil_split):
        if max(ds) != 0:
            head["ms"]["convs"][str(i)] = _msblock_init(
                mkeys[i], ms.in_split[i], ds, dtype
            )
    params["oct_fuse"] = head
    cout = f1.out_channels
    ck1, ck2 = jax.random.split(kc)
    bound = math.sqrt(1.0 / cout)
    params["cls_layer"] = {
        "kernel": _kaiming_uniform(ck1, 1, 1, cout, 1, dtype=dtype),
        "bias": jax.random.uniform(ck2, (1,), dtype, minval=-bound, maxval=bound),
    }
    return params


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _ilblock_apply(ctx, path, p, entry: Entry, plan, xset):
    """ILBlock: leading CBR + two depthwise simplified CBRs (csnet.py:72-76)."""
    y = goct_cbr(
        ctx, f"{path}.conv1x1", p["conv1x1"], xset,
        in_split=entry.in_split, out_split=entry.out_split,
        stride=plan.stride, padding=plan.padding,
    )
    if ctx.pallas and not ctx.train and not ctx.collect_gap:
        from ..ops.pallas.dw_chain import dw_tail_fused

        return dw_tail_fused(p["conv3x3_1"], p["conv3x3_2"], y,
                             entry.out_split)
    y = simplified_goct_cbr(ctx, f"{path}.conv3x3_1", p["conv3x3_1"], y,
                            split=entry.out_split)
    y = simplified_goct_cbr(ctx, f"{path}.conv3x3_2", p["conv3x3_2"], y,
                            split=entry.out_split)
    return y


def csnet_apply(
    params: dict,
    x: jax.Array,
    lc: LayerConfig,
    ctx: Optional[ApplyCtx] = None,
) -> jax.Array:
    """CSNet forward: NHWC image batch -> NHWC saliency logits at input size.

    Mirrors CSNet.forward (csnet.py:365-387). ``ctx`` carries train-mode flags
    and collects BN stats / dynamic-weight-decay GAP signals.
    """
    if ctx is None:
        ctx = ApplyCtx()
    plans = lc.block_plans()
    stage_out: dict[str, list] = {}
    feat = [x]
    for plan in plans:
        path = f"{plan.stage}.{plan.index}"
        feat = _ilblock_apply(
            ctx, path, params[plan.stage][str(plan.index)],
            lc.entries[plan.entry], plan, feat,
        )
        stage_out[plan.stage] = feat

    # CSF head over branch-0 features of stages 2/3/4 as a 3-octave set
    # (csnet.py:380): strides 2/4/8 relative to the input.
    fuse_in = [stage_out["stage2"][0], stage_out["stage3"][0],
               stage_out["stage4"][0]]
    h = params["oct_fuse"]
    y = goct_cbr(ctx, "oct_fuse.fuse", h["fuse"], fuse_in,
                 in_split=lc.fuse.in_split, out_split=lc.fuse.out_split,
                 stride=1, padding=0)
    y = pall_ms_block(ctx, "oct_fuse.ms", h["ms"], y, dil_splits=lc.ms.dil_split)
    y = goct_cbr(ctx, "oct_fuse.fuse1x1", h["fuse1x1"], y,
                 in_split=lc.fuse1x1.in_split, out_split=lc.fuse1x1.out_split,
                 stride=1, padding=0)

    logits = conv2d(y[0], params["cls_layer"]["kernel"],
                    params["cls_layer"]["bias"])
    return resize_bilinear(logits, x.shape[1:3])


def count_params(params) -> int:
    """Trainable-equivalent parameter count (excludes BN running stats),
    matching the reference's `sum(p.nelement() for p in model.parameters())`
    (csnet.py:945)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        if "mean" in name or "var" in name:
            continue
        total += int(np.prod(leaf.shape))
    return total
