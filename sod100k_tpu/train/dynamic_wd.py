"""Dynamic weight decay: the FLOPs-aware BN-gamma penalty, as a pure regularizer.

The reference implements this with forward hooks (Oct_bn_hook,
csnet.py:391-410) that accumulate, per ILBlock CBR batch-norm branch,

    0.5 * flop_weight(stage, branch) * sum_{n,c} |GAP(activation)|_{n,c} * gamma_c^2

with the GAP term detached, and adds ``AUTO.FLOPS.WEIGHT * total / batch_size``
to the loss while epoch < AUTO.FINETUNE (train.py:212-213). Channels whose
gamma decays to ~0 are pruned later.

In JAX the hook becomes data: ApplyCtx.gap collects the stop-gradient'd
|spatial-mean| vectors during the forward pass, and this module turns them
into a differentiable penalty on the BN scales. Gradients flow only to gamma,
exactly like the reference.

Flop weights (flops_hook, csnet.py:332-355): blocks are walked in module
order; group sizes are [stages[0]+1, stages[1], stages[2], stages[3]] (stage0
is folded into the first group) and the g-th group's CBRs get
expand^(len(stages)-1-g); within a CBR, branch k of B gets an extra
expand^(B-1-k).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..arch.layer_config import LayerConfig

_CBRS = ("conv1x1", "conv3x3_1", "conv3x3_2")


def flop_weight_map(lc: LayerConfig, expandflop: float = 2.0) -> dict[str, float]:
    """Map of BN path ('stage1.2.conv1x1.bns.0') -> flop weight."""
    weights: dict[str, float] = {}
    baseflop = expandflop ** (len(lc.stages) - 1)
    group_sizes = [lc.stages[0] + 1, lc.stages[1], lc.stages[2], lc.stages[3]]
    group, in_group = 0, 0
    for plan in lc.block_plans():
        entry = lc.entries[plan.entry]
        branches = len(entry.out_split)
        for cbr in _CBRS:
            init = baseflop * expandflop ** (branches - 1)
            for k in range(branches):
                if entry.out_split[k] != 0:
                    weights[f"{plan.stage}.{plan.index}.{cbr}.bns.{k}"] = init
                init /= expandflop
        in_group += 1
        if in_group == group_sizes[group]:
            baseflop /= expandflop
            group += 1
            in_group = 0
    return weights


def penalty(trainable: dict, gap: dict[str, jnp.ndarray],
            fw: dict[str, float], batch_size: int) -> jnp.ndarray:
    """0.5/batch * sum over hooked BNs of flop_w * sum(gap * gamma^2).

    ``gap`` entries are (N, C) per-sample spatial means (already
    stop-gradient'd); the sum over the batch axis then /batch matches the
    reference's get_flops()/batchsize (csnet.py:324-330, train.py:213).
    """
    total = jnp.zeros((), jnp.float32)
    for path, w in fw.items():
        if path not in gap:
            continue
        node = trainable
        for part in path.split("."):
            node = node[part]
        gamma = node["scale"].astype(jnp.float32)
        total = total + w * jnp.sum(gap[path] * jnp.square(gamma)[None, :])
    return 0.5 * total / batch_size
