"""Optimizer + LR schedules replicating the reference training recipes.

Adam_dynamic_weight_decay (train.py:97-123): torch Adam, betas (0.9, 0.99),
eps 1e-8, L2-style weight decay added to the gradient *before* the moment
updates, with wd = 0 on the BN gammas of ILBlock conv1x1 / conv3x3_1 — the
reference lists 'conv3x3_1.bns' twice and never 'conv3x3_2.bns'
(train.py:102-104), so conv3x3_2 gammas keep normal decay; we reproduce that
by default and expose ``decay_conv3x3_2=False`` to fix it deliberately.
Only '...weight' parameters are exempted, i.e. BN scale — biases keep decay,
like the reference's `'weight' in pname` filter.

LR schedules: MultiStepLR with gamma 0.1 stepped at the *start* of every epoch
(train.py:152-157), so a milestone m takes effect when epoch+1 >= m; cosine
annealing for finetuning (finetune.py).
"""

from __future__ import annotations

import math
from typing import Sequence

import optax

from .params import map_with_path


def _wd_mask(trainable: dict, decay_conv3x3_2: bool = True) -> dict:
    """True where weight decay applies (reference group split, train.py:101-107)."""
    exempt_cbrs = ["conv1x1.bns", "conv3x3_1.bns"]
    if not decay_conv3x3_2:
        exempt_cbrs.append("conv3x3_2.bns")

    def decide(path: str, _leaf) -> bool:
        if "stage" in path and path.endswith(".scale"):
            if any(c in path for c in exempt_cbrs):
                return False
        return True

    return map_with_path(decide, trainable)


def make_adam_dwd(
    trainable: dict,
    weight_decay: float = 5e-3,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
    decay_conv3x3_2: bool = True,
) -> optax.GradientTransformation:
    """Adam with masked L2 decay; LR is applied by the caller per step, so the
    per-epoch schedule never forces recompilation."""
    mask = _wd_mask(trainable, decay_conv3x3_2)
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-1.0),  # caller multiplies by lr
    )


def make_adam(weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.99,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """Plain Adam (+uniform L2) for finetune / CSF training."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.extend([optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.scale(-1.0)])
    return optax.chain(*steps)


def make_sgd(momentum: float = 0.95, weight_decay: float = 0.0) -> optax.GradientTransformation:
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.extend([optax.trace(decay=momentum), optax.scale(-1.0)])
    return optax.chain(*steps)


def multistep_lr(base_lr: float, steps: Sequence[int], epoch: int,
                 gamma: float = 0.1) -> float:
    """torch MultiStepLR with the reference's step-at-epoch-start quirk."""
    drops = sum(1 for m in steps if epoch + 1 >= m)
    return base_lr * gamma**drops


def cosine_lr(base_lr: float, epoch: int, max_epochs: int,
              min_lr: float = 0.0) -> float:
    """torch CosineAnnealingLR(T_max=max_epochs) sampled per epoch."""
    t = min(epoch, max_epochs)
    return min_lr + 0.5 * (base_lr - min_lr) * (1 + math.cos(math.pi * t / max_epochs))
