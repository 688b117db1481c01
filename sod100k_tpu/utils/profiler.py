"""Params/FLOPs profiler + wall-clock meters (reference C19 equivalents).

The reference counts params/FLOPs with forward hooks and an analytic octconv
cost model (model/utils/parm_octconv_v2.py:13-234) and every driver prints
both at startup (train.py:93-96). Here XLA does the counting: jitted
``.lower().compile().cost_analysis()`` returns exact compiled FLOPs —
including fusion effects — which is *more* faithful to what actually executes
than hook arithmetic. ``simplesum`` keeps the reference facade (same call
shape, returns (params, flops)).

Also: jax.profiler trace capture helper and the AverageMeter used by drivers
for batch/data timing prints (train.py:333-348).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def count_params(params) -> int:
    """Trainable-equivalent parameter count (BN running stats excluded)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        if "mean" in name or "var" in name:
            continue
        total += int(np.prod(leaf.shape))
    return total


def compiled_flops(fn: Callable, *args) -> Optional[float]:
    """FLOPs of the compiled jitted fn on these args (None if unavailable)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def simplesum(apply_fn: Callable, params, inputsize=(224, 224, 3)) -> tuple[int, float]:
    """Reference `simplesum(model, inputsize, device)` facade
    (model/utils/simplesum_octconv.py:5-8): returns (n_params, flops) for a
    batch-1 forward at `inputsize` (H, W, C)."""
    import jax.numpy as jnp

    x = jnp.zeros((1, *inputsize), jnp.float32)
    flops = compiled_flops(apply_fn, params, x)
    return count_params(params), flops if flops is not None else float("nan")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class AverageMeter:
    """Running value/average (reference train.py:333-348)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class Timer:
    """Context-manager wall clock for FPS prints."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.t0
        return False
