"""Normalization + PReLU primitives (NHWC, channel-last).

Parameter dict conventions (one dict per norm/activation instance):

    batchnorm: {"scale": (C,), "offset": (C,), "mean": (C,), "var": (C,)}
    groupnorm: {"scale": (C,), "offset": (C,)}
    prelu:     {"alpha": (C,)}   (or scalar (1,))

Matching reference semantics:
- BatchNorm2d eval: y = (x - running_mean) / sqrt(running_var + 1e-5) * w + b
  (torch defaults; used throughout CSNet, csnet.py:1110-1120).
- BatchNorm2d train: batch statistics over (N, H, W); running stats updated
  with momentum 0.1 and *unbiased* batch variance (torch semantics).
- GroupNorm(32): CSF variant norm (CSF+Res2Net/networks/gOctConv.py:116-153).
- PReLU: per-channel negative slope (csnet.py:1117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def batchnorm_infer(x: jax.Array, p: dict) -> jax.Array:
    """Eval-mode batchnorm using running statistics; folds to one FMA."""
    inv = jax.lax.rsqrt(p["var"] + jnp.asarray(BN_EPS, p["var"].dtype))
    scale = (p["scale"] * inv).astype(x.dtype)
    shift = (p["offset"] - p["mean"] * p["scale"] * inv).astype(x.dtype)
    return x * scale + shift


def batchnorm_train(x: jax.Array, p: dict) -> tuple[jax.Array, dict]:
    """Train-mode batchnorm: normalize by batch stats, return updated running stats.

    Statistics are computed in float32 regardless of activation dtype. Under
    jit over a mesh with the batch sharded, GSPMD turns these jnp.mean
    reductions into cross-replica (global-batch) statistics automatically —
    verified equal to single-device math in tests/test_train.py (DP step
    equivalence); no explicit psum is needed or wanted here.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    # E[x^2]-E[x]^2 can go slightly negative under f32 cancellation (large
    # mean, tiny spread); clamp so rsqrt can't NaN-poison the running var
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (xf - mean) * (inv * p["scale"]) + p["offset"]
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - BN_MOMENTUM) * p["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * p["var"] + BN_MOMENTUM * unbiased,
    }
    return y.astype(x.dtype), new_stats


def groupnorm(x: jax.Array, p: dict, num_groups: int = 32) -> jax.Array:
    """GroupNorm over channel groups (CSF variant; torch GroupNorm semantics)."""
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS)
    y = y.reshape(n, h, w, c)
    return (y * p["scale"] + p["offset"]).astype(x.dtype)


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """PReLU with per-channel (or scalar) negative slope."""
    a = alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)
