"""Spatial resampling primitives for octave feature sets (NHWC).

Semantics match the reference ops used inside gOctConv
(/root/reference/CSNet_training/model/csnet.py:1014-1076):

- coarse->fine paths upsample with bilinear interpolation, half-pixel centers
  (PyTorch ``F.interpolate(mode='bilinear', align_corners=False)``),
- fine->coarse paths downsample with non-overlapping max pooling,
- stride-2 convolutions average-pool their input first
  (``F.avg_pool2d(x, 2, stride=2)``).

All functions take and return NHWC arrays with static shapes so XLA can tile
them onto the VPU/MXU. Integer-factor bilinear upsampling is lowered to a
separable depthwise fractionally-strided convolution with constant taps —
one fused TPU op instead of the gather/matmul chains ``jax.image.resize``
emits. Edge clamping is reproduced exactly by a one-pixel replicate pad
(interpolation sources never reach further than one pixel out of range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _bilinear_taps(factor: int) -> tuple[float, ...]:
    """Symmetric 2*factor-tap filter for x`factor` half-pixel bilinear upsampling.

    Output pixel o = factor*q + p samples input at ``(o + 0.5)/factor - 0.5``;
    relative to input q the two source offsets are rel and rel+1 with weights
    (1-frac, frac). Tap index is ``p - factor*rel + factor//2``, which for even
    factors lands in [0, 2*factor). (e.g. factor 2 -> [1,3,3,1]/4,
    factor 4 -> [1,3,5,7,7,5,3,1]/8.)
    """
    assert factor % 2 == 0, "octave scale factors are powers of two"
    taps = np.zeros(2 * factor, dtype=np.float64)
    for p in range(factor):
        src = (p + 0.5) / factor - 0.5
        rel = int(np.floor(src))
        frac = src - rel
        taps[p - factor * rel + factor // 2] += 1.0 - frac
        taps[p - factor * (rel + 1) + factor // 2] += frac
    return tuple(taps.tolist())


def _upsample_1d(x: jax.Array, factor: int, axis: int) -> jax.Array:
    """Depthwise fractionally-strided conv along one spatial axis of NHWC."""
    c = x.shape[-1]
    taps = _bilinear_taps(factor)
    k = len(taps)
    pad = [(0, 0), (0, 0)]
    pad[axis - 1] = (factor // 2 - 1, factor // 2 - 1)
    if axis == 1:
        kern = jnp.asarray(taps, x.dtype).reshape(k, 1, 1, 1)
        lhs_dil = (factor, 1)
        edge_pad = ((0, 0), (1, 1), (0, 0), (0, 0))
    else:
        kern = jnp.asarray(taps, x.dtype).reshape(1, k, 1, 1)
        lhs_dil = (1, factor)
        edge_pad = ((0, 0), (0, 0), (1, 1), (0, 0))
    kern = jnp.broadcast_to(kern, kern.shape[:3] + (c,))
    xp = jnp.pad(x, edge_pad, mode="edge")
    dn = lax.conv_dimension_numbers(xp.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    return lax.conv_general_dilated(
        xp, kern, window_strides=(1, 1), padding=pad,
        lhs_dilation=lhs_dil, dimension_numbers=dn, feature_group_count=c,
        precision=precision,
    )


@functools.partial(jax.jit, static_argnums=(1,), inline=True)
def upsample_bilinear(x: jax.Array, factor: int) -> jax.Array:
    """Bilinear x`factor` upsample, NHWC, align_corners=False (half-pixel).

    Matches ``torch.nn.functional.interpolate(scale_factor=factor,
    mode='bilinear')`` (reference csnet.py:1055-1057) including edge clamping.
    """
    if factor == 1:
        return x
    return _upsample_1d(_upsample_1d(x, factor, axis=1), factor, axis=2)


@functools.partial(jax.jit, static_argnums=(1,), inline=True)
def max_pool(x: jax.Array, factor: int) -> jax.Array:
    """Non-overlapping max pool (kernel = stride = factor), NHWC.

    Matches ``F.max_pool2d(x, k, stride=k)`` (reference csnet.py:1059-1062);
    trailing rows/cols that do not fill a window are dropped (floor mode).
    """
    if factor == 1:
        return x
    # scalar init values keep lax on the monoid-specialized (differentiable)
    # reduce_window primitives
    init = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, init, lax.max,
        (1, factor, factor, 1), (1, factor, factor, 1), "VALID",
    )


@functools.partial(jax.jit, static_argnums=(1,), inline=True)
def avg_pool(x: jax.Array, factor: int = 2) -> jax.Array:
    """Non-overlapping average pool, NHWC.

    Matches ``F.avg_pool2d(x, (2,2), stride=2)`` used for stride-2 gOctConv
    (reference csnet.py:1030).
    """
    if factor == 1:
        return x
    s = lax.reduce_window(
        x, 0.0, lax.add,
        (1, factor, factor, 1), (1, factor, factor, 1), "VALID",
    )
    return s / jnp.asarray(factor * factor, x.dtype)


def max_pool_torch(x: jax.Array, kernel: int, stride: int, padding: int) -> jax.Array:
    """torch nn.MaxPool2d(kernel, stride, padding) with floor output shape
    (Res2Net stem pool, csf_res2net.py:128)."""
    return lax.reduce_window(
        x, -float("inf"), lax.max,
        (1, kernel, kernel, 1), (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool_torch(
    x: jax.Array, kernel: int, stride: int, padding: int = 0,
    ceil_mode: bool = False, count_include_pad: bool = True,
) -> jax.Array:
    """torch nn.AvgPool2d semantics incl. ceil_mode + count_include_pad
    (Bottle2neck stage pool / downsample, csf_res2net.py:52,149-151).

    ceil_mode adds right/bottom padding to cover a final partial window;
    count_include_pad=False divides by the true element count per window.
    """
    n, h, w, c = x.shape

    def out_len(size):
        eff = size + 2 * padding - kernel
        out = (-(-eff // stride) if ceil_mode else eff // stride) + 1
        if ceil_mode and (out - 1) * stride >= size + padding:
            # torch drops the last window when it would start entirely in
            # the right/bottom padding (pooling docs; bites stride > kernel)
            out -= 1
        return out

    oh, ow = out_len(h), out_len(w)
    extra_h = max(0, (oh - 1) * stride + kernel - (h + 2 * padding))
    extra_w = max(0, (ow - 1) * stride + kernel - (w + 2 * padding))
    pads = ((0, 0), (padding, padding + extra_h), (padding, padding + extra_w), (0, 0))
    win, strides = (1, kernel, kernel, 1), (1, stride, stride, 1)
    s = lax.reduce_window(x, 0.0, lax.add, win, strides, pads)
    if count_include_pad:
        if not (extra_h or extra_w):
            return s / float(kernel * kernel)
        # divisor counts window ∩ padded input (ceil extension excluded)
        ones = jnp.ones((1, h + 2 * padding, w + 2 * padding, 1), x.dtype)
        cnt = lax.reduce_window(
            ones, 0.0, lax.add, win, strides,
            ((0, 0), (0, extra_h), (0, extra_w), (0, 0)),
        )
    else:
        # divisor counts window ∩ original input
        ones = jnp.ones((1, h, w, 1), x.dtype)
        cnt = lax.reduce_window(ones, 0.0, lax.add, win, strides, pads)
    return s / cnt


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize to an arbitrary (H, W), NHWC, half-pixel centers.

    Used for the final logit upsample back to input resolution
    (reference csnet.py:382-385) and the CSF-flavor gOctConv's
    ``F.interpolate(size=...)`` paths (CSF+Res2Net/networks/gOctConv.py:98-103).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if oh % h == 0 and ow % w == 0 and oh // h == ow // w and oh // h in (2, 4, 8):
        return upsample_bilinear(x, oh // h)
    return jax.image.resize(x, (n, oh, ow, c), method="linear", antialias=False)
