"""2-D convolution wrappers (NHWC activations, HWIO weights).

The reference stores torch OIHW weights; interop transposes them once at load
time so the compute path never reshapes. ``weight_scale`` reproduces the
reference's Conv2dX100 trick — the stored weight is 1/100 of the effective
weight and the forward multiplies by 100 "for faster convergence"
(/root/reference/CSNet_training/model/conv2d.py:95-105). The scale lives in
the graph (not folded into the weight) so gradients and optimizer state see
the same parameterization as the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax


def conv2d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int | tuple[int, int] = 1,
    groups: int = 1,
    weight_scale: float = 1.0,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Convolution matching ``torch.nn.functional.conv2d`` on NHWC/HWIO.

    Accumulates in float32 (``preferred_element_type``) so bfloat16
    activations keep full-precision partial sums on the MXU.

    ``padding_mode="circular"`` reproduces the reference Conv2dX100 branch
    (conv2d.py:84-94, dead in every shipped config): wrap-pad by the torch
    expansion (left/top get (pad+1)//2, right/bottom pad//2) then convolve
    unpadded.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if padding_mode == "circular":
        x = jnp.pad(
            x,
            ((0, 0),
             ((padding[0] + 1) // 2, padding[0] // 2),
             ((padding[1] + 1) // 2, padding[1] // 2),
             (0, 0)),
            mode="wrap")
        padding = (0, 0)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    w = weight if weight_scale == 1.0 else weight * jnp.asarray(weight_scale, weight.dtype)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    # float32 inputs use full-precision MXU passes (parity with the reference).
    # bfloat16 inputs take the single-pass path: the TPU MXU accumulates bf16
    # products in f32 internally, and leaving the output dtype native keeps
    # the autodiff transpose dtypes consistent (an explicit f32
    # preferred_element_type + downcast breaks grad-of-conv under mixed
    # precision).
    f32 = x.dtype == jnp.float32
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32 if f32 else None,
    )
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def conv2d_x100(x, weight, bias=None, *, stride=1, padding=0, dilation=1,
                groups=1, padding_mode="zeros"):
    """Conv2dX100: effective weight = 100 * stored weight (conv2d.py:102-104)."""
    return conv2d(
        x, weight, bias,
        stride=stride, padding=padding, dilation=dilation, groups=groups,
        weight_scale=100.0, padding_mode=padding_mode,
    )
