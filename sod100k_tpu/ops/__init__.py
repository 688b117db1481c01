"""Functional TPU op layer: conv / resample / norm primitives + gOctConv family."""

from .conv import conv2d, conv2d_x100
from .goct import (
    ApplyCtx,
    goct_conv,
    goct_cbr,
    ms_block,
    pall_ms_block,
    simplified_goct_cbr,
)
from .norm import batchnorm_infer, batchnorm_train, groupnorm, prelu
from .resample import avg_pool, max_pool, resize_bilinear, upsample_bilinear

__all__ = [
    "ApplyCtx", "conv2d", "conv2d_x100", "goct_conv", "goct_cbr",
    "ms_block", "pall_ms_block", "simplified_goct_cbr",
    "batchnorm_infer", "batchnorm_train", "groupnorm", "prelu",
    "avg_pool", "max_pool", "resize_bilinear", "upsample_bilinear",
]
