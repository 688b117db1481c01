"""Fused ILBlock depthwise tail as a Pallas TPU kernel.

An ILBlock ends with two depthwise 3x3 Conv2dX100 + BN + PReLU stages per
octave branch (SimplifiedGOctConvBR x2, reference csnet.py:50-76). Unfused,
that is two HBM round trips of the full activation per branch; XLA will not
fuse conv->conv. This kernel keeps the whole image resident in VMEM and runs

    x -> dw3x3 -> affine(BN folded) -> PReLU -> dw3x3 -> affine -> PReLU -> y

in one pass: HBM traffic drops from ~4x to the 2x minimum (read x, write y).

Layout: channel counts here are 10-64 — laying C on the 128-wide lanes wastes
>50% of the VPU *and* blows VMEM (tiles pad lanes to 128). Instead the kernel
views the image as (H, W*C): rows on sublanes, the merged W*C dim on lanes
(~full utilization for any C). A depthwise dx-shift becomes a lane shift by
dx*C (slice + zero-pad, which also realizes the conv's zero boundary — for
w=0 the shifted index w*C+c-C is exactly the padded region), and the dy-shift
is a row slice. Taps/affines are pre-tiled to (W*C,) vectors outside the
kernel. Compute strips of TH rows keep f32 temporaries small; the conv1->conv2
intermediate is stored bf16 in VMEM scratch, matching the unfused XLA
numerics.

grid = (N,): one image per step, any H*W*C that fits ~3 image copies in VMEM
(224x224x25 bf16 ~ 2.4 MB each). The wrapper reshapes NHWC -> (N, H, W*C),
a free trailing-dim merge.

Measured (v5e, B=128, 224x224x24 bf16): 4.8 ms/batch fused vs 2.1 ms for the
unfused XLA chain — XLA's depthwise convs already run at ~75% of the HBM
roofline with BN/PReLU fused in, and the dynamic lane rotations this kernel
needs (pltpu.roll by C per tap direction) cost more than the intermediate
round trip they save. Kept as an optional, tested path (ApplyCtx.pallas);
the default inference path stays on XLA. The promising direction for a
faster kernel is a batch-in-lanes (N=128) layout end-to-end, which turns the
shifts into aligned sublane moves — a cross-cutting layout change tracked
for a future round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 32  # strip rows per inner step


def _lane_shift(a: jax.Array, s: int) -> jax.Array:
    """out[:, i] = a[:, i - s] with zero fill (s>0 shifts right).

    Mosaic cannot lower unaligned slice+concat on the lane axis, so this is a
    cyclic pltpu.roll with the wrapped region masked to zero.
    """
    if s == 0:
        return a
    wc = a.shape[1]
    rolled = pltpu.roll(a, s % wc, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    mask = idx >= s if s > 0 else idx < wc + s
    return jnp.where(mask, rolled, jnp.zeros((), a.dtype))


def _make_kernel(h: int, wc: int, c: int, out_dtype):
    def rows_padded(src, a: int, b: int):
        """Rows [a, b) of an (H, WC) ref/array with zero rows outside [0, H)."""
        pieces = []
        if a < 0:
            pieces.append(jnp.zeros((-a, wc), jnp.float32))
        lo, hi = max(a, 0), min(b, h)
        pieces.append(src[lo:hi].astype(jnp.float32))
        if b > h:
            pieces.append(jnp.zeros((b - h, wc), jnp.float32))
        return jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else pieces[0]

    def conv_pass(src, dst, w_ref, aff_ref, dst_dtype):
        for r0 in range(0, h, TH):
            th = min(TH, h - r0)
            xs = rows_padded(src, r0 - 1, r0 + th + 1)  # (th+2, WC) f32
            acc = jnp.zeros((th, wc), jnp.float32)
            for dy in range(3):
                band = xs[dy:dy + th]
                for dx in range(3):
                    tap = w_ref[dy, dx].astype(jnp.float32)
                    acc = acc + _lane_shift(band, (1 - dx) * c) * tap
            y = acc * aff_ref[0].astype(jnp.float32) + aff_ref[1].astype(jnp.float32)
            y = jnp.where(y >= 0, y, y * aff_ref[2].astype(jnp.float32))
            dst[r0:r0 + th] = y.astype(dst_dtype)

    def kernel(x_ref, w1_ref, aff1_ref, w2_ref, aff2_ref, o_ref, t_ref):
        conv_pass(x_ref[0], t_ref, w1_ref, aff1_ref, t_ref.dtype)
        conv_pass(t_ref, o_ref.at[0], w2_ref, aff2_ref, out_dtype)

    return kernel


def _tile_vec(v: jax.Array, w: int) -> jax.Array:
    """(C,) -> (W*C,) repeating along W (channel-minor layout)."""
    return jnp.tile(v.astype(jnp.float32), (w,))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dw_chain(
    x: jax.Array,      # (N, H, W, C)
    w1: jax.Array,     # (3, 3, C) effective depthwise taps (x100 pre-applied)
    s1: jax.Array, b1: jax.Array, a1: jax.Array,   # folded BN scale/shift + PReLU alpha, (C,)
    w2: jax.Array,
    s2: jax.Array, b2: jax.Array, a2: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    n, h, w, c = x.shape
    wc = w * c
    xm = x.reshape(n, h, wc)

    def tiles(wk):  # (3, 3, C) -> (3, 3, W*C)
        return jax.vmap(jax.vmap(lambda v: _tile_vec(v, w)))(wk)

    w1t, w2t = tiles(w1), tiles(w2)
    aff1 = jnp.stack([_tile_vec(s1, w), _tile_vec(b1, w), _tile_vec(a1, w)])
    aff2 = jnp.stack([_tile_vec(s2, w), _tile_vec(b2, w), _tile_vec(a2, w)])

    kernel = _make_kernel(h, wc, c, x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, wc), x.dtype)],
        interpret=interpret,
    )(xm, w1t, aff1, w2t, aff2)
    return out.reshape(n, h, w, c)


def fold_bn_eval(bn: dict, eps: float = 1e-5):
    """Eval-mode BN as (scale, shift)."""
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps)
    scale = bn["scale"].astype(jnp.float32) * inv
    shift = bn["offset"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * scale
    return scale, shift


def dw_tail_fused(p1: dict, p2: dict, xset, split, *, interpret: bool = False):
    """Apply conv3x3_1 + conv3x3_2 (both SimplifiedGOctConvBR stages of an
    ILBlock) fused, per octave branch. Inference only (running-stat BN)."""
    out = []
    for j, cj in enumerate(split):
        key = str(j)
        if cj == 0 or xset[j] is None or key not in p1["convs"]:
            out.append(None)
            continue

        def prep(p):
            k = p["convs"][key]["kernel"]  # (3, 3, 1, C) HWIO depthwise
            w = k[:, :, 0, :].astype(jnp.float32) * 100.0  # Conv2dX100
            s, b = fold_bn_eval(p["bns"][key])
            return w, s, b, p["prelus"][key]["alpha"]

        w1, s1, b1, a1 = prep(p1)
        w2, s2, b2, a2 = prep(p2)
        out.append(fused_dw_chain(xset[j], w1, s1, b1, a1, w2, s2, b2, a2,
                                  interpret=interpret))
    return out
