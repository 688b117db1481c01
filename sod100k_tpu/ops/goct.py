"""Generalized Octave Convolution op family, functional and TPU-first.

An "octave set" (octset) is a tuple/list of NHWC arrays, one per resolution
branch (branch i nominally at 1/2^i scale), with ``None`` for empty branches.
All branch structure (channel splits, strides, kernel sizes) is static Python
data, so every function here traces to a fixed XLA graph: the branch double
loop unrolls into a handful of convolutions that XLA fuses and schedules onto
the MXU; no dynamic shapes, no data-dependent control flow.

Two dialects of the cross-scale resampling exist in the reference and both are
supported via ``flavor``:

- "csnet" (/root/reference/CSNet_training/model/csnet.py:1014-1076):
  coarse->fine = conv then bilinear-upsample by 2^(i-j);
  fine->coarse = maxpool by 2^(j-i) then conv;
  stride 2 = avgpool(2) on the input before anything else.
- "csf" (/root/reference/CSF+Res2Net/networks/gOctConv.py:60-114):
  coarse->fine = conv then bilinear-resize to the *input set's* branch-j shape;
  fine->coarse = bilinear-resize input to branch-j shape, then conv.
  (The CSF file also carries a learned per-branch balance-weight path gated
  by a hardcoded USE_BALANCE=False, gOctConv.py:9,46-50,67-68,92-94 — dead
  code in every shipped recipe, deliberately not reproduced.)

Parameter dicts mirror the reference's module naming so checkpoint interop is
a pure key mapping (see interop/torch_ckpt.py). Convolutions marked x100 carry
the reference's Conv2dX100 weight scaling (conv2d.py:102-104).

Training-time bookkeeping (batch-norm running stats, and the GAP(|activation|)
vectors feeding the dynamic-weight-decay penalty, csnet.py:391-410) is
collected in an ``ApplyCtx`` instead of forward hooks: pure data out of a pure
function.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from .conv import conv2d
from .norm import batchnorm_infer, batchnorm_train, groupnorm, prelu
from .resample import avg_pool, max_pool, resize_bilinear, upsample_bilinear

Split = Sequence[int]
OctSet = list  # list of Optional[jax.Array]


@dataclasses.dataclass
class ApplyCtx:
    """Mutable trace-time collector threaded through apply functions.

    train:     batch-stat normalization + running-stat updates when True.
    bn_stats:  path -> {"mean","var"} new running statistics (train only).
    gap:       path -> (N, C) |spatial mean| of post-CBR activations,
               stop-gradient'd — the reference's Oct_bn_hook signal
               (csnet.py:403-408). Only populated when collect_gap.
    """

    train: bool = False
    collect_gap: bool = False
    # route ILBlock depthwise tails through the fused Pallas kernel
    # (inference only; see ops/pallas/dw_chain.py for the measured tradeoff)
    pallas: bool = False
    bn_stats: dict = dataclasses.field(default_factory=dict)
    gap: dict = dataclasses.field(default_factory=dict)

    def norm_act(self, path: str, bn_p: dict, alpha: jax.Array, x: jax.Array,
                 norm: str = "bn") -> jax.Array:
        """norm (BN train/eval or GN) followed by PReLU; records bookkeeping."""
        if norm == "gn":
            y = groupnorm(x, bn_p)
        elif self.train:
            y, stats = batchnorm_train(x, bn_p)
            self.bn_stats[path] = stats
        else:
            y = batchnorm_infer(x, bn_p)
        y = prelu(y, alpha)
        if self.collect_gap:
            # |GAP(post-activation)| per (batch, channel), detached
            # (reference applies abs after the spatial mean, csnet.py:403-405).
            g = jnp.abs(jnp.mean(y.astype(jnp.float32), axis=(1, 2)))
            self.gap[path] = jax.lax.stop_gradient(g)
        return y


def _offsets(split: Split) -> list[int]:
    offs = [0]
    for s in split:
        offs.append(offs[-1] + int(s))
    return offs


def goct_conv(
    xset: OctSet,
    weight: jax.Array,
    bias: Optional[jax.Array],
    *,
    in_split: Split,
    out_split: Split,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    flavor: str = "csnet",
) -> OctSet:
    """Generalized octave convolution over an octset.

    ``weight`` is the dense HWIO tensor (kh, kw, sum(in_split), sum(out_split));
    per-(in-branch, out-branch) slices are static, so XLA sees small independent
    convolutions it can schedule concurrently. Mirrors gOctaveConv.forward
    (csnet.py:1014-1076 / gOctConv.py:60-114).
    """
    in_off = _offsets(in_split)
    out_off = _offsets(out_split)
    n_out = len(out_split)
    ysets: list[list[jax.Array]] = [[] for _ in range(n_out)]

    for i, ci in enumerate(in_split):
        if ci == 0 or i >= len(xset) or xset[i] is None:
            continue
        x = avg_pool(xset[i], 2) if stride == 2 else xset[i]
        for j, cj in enumerate(out_split):
            if cj == 0:
                continue
            w = jax.lax.slice(
                weight,
                (0, 0, in_off[i], out_off[j]),
                (weight.shape[0], weight.shape[1], in_off[i + 1], out_off[j + 1]),
            )
            b = None if bias is None else bias[out_off[j]:out_off[j + 1]]
            sf = 2 ** (i - j)
            if flavor == "csf":
                tgt = xset[j].shape[1:3]
                if sf > 1:
                    y = conv2d(x, w, b, padding=padding, dilation=dilation)
                    y = resize_bilinear(y, tgt)
                elif sf < 1:
                    y = conv2d(resize_bilinear(x, tgt), w, b,
                               padding=padding, dilation=dilation)
                else:
                    y = conv2d(x, w, b, padding=padding, dilation=dilation)
            else:
                if sf > 1:
                    y = conv2d(x, w, b, padding=padding, dilation=dilation)
                    y = upsample_bilinear(y, sf)
                elif sf < 1:
                    y = conv2d(max_pool(x, int(round(1.0 / sf))), w, b,
                               padding=padding, dilation=dilation)
                else:
                    y = conv2d(x, w, b, padding=padding, dilation=dilation)
            ysets[j].append(y)

    out: OctSet = []
    for j in range(n_out):
        if ysets[j]:
            acc = ysets[j][0]
            for y in ysets[j][1:]:
                acc = acc + y
            out.append(acc)
        else:
            out.append(None)
    return out


def goct_cbr(
    ctx: ApplyCtx,
    path: str,
    params: dict,
    xset: OctSet,
    *,
    in_split: Split,
    out_split: Split,
    stride: int = 1,
    padding: int = 0,
    flavor: str = "csnet",
    norm: str = "bn",
) -> OctSet:
    """gOctConv (or plain x100 conv when 1-in/1-out) + per-branch norm + PReLU.

    Mirrors gOctaveCBR (csnet.py:1079-1142; GroupNorm variant
    gOctConv.py:116-153). The single-branch fast path uses the reference's
    Conv2dX100 (x100 weight scale); the multi-branch path does not scale.
    """
    std_conv = len(in_split) == 1 and len(out_split) == 1
    weight = params["conv"]["kernel"]
    bias = params["conv"].get("bias")
    if std_conv:
        y = conv2d(xset[0], weight, bias, stride=stride, padding=padding,
                   weight_scale=100.0)
        yset: OctSet = [y]
    else:
        yset = goct_conv(
            xset, weight, bias,
            in_split=in_split, out_split=out_split,
            stride=stride, padding=padding, flavor=flavor,
        )
    out: OctSet = []
    for j in range(len(out_split)):
        if yset[j] is None or out_split[j] == 0:
            out.append(None)
            continue
        bkey = str(j)
        out.append(
            ctx.norm_act(f"{path}.bns.{bkey}", params["bns"][bkey],
                         params["prelus"][bkey]["alpha"], yset[j], norm=norm)
        )
    return out


def simplified_goct_cbr(
    ctx: ApplyCtx,
    path: str,
    params: dict,
    xset: OctSet,
    *,
    split: Split,
    padding: int = 1,
) -> OctSet:
    """Per-branch depthwise 3x3 Conv2dX100 + BN + PReLU, no cross-branch mixing.

    Mirrors SimplifiedGOctConvBR (csnet.py:1145-1201): groups == channels, so
    each branch is an independent depthwise convolution.
    """
    out: OctSet = []
    for i, c in enumerate(split):
        if c == 0 or xset[i] is None:
            out.append(None)
            continue
        key = str(i)
        y = conv2d(xset[i], params["convs"][key]["kernel"], None,
                   padding=padding, groups=int(c), weight_scale=100.0)
        out.append(
            ctx.norm_act(f"{path}.bns.{key}", params["bns"][key],
                         params["prelus"][key]["alpha"], y)
        )
    return out


def ms_block(
    ctx: ApplyCtx,
    path: str,
    params: dict,
    x: jax.Array,
    *,
    dil_split: Split,
    dilations: Sequence[int] = (1, 2, 4, 8, 16),
    norm: str = "bn",
    x100: bool = True,
) -> jax.Array:
    """Multi-dilation block: parallel dilated 3x3 convs, concat, norm + PReLU.

    Mirrors MSBlock (csnet.py:116-149). Per-dilation output widths come from
    the (prunable) dil_split; zero-width dilation branches are skipped. The
    CSF variant (csf_res2net.py:189-213) uses plain convs (x100=False) and
    GroupNorm.
    """
    outs = []
    for i, d in enumerate(dilations):
        if int(dil_split[i]) == 0:
            continue
        key = str(i)
        outs.append(
            conv2d(x, params["msconv"][key]["kernel"], None,
                   padding=int(d), dilation=int(d),
                   weight_scale=100.0 if x100 else 1.0)
        )
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    # shared norm+PReLU path (identical bn_stats key; the gap entry norm_act
    # records under collect_gap has no flop weight, so penalty() ignores it)
    return ctx.norm_act(f"{path}.bn", params["bn"],
                        params["prelu"]["alpha"], y, norm=norm)


def pall_ms_block(
    ctx: ApplyCtx,
    path: str,
    params: dict,
    xset: OctSet,
    *,
    dil_splits: Sequence[Split],
    norm: str = "bn",
    x100: bool = True,
) -> OctSet:
    """One MSBlock per octave branch (PallMSBlock, csnet.py:79-113)."""
    out: OctSet = []
    for i, ds in enumerate(dil_splits):
        if max(int(v) for v in ds) == 0 or xset[i] is None:
            out.append(None)
            continue
        key = str(i)
        out.append(
            ms_block(ctx, f"{path}.convs.{key}", params["convs"][key], xset[i],
                     dil_split=ds, norm=norm, x100=x100)
        )
    return out
