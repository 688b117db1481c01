"""Jitted train/val steps for CSNet (single-chip or mesh-sharded).

Loss = BCE-with-logits (mean over all pixels, train.py:205-209)
     + flops_weight * dynamic-weight-decay penalty while enabled
       (train.py:212-213; the enable flag is a traced 0/1 scalar so crossing
       AUTO.FINETUNE never recompiles).

The step is a pure function of (trainable, state, opt_state, batch, lr,
penalty_on); under a mesh, batch arrays are sharded along the data axis,
params/opt state replicated — XLA inserts gradient all-reduces and global BN
statistics on its own.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from ..arch.csnet import csnet_apply
from ..arch.layer_config import LayerConfig
from ..ops.goct import ApplyCtx
from . import dynamic_wd
from .params import merge, update_state


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Mean binary cross-entropy with logits (torch F.binary_cross_entropy_with_logits)."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), target.astype(jnp.float32)))


def make_train_step(
    lc: LayerConfig,
    tx: optax.GradientTransformation,
    *,
    flops_weight: float = 0.0,
    flops_expand: float = 2.0,
    batch_size: int,
    donate: bool = True,
    apply_fn=None,
    mloss: int = 1,
    compute_dtype=None,
    from_u8: bool = False,
):
    """Build the jitted CSNet train step.

    batch: {"image": (N,H,W,3), "target": (N,H,W,1)}; lr and penalty_on are
    traced scalars. Returns (trainable, state, opt_state, metrics).
    ``apply_fn(params, image, ctx)`` overrides the model; a model returning a
    list of outputs is summed over the first ``mloss`` heads (LOSS.MLOSS,
    reference train.py:205-209). ``compute_dtype=jnp.bfloat16`` runs the
    forward/backward in mixed precision (activations bf16 with f32
    accumulation; params, BN stats, loss and optimizer state stay f32).
    ``from_u8`` accepts uint8 image/target (the hybrid data front-end ships
    raw bytes) and fuses [0,1] scaling + ImageNet normalization into this
    same dispatch — no separate preprocess program, 4x less link traffic.
    """
    fw = dynamic_wd.flop_weight_map(lc, flops_expand) if flops_weight else {}
    apply = apply_fn or (lambda p, x, ctx: csnet_apply(p, x, lc, ctx))

    def loss_fn(trainable, state, batch, penalty_on):
        ctx = ApplyCtx(train=True, collect_gap=bool(fw))
        params = merge(trainable, state)
        image = batch["image"]
        if from_u8:
            from ..data.pipeline import normalize_u8_device

            image = normalize_u8_device(image)
            batch = dict(batch,
                         target=batch["target"].astype(jnp.float32) / 255.0)
        if compute_dtype is not None:
            image = image.astype(compute_dtype)
        out = apply(params, image, ctx)
        if isinstance(out, (list, tuple)):
            bce = sum(bce_with_logits(out[k], batch["target"])
                      for k in range(mloss))
        else:
            bce = bce_with_logits(out, batch["target"])
        loss = bce
        pen = jnp.zeros((), jnp.float32)
        if fw:
            pen = dynamic_wd.penalty(trainable, ctx.gap, fw, batch_size)
            loss = loss + penalty_on * flops_weight * pen
        return loss, (bce, pen, ctx.bn_stats)

    def step(trainable, state, opt_state, batch, lr, penalty_on):
        grads, (bce, pen, bn_stats) = jax.grad(loss_fn, has_aux=True)(
            trainable, state, batch, penalty_on
        )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        updates = jax.tree.map(lambda u: u * lr, updates)
        trainable = optax.apply_updates(trainable, updates)
        state = update_state(state, bn_stats)
        metrics = {"loss": bce, "penalty": pen}
        return trainable, state, opt_state, metrics

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(lc: LayerConfig, *, pallas: bool = False,
                   from_u8: bool = False, compute_dtype=None,
                   quantize_u8: bool = False):
    """Jitted inference step: image batch -> sigmoid saliency maps (N,H,W,1).

    from_u8 fuses [0,1] scaling + ImageNet normalization into the dispatch
    (hybrid front-end: the host ships resized uint8, 4x less link traffic).
    quantize_u8 returns trunc(sigmoid*255) as uint8 — the PNG quantization
    applied on device, so the readback is 4x smaller too (the wire is the
    e2e inference bottleneck). The host then resizes the quantized map back
    to native size; vs the reference's resize-then-quantize order this can
    differ by +-1/255 on interpolated pixels, so the parity-default host
    mode keeps the f32 readback."""

    from ..data.pipeline import normalize_u8_device, quantize_sigmoid_u8

    @jax.jit
    def step(params, image):
        if from_u8:
            image = normalize_u8_device(image)
        if compute_dtype is not None:
            image = image.astype(compute_dtype)
        logits = csnet_apply(params, image, lc, ApplyCtx(pallas=pallas))
        sig = jax.nn.sigmoid(logits.astype(jnp.float32))
        if quantize_u8:
            return quantize_sigmoid_u8(sig)
        return sig

    return step


def quantized_mae(pred01: jnp.ndarray, target01: jnp.ndarray) -> jnp.ndarray:
    """Reference val MAE: sigmoid output scaled to 255, truncated to int, /255,
    then L1 against the GT (train.py:268-278)."""
    q = jnp.trunc(pred01 * 255.0) / 255.0
    return jnp.mean(jnp.abs(q - target01))
