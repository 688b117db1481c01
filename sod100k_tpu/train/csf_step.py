"""CSF+Res2Net training step (the reference Solver's semantics, TPU-native).

Reference recipe (CSF+Res2Net/solver.py): Adam(lr 5e-5, wd 5e-4) over the
*trainable* params only (frozen: backbone block/top BN affines AND the
downsample shortcut convs, csf_res2net.py:45-46,60-62,66-67,125-126,156-157
— note the stem Sequential BNs and the downsample BN affines are NOT
frozen, only eval-mode), BCE-with-logits reduction='sum' scaled by
1/(iter_size*batch) (:98-99), gradient accumulation over iter_size=10
micro-batches (:104-110), lr/10 after epoch 15 by optimizer re-creation
(:123-125; re-creating Adam also resets its moments — drivers reproduce this
by re-running tx.init at the decay epoch).

TPU adaptation: the reference trains at native image size with batch 1
(README: "Only support batch_size=1"), which would recompile per shape under
XLA. Steps here take fixed-shape (optionally padded) batches with a validity
mask; the masked *sum* reduction keeps the loss exactly equal to the
reference's on the real pixels. Gradient accumulation is optax.MultiSteps, so
one jitted step per micro-batch and the optimizer applies every iter_size-th.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..arch.csf_res2net import csf_apply
from .params import merge, partition

_FROZEN_BN_MARKERS = ("bn1", "bn3", "bns")


def csf_partition(params: dict) -> tuple[dict, dict]:
    """Split CSF params into (trainable, state): BN running stats, the
    frozen backbone BN affines, AND the downsample shortcut convs.

    requires_grad=False set in the reference: block bn1/bns/bn3 affines
    (csf_res2net.py:45-46,60-62,66-67), the top-level bn1 (:125-126), and
    the downsample CONV — ``downsample._modules['1']`` (:156-157). The
    downsample BN (index 2) affines are NOT frozen and train; the stem
    conv1 Sequential BNs train too."""
    trainable, state = partition(params)

    def is_frozen(path_parts: list[str]) -> bool:
        if path_parts[0] != "base":
            return False
        if path_parts[1] == "bn1":
            return True  # base.bn1 (csf_res2net.py:125-126)
        if path_parts[1].startswith("layer"):
            if "downsample" in path_parts:
                # reference freezes the 1x1 shortcut CONV (:156-157);
                # the downsample BN affines (index 2) stay trainable
                i = path_parts.index("downsample")
                return path_parts[i + 1] == "1"
            # block bn1/bns.*/bn3 affines
            return any(m in path_parts for m in _FROZEN_BN_MARKERS)
        return False  # stem conv1.1/conv1.4 BNs stay trainable

    def move(node_t, node_s, parts):
        for k in list(node_t.keys()):
            v = node_t[k]
            if isinstance(v, dict):
                move(v, node_s.setdefault(k, {}), parts + [k])
                if not v:
                    del node_t[k]
            elif (k in ("scale", "offset", "kernel")
                  and is_frozen(parts + [k])):
                node_s[k] = node_t.pop(k)

    move(trainable, state, [])
    return trainable, state


def make_csf_optimizer(lr: float = 5e-5, weight_decay: float = 5e-4,
                       iter_size: int = 10) -> optax.GradientTransformation:
    """Adam(0.9/0.999, eps 1e-8) + L2, applied every iter_size micro-steps."""
    inner = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-1.0),
    )
    # use_grad_mean=False: the reference SUMS micro-grads (backward()
    # accumulation over iter_size batches, solver.py:104-110) and the loss
    # already divides by iter_size*batch; the optax default (mean) would
    # feed Adam grads iter_size-times smaller, inflating the effective
    # weight-decay-to-gradient ratio by iter_size
    return optax.MultiSteps(inner, every_k_schedule=iter_size,
                            use_grad_mean=False)


def bce2d(logits, target, reduction: str = "none"):
    """Class-balanced BCE-with-logits (reference solver.py:129-144).

    Pixel weights: alpha = #neg/#total on positives, beta = 1.1*#pos/#total
    on negatives (the reference's comment has the roles swapped; the code —
    `weights = alpha * pos + beta * neg` — is what we mirror). Present in
    the reference but never called by its Solver; provided for users who
    switch their loss to it. The reference's *default* `reduction=None` is
    not a valid torch reduction (calling it without an explicit reduction
    raises), so the default here is "none".
    """
    target = target.astype(jnp.float32)
    pos = (target == 1).astype(jnp.float32)
    neg = (target == 0).astype(jnp.float32)
    num_total = jnp.sum(pos) + jnp.sum(neg)
    alpha = jnp.sum(neg) / num_total
    beta = 1.1 * jnp.sum(pos) / num_total
    weights = alpha * pos + beta * neg
    bce = weights * optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), target)
    if reduction == "none":
        return bce
    if reduction == "mean":
        return jnp.mean(bce)
    if reduction == "sum":
        return jnp.sum(bce)
    raise ValueError(f"invalid reduction {reduction!r}")


def make_csf_train_step(tx: optax.GradientTransformation, *,
                        backbone: str = "res2net50",
                        iter_size: int = 10, batch_size: int = 1,
                        donate: bool = True, compute_dtype=None,
                        remat: bool = False):
    """Jitted micro-batch step. batch: {"image","target"} (+optional "mask"
    over pixels for padded batches); loss = sum(BCE * mask)/(iter*batch).

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in mixed
    precision (activations bf16 — the ops cast weights to the activation
    dtype and the convs accumulate in f32; params, frozen-BN state, loss and
    optimizer moments stay f32), mirroring the CSNet step's TPU.DTYPE.

    ``remat=True`` wraps the forward in jax.checkpoint (nothing_saveable):
    the backward recomputes activations instead of keeping them. This is a
    MEMORY lever, not a speed lever — measured (tools/perf_probe.py csf,
    v5e): bf16 B=32 127 ms vs the plain step's 98 ms. The step is
    HBM-bandwidth-bound, and at these activation sizes the recomputed
    tensors spill back to HBM instead of staying in VMEM, so full remat
    *adds* traffic (cost model: 109 vs 86 GB) while cutting peak HBM by the
    saved residuals. Use it to fit larger batches / native-size images;
    identical gradients either way (``--remat`` in cli.csf)."""
    fwd = lambda p, im: csf_apply(p, im, backbone)  # noqa: E731
    if remat:
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.nothing_saveable)

    def loss_fn(trainable, state, batch):
        params = merge(trainable, state)
        image = batch["image"]
        if compute_dtype is not None:
            image = image.astype(compute_dtype)
        logits = fwd(params, image).astype(jnp.float32)
        bce = optax.sigmoid_binary_cross_entropy(
            logits, batch["target"].astype(jnp.float32))
        if "mask" in batch:
            bce = bce * batch["mask"].astype(jnp.float32)
        return jnp.sum(bce) / (iter_size * batch_size)

    def step(trainable, state, opt_state, batch, lr):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, state, batch)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        updates = jax.tree.map(lambda u: u * lr, updates)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 2) if donate else ())


def make_csf_eval_step(backbone: str = "res2net50", compute_dtype=None,
                       quantize_u8: bool = False, from_u8: bool = False):
    """quantize_u8 returns trunc(sigmoid*255) as uint8 — bit-identical to the
    host's `(255 * pred).astype(np.uint8)` (the reference writes the map at
    native size with no resize-back, solver.py:62-78, so on-device PNG
    quantization is EXACT parity) while shrinking the readback 4x; the wire
    is the e2e bottleneck on the axon tunnel.

    from_u8 takes raw uint8 RGB and fuses the /255 + ImageNet normalization
    (the reference's host-side dataset.py:69-81) into the dispatch: 4x less
    upload too. The fused math is the same f32 `(x/255 - mean)/std` sequence,
    so results are bit-identical to the host-normalized path."""
    from sod100k_tpu.data.pipeline import (
        normalize_u8_device,
        quantize_sigmoid_u8,
    )

    @jax.jit
    def step(params, image):
        if from_u8:
            image = normalize_u8_device(image)
        if compute_dtype is not None:
            image = image.astype(compute_dtype)
        logits = csf_apply(params, image, backbone).astype(jnp.float32)
        sig = jax.nn.sigmoid(logits)
        if quantize_u8:
            return quantize_sigmoid_u8(sig)
        return sig

    return step
