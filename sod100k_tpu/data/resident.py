"""Device-resident training data: upload once, train epochs in one dispatch.

Measured on the axon tunnel (CLAUDE.md): truthful host->device bandwidth is
~36 MB/s, so ANY mode that ships pixels per batch is wire-bound (~180 img/s
at 224^2 uint8) while the bf16 train step alone sustains 523 img/s. The
model is ~100K params and a v5e chip has 16 GB HBM — DUTS-TR (10k images)
stored as 256^2 uint8 is ~2.6 GB. So the TPU-native design is:

1. build_resident_dataset: decode on host (once, RAM-cached), resize uint8
   to a canonical store size (default 256^2), upload to HBM in one transfer.
2. make_resident_epoch_fn: ONE jitted program per epoch —
   jax.random.permutation -> lax.scan over batches, each iteration gathers
   its batch from the resident array, runs the crop/flip/resize/normalize
   augmentation (device_pipeline) and the full dynamic-wd train step.
   No host transfers, no per-batch dispatches; the ~35 ms tunnel RPC is
   paid once per epoch.

Augmentation note: the reference crops <=15 px at NATIVE resolution then
resizes (prepare_data.py:26-88). Here images are pre-resized to the store
size, so the crop acts at the canonical 256-scale (up to max_crop px of
256). The augmentation DISTRIBUTION (crop fraction, flip rates) matches to
within the native-size spread; parity-exact host augmentation remains
available via the host/hybrid modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .device_pipeline import preprocess_train_batch, resize_to_native_canvas


def build_resident_dataset(dataset, store_hw: tuple[int, int] = (256, 256),
                           sharding=None) -> dict:
    """Decode + uint8-resize every sample to store_hw and upload to device.

    Returns {"image_u8": (N,hs,ws,3), "gt_u8": (N,hs,ws)} device arrays
    (replicated or placed per `sharding` when given)."""
    import cv2

    n = len(dataset)
    hs, ws = store_hw
    imgs = np.empty((n, hs, ws, 3), np.uint8)
    gts = np.empty((n, hs, ws), np.uint8)
    for i in range(n):
        img, gt = dataset._decode_u8(i)
        imgs[i] = cv2.resize(img, (ws, hs), interpolation=cv2.INTER_LINEAR)
        gts[i] = cv2.resize(gt, (ws, hs), interpolation=cv2.INTER_LINEAR)
    # put_replicated: multi-host safe (every process supplies its local copy
    # of the replicated store; plain device_put single-process)
    from ..parallel.multihost import put_replicated
    put = (lambda a: put_replicated(a, sharding)) if sharding is not None \
        else jax.device_put
    return {"image_u8": put(imgs), "gt_u8": put(gts)}


def make_resident_epoch_fn(step_fn, *, batch_size: int,
                           out_hw: tuple[int, int],
                           augment: bool = True, max_crop: int = 17,
                           batch_sharding=None):
    """One-dispatch epoch: shuffle -> scan(gather -> augment -> step_fn).

    step_fn is a make_train_step-style pure function
    (trainable, state, opt_state, batch, lr, penalty_on) -> (t, s, o, metrics)
    built WITHOUT from_u8 (the on-device augmentation already normalizes).
    max_crop defaults to 17 ~ 15 * 256/224: the reference's 15-px native
    crop expressed at the 256 store scale.

    batch_sharding (a NamedSharding over the batch axis) constrains the
    gathered batch under a mesh so the per-step work data-parallelizes
    instead of replicating; the resident arrays themselves stay replicated
    (uint8 is small) and the gather happens shard-locally after the
    constraint.

    Returns epoch_fn(trainable, state, opt_state, data, key, lr, penalty_on)
    -> (trainable, state, opt_state, losses (nb,), penalties (nb,)).
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_fn(trainable, state, opt_state, data, key, lr, penalty_on):
        n = data["image_u8"].shape[0]
        nb = n // batch_size
        kperm, kaug = jax.random.split(key)
        perm = jax.random.permutation(kperm, n)[: nb * batch_size]
        perm = perm.reshape(nb, batch_size)
        hs, ws = data["image_u8"].shape[1:3]
        valid = jnp.broadcast_to(jnp.asarray([hs, ws], jnp.int32),
                                 (batch_size, 2))

        def body(carry, args):
            t, s, o = carry
            idxs, kb = args
            img = data["image_u8"][idxs]
            gt = data["gt_u8"][idxs]
            if batch_sharding is not None:
                img = jax.lax.with_sharding_constraint(img, batch_sharding)
                gt = jax.lax.with_sharding_constraint(gt, batch_sharding)
            batch = preprocess_train_batch(
                img, gt, valid, kb,
                out_hw=out_hw, augment=augment, max_crop=max_crop)
            t, s, o, m = step_fn(t, s, o, batch, lr, penalty_on)
            return (t, s, o), (m["loss"], m["penalty"])

        keys = jax.random.split(kaug, nb)
        (trainable, state, opt_state), (losses, pens) = jax.lax.scan(
            body, (trainable, state, opt_state), (perm, keys))
        return trainable, state, opt_state, losses, pens

    return epoch_fn


def make_resident_csf_epoch_fn(step_fn, *, batch_size: int,
                               batch_sharding=None):
    """One-dispatch CSF epoch over a resident fixed-size dataset.

    CSF dialect (csf_dataset.py / reference dataset.py): per-sample random
    horizontal flip at p=0.5, RGB /255 then ImageNet normalization, GT /255 —
    no crop. step_fn is a make_csf_train_step-style pure function built with
    donate=False: (trainable, state, opt_state, batch, lr) ->
    (trainable, opt_state, metrics); BN state is frozen during CSF training
    (reference net.eval(), solver.py:49) so it is closed over per call, not
    carried. batch_sharding constrains the gathered batch under a data mesh.

    Returns epoch_fn(trainable, state, opt_state, data, key, lr)
    -> (trainable, opt_state, losses (nb,)).
    """
    from .pipeline import normalize_u8_device

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def epoch_fn(trainable, state, opt_state, data, key, lr):
        n = data["image_u8"].shape[0]
        nb = n // batch_size
        kperm, kflip = jax.random.split(key)
        perm = jax.random.permutation(kperm, n)[: nb * batch_size]
        perm = perm.reshape(nb, batch_size)
        flips = jax.random.bernoulli(kflip, 0.5, (nb, batch_size))

        def body(carry, args):
            t, o = carry
            idxs, fl = args
            img = data["image_u8"][idxs]
            gt = data["gt_u8"][idxs]
            if batch_sharding is not None:
                img = jax.lax.with_sharding_constraint(img, batch_sharding)
                gt = jax.lax.with_sharding_constraint(gt, batch_sharding)
            img = jnp.where(fl[:, None, None, None], img[:, :, ::-1], img)
            gt = jnp.where(fl[:, None, None], gt[:, :, ::-1], gt)
            im = normalize_u8_device(img)
            batch = {"image": im,
                     "target": gt.astype(jnp.float32)[..., None] / 255.0}
            t, o, m = step_fn(t, state, o, batch, lr)
            return (t, o), m["loss"]

        (trainable, opt_state), losses = jax.lax.scan(
            body, (trainable, opt_state), (perm, flips))
        return trainable, opt_state, losses

    return epoch_fn


def build_resident_val_dataset(dataset, in_hw: tuple[int, int],
                               batch_size: int, sharding=None,
                               with_wf_tables: bool = False,
                               wf_budget_bytes: int | None = None) -> dict:
    """Upload the whole val split once: model inputs at the train size
    (uint8, hybrid-dialect host resize) plus NATIVE-resolution ground truths
    padded to one canvas, so per-epoch validation needs zero host transfers.

    The host val protocol (cli/common.py val_mae, reference train.py:250-293)
    resizes each prediction back to its native (h, w) and scores a
    quantized L1 there — the native GTs must therefore ride along. N is
    padded to a batch_size multiple with weight-0 copies of sample 0.

    Returns {"image_u8": (N',h,w,3), "gt_u8": (N',H,W), "hw": (N',2) int32,
    "weight": (N',) float32} device arrays plus the canvas size under
    "_canvas_hw" (host metadata, not uploaded). with_wf_tables=True adds the
    GT-static weighted-F tables ("wf_idx" int32 (N',H*W), "wf_weight" f32
    (N',H,W) — metrics.wfmeasure.precompute_wf_tables) so the TESTALL sweep
    can score Fbw on device; costs 8 extra HBM bytes per canvas pixel.
    When `wf_budget_bytes` is set and the tables would exceed it, they are
    skipped and the reason lands under "_wf_skipped" (host metadata) — a
    DUTS-TE-sized split would otherwise silently claim ~10 GB of HBM."""
    import cv2

    n = len(dataset)
    pairs = [dataset._decode_u8(i) for i in range(n)]
    canvas_h = max(g.shape[0] for _, g in pairs)
    canvas_w = max(g.shape[1] for _, g in pairs)
    n_pad = -(-n // batch_size) * batch_size
    hs, ws = in_hw
    imgs = np.zeros((n_pad, hs, ws, 3), np.uint8)
    gts = np.zeros((n_pad, canvas_h, canvas_w), np.uint8)
    hws = np.ones((n_pad, 2), np.int32)
    wts = np.zeros((n_pad,), np.float32)
    for i in range(n_pad):
        img, gt = pairs[i] if i < n else pairs[0]
        imgs[i] = cv2.resize(img, (ws, hs), interpolation=cv2.INTER_LINEAR)
        gts[i, :gt.shape[0], :gt.shape[1]] = gt
        hws[i] = gt.shape[:2]
        wts[i] = 1.0 if i < n else 0.0
    # put_replicated: multi-host safe (every process supplies its local copy
    # of the replicated store; plain device_put single-process)
    from ..parallel.multihost import put_replicated
    put = (lambda a: put_replicated(a, sharding)) if sharding is not None \
        else jax.device_put
    out = {"image_u8": put(imgs), "gt_u8": put(gts),
           "hw": put(hws), "weight": put(wts),
           "_canvas_hw": (canvas_h, canvas_w)}
    if with_wf_tables:
        wf_bytes = n_pad * canvas_h * canvas_w * 8  # int32 idx + f32 weight
        if wf_budget_bytes and wf_bytes > wf_budget_bytes:
            out["_wf_skipped"] = (
                f"wF tables need {wf_bytes / 2**20:.0f} MiB of HBM > budget "
                f"{wf_budget_bytes / 2**20:.0f} MiB "
                "(raise TPU.RESIDENT_WF_MAX_MIB, or 0 for unlimited)")
        else:
            from ..metrics.wfmeasure import precompute_wf_tables
            tables = precompute_wf_tables(gts, hws)
            out["wf_idx"] = put(tables["wf_idx"])
            out["wf_weight"] = put(tables["wf_weight"])
    return out


def _batch_native_maps(eval_step, params, img, hw, canvas_hw):
    """The shared per-batch scoring stage of BOTH resident evaluation paths
    (make_resident_val_fn and make_resident_salmetric_fn): forward ->
    per-image dynamic-size bilinear resize-back onto the static canvas ->
    the exact PNG quantization (trunc(sigmoid*255)), plus the per-image
    validity masks. Keep both paths on this ONE implementation — their
    protocol equality is part of the parity story."""
    ch, cw = canvas_hw
    pred = eval_step(params, img)[..., 0]
    up = jax.vmap(
        lambda p, s: resize_to_native_canvas(p, s, (ch, cw))
    )(pred, hw)
    sal255 = jnp.trunc(up * 255.0)  # the PNG value, as float
    mask = ((jnp.arange(ch)[None, :, None] < hw[:, :1, None])
            & (jnp.arange(cw)[None, None, :] < hw[:, 1:, None])
            ).astype(jnp.float32)
    return sal255, mask


def make_resident_salmetric_fn(eval_step, *, batch_size: int,
                               canvas_hw: tuple[int, int],
                               batch_sharding=None):
    """One-dispatch test+eval over a resident test split (the TESTALL sweep
    without PNGs or wire traffic).

    The host protocol (cli/test.py run_test -> cli/eval.py run_eval) dumps a
    PNG per image and re-reads it for SalMetric; per checkpoint that moves
    the whole dataset across the host link twice and pays single-core PNG
    codec time. Here the split stays in HBM (build_resident_val_dataset:
    u8 inputs at the test size + native GTs on one canvas) and each
    checkpoint is ONE dispatched scan: forward -> per-image resize-back to
    native size -> trunc(sigmoid*255) (the exact PNG quantization) ->
    histogram MAE / 256-threshold P/R / E-measure (metrics.salmetric math)
    + adaptive-F + adaptive-E + S-measure — only the metric sums come back
    over the wire.

    eval_step: make_eval_step(lc, from_u8=True, ...). Returns
    fn(params, data) -> dict of PER-BATCH device sums, each with a leading
    (nb,) axis: {"n", "mae_sum", "p_sum"[256], "r_sum"[256], "e_sum"[256],
    "a_sum", "ae_sum", "s_sum", and — when the store was built with_wf_tables —
    "w_sum" (weighted F-measure, GT-static tables precomputed on host,
    sal-dependent gather/conv/reduce on device)} — the cross-batch
    reduction happens on host in float64
    (metrics.salmetric.result_from_sums) so a long f32 carry chain cannot
    drift best-epoch rankings on large splits. Counterpart of the
    reference's test.py:58-108 + eval.py + sal_metric.cpp pipeline."""
    from sod100k_tpu.metrics.salmetric import (
        _per_image_stats,
        adaptive_e_per_image,
        adaptive_f_per_image,
    )
    from sod100k_tpu.metrics.smeasure import s_measure_batch
    from sod100k_tpu.metrics.wfmeasure import wf_per_image_device

    @jax.jit
    def fn(params, data):
        imgs, gts = data["image_u8"], data["gt_u8"]
        hws, wts = data["hw"], data["weight"]
        nb = imgs.shape[0] // batch_size
        ch, cw = canvas_hw
        with_wf = "wf_idx" in data
        xs = {"img": imgs.reshape(nb, batch_size, *imgs.shape[1:]),
              "gt": gts.reshape(nb, batch_size, *gts.shape[1:]),
              "hw": hws.reshape(nb, batch_size, 2),
              "wt": wts.reshape(nb, batch_size)}
        if with_wf:
            xs["wf_idx"] = data["wf_idx"].reshape(nb, batch_size, ch * cw)
            xs["wf_weight"] = data["wf_weight"].reshape(
                nb, batch_size, ch, cw)

        def body(_, xs_b):
            img, gt, hw, wt = xs_b["img"], xs_b["gt"], xs_b["hw"], xs_b["wt"]
            if batch_sharding is not None:
                img = jax.lax.with_sharding_constraint(img, batch_sharding)
                gt = jax.lax.with_sharding_constraint(gt, batch_sharding)
            sal255, mask = _batch_native_maps(eval_step, params, img, hw,
                                              (ch, cw))
            gt_f = gt.astype(jnp.float32)
            mae, pre, rec, em = _per_image_stats(sal255, gt_f, mask)
            af = adaptive_f_per_image(sal255, gt_f, mask)
            ae = adaptive_e_per_image(sal255, gt_f, mask)
            sm = s_measure_batch(sal255 / 255.0,
                                 (gt_f > 128).astype(jnp.float32), mask)
            out = {
                "n": jnp.sum(wt),
                "mae_sum": jnp.sum(mae * wt),
                "p_sum": jnp.sum(pre * wt[:, None], axis=0),
                "r_sum": jnp.sum(rec * wt[:, None], axis=0),
                "e_sum": jnp.sum(em * wt[:, None], axis=0),
                "a_sum": jnp.sum(af * wt),
                "ae_sum": jnp.sum(ae * wt),
                "s_sum": jnp.sum(sm * wt),
            }
            if with_wf:
                wf = wf_per_image_device(sal255 / 255.0, gt, mask,
                                         xs_b["wf_idx"], xs_b["wf_weight"])
                out["w_sum"] = jnp.sum(wf * wt)
            return None, out

        _, per_batch = jax.lax.scan(body, None, xs)
        return per_batch  # leading (nb,) axis per leaf; host reduces in f64

    return fn


def make_resident_val_fn(eval_step, *, batch_size: int,
                         canvas_hw: tuple[int, int], batch_sharding=None):
    """One-dispatch validation over a resident val set.

    eval_step: a make_eval_step(lc, from_u8=True, ...) function
    (params, image_u8) -> sigmoid maps (B, Ht, Wt, 1). Per image the map is
    bilinearly resized to its native (h, w) on device, trunc-quantized to
    /255 steps and L1-scored against the native GT — the exact host
    protocol (cli/common.py val_mae). Returns val_fn(params, data) -> MAE
    scalar (host float after one dispatch)."""

    @jax.jit
    def val_fn(params, data):
        imgs, gts = data["image_u8"], data["gt_u8"]
        hws, wts = data["hw"], data["weight"]
        nb = imgs.shape[0] // batch_size
        ch, cw = canvas_hw
        xs = (imgs.reshape(nb, batch_size, *imgs.shape[1:]),
              gts.reshape(nb, batch_size, *gts.shape[1:]),
              hws.reshape(nb, batch_size, 2),
              wts.reshape(nb, batch_size))

        def body(carry, xs_b):
            img, gt, hw, wt = xs_b
            if batch_sharding is not None:
                img = jax.lax.with_sharding_constraint(img, batch_sharding)
                gt = jax.lax.with_sharding_constraint(gt, batch_sharding)
            sal255, mask = _batch_native_maps(eval_step, params, img, hw,
                                              (ch, cw))
            diff = jnp.abs(sal255 / 255.0
                           - gt.astype(jnp.float32) / 255.0) * mask
            maes = (jnp.sum(diff, axis=(1, 2))
                    / (hw[:, 0] * hw[:, 1]).astype(jnp.float32))
            s, c = carry
            return (s + jnp.sum(maes * wt), c + jnp.sum(wt)), None

        (s, c), _ = jax.lax.scan(body, (jnp.float32(0.0), jnp.float32(0.0)), xs)
        return s / c

    return val_fn
