"""CSNet training driver (TPU-native counterpart of the reference train.py).

Usage: python -m cli.train --config configs/csnet-L-x2_train.yml [--epochs N]

Reproduces the reference recipe (train.py:67-181): architecture from
AUTO (init_layers or predefined pickle), Adam with the dynamic-weight-decay
group split, MultiStepLR stepped at epoch starts, BCE + FLOPs penalty while
epoch < AUTO.FINETUNE, per-epoch val MAE with best-epoch tracking, and
reference-format per-epoch checkpoints. Data parallelism runs over a
jax.sharding mesh (TPU.MESH_DEVICES).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sod100k_tpu.config import get_cfg
from sod100k_tpu.data.pipeline import (
    SalData,
    batches,
    device_prefetch,
    hybrid_batches,
    raw_batches,
)
from sod100k_tpu.parallel.mesh import replicate
from sod100k_tpu.train.optim import make_adam, make_adam_dwd, multistep_lr
from sod100k_tpu.train.params import merge, partition
from sod100k_tpu.train.step import make_eval_step, make_train_step

from .common import (
    Logger,
    build_model_from_cfg,
    load_any_checkpoint,
    resolve_dirs,
    save_torch_checkpoint,
    val_mae,
)


def _restore_opt_state(fresh_opt_state, loaded, log):
    """Rebuild the optax state from checkpointed leaves, validating the leaf
    list (count + shape + dtype pairwise) against the freshly-initialized
    state before trusting unflatten — leaf order is optax-version-dependent,
    so a silent mismatch would corrupt moments. Falls back to the fresh state
    with a logged warning."""
    fresh_leaves = jax.tree.leaves(fresh_opt_state)
    loaded_leaves = jax.tree.leaves(loaded)
    if len(fresh_leaves) != len(loaded_leaves):
        log(f"optimizer state incompatible (leaf count "
            f"{len(loaded_leaves)} != {len(fresh_leaves)}); reinitialized")
        return fresh_opt_state
    for i, (f, l) in enumerate(zip(fresh_leaves, loaded_leaves)):
        if tuple(np.shape(f)) != tuple(np.shape(l)):
            log(f"optimizer state incompatible (leaf {i} shape "
                f"{np.shape(l)} != {np.shape(f)}); reinitialized")
            return fresh_opt_state
        if np.asarray(l).dtype != np.asarray(f).dtype:
            log(f"optimizer state incompatible (leaf {i} dtype "
                f"{np.asarray(l).dtype} != {np.asarray(f).dtype}); "
                "reinitialized")
            return fresh_opt_state
    try:
        return jax.tree.unflatten(jax.tree.structure(fresh_opt_state),
                                  [jnp.asarray(l) for l in loaded_leaves])
    except Exception as e:  # defensive: never let resume corrupt a run
        log(f"optimizer state incompatible ({e}); reinitialized")
        return fresh_opt_state


def run_training(cfg, max_epochs: int | None = None, log=None) -> dict:
    from .common import enable_compile_cache

    enable_compile_cache()
    # multi-host init MUST precede any backend-initializing jax call
    # (jax.distributed.initialize raises once backends exist); the
    # data_mesh_for call later is an idempotent fallback
    from sod100k_tpu.parallel import multihost

    multihost.init_from_env(log or print)
    dirs = resolve_dirs(cfg)
    log = log or Logger(dirs["base"], "logtrain", dirs["task"])
    log(cfg, display=False)

    if not cfg.AUTO.ENABLE:
        raise SystemExit("Enable AUTO to train CSNet!")  # train.py:82
    lc, params = build_model_from_cfg(cfg, dirs, log)
    if cfg.DATA.PRETRAIN:
        from sod100k_tpu.interop.torch_ckpt import load_pretrained

        params = load_pretrained(params, cfg.DATA.PRETRAIN)
        log(f"partial-loaded pretrained weights from {cfg.DATA.PRETRAIN}")
    trainable, state = partition(params)

    if cfg.SOLVER.METHOD == "Adam_dynamic_weight_decay":
        log("Setting wd of bn in ILBlock to 0.")
        tx = make_adam_dwd(trainable, weight_decay=cfg.SOLVER.WEIGHT_DECAY,
                           decay_conv3x3_2=cfg.TPU.WD_QUIRK)
    else:
        tx = make_adam(weight_decay=cfg.SOLVER.WEIGHT_DECAY)
    opt_state = tx.init(trainable)

    start_epoch = 0
    if cfg.DATA.RESUME and os.path.isdir(cfg.DATA.RESUME):
        # native Orbax resume (directories written under TPU.ORBAX)
        from sod100k_tpu.train.checkpoint import restore_native

        log(f"=> loading orbax checkpoint '{cfg.DATA.RESUME}'")
        restored = restore_native(cfg.DATA.RESUME)
        trainable = jax.tree.map(jnp.asarray, restored["trainable"])
        state = jax.tree.map(jnp.asarray, restored["state"])
        opt_state = _restore_opt_state(opt_state, restored["opt_state"], log)
        start_epoch = int(restored["epoch"])
        log(f"=> loaded orbax checkpoint (epoch {start_epoch})")
    elif cfg.DATA.RESUME and os.path.isfile(cfg.DATA.RESUME):
        log(f"=> loading checkpoint '{cfg.DATA.RESUME}'")
        rparams, start_epoch, ropt = load_any_checkpoint(cfg.DATA.RESUME)
        trainable, state = partition(rparams)
        if ropt is not None:
            opt_state = _restore_opt_state(opt_state, ropt, log)
        log(f"=> loaded checkpoint (epoch {start_epoch})")

    flops_on = cfg.AUTO.FLOPS.ENABLE
    flops_expand = cfg.AUTO.FLOPS.EXPAND if cfg.AUTO.FLOPS.EXPAND != -1.0 else 2.0
    preprocess = cfg.TPU.PREPROCESS  # "host" | "hybrid" | "device" | "resident"
    if preprocess not in ("host", "hybrid", "device", "resident"):
        raise SystemExit(f"TPU.PREPROCESS must be host|hybrid|device|resident, "
                         f"got {preprocess!r}")
    step = make_train_step(
        lc, tx,
        flops_weight=cfg.AUTO.FLOPS.WEIGHT if flops_on else 0.0,
        flops_expand=flops_expand,
        batch_size=cfg.DATA.BATCH_SIZE,
        mloss=cfg.LOSS.MLOSS,
        compute_dtype=jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else None,
        from_u8=preprocess == "hybrid",
        donate=preprocess != "resident",  # resident's epoch scan owns donation
    )
    eval_step = make_eval_step(lc)

    from .common import data_mesh_for

    from sod100k_tpu.arch.csnet import DEEPEST_STRIDE2_FACTOR

    mesh = data_mesh_for(cfg, cfg.DATA.BATCH_SIZE, log,
                         image_h=cfg.DATA.IMAGE_H,
                         stride2_factor=DEEPEST_STRIDE2_FACTOR)
    trainable = replicate(trainable, mesh)
    state = replicate(state, mesh)
    opt_state = replicate(opt_state, mesh)

    train_ds = SalData(cfg.DATA.DIR, (cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W),
                       mode="train", seed=cfg.TPU.SEED,
                       cache=cfg.TPU.DATA_CACHE)
    val_ds = SalData(cfg.VAL.DIR, (cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W),
                     mode="val", cache=cfg.TPU.DATA_CACHE) \
        if cfg.VAL.DIR else None

    resident_data = epoch_fn = None
    resident_val_data = resident_val_fn = None
    if preprocess == "resident":
        # upload the whole (uint8, canonical-size) training set to HBM once;
        # each epoch is then ONE dispatched program: on-device shuffle ->
        # scan(gather -> augment -> train step). See data/resident.py.
        from sod100k_tpu.data.resident import (
            build_resident_dataset,
            build_resident_val_dataset,
            make_resident_epoch_fn,
            make_resident_val_fn,
        )
        from sod100k_tpu.parallel.mesh import epoch_feed_sharding as _bs
        from sod100k_tpu.parallel.mesh import replicated

        if len(train_ds) < cfg.DATA.BATCH_SIZE:
            raise SystemExit(
                f"TPU.PREPROCESS=resident needs at least one full batch: "
                f"dataset has {len(train_ds)} images < DATA.BATCH_SIZE="
                f"{cfg.DATA.BATCH_SIZE}")
        # upload directly to the replicated placement (no transient
        # device-0 copy of the multi-GB store on a multi-device mesh)
        resident_data = build_resident_dataset(
            train_ds, store_hw=(cfg.TPU.RESIDENT_STORE_HW,) * 2,
            sharding=replicated(mesh))
        # the reference crops <=15 px at its 224 train size
        # (prepare_data.py:26-88); express that fraction at the store scale
        max_crop = max(1, round(15 * cfg.TPU.RESIDENT_STORE_HW / 224))
        epoch_fn = make_resident_epoch_fn(
            step, batch_size=cfg.DATA.BATCH_SIZE,
            out_hw=(cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W), max_crop=max_crop,
            batch_sharding=_bs(mesh) if len(mesh.devices.flat) > 1 else None)
        n_imgs = int(resident_data["image_u8"].shape[0])
        log(f"resident dataset: {n_imgs} images @"
            f"{cfg.TPU.RESIDENT_STORE_HW}px uint8 = "
            f"{sum(a.nbytes for a in resident_data.values()) / 2**20:.0f} MiB"
            " in HBM")
        if val_ds is not None:
            # the val split lives in HBM too (model-size inputs + native
            # GTs); each per-epoch validation is then one dispatch instead
            # of a wire-bound host loop. Validation always scores in f32 —
            # the same protocol as the host val path — regardless of
            # TPU.DTYPE, so best-epoch selection is mode-independent.
            vdata = build_resident_val_dataset(
                val_ds, (cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W),
                cfg.DATA.BATCH_SIZE, sharding=replicated(mesh))
            canvas_hw = vdata.pop("_canvas_hw")
            resident_val_data = vdata
            resident_val_fn = make_resident_val_fn(
                make_eval_step(lc, from_u8=True),
                batch_size=cfg.DATA.BATCH_SIZE, canvas_hw=canvas_hw,
                batch_sharding=_bs(mesh) if len(mesh.devices.flat) > 1
                else None)
            log(f"resident val set: {len(val_ds)} images, native canvas "
                f"{canvas_hw}, "
                f"{sum(a.nbytes for a in vdata.values()) / 2**20:.0f} MiB"
                " in HBM")

    best_mae, best_epoch = float("inf"), -1
    epochs = max_epochs if max_epochs is not None else cfg.SOLVER.MAX_EPOCHS
    history = []
    step_warmed = False  # multi-host: compile-barrier before first dispatch
    import time as _time
    for epoch in range(start_epoch, epochs):
        t_epoch = _time.perf_counter()
        lr = multistep_lr(cfg.SOLVER.LR, cfg.SOLVER.STEPS, epoch) \
            if cfg.SOLVER.ADJUST_STEP else cfg.SOLVER.LR
        log(f"lr: {lr}")
        if cfg.PRUNE.BNS and cfg.PRUNE.SHOW:
            # BN-gamma observability for the pruning scheme (foo_bns,
            # reference train.py:320-330)
            for path, leaf in jax.tree_util.tree_leaves_with_path(trainable):
                name = jax.tree_util.keystr(path)
                if "bns" in name and name.endswith("['scale']"):
                    log(f"{name}: {np.asarray(leaf)}", display=False)
        penalty_on = jnp.float32(1.0 if epoch < cfg.AUTO.FINETUNE else 0.0)

        profiling = bool(cfg.TPU.PROFILE_DIR) and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
        if preprocess == "resident":
            # whole epoch in one dispatched program; the float() readbacks
            # below force execution (block_until_ready lies on this tunnel)
            ekey = jax.random.key(cfg.TPU.SEED * 7_777_777 + epoch)
            if not step_warmed:
                # compile everywhere, barrier, THEN dispatch: the collective
                # transport's rendezvous times out (~30 s gloo) if one
                # process is still compiling when its peers dispatch
                multihost.compile_barrier(
                    epoch_fn, trainable, state, opt_state, resident_data,
                    ekey, jnp.float32(lr), penalty_on, name="resident-epoch")
                step_warmed = True
            trainable, state, opt_state, loss_arr, pen_arr = epoch_fn(
                trainable, state, opt_state, resident_data, ekey,
                jnp.float32(lr), penalty_on)
            losses, pens = float(loss_arr[-1]), float(pen_arr[-1])
            nb = int(loss_arr.shape[0])
            log(f"Epoch: [{epoch + 1}][{nb} steps, one dispatch]\t"
                f"Loss {losses:.4f}\tFakeFLOPs {pens:.3f}")
        else:
            if preprocess == "device":
                # host decodes uint8 only; crop/flip/resize/normalize run as
                # one jitted device program (preprocess_train_batch)
                it = raw_batches(train_ds, cfg.DATA.BATCH_SIZE, shuffle=True,
                                 seed=cfg.TPU.SEED + epoch,
                                 num_threads=cfg.DATA.WORKERS)
            elif preprocess == "hybrid":
                # host augments/resizes in uint8; normalization is fused
                # into the train-step dispatch (step was built with from_u8)
                it = hybrid_batches(train_ds, cfg.DATA.BATCH_SIZE,
                                    shuffle=True, seed=cfg.TPU.SEED + epoch,
                                    num_threads=cfg.DATA.WORKERS)
            else:
                it = batches(train_ds, cfg.DATA.BATCH_SIZE, shuffle=True,
                             seed=cfg.TPU.SEED + epoch,
                             num_threads=cfg.DATA.WORKERS)
            losses, pens, nb = 0.0, 0.0, 0
            aug_key = jax.random.key(cfg.TPU.SEED * 1_000_003 + epoch)
            for batch in device_prefetch(it, mesh=mesh):
                if preprocess == "device":
                    from sod100k_tpu.data.device_pipeline import (
                        preprocess_train_batch,
                    )

                    feed = preprocess_train_batch(
                        batch["image_u8"], batch["gt_u8"], batch["valid_hw"],
                        jax.random.fold_in(aug_key, nb),
                        out_hw=(cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W))
                elif preprocess == "hybrid":
                    feed = {"image": batch["image_u8"],
                            "target": batch["target_u8"]}
                else:
                    feed = {"image": batch["image"], "target": batch["target"]}
                if not step_warmed:
                    # see the resident branch: compile everywhere, barrier,
                    # then dispatch the first collective (gradient psum)
                    multihost.compile_barrier(
                        step, trainable, state, opt_state, feed,
                        jnp.float32(lr), penalty_on, name="train-step")
                    step_warmed = True
                trainable, state, opt_state, m = step(
                    trainable, state, opt_state, feed,
                    jnp.float32(lr), penalty_on,
                )
                nb += 1
                if profiling and nb >= cfg.TPU.PROFILE_STEPS:
                    float(m["loss"])  # drain the traced steps before stopping
                    jax.profiler.stop_trace()
                    profiling = False
                    log(f"profiler trace written to {cfg.TPU.PROFILE_DIR}")
                if nb % cfg.PRINT_FREQ == 0:
                    losses, pens = float(m["loss"]), float(m["penalty"])
                    log(f"Epoch: [{epoch + 1}][{nb}]\tLoss {losses:.4f}\t"
                        f"FakeFLOPs {pens:.3f}")
            if nb:
                # value readback, not block_until_ready: over the axon tunnel
                # the latter can ack at dispatch, before execution finishes
                float(m["loss"])

        if profiling:  # resident mode, or epoch shorter than PROFILE_STEPS
            jax.profiler.stop_trace()
            profiling = False
            log(f"profiler trace written to {cfg.TPU.PROFILE_DIR}")
        epoch_secs = _time.perf_counter() - t_epoch
        ips = nb * cfg.DATA.BATCH_SIZE / max(epoch_secs, 1e-9)
        log(f"epoch time: {epoch_secs:.1f}s ({ips:.1f} img/s)")
        # per-epoch device-memory print (reference train.py:185-186
        # torch.cuda.max_memory_allocated equivalent)
        stats = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            log(f"max memory allocated: "
                f"{stats['peak_bytes_in_use'] / 2**20:.1f} MiB")

        mae = float("nan")
        # current params stay on device for validation (the old
        # device->host->device round-trip of every leaf cost two full
        # param transfers per epoch over the ~35 ms-RPC tunnel)
        params_dev = merge(trainable, state)
        if resident_val_fn is not None:
            # one-dispatch validation over the HBM-resident val set; float()
            # forces the readback (see the tunnel note above)
            if epoch == start_epoch:
                multihost.compile_barrier(resident_val_fn, params_dev,
                                          resident_val_data,
                                          name="resident-val")
            mae = float(resident_val_fn(params_dev, resident_val_data))
        elif val_ds is not None:
            mae = val_mae(eval_step, params_dev, val_ds, cfg.DATA.BATCH_SIZE, log)
        if mae < best_mae:
            best_mae, best_epoch = mae, epoch + 1
        log(f" epoch: {epoch + 1} mae: {mae} best_epoch: {best_epoch} "
            f"best_mae: {best_mae}")
        history.append({"epoch": epoch + 1, "mae": mae, "loss": losses,
                        "secs": epoch_secs, "img_per_sec": ips})

        # multi-host: one writer (params/opt state are replicated, so the
        # primary's readback sees the same values every host would)
        from sod100k_tpu.parallel.multihost import is_primary

        if is_primary():
            save_torch_checkpoint(
                os.path.join(dirs["checkpoint"],
                             f"checkpoint_epoch{epoch + 1}.pth.tar"),
                jax.tree.map(np.asarray, params_dev),  # one host readback
                epoch=epoch + 1, arch=cfg.MODEL.ARCH,
                opt_state=opt_state,
            )
            if cfg.TPU.ORBAX:
                from sod100k_tpu.train.checkpoint import save_native

                save_native(
                    os.path.join(dirs["checkpoint"], f"orbax_epoch{epoch + 1}"),
                    trainable, state, opt_state, epoch + 1,
                )
    return {"best_mae": best_mae, "best_epoch": best_epoch, "history": history,
            "lc": lc, "dirs": dirs}


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU SOD training (CSNet)")
    parser.add_argument("--config", required=True, metavar="FILE")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override SOLVER.MAX_EPOCHS")
    args = parser.parse_args()
    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if not cfg.TASK:
        cfg.TASK = cfg.MODEL.ARCH
    run_training(cfg, max_epochs=args.epochs)


if __name__ == "__main__":
    main()
