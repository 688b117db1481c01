"""Prune-and-finetune driver (counterpart of the reference finetune.py).

Usage: python -m cli.finetune --config <yml> --epoch N [--epochs M]

Flow (finetune.py:85-207): rebuild the epoch-0 architecture from
layer_configs/layer_config_0.bin, load checkpoint_epoch{N}, prune BN-gamma
channels below FINETUNE.THRES into a slim layer_config
(saved as layer_config_finetune_{N}.bin), then retrain with plain
Adam/SGD + step or cosine LR on BCE only (no FLOPs penalty), checkpointing
under finetune_checkpoint_epoch{N}/. TEST.ENABLE dumps test-set saliency
PNGs into finetune_{dataset}_{epoch} every TEST.INTERVAL epochs from
TEST.BEGIN (the reference's in-loop periodic test,
finetune.py:183-185,304-352).

Deliberate fix vs the reference: the optimizer is created *after* pruning
(the reference builds it against the pre-prune parameters, finetune.py:112-123
vs :165-173, so the rebuilt model's tensors were never registered with it).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sod100k_tpu.arch.csnet import count_params
from sod100k_tpu.arch.layer_config import LayerConfig
from sod100k_tpu.config import get_cfg
from sod100k_tpu.data.pipeline import (
    SalData,
    batches,
    device_prefetch,
    hybrid_batches,
)
from sod100k_tpu.parallel.mesh import replicate
from sod100k_tpu.prune.finetune import prune
from sod100k_tpu.train.optim import cosine_lr, make_adam, make_sgd, multistep_lr
from sod100k_tpu.train.params import merge, partition
from sod100k_tpu.train.step import make_eval_step, make_train_step

from .common import (
    Logger,
    load_any_checkpoint,
    resolve_dirs,
    save_torch_checkpoint,
    val_mae,
)


def run_finetune(cfg, from_epoch: int, max_epochs: int | None = None,
                 log=None) -> dict:
    from .common import enable_compile_cache

    enable_compile_cache()
    # multi-host init must precede any backend-initializing jax call
    from sod100k_tpu.parallel import multihost

    multihost.init_from_env(log or print)
    dirs = resolve_dirs(cfg)
    log = log or Logger(dirs["base"], "logfinetune", dirs["task"])

    lc0 = LayerConfig.load(
        os.path.join(dirs["layer_configs"], "layer_config_0.bin"))
    ck = os.path.join(dirs["checkpoint"],
                      f"checkpoint_epoch{from_epoch}.pth.tar")
    if not os.path.isfile(ck):
        raise SystemExit(f"=> no checkpoint found at '{ck}'")
    params, _, _ = load_any_checkpoint(ck)
    log(f"=> loaded checkpoint '{ck}' (epoch {from_epoch})")
    log("  + Number of params before: %.4fM" % (count_params(params) / 1e6))

    log("Finetune to slim model.")
    params, lc, _masks = prune(params, lc0, cfg.FINETUNE.THRES)
    lc.save(os.path.join(dirs["layer_configs"],
                         f"layer_config_finetune_{from_epoch}.bin"))
    log("  + Number of params after: %.4fM" % (count_params(params) / 1e6))

    trainable, state = partition(jax.tree.map(jnp.asarray, params))
    sol = cfg.FINETUNE.SOLVER
    if sol.METHOD == "SGD":
        tx = make_sgd(momentum=sol.MOMENTUM, weight_decay=sol.WEIGHT_DECAY)
    else:
        tx = make_adam(weight_decay=sol.WEIGHT_DECAY)
    opt_state = tx.init(trainable)

    preprocess = cfg.TPU.PREPROCESS  # "host" | "hybrid" | "device" | "resident"
    if preprocess not in ("host", "hybrid", "device", "resident"):
        raise SystemExit(f"TPU.PREPROCESS must be host|hybrid|device|resident, "
                         f"got {preprocess!r}")
    hybrid = preprocess == "hybrid"
    step = make_train_step(lc, tx, flops_weight=0.0,
                           batch_size=cfg.DATA.BATCH_SIZE,
                           from_u8=hybrid,
                           compute_dtype=jnp.bfloat16
                           if cfg.TPU.DTYPE == "bfloat16" else None,
                           donate=preprocess != "resident")
    eval_step = make_eval_step(lc)

    from .common import data_mesh_for

    from sod100k_tpu.arch.csnet import DEEPEST_STRIDE2_FACTOR

    mesh = data_mesh_for(cfg, cfg.DATA.BATCH_SIZE, log,
                         image_h=cfg.DATA.IMAGE_H,
                         stride2_factor=DEEPEST_STRIDE2_FACTOR)
    trainable = replicate(trainable, mesh)
    state = replicate(state, mesh)
    opt_state = replicate(opt_state, mesh)

    ft_dir = os.path.join(dirs["base"], f"finetune_checkpoint_epoch{from_epoch}")
    os.makedirs(ft_dir, exist_ok=True)
    train_ds = SalData(cfg.DATA.DIR, (cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W),
                       mode="train", seed=cfg.TPU.SEED,
                       cache=cfg.TPU.DATA_CACHE)
    val_ds = SalData(cfg.VAL.DIR, (cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W),
                     mode="val", cache=cfg.TPU.DATA_CACHE) \
        if cfg.VAL.DIR else None

    resident_data = epoch_fn = None
    resident_val_data = resident_val_fn = None
    if preprocess == "resident":
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
        resident_data = build_resident_dataset(
            train_ds, store_hw=(cfg.TPU.RESIDENT_STORE_HW,) * 2,
            sharding=replicated(mesh))
        # the reference's <=15-px crop at 224, scaled to the store size
        max_crop = max(1, round(15 * cfg.TPU.RESIDENT_STORE_HW / 224))
        epoch_fn = make_resident_epoch_fn(
            step, batch_size=cfg.DATA.BATCH_SIZE,
            out_hw=(cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W), max_crop=max_crop,
            batch_sharding=_bs(mesh) if len(mesh.devices.flat) > 1 else None)
        if val_ds is not None:
            vdata = build_resident_val_dataset(
                val_ds, (cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W),
                cfg.DATA.BATCH_SIZE, sharding=replicated(mesh))
            canvas_hw = vdata.pop("_canvas_hw")
            resident_val_data = vdata
            # validation always scores in f32 (the host-path protocol),
            # independent of TPU.DTYPE, so best-epoch picks don't shift
            # between preprocess modes
            resident_val_fn = make_resident_val_fn(
                make_eval_step(lc, from_u8=True),
                batch_size=cfg.DATA.BATCH_SIZE, canvas_hw=canvas_hw,
                batch_sharding=_bs(mesh) if len(mesh.devices.flat) > 1
                else None)

    best_mae, best_epoch = float("inf"), -1
    epochs = max_epochs if max_epochs is not None else sol.MAX_EPOCHS
    step_warmed = False  # multi-host: compile-barrier before first dispatch
    for epoch in range(epochs):
        if sol.ADJUST_STEP and sol.LR_SCHEDULER == "cosine":
            lr = cosine_lr(sol.LR, epoch, sol.MAX_EPOCHS)
        elif sol.ADJUST_STEP:
            lr = multistep_lr(sol.LR, sol.STEPS, epoch)
        else:
            lr = sol.LR
        log(f"lr: {lr}")
        if preprocess == "resident":
            ekey = jax.random.key(cfg.TPU.SEED * 7_777_771 + epoch)
            if not step_warmed:
                multihost.compile_barrier(
                    epoch_fn, trainable, state, opt_state, resident_data,
                    ekey, jnp.float32(lr), jnp.float32(0.0),
                    name="ft-resident-epoch")
                step_warmed = True
            trainable, state, opt_state, loss_arr, _ = epoch_fn(
                trainable, state, opt_state, resident_data, ekey,
                jnp.float32(lr), jnp.float32(0.0))
            nb = int(loss_arr.shape[0])
            log(f"FtEpoch: [{epoch + 1}][{nb} steps, one dispatch]\t"
                f"Loss {float(loss_arr[-1]):.4f}")
        else:
            if preprocess == "device":
                # host decodes uint8 only; crop/flip/resize/normalize run as
                # one jitted device program (same front-end as cli.train)
                from sod100k_tpu.data.pipeline import raw_batches

                it = raw_batches(train_ds, cfg.DATA.BATCH_SIZE, shuffle=True,
                                 seed=cfg.TPU.SEED + epoch,
                                 num_threads=cfg.DATA.WORKERS)
            elif hybrid:
                # same uint8 host aug/resize + fused normalize as cli.train
                it = hybrid_batches(train_ds, cfg.DATA.BATCH_SIZE,
                                    shuffle=True, seed=cfg.TPU.SEED + epoch,
                                    num_threads=cfg.DATA.WORKERS)
            else:
                it = batches(train_ds, cfg.DATA.BATCH_SIZE, shuffle=True,
                             seed=cfg.TPU.SEED + epoch,
                             num_threads=cfg.DATA.WORKERS)
            nb = 0
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
                else:
                    feed = ({"image": batch["image_u8"],
                             "target": batch["target_u8"]}
                            if hybrid else
                            {"image": batch["image"],
                             "target": batch["target"]})
                if not step_warmed:
                    multihost.compile_barrier(
                        step, trainable, state, opt_state, feed,
                        jnp.float32(lr), jnp.float32(0.0), name="ft-step")
                    step_warmed = True
                trainable, state, opt_state, m = step(
                    trainable, state, opt_state, feed,
                    jnp.float32(lr), jnp.float32(0.0),
                )
                nb += 1
                if nb % cfg.PRINT_FREQ == 0:
                    log(f"FtEpoch: [{epoch + 1}][{nb}]\t"
                        f"Loss {float(m['loss']):.4f}")
        mae = float("nan")
        params_dev = merge(trainable, state)  # stays on device for val
        if resident_val_fn is not None:
            if epoch == 0:
                multihost.compile_barrier(resident_val_fn, params_dev,
                                          resident_val_data,
                                          name="ft-resident-val")
            mae = float(resident_val_fn(params_dev, resident_val_data))
        elif val_ds is not None:
            mae = val_mae(eval_step, params_dev, val_ds,
                          cfg.DATA.BATCH_SIZE, log)
        if (cfg.TEST.ENABLE and cfg.TEST.DATASET_PATH
                and (epoch + 1) >= cfg.TEST.BEGIN
                and (epoch + 1) % cfg.TEST.INTERVAL == 0):
            # in-loop periodic test (reference finetune.py:183-185,304-352):
            # saliency-PNG dumps into finetune_{dataset}_{epoch} every
            # TEST.INTERVAL epochs from TEST.BEGIN — how the reference picks
            # its best finetuned epoch in practice
            from .test import dump_saliency_maps

            log("Start testing.")
            dump_saliency_maps(cfg, lc, params_dev, epoch + 1, log=log,
                               dir_prefix="finetune_")
        if mae < best_mae:
            best_mae, best_epoch = mae, epoch + 1
        log(f" epoch: {epoch + 1} mae: {mae} best_epoch: {best_epoch} "
            f"best_mae: {best_mae}")
        save_torch_checkpoint(
            os.path.join(ft_dir, f"checkpoint_epoch{epoch + 1}.pth.tar"),
            jax.tree.map(np.asarray, params_dev),  # one host readback
            epoch=epoch + 1, arch=cfg.MODEL.ARCH,
            opt_state=opt_state,
        )
    return {"best_mae": best_mae, "best_epoch": best_epoch, "lc": lc,
            "ft_dir": ft_dir}


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU SOD prune + finetune")
    parser.add_argument("--config", required=True, metavar="FILE")
    parser.add_argument("--epoch", required=True, type=int,
                        help="training epoch checkpoint to prune from")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override FINETUNE.SOLVER.MAX_EPOCHS")
    args = parser.parse_args()
    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if not cfg.TASK:
        cfg.TASK = cfg.MODEL.ARCH
    run_finetune(cfg, from_epoch=args.epoch, max_epochs=args.epochs)


if __name__ == "__main__":
    main()
