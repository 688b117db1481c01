"""CSNet inference driver (TPU-native counterpart of the reference test.py).

Usage: python -m cli.test --config configs/csnet-L-x2.yml

Per dataset under TEST.DATASET_PATH: read images/, preprocess per the
reference protocol (fixed TEST.IMAGE_H/W resize or ceil-to-16,
test.py:71-86), run the jitted model, sigmoid, resize the map back to the
native resolution, save uint8 PNGs, then evaluate (eval driver).

Fixed-size configs compile once; the ceil-to-16 mode compiles per padded
shape (an LRU of jitted shapes) like the reference pays per-shape cuDNN
autotuning.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sod100k_tpu.arch.csnet import count_params
from sod100k_tpu.arch.layer_config import LayerConfig
from sod100k_tpu.config import get_cfg
from sod100k_tpu.data.pipeline import preprocess_test_image, resize_bilinear_np
from sod100k_tpu.interop.torch_ckpt import load_checkpoint
from sod100k_tpu.train.step import make_eval_step


def run_test(cfg, log=print) -> dict:
    from .common import enable_compile_cache

    enable_compile_cache()
    from sod100k_tpu.parallel import multihost

    multihost.init_from_env(log)  # before any backend-initializing call

    lc = LayerConfig.load(cfg.TEST.MODEL_CONFIG)
    params, meta = load_checkpoint(cfg.TEST.CHECKPOINT)
    epoch = meta.get("epoch", 0)
    log(f"=> loaded checkpoint '{cfg.TEST.CHECKPOINT}' (epoch {epoch})")
    log("  + Number of params: %.4fM" % (count_params(params) / 1e6))
    return {"epoch": epoch,
            "datasets": dump_saliency_maps(cfg, lc, params, epoch, log=log)}


def dump_saliency_maps(cfg, lc, params, epoch, log=print,
                       dir_prefix: str = "") -> dict:
    """Core of the TEST protocol with in-memory (lc, params): per dataset
    under TEST.DATASET_PATH, forward + sigmoid + resize-back + uint8 PNG
    dump into {dir_prefix}{dataset}_{epoch}. Used by run_test and by the
    finetune driver's in-loop periodic test (reference
    finetune.py:183-185,304-352, which dumps into finetune_{ds}_{epoch})."""
    import cv2

    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)

    task = cfg.TASK or cfg.MODEL.ARCH
    # fixed-size configs batch images for one dispatch per DATA.BATCH_SIZE
    # (per-image dispatch is dominated by host<->device latency); the
    # ceil-to-16 native-size mode stays per-image like the reference
    fixed = cfg.TEST.IMAGE_H != 0 and cfg.TEST.IMAGE_W != 0
    batch_size = max(cfg.DATA.BATCH_SIZE, 1) if fixed else 1
    # front-end placement (fixed-size mode only: the ceil-to-16 mode has a
    # per-image output shape, so its resize stays on host like the reference)
    mode = cfg.TPU.TEST_PREPROCESS if fixed else "host"
    dev_pre = mode == "device"
    hyb_pre = mode == "hybrid"
    if dev_pre or hyb_pre:
        from sod100k_tpu.data.device_pipeline import preprocess_infer_batch
        from sod100k_tpu.data.pipeline import _imread_rgb_u8
    # TPU-native modes also quantize the saliency map to uint8 ON DEVICE:
    # 4x less readback over the wire (the e2e bottleneck); the host-mode
    # parity path keeps the reference's f32 resize-then-quantize order
    quant = dev_pre or hyb_pre
    eval_step = make_eval_step(lc, pallas=cfg.TPU.PALLAS_DW, from_u8=hyb_pre,
                               compute_dtype=dtype, quantize_u8=quant)

    # serving-level data parallelism: fixed-size batches shard over a 1-D
    # data mesh (TPU.MESH_DEVICES; params replicated, XLA splits the batch)
    shard_mesh = None
    if fixed and batch_size > 1:
        from sod100k_tpu.parallel.mesh import replicate

        from .common import data_mesh_for

        from sod100k_tpu.arch.csnet import DEEPEST_STRIDE2_FACTOR

        mesh = data_mesh_for(cfg, batch_size, log,
                             image_h=cfg.TEST.IMAGE_H,
                             stride2_factor=DEEPEST_STRIDE2_FACTOR)
        if len(mesh.devices.flat) > 1:
            params = replicate(params, mesh)
            shard_mesh = mesh
            log(f"inference batch sharded over "
                f"{len(mesh.devices.flat)} devices")

    def ship(a, dtype=None):
        a = jnp.asarray(a) if dtype is None else jnp.asarray(a, dtype)
        if shard_mesh is not None:
            # batch over data; image-like arrays also H over spatial on a
            # 2-D TPU.MESH_SHAPE mesh (rank<3 side arrays stay data-only)
            from sod100k_tpu.parallel.mesh import feed_sharding

            return jax.device_put(a, feed_sharding(shard_mesh, a.ndim))
        return a

    results = {}
    from concurrent.futures import ThreadPoolExecutor

    # ceil-to-16 native-size batching (TEST.BATCH / cli.test --test_batch):
    # consecutive same-resized-shape images share one dispatch
    native_tb = max(int(cfg.TEST.BATCH or 1), 1) if not fixed else 1

    for dataset in cfg.TEST.DATASETS:
        sal_dir = os.path.join(cfg.DATA.SAVEDIR, task,
                               f"{dir_prefix}{dataset}_{epoch}")
        os.makedirs(sal_dir, exist_ok=True)
        img_dir = os.path.join(cfg.TEST.DATASET_PATH, dataset, "images")
        names = sorted(os.listdir(img_dir))
        t0 = time.time()

        if native_tb > 1:
            n_done = _dump_native_batched(
                cfg, eval_step, params, names, img_dir, sal_dir,
                tb=native_tb, dtype=dtype, log=log)
            dt = time.time() - t0
            log(f"Dataset: {dataset}, {n_done} images, "
                f"{n_done / dt:.2f} img/s (native batched x{native_tb})")
            results[dataset] = {"n": n_done, "sal_dir": sal_dir,
                                "img_per_sec": n_done / dt}
            continue

        def load(name):
            if dev_pre:
                img = _imread_rgb_u8(os.path.join(img_dir, name))
                return img, img.shape[:2]
            if hyb_pre:
                # host resize in uint8; normalization fused into eval_step
                img = _imread_rgb_u8(os.path.join(img_dir, name))
                h, w = img.shape[:2]
                img = cv2.resize(img, (cfg.TEST.IMAGE_W, cfg.TEST.IMAGE_H),
                                 interpolation=cv2.INTER_LINEAR)
                return img, (h, w)
            return preprocess_test_image(
                os.path.join(img_dir, name),
                (cfg.TEST.IMAGE_H, cfg.TEST.IMAGE_W))

        # one-deep software pipeline: eval_step dispatches asynchronously, so
        # batch k's device compute + wire readback overlap batch k+1's host
        # decode/resize; the blocking np.asarray happens one iteration late
        def flush(pending):
            chunk, loaded, dev_preds = pending
            preds = np.asarray(dev_preds)
            for name, (_, (h, w)), pred in zip(chunk, loaded, preds):
                if preds.dtype == np.uint8:  # device-quantized map
                    out = cv2.resize(pred[..., 0], (w, h),
                                     interpolation=cv2.INTER_LINEAR)
                else:
                    out = (resize_bilinear_np(pred[..., 0], (h, w)) * 255
                           ).astype(np.uint8)
                cv2.imwrite(os.path.join(
                    sal_dir, os.path.splitext(name)[0] + ".png"), out)

        pending = None
        with ThreadPoolExecutor(max_workers=max(cfg.DATA.WORKERS, 1)) as pool:
            for b0 in range(0, len(names), batch_size):
                chunk = names[b0:b0 + batch_size]
                loaded = list(pool.map(load, chunk))
                if dev_pre:
                    # uint8 ship + on-device resize/normalize; pad to a
                    # 64-multiple bucket so compiles are shared across batches
                    hp = max(-(-max(l[0].shape[0] for l in loaded) // 64) * 64, 64)
                    wp = max(-(-max(l[0].shape[1] for l in loaded) // 64) * 64, 64)
                    imgs = np.zeros((batch_size, hp, wp, 3), np.uint8)
                    hws = np.ones((batch_size, 2), np.int32)
                    for i, (im, (h, w)) in enumerate(loaded):
                        imgs[i, :h, :w] = im
                        hws[i] = (h, w)
                    x = preprocess_infer_batch(
                        ship(imgs), ship(hws),
                        out_hw=(cfg.TEST.IMAGE_H, cfg.TEST.IMAGE_W)).astype(dtype)
                    preds = eval_step(params, x)  # uint8 (quantize_u8)
                elif hyb_pre:
                    stack = [l[0] for l in loaded]
                    stack += [stack[-1]] * (batch_size - len(stack))
                    x = ship(np.stack(stack))  # uint8
                    preds = eval_step(params, x)  # uint8 (quantize_u8)
                elif batch_size > 1:
                    # pad the trailing partial batch to keep one compiled shape
                    stack = [l[0] for l in loaded]
                    stack += [stack[-1]] * (batch_size - len(stack))
                    x = ship(np.concatenate(stack), dtype)
                    preds = eval_step(params, x).astype(jnp.float32)
                else:
                    preds = eval_step(
                        params, jnp.asarray(loaded[0][0], dtype)
                    ).astype(jnp.float32)
                if pending is not None:
                    flush(pending)
                pending = (chunk, loaded, preds)
            if pending is not None:
                flush(pending)
        dt = time.time() - t0
        log(f"Dataset: {dataset}, {len(names)} images, {len(names) / dt:.2f} img/s")
        results[dataset] = {"n": len(names), "sal_dir": sal_dir,
                            "img_per_sec": len(names) / dt}
    return results


def _dump_native_batched(cfg, eval_step, params, names, img_dir, sal_dir,
                         *, tb: int, dtype, log=print) -> int:
    """Ceil-to-16 native-size protocol, batched (cli.test --test_batch —
    the CSNet counterpart of cli.csf --test_batch, cli/csf.py run_test).

    Consecutive images whose resized (ceil-to-16, test.py:75-86) shapes
    match are concatenated into ONE dispatch; a trailing partial group pads
    by repeating the last image (rows discarded after readback). Per-sample
    conv math is batch-independent, so the PNGs are bit-identical to the
    per-image reference loop (tests/test_cli.py pins this); the win is
    amortized dispatch latency + MXU occupancy on uniform-size lists. The
    f32 host parity dialect is kept: host normalize in, f32 maps out,
    host resize-back + *255 quantization per image. jit caches one
    executable per distinct resized shape, like the per-image mode."""
    import cv2
    from concurrent.futures import ThreadPoolExecutor

    pending = None  # one-deep pipeline, same as the fixed-size loop
    buf: list = []  # [(name, (h, w), img_1hw3_f32)]
    padded_rows = 0  # batching only wins on same-shape runs; count the
    # pad waste so ragged datasets (short runs -> near-full padding) get a
    # visible warning instead of silently computing up to tb-fold extra

    def flush(p):
        group, dev_preds, k = p
        preds = np.asarray(dev_preds)[:k]
        for (name, (h, w), _), pred in zip(group, preds):
            out = (resize_bilinear_np(pred[..., 0], (h, w)) * 255
                   ).astype(np.uint8)
            cv2.imwrite(os.path.join(
                sal_dir, os.path.splitext(name)[0] + ".png"), out)

    def dispatch():
        nonlocal pending, padded_rows
        k = len(buf)
        padded_rows += tb - k
        stack = [b[2] for b in buf] + [buf[-1][2]] * (tb - k)
        x = jnp.asarray(np.concatenate(stack), dtype)
        preds = eval_step(params, x).astype(jnp.float32)
        if pending is not None:
            flush(pending)
        pending = (list(buf), preds, k)
        buf.clear()

    def load(name):
        img, hw = preprocess_test_image(os.path.join(img_dir, name))
        return name, hw, img

    from collections import deque

    workers = max(cfg.DATA.WORKERS, 1)
    window = max(tb, workers)  # bounded look-ahead: decode the next group
    # while this group's dispatch/flush runs, without buffering the dataset
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futs: deque = deque()
        idx = 0
        for i in range(len(names)):
            while idx < len(names) and len(futs) <= window:
                futs.append(pool.submit(load, names[idx]))
                idx += 1
            name, hw, img = futs.popleft().result()
            if buf and buf[0][2].shape != img.shape:
                dispatch()  # shape break: flush the current same-shape run
            buf.append((name, hw, img))
            if len(buf) == tb:
                dispatch()
        if buf:
            dispatch()
        if pending is not None:
            flush(pending)
    total_rows = len(names) + padded_rows
    if total_rows and padded_rows / total_rows > 0.25:
        log(f"test_batch={tb}: {padded_rows}/{total_rows} dispatched rows "
            f"were padding (ragged shapes break same-shape runs) — a "
            f"smaller --test_batch will likely be faster on this dataset")
    return len(names)


def run_testall_resident(cfg, log=print) -> dict:
    """HBM-resident TESTALL: test+eval sweep with zero per-epoch wire traffic.

    The host protocol (run_testall -> run_eval) ships every image up, reads
    every map back, and round-trips PNGs through the single host core — per
    checkpoint. Here each TEST.DATASETS split is uploaded ONCE
    (u8 inputs at TEST.IMAGE_H/W + native GTs on a canvas) and every
    checkpoint_epoch{N} evaluates as ONE dispatched scan (forward ->
    native resize-back -> PNG-exact quantization -> MAE / 256-threshold
    P/R/F / E-measure / S-measure on device); only metric sums come back.
    Writes cli.eval-format artifacts under distinct "_resident" names
    (FmeasureResults_{ds}_resident.txt / FmeasureResult_{ds}_{e}_resident
    .txt — this protocol's u8-resize inputs differ sub-1/255 from the
    reference dialect, so the files never mix with cli.eval's) and returns
    the same best-by-MaxF dict. No PNG maps are produced — use the
    standard mode when the maps themselves are wanted. Counterpart of the
    reference's test.py + eval.py epoch sweep."""
    from sod100k_tpu.data.pipeline import SalData
    from sod100k_tpu.data.resident import (
        build_resident_val_dataset,
        make_resident_salmetric_fn,
    )
    from sod100k_tpu.metrics.salmetric import format_report, result_from_sums
    from sod100k_tpu.parallel.mesh import replicate

    from .common import data_mesh_for, enable_compile_cache

    enable_compile_cache()
    from sod100k_tpu.parallel import multihost

    multihost.init_from_env(log)  # before any backend-initializing call
    if not (cfg.TEST.IMAGE_H and cfg.TEST.IMAGE_W):
        raise SystemExit("TPU.TEST_RESIDENT needs fixed TEST.IMAGE_H/W "
                         "(the ceil-to-16 mode is per-image-shaped)")
    lc = LayerConfig.load(cfg.TEST.MODEL_CONFIG)
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    batch = max(cfg.DATA.BATCH_SIZE, 1)
    eval_step = make_eval_step(lc, pallas=cfg.TPU.PALLAS_DW, from_u8=True,
                               compute_dtype=dtype)
    from sod100k_tpu.arch.csnet import DEEPEST_STRIDE2_FACTOR

    mesh = data_mesh_for(cfg, batch, log, image_h=cfg.TEST.IMAGE_H,
                         stride2_factor=DEEPEST_STRIDE2_FACTOR)
    # data axis + (on a 2-D TPU.MESH_SHAPE mesh) image H on the spatial
    # axis, so each sweep dispatch uses the whole mesh
    from sod100k_tpu.parallel.mesh import epoch_feed_sharding

    bsh = (epoch_feed_sharding(mesh) if len(mesh.devices.flat) > 1
           else None)

    task = cfg.TASK or cfg.MODEL.ARCH
    out_dir = os.path.join(cfg.DATA.SAVEDIR, task)
    ckpt_dir = os.path.join(out_dir, "checkpoint")
    os.makedirs(out_dir, exist_ok=True)

    splits = {}
    for ds in cfg.TEST.DATASETS:
        sd = SalData(os.path.join(cfg.TEST.DATASET_PATH, ds),
                     (cfg.TEST.IMAGE_H, cfg.TEST.IMAGE_W), mode="val",
                     cache=cfg.TPU.DATA_CACHE)
        from sod100k_tpu.parallel.mesh import replicated

        # upload straight to the replicated placement (no transient
        # device-0 copy of the store on a multi-device mesh)
        data = build_resident_val_dataset(
            sd, (cfg.TEST.IMAGE_H, cfg.TEST.IMAGE_W), batch,
            sharding=replicated(mesh) if bsh is not None else None,
            with_wf_tables=cfg.TPU.RESIDENT_WF,
            wf_budget_bytes=cfg.TPU.RESIDENT_WF_MAX_MIB * 2**20)
        canvas_hw = data.pop("_canvas_hw")
        wf_skipped = data.pop("_wf_skipped", None)
        if wf_skipped:
            log(f"resident test split {ds}: weighted-F SKIPPED — "
                f"{wf_skipped}")
        splits[ds] = (data, make_resident_salmetric_fn(
            eval_step, batch_size=batch, canvas_hw=canvas_hw,
            batch_sharding=bsh))
        nbytes = sum(v.nbytes for v in data.values())
        log(f"resident test split {ds}: {len(sd)} images "
            f"({nbytes / 2**20:.0f} MiB in HBM)")

    best = {ds: {"max_f": 0.0, "epoch": -1} for ds in splits}
    epoch = cfg.TEST.BEGIN
    while True:
        path = os.path.join(ckpt_dir, f"checkpoint_epoch{epoch}.pth.tar")
        if not os.path.isfile(path):
            break
        params, _ = load_checkpoint(path)
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        if bsh is not None:
            params = replicate(params, mesh)
        for ds, (data, fn) in splits.items():
            res = result_from_sums(fn(params, data))
            # distinct "_resident" artifact names: these numbers come from
            # the u8-resize + device-resize-back protocol (sub-1/255 input
            # delta vs the reference dialect) and must never clobber or mix
            # with cli.eval's reference-protocol FmeasureResults files
            report = (f"epoch {epoch} {ds} [resident]: "
                      f"MaxF {res['max_f']:.6f} MAE {res['mae']:.6f} "
                      f"MeanF {res['mean_f']:.6f} "
                      f"AdpF {res['adaptive_f']:.6f} "
                      f"MaxE {res['max_e']:.6f} "
                      f"MeanE {res['mean_e']:.6f} "
                      f"AdpE {res['adaptive_e']:.6f} "
                      f"S {res['s_measure']:.6f}")
            if "weighted_f" in res:
                report += f" wF {res['weighted_f']:.6f}"
            log(report)
            with open(os.path.join(
                    out_dir, f"FmeasureResults_{ds}_resident.txt"),
                    "a") as flog:
                flog.write(report + "\n")
            with open(os.path.join(
                    out_dir, f"FmeasureResult_{ds}_{epoch}_resident.txt"),
                    "w") as f:
                f.write(format_report(res))
            if res["max_f"] > best[ds]["max_f"]:
                best[ds] = {"max_f": res["max_f"], "epoch": epoch}
        epoch += cfg.TEST.INTERVAL
    for ds, b in best.items():
        log(f"best for {ds}: MaxF {b['max_f']:.6f} @ epoch {b['epoch']}")
    return best


def run_testall(cfg, log=print) -> list:
    """TEST.TESTALL protocol: sweep checkpoint_epoch{N} from TEST.BEGIN every
    TEST.INTERVAL epochs (reference test/eval epoch-range traversal)."""
    ckpt_dir = os.path.join(cfg.DATA.SAVEDIR, cfg.TASK or cfg.MODEL.ARCH,
                            "checkpoint")
    results = []
    epoch = cfg.TEST.BEGIN
    while True:
        path = os.path.join(ckpt_dir, f"checkpoint_epoch{epoch}.pth.tar")
        if not os.path.isfile(path):
            break
        c = cfg.clone()
        c.TEST.CHECKPOINT = path
        results.append(run_test(c, log=log))
        epoch += cfg.TEST.INTERVAL
    return results


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU SOD inference (CSNet)")
    parser.add_argument("--config", required=True, metavar="FILE")
    parser.add_argument("--skip-eval", action="store_true")
    parser.add_argument("--test_batch", type=int, default=0, metavar="N",
                        help="ceil-to-16 native-size mode: batch up to N "
                        "consecutive same-resized-shape images per dispatch "
                        "(bit-identical PNGs; overrides TEST.BATCH). "
                        "Fixed-size configs batch via DATA.BATCH_SIZE.")
    args = parser.parse_args()
    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if args.test_batch:
        cfg.TEST.BATCH = args.test_batch
    if not cfg.TASK:
        cfg.TASK = cfg.MODEL.ARCH
    if cfg.TEST.TESTALL:
        if cfg.TPU.TEST_RESIDENT:
            run_testall_resident(cfg)  # metrics inline; no PNGs / no eval pass
            return
        runs = run_testall(cfg)
        if runs and not args.skip_eval:
            from .eval import run_eval

            lo = min(r["epoch"] for r in runs)
            hi = max(r["epoch"] for r in runs)
            run_eval(cfg, epoch_range=(lo, hi + 1))
        return
    res = run_test(cfg)
    if not args.skip_eval:
        from .eval import run_eval

        run_eval(cfg, epoch_range=(res["epoch"], res["epoch"] + 1))


if __name__ == "__main__":
    main()
