"""Shared CLI plumbing: logging tee, checkpoint IO, model building from cfg.

Checkpoints are written in the reference's torch format
({'epoch','arch','state_dict','optimizer'}, train.py:174-181) so reference
tooling can read ours; our optax state rides along as numpy pytrees under
'optimizer'. Architecture snapshots are the same pickled layer_config .bin
files (csnet.py:541-568).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sod100k_tpu.arch.layer_config import LayerConfig, init_layers
from sod100k_tpu.interop.torch_ckpt import (
    load_checkpoint,
    pytree_to_state_dict,
    state_dict_to_pytree,
)


def data_mesh_for(cfg, batch_size: int, log=print, *, image_h: int = 0,
                  stride2_factor: int = 0):
    """Mesh for the training/eval feeds. TPU.MESH_SHAPE "DxS" builds the 2-D
    data x spatial mesh (batch over data, image H over spatial — the lever
    when batch_size < device count); otherwise a 1-D data mesh sized to
    TPU.MESH_DEVICES (0 = all visible), clamped to the largest device count
    that divides the batch (GSPMD shards the batch axis evenly).

    image_h + stride2_factor (the model's cumulative downsampling at its
    deepest strided conv, e.g. arch.csnet.DEEPEST_STRIDE2_FACTOR) enable the
    GSPMD validity check for the 2-D path — spatially-sharded strided convs
    silently compute wrong values below a measured extent
    (parallel.mesh.MIN_STRIDE2_INPUT; docs/DESIGN.md §10)."""
    from sod100k_tpu.parallel import multihost
    from sod100k_tpu.parallel.mesh import (
        check_spatial_extent,
        make_mesh,
        make_mesh_2d,
        parse_mesh_shape,
    )

    # multi-host: one process per pod host, one global mesh (SOD100K_* env,
    # parallel/multihost.py). A no-op unless the env opts in.
    multihost.init_from_env(log)

    if cfg.TPU.MESH_SHAPE:
        try:
            d, s = parse_mesh_shape(cfg.TPU.MESH_SHAPE)
        except ValueError as e:
            raise SystemExit(str(e))
        if batch_size % d:
            raise SystemExit(
                f"TPU.MESH_SHAPE={cfg.TPU.MESH_SHAPE}: data axis {d} must "
                f"divide DATA.BATCH_SIZE={batch_size}")
        if image_h and stride2_factor:
            try:
                check_spatial_extent(image_h, stride2_factor, s)
            except ValueError as e:
                raise SystemExit(f"TPU.MESH_SHAPE={cfg.TPU.MESH_SHAPE}: {e}")
        try:
            mesh = make_mesh_2d(d, s)
            multihost.check_mesh_process_layout(mesh)
        except ValueError as e:  # not enough devices / axis crosses hosts
            raise SystemExit(f"TPU.MESH_SHAPE={cfg.TPU.MESH_SHAPE}: {e}")
        log(f"2-D mesh: {d} data x {s} spatial devices")
        return mesh
    if cfg.TPU.MESH_DEVICES < 0:
        raise SystemExit(f"TPU.MESH_DEVICES must be >= 0 "
                         f"(0 = all visible), got {cfg.TPU.MESH_DEVICES}")
    want = min(cfg.TPU.MESH_DEVICES or len(jax.devices()), len(jax.devices()))
    n = want
    while batch_size % n:
        n -= 1
    if multihost.is_multihost() and n != len(jax.devices()):
        # every process must own mesh devices (multi-controller SPMD);
        # partial meshes would strand whole hosts
        raise SystemExit(
            f"multi-host runs need the mesh to span all {len(jax.devices())} "
            f"global devices and the batch ({batch_size}) to divide evenly "
            f"over them; got a {n}-device mesh")
    if n != want:
        log(f"data mesh clamped to {n} device(s) "
            f"(batch {batch_size} must shard evenly)")
    return make_mesh(n)


def enable_compile_cache() -> None:
    """Persistent XLA compile cache (.jax_cache at the repo root): first
    compiles over the axon tunnel take minutes; reruns of the same driver
    program load from disk. Safe to call repeatedly. The directory is
    versioned by a host-CPU fingerprint (utils.cache_hygiene) so a cache
    shared across machines never loads a foreign XLA:CPU AOT entry
    (SIGILL risk) and never purges another host's warm entries."""
    from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir

    base = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", hygienic_cache_dir(base))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


class Logger:
    """Tee to stdout + a timestamped log file (reference log_string pattern)."""

    def __init__(self, log_dir: str, prefix: str, task: str):
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y_%m_%d-%H_%M_%S")
        # multi-host: per-process files (same-second starts on a shared FS
        # would interleave writes into one file)
        proc = jax.process_index() if jax.process_count() > 1 else 0
        suffix = f".p{proc}" if proc else ""
        self.path = os.path.join(log_dir,
                                 f"{prefix}_{task}_{stamp}{suffix}.txt")
        self._f = open(self.path, "w")

    def __call__(self, msg, display: bool = True) -> None:
        self._f.write(str(msg) + "\n")
        self._f.flush()
        if display:
            print(msg)


def resolve_dirs(cfg) -> dict:
    task = cfg.TASK or cfg.MODEL.ARCH
    base = os.path.join(cfg.DATA.SAVEDIR, task)
    dirs = {
        "task": task,
        "base": base,
        "checkpoint": os.path.join(base, "checkpoint"),
        "layer_configs": os.path.join(base, "layer_configs"),
    }
    for k in ("base", "checkpoint", "layer_configs"):
        os.makedirs(dirs[k], exist_ok=True)
    return dirs


def build_model_from_cfg(cfg, dirs: dict, log=print):
    """Reference build_model flow (csnet.py:882-947): predefined pickled arch
    or a fresh init_layers seed with basewidth 20 * AUTO.EXPAND; saves
    layer_config_0.bin (+ _latest) and the epoch-0 init snapshot. MODEL.ARCH
    resolves through the architecture registry (the reference's importlib
    dispatch, train.py:70)."""
    from sod100k_tpu.arch import get_arch

    arch = get_arch(cfg.MODEL.ARCH)
    if cfg.AUTO.PREDEFINE and os.path.isfile(cfg.AUTO.PREDEFINE):
        log("predefine.")
        lc = LayerConfig.load(cfg.AUTO.PREDEFINE)
    else:
        log("init.")
        basewidth = int(round(20 * max(cfg.AUTO.EXPAND, 1.0)))
        if cfg.AUTO.EXPAND > 1:
            log(f"Expand the basewidth from 20 to {basewidth}")
        lc = init_layers(basewidth, cfg.MODEL.BASIC_SPLIT)
    from sod100k_tpu.parallel import multihost

    if multihost.is_primary():
        # multi-host: one writer — concurrent non-atomic pickle writes to the
        # same shared-FS path could corrupt a file another process later loads
        lc.save(os.path.join(dirs["layer_configs"], "layer_config_0.bin"))
        lc.save(os.path.join(dirs["layer_configs"], "layer_config_latest.bin"))

    params = arch.init(jax.random.key(cfg.TPU.SEED), lc)
    save_torch_checkpoint(
        os.path.join(dirs["checkpoint"], "checkpoint_init.pth.tar"),
        params, epoch=-1, arch="CSNet",
    )
    # every process sees the primary's files before anything reads them
    multihost.barrier("model-built")
    # startup params/FLOPs print contract (reference train.py:93-96)
    from sod100k_tpu.arch.csnet import csnet_apply
    from sod100k_tpu.utils.profiler import simplesum

    n, flops = simplesum(
        lambda p, x: csnet_apply(p, x, lc), params,
        (cfg.DATA.IMAGE_H, cfg.DATA.IMAGE_W, 3),
    )
    log("  + Number of params: %.4fM" % (n / 1e6))
    log("  + Number of FLOPs: %.4fG" % (flops / 1e9))
    return lc, params


def save_torch_checkpoint(path: str, params, epoch: int, arch: str,
                          opt_state=None, rename=None) -> None:
    from sod100k_tpu.parallel.multihost import is_primary

    if not is_primary():
        return  # multi-host: one checkpoint writer (params are replicated)
    import torch

    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          pytree_to_state_dict(jax.tree.map(np.asarray, params)).items()}
    for old, new in (rename or {}).items():
        if old in sd:
            sd[new] = sd.pop(old)
    payload = {"epoch": epoch, "arch": arch, "state_dict": sd}
    if opt_state is not None:
        payload["optimizer"] = jax.tree.map(np.asarray, opt_state)
    torch.save(payload, path)


def load_any_checkpoint(path: str):
    """Returns (params pytree, epoch, optax opt_state or None)."""
    params, meta = load_checkpoint(path)
    return params, meta.get("epoch", 0), meta.get("optimizer")


def val_mae(eval_step, params, dataset, batch_size: int, log=print,
            print_freq: int = 20) -> float:
    """Reference val protocol (train.py:250-293): forward at train size,
    per-image bilinear resize back to native GT resolution, quantize via
    trunc(x*255)/255, L1 against the native-resolution GT."""
    import cv2

    from sod100k_tpu.data.pipeline import batches

    total, count = 0.0, 0
    for batch in batches(dataset, batch_size, shuffle=False, drop_last=False):
        pred = np.asarray(eval_step(params, jnp.asarray(batch["image"])))[..., 0]
        for i in range(pred.shape[0]):
            h, w = batch["h"][i], batch["w"][i]
            up = cv2.resize(pred[i], (w, h), interpolation=cv2.INTER_LINEAR)
            q = np.trunc(up * 255.0) / 255.0
            gt = batch["target"][i][..., 0]  # native-resolution GT (ragged)
            total += float(np.abs(q - gt).mean())
            count += 1
    mae = total / max(count, 1)
    return mae
