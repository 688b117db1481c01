"""Multi-host e2e worker: the REAL cli.train driver under 2 processes
(launched by tests/test_multihost.py::test_two_process_cli_train_e2e).

Exercises the whole multi-host wiring end to end: data_mesh_for ->
multihost.init_from_env, the hybrid host pipeline's index-deterministic
global batch order sliced per process in device_prefetch, replicated
params/opt-state assembly, redundant-but-identical host validation, and
primary-only checkpoint writes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    data_root = os.environ["MH_DATA_ROOT"]
    save_dir = os.environ["MH_SAVE_DIR"]

    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.config import get_cfg

    # per-process predefine file with deterministic content: no pre-init
    # coordination needed, so run_training below is the FIRST jax touchpoint
    # — this is the product path (GUIDE.md: "SOD100K_MULTIHOST=auto python
    # -m cli.train"), where multihost init must happen inside the driver
    # before any backend-initializing call.
    lc_path = os.path.join(save_dir,
                           f"predefine_p{os.environ['SOD100K_PROCESS_ID']}.bin")
    init_layers(8, [0.5, 0.5]).save(lc_path)

    cfg = get_cfg()
    cfg.TASK = "mh_e2e"
    cfg.PRINT_FREQ = 100
    cfg.MODEL.BASIC_SPLIT = [0.5, 0.5]
    cfg.DATA.DIR = os.path.join(data_root, "DUTS-TR")
    cfg.DATA.BATCH_SIZE = 8
    cfg.DATA.WORKERS = 2
    cfg.DATA.SAVEDIR = save_dir
    cfg.DATA.IMAGE_H = cfg.DATA.IMAGE_W = 32
    cfg.VAL.DIR = os.path.join(data_root, "ECSSD")
    cfg.AUTO.ENABLE = True
    cfg.AUTO.PREDEFINE = lc_path
    cfg.AUTO.FLOPS.ENABLE = True
    cfg.AUTO.FLOPS.WEIGHT = 3.0
    cfg.AUTO.FLOPS.EXPAND = 1.0
    cfg.SOLVER.METHOD = "Adam_dynamic_weight_decay"
    cfg.SOLVER.LR = 1e-3
    cfg.TPU.MESH_DEVICES = 0  # all 8 global devices
    cfg.TPU.PREPROCESS = os.environ.get("MH_PREPROCESS", "hybrid")

    from cli.train import run_training

    # NO explicit multihost init here: run_training itself must initialize
    # jax.distributed before its first jax call (it does, at entry) — an
    # explicit pre-init would mask an init-ordering regression.
    result = run_training(cfg, max_epochs=1, log=lambda *a, **k: None)

    from sod100k_tpu.parallel import multihost

    multihost.barrier("trained")

    ckpt = os.path.join(save_dir, "mh_e2e", "checkpoint",
                        "checkpoint_epoch1.pth.tar")
    print(json.dumps({
        "pid": jax.process_index(),
        "best_mae": result["best_mae"],
        "loss": result["history"][0]["loss"],
        "ckpt_exists": os.path.isfile(ckpt),
    }), flush=True)


if __name__ == "__main__":
    main()
