"""Multi-host (multi-process) SPMD oracle.

Launches 2 REAL processes (4 virtual CPU devices each — "two hosts of a pod
slice"), coordinated via jax.distributed exactly as the product CLIs would be
(SOD100K_* env -> multihost.init_from_env), runs the real CSNet train step
over the global 8-device mesh with per-process host feeds, and asserts the
result matches this process's single-process 8-device math. The reference has
nothing distributed (SURVEY §5.8); this pins the tier-2 scale-out story.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The worker's 1-D training math on this process's 8-device mesh."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import mh_worker

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.parallel.mesh import make_mesh, replicate, shard_feed
    from sod100k_tpu.train.optim import make_sgd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    lc = init_layers(8, [0.5, 0.5])
    trainable, state = partition(csnet_init(jax.random.key(0), lc))
    tx = make_sgd(momentum=0.9)
    opt_state = tx.init(trainable)
    mesh = make_mesh()
    trainable, state, opt_state = (replicate(t, mesh)
                                   for t in (trainable, state, opt_state))
    step = make_train_step(lc, tx, batch_size=8, donate=False)
    losses = []
    for i in range(2):
        feed = shard_feed(mh_worker.global_batch(seed=i), mesh)
        trainable, state, opt_state, m = step(
            trainable, state, opt_state, feed,
            jnp.float32(1e-3), jnp.float32(0.0))
        losses.append(float(m["loss"]))
    checksum = float(sum(float(jnp.sum(jnp.abs(l)))
                         for l in jax.tree.leaves(trainable)))
    sum2d = float(mh_worker.global_batch(seed=7)["image"].sum(dtype=np.float32))
    return losses, checksum, sum2d


def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    procs, logs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO  # drop the axon site: pure CPU workers
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["SOD100K_COORDINATOR"] = f"127.0.0.1:{port}"
        env["SOD100K_NUM_PROCESSES"] = "2"
        env["SOD100K_PROCESS_ID"] = str(pid)
        log = open(tmp_path / f"worker{pid}.log", "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mh_worker.py")],
            stdout=log, stderr=subprocess.STDOUT, env=env, cwd=REPO))
    results = {}
    try:
        for pid, p in enumerate(procs):
            rc = p.wait(timeout=900)
            logs[pid].seek(0)
            out = logs[pid].read()
            assert rc == 0, f"worker {pid} failed:\n{out}"
            line = [l for l in out.splitlines() if l.startswith("{")][-1]
            results[pid] = json.loads(line)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    # both processes observed the same (replicated) results
    assert results[0]["primary"] and not results[1]["primary"]
    for key in ("loss0", "loss", "checksum", "sum2d"):
        assert results[0][key] == pytest.approx(results[1][key], rel=1e-6), key

    ref_losses, ref_checksum, ref_sum2d = _single_process_reference()
    assert results[0]["loss0"] == pytest.approx(ref_losses[0], rel=1e-5)
    assert results[0]["loss"] == pytest.approx(ref_losses[1], rel=1e-4)
    assert results[0]["checksum"] == pytest.approx(ref_checksum, rel=1e-4)
    assert results[0]["sum2d"] == pytest.approx(ref_sum2d, rel=1e-5)


@pytest.mark.parametrize("preprocess", ["hybrid", "resident"])
def test_two_process_cli_train_e2e(tmp_path, preprocess):
    """The REAL cli.train driver under 2 processes: env-driven init, the
    data front-end (hybrid: host pipeline sliced per process in
    device_prefetch; resident: per-process replicated HBM store via
    put_replicated + one-dispatch epoch scan + resident val), replicated
    state, identical losses and val MAE on both hosts, primary-only
    checkpoint writes."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    for split in ("DUTS-TR", "ECSSD"):
        img_dir = tmp_path / "data" / split / "images"
        gt_dir = tmp_path / "data" / split / "GT"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(8):
            h, w = int(rng.integers(70, 90)), int(rng.integers(70, 90))
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            gt = (rng.random((h, w)) > 0.6).astype(np.uint8) * 255
            cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
            cv2.imwrite(str(gt_dir / f"im{i}.png"), gt)
    save = tmp_path / "run"
    save.mkdir()

    port = _free_port()
    procs, logs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["SOD100K_COORDINATOR"] = f"127.0.0.1:{port}"
        env["SOD100K_NUM_PROCESSES"] = "2"
        env["SOD100K_PROCESS_ID"] = str(pid)
        env["MH_DATA_ROOT"] = str(tmp_path / "data")
        env["MH_SAVE_DIR"] = str(save)
        env["MH_PREPROCESS"] = preprocess
        log = open(tmp_path / f"train{pid}.log", "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mh_train_worker.py")],
            stdout=log, stderr=subprocess.STDOUT, env=env, cwd=REPO))
    results = {}
    try:
        for pid, p in enumerate(procs):
            rc = p.wait(timeout=900)
            logs[pid].seek(0)
            out = logs[pid].read()
            assert rc == 0, f"train worker {pid} failed:\n{out}"
            line = [l for l in out.splitlines() if l.startswith("{")][-1]
            results[pid] = json.loads(line)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    # training state is replicated: both hosts observed identical history
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["best_mae"] == pytest.approx(
        results[1]["best_mae"], rel=1e-6)
    assert np.isfinite(results[0]["best_mae"])
    # exactly one writer, and the checkpoint is a valid torch file
    assert results[0]["ckpt_exists"] and results[1]["ckpt_exists"]
    import torch

    ckpt = torch.load(str(save / "mh_e2e" / "checkpoint" /
                          "checkpoint_epoch1.pth.tar"), weights_only=False)
    assert ckpt["epoch"] == 1 and ckpt["state_dict"]


def test_multihost_helpers_single_process_fallbacks():
    """Single-process: the multi-host API degrades to the plain mesh helpers
    and init_from_env is a no-op without the env opt-in."""
    from sod100k_tpu.parallel import multihost
    from sod100k_tpu.parallel.mesh import make_mesh

    assert not multihost.init_from_env()
    assert not multihost.is_multihost()
    assert multihost.is_primary()
    assert multihost.process_slice(8) == slice(0, 8)
    mesh = make_mesh()
    multihost.check_mesh_process_layout(mesh)  # no-op single-process
    batch = {"image": np.zeros((8, 8, 8, 3), np.float32), "meta": "x"}
    assert multihost.local_slice_feed(batch)["image"].shape[0] == 8
    multihost.barrier("noop")  # no-op single-process
    fed = multihost.global_feed(batch, mesh)
    assert fed["image"].shape == (8, 8, 8, 3) and fed["meta"] == "x"
