"""Full-recipe smoke driver e2e: the real-data-readiness contract.

Runs cli.smoke's five-stage chain (train -> prune+finetune -> test ->
eval -> resident TESTALL sweep) on a synthetic DUTS-TR-shaped tree — the
exact path a real dataset would take with --data-root (reference flow:
train.py -> finetune.py -> test.py -> eval.py, SURVEY.md section 3).

The mesh test runs the SAME chain composed over a 4x2 data x spatial mesh
(--mesh_shape): train sharded, prune from the sharded-trained gammas,
finetune-restart on the live mesh, sharded test dispatches and resident
sweep — and pins its metrics to the single-device recipe's. Single-step
sharded==single oracles (tests/test_parallel.py) can't catch composition
bugs (pruned-arch rebuild under a live mesh, stage-to-stage artifact
handoff); this does."""

import pytest

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dry_tree(tmp_path_factory):
    from cli.smoke import make_dry_data

    root = str(tmp_path_factory.mktemp("smoke") / "data")
    make_dry_data(root, n_train=8, n_test=4, hw=(80, 96))
    return root


@pytest.fixture(scope="module")
def single_run(dry_tree, tmp_path_factory):
    from cli.smoke import run_smoke

    return run_smoke(dry_tree, str(tmp_path_factory.mktemp("save_single")),
                     train_epochs=1, finetune_epochs=1, image_hw=64,
                     batch_size=4, log=lambda *a, **k: None)


def test_smoke_dry_data_full_recipe(single_run):
    out = single_run
    assert out["ok"], out
    assert out["eval"]["ECSSD"]["max_f"] > 0.0
    # the resident sweep scored the same checkpoints without PNGs
    assert out["resident_eval"]["ECSSD"]["epoch"] >= 1


def test_smoke_composed_mesh_recipe_matches_single_device(
        single_run, dry_tree, tmp_path_factory):
    """cli.smoke --mesh_shape 4x2: the composed chain on the 8-device
    virtual mesh succeeds, the train stage tracks the single-device
    recipe, and — the composition claim single-step oracles can't see —
    prune+finetune CONSUMING the sharded-trained gammas on the live mesh
    is equivalent to running that same downstream on a single device.

    Why the downstream comparison anchors on the mesh run's own trained
    checkpoint instead of cross-comparing the two full chains end-to-end:
    sharded reductions leave ~1e-6 reduction-order noise per step, and two
    Adam steps + gamma-threshold pruning + two more Adam steps amplify it
    chaotically (measured: same-checkpoint mesh-vs-single finetune differs
    by 2e-6 MAE with identical pruned architecture, while cross-chain
    finetuned MAEs differ by ~2e-2 on this 8-image recipe). The tight
    invariant IS the same-checkpoint one; the cross-chain one is noise."""
    import os
    import shutil

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (4x2 mesh)")
    from cli.finetune import run_finetune
    from cli.smoke import run_smoke

    out = run_smoke(dry_tree, str(tmp_path_factory.mktemp("save_mesh")),
                    train_epochs=1, finetune_epochs=1, image_hw=64,
                    batch_size=4, mesh_shape="4x2",
                    log=lambda *a, **k: None)
    assert out["ok"], out
    # train-stage val MAE: same recipe sharded; only reduction-order noise
    # through 2 Adam steps separates the chains here
    assert out["trained"]["best_mae"] == pytest.approx(
        single_run["trained"]["best_mae"], rel=5e-2, abs=1e-2)
    assert out["resident_eval"]["ECSSD"]["epoch"] >= 1

    # composition pin: single-device prune+finetune from the SHARDED-
    # trained checkpoint == the mesh run's own prune+finetune (identical
    # pruned arch, MAE to float tolerance)
    c = out["cfg"].clone()
    c.TASK = "smoke_ft_single_check"
    base = os.path.dirname(os.path.dirname(out["finetuned"]["ft_dir"]))
    shutil.copytree(os.path.join(base, "smoke"),
                    os.path.join(base, c.TASK),
                    ignore=shutil.ignore_patterns("finetune_*", "ECSSD_*"))
    c.DATA.SAVEDIR = base
    c.TPU.MESH_SHAPE = ""
    ft1 = run_finetune(c, from_epoch=1, max_epochs=1,
                       log=lambda *a, **k: None)
    assert ft1["best_mae"] == pytest.approx(
        out["finetuned"]["best_mae"], abs=1e-4)
    from sod100k_tpu.arch.csnet import count_params, csnet_init

    n1 = count_params(csnet_init(jax.random.key(0), ft1["lc"]))
    n2 = count_params(csnet_init(jax.random.key(0), out["finetuned"]["lc"]))
    assert n1 == n2  # same channels survived the sharded-trained gammas
