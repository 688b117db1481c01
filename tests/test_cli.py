"""End-to-end CLI pipeline test on a synthetic dataset: train -> checkpoint ->
prune+finetune -> test (PNG dump) -> eval (metrics), all through the drivers."""

import os

import numpy as np
import pytest

from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.config import get_cfg

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    """Synthetic SOD dataset: images/*.jpg + GT/*.png with blobby saliency."""
    root = tmp_path_factory.mktemp("salprng")
    rng = np.random.default_rng(9)
    for split in ("DUTS-TR", "ECSSD"):
        img_dir = root / split / "images"
        gt_dir = root / split / "GT"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(8):
            h, w = int(rng.integers(70, 90)), int(rng.integers(70, 90))
            cy, cx = rng.integers(20, h - 20), rng.integers(20, w - 20)
            yy, xx = np.mgrid[0:h, 0:w]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < rng.integers(8, 20) ** 2
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            img[blob] = [200, 60, 60]
            cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
            cv2.imwrite(str(gt_dir / f"im{i}.png"),
                        (blob * 255).astype(np.uint8))
    return root


@pytest.fixture(scope="module")
def cfg(synth_root, tmp_path_factory):
    save = tmp_path_factory.mktemp("run")
    lc_small = save / "predefine.bin"
    init_layers(8, [0.5, 0.5]).save(str(lc_small))
    c = get_cfg()
    c.TASK = "synth"
    c.PRINT_FREQ = 1
    c.MODEL.BASIC_SPLIT = [0.5, 0.5]
    c.LOSS.MLOSS = 1
    c.DATA.DIR = str(synth_root / "DUTS-TR")
    c.DATA.BATCH_SIZE = 4
    c.DATA.WORKERS = 2
    c.DATA.SAVEDIR = str(save)
    c.DATA.IMAGE_H = c.DATA.IMAGE_W = 64
    c.VAL.DIR = str(synth_root / "ECSSD")
    c.TEST.DATASET_PATH = str(synth_root)
    c.TEST.DATASETS = ["ECSSD"]
    c.TEST.IMAGE_H = c.TEST.IMAGE_W = 64
    c.AUTO.ENABLE = True
    c.AUTO.PREDEFINE = str(lc_small)
    c.AUTO.FLOPS.ENABLE = True
    c.AUTO.FLOPS.WEIGHT = 3.0
    c.AUTO.FLOPS.EXPAND = 1.0
    c.SOLVER.METHOD = "Adam_dynamic_weight_decay"
    c.SOLVER.LR = 1e-3
    c.FINETUNE.THRES = 1e-6
    c.FINETUNE.SOLVER.LR = 1e-4
    c.FINETUNE.SOLVER.LR_SCHEDULER = "cosine"
    c.FINETUNE.SOLVER.ADJUST_STEP = True
    c.TPU.MESH_DEVICES = 2
    return c


@pytest.fixture(scope="module")
def trained(cfg):
    """Train once per module; downstream driver tests reuse the artifacts
    (they exercise the same checkpoint/layer_config files a real run
    produces)."""
    from cli.train import run_training

    return run_training(cfg, max_epochs=2, log=lambda *a, **k: None)


def test_cli_train(cfg, trained):
    out = trained
    assert out["best_epoch"] >= 1
    assert np.isfinite(out["best_mae"])
    ckpt = os.path.join(cfg.DATA.SAVEDIR, "synth", "checkpoint",
                        "checkpoint_epoch2.pth.tar")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(cfg.DATA.SAVEDIR, "synth",
                                       "layer_configs", "layer_config_0.bin"))
    # reference tooling can read our checkpoint format
    import torch

    ck = torch.load(ckpt, map_location="cpu", weights_only=False)
    assert ck["epoch"] == 2 and "state_dict" in ck


def test_cli_resume_continues_from_checkpoint(cfg, trained):
    """DATA.RESUME restores params + optax state + epoch (train.py:130-141
    semantics) and continues to the next epoch."""
    from cli.train import run_training

    c = cfg.clone()
    c.TPU.PREPROCESS = "host"  # also covers the host-pipeline fallback
    c.DATA.RESUME = os.path.join(c.DATA.SAVEDIR, "synth", "checkpoint",
                                 "checkpoint_epoch2.pth.tar")
    out = run_training(c, max_epochs=3, log=lambda *a, **k: None)
    assert [h["epoch"] for h in out["history"]] == [3]
    assert os.path.exists(os.path.join(c.DATA.SAVEDIR, "synth", "checkpoint",
                                       "checkpoint_epoch3.pth.tar"))


def test_cli_finetune_after_train(cfg, trained):
    from cli.finetune import run_finetune

    out = run_finetune(cfg, from_epoch=2, max_epochs=1,
                       log=lambda *a, **k: None)
    assert os.path.exists(os.path.join(out["ft_dir"],
                                       "checkpoint_epoch1.pth.tar"))
    assert np.isfinite(out["best_mae"])


def test_cli_finetune_periodic_test_dumps(cfg, trained):
    """TEST.ENABLE in-loop periodic test (reference finetune.py:183-185):
    saliency PNG dirs finetune_{ds}_{epoch} appear exactly at epochs
    >= TEST.BEGIN that are multiples of TEST.INTERVAL."""
    from cli.finetune import run_finetune

    c = cfg.clone()
    c.TASK = "synth_ft_test"
    c.TEST.ENABLE = True
    c.TEST.BEGIN = 2
    c.TEST.INTERVAL = 2
    # reuse the trained artifacts of the main TASK
    import shutil

    src = os.path.join(cfg.DATA.SAVEDIR, "synth")
    dst = os.path.join(cfg.DATA.SAVEDIR, "synth_ft_test")
    if not os.path.isdir(dst):
        shutil.copytree(src, dst,
                        ignore=shutil.ignore_patterns("ECSSD_*", "finetune_*"))
    run_finetune(c, from_epoch=2, max_epochs=3, log=lambda *a, **k: None)
    base = os.path.join(c.DATA.SAVEDIR, "synth_ft_test")
    assert not os.path.isdir(os.path.join(base, "finetune_ECSSD_1"))
    assert not os.path.isdir(os.path.join(base, "finetune_ECSSD_3"))
    dump = os.path.join(base, "finetune_ECSSD_2")
    assert os.path.isdir(dump) and len(os.listdir(dump)) == 8


def test_cli_train_mesh_shape_2d(cfg, trained):
    """TPU.MESH_SHAPE='2x2' runs the product training path on the 2-D
    data x spatial mesh (batch over data, image H over spatial with GSPMD
    halos) — the CLI surface for VERDICT r2 item 1b."""
    from cli.train import run_training

    c = cfg.clone()
    c.TASK = "synth_mesh2d"
    c.TPU.MESH_SHAPE = "2x2"
    out = run_training(c, max_epochs=1, log=lambda *a, **k: None)
    assert np.isfinite(out["best_mae"])


def test_cli_test_and_eval(cfg, trained):
    from cli.eval import run_eval
    from cli.test import run_test

    c = cfg.clone()
    c.TPU.TEST_PREPROCESS = "hybrid"  # covers the u8 inference front-end
    c.TEST.CHECKPOINT = os.path.join(c.DATA.SAVEDIR, "synth", "checkpoint",
                                     "checkpoint_epoch2.pth.tar")
    c.TEST.MODEL_CONFIG = os.path.join(c.DATA.SAVEDIR, "synth",
                                       "layer_configs", "layer_config_0.bin")
    res = run_test(c, log=lambda *a, **k: None)
    sal_dir = res["datasets"]["ECSSD"]["sal_dir"]
    assert len(os.listdir(sal_dir)) == 8

    best = run_eval(c, epoch_range=(res["epoch"], res["epoch"] + 1),
                    log=lambda *a, **k: None)
    assert "ECSSD" in best and best["ECSSD"]["epoch"] == res["epoch"]
    assert 0.0 < best["ECSSD"]["max_f"] <= 1.0

    # native backend agrees with the device backend
    best_native = run_eval(c, epoch_range=(res["epoch"], res["epoch"] + 1),
                           backend="native", log=lambda *a, **k: None)
    assert best_native["ECSSD"]["max_f"] == pytest.approx(
        best["ECSSD"]["max_f"], abs=1e-5)


def test_cli_test_native_batched_bit_identical(cfg, trained):
    """--test_batch in the ceil-to-16 native-size mode (TEST.IMAGE_H/W=0):
    consecutive same-resized-shape images share one dispatch and the PNGs
    are BIT-identical to the per-image reference loop (test.py:75-98) —
    VERDICT r4 item 4, the CSNet counterpart of cli.csf --test_batch.
    The synthetic 70..90-px images resize to a few ceil-16 shapes, so the
    run exercises shape breaks and the padded trailing partial."""
    from cli.test import run_test

    c = cfg.clone()
    c.TASK = "synth_native1"
    c.TEST.CHECKPOINT = os.path.join(c.DATA.SAVEDIR, "synth", "checkpoint",
                                     "checkpoint_epoch2.pth.tar")
    c.TEST.MODEL_CONFIG = os.path.join(c.DATA.SAVEDIR, "synth",
                                       "layer_configs", "layer_config_0.bin")
    c.TEST.IMAGE_H = c.TEST.IMAGE_W = 0  # native ceil-to-16 protocol
    r1 = run_test(c, log=lambda *a, **k: None)

    c2 = c.clone()
    c2.TASK = "synth_native3"
    c2.TEST.BATCH = 3
    r2 = run_test(c2, log=lambda *a, **k: None)

    d1 = r1["datasets"]["ECSSD"]["sal_dir"]
    d2 = r2["datasets"]["ECSSD"]["sal_dir"]
    names = sorted(os.listdir(d1))
    assert names and names == sorted(os.listdir(d2))
    for n in names:
        a = cv2.imread(os.path.join(d1, n), cv2.IMREAD_GRAYSCALE)
        b = cv2.imread(os.path.join(d2, n), cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(a, b, err_msg=n)

    # ragged shapes with a large test_batch: most same-shape runs are
    # short, so most dispatched rows are padding — the driver must SAY so
    # instead of silently computing up to tb-fold extra
    c3 = c.clone()
    c3.TASK = "synth_native8"
    c3.TEST.BATCH = 8
    logs = []
    run_test(c3, log=lambda m, **k: logs.append(str(m)))
    assert any("were padding" in ln for ln in logs), logs


def test_cli_orbax_save_and_resume(cfg, trained):
    """TPU.ORBAX writes native checkpoints next to the .pth.tar files and
    DATA.RESUME accepts the orbax directory (restores params + optax state +
    epoch through the hardened _restore_opt_state path)."""
    pytest.importorskip("orbax.checkpoint")
    from cli.train import run_training

    c = cfg.clone()
    c.TASK = "synth_orbax"
    c.TPU.ORBAX = True
    c.TPU.PREPROCESS = "device"  # also covers the device front-end driver path
    c.TPU.PROFILE_DIR = os.path.join(c.DATA.SAVEDIR, "trace")  # and profiling
    run_training(c, max_epochs=1, log=lambda *a, **k: None)
    odir = os.path.join(c.DATA.SAVEDIR, "synth_orbax", "checkpoint",
                        "orbax_epoch1")
    assert os.path.isdir(odir)
    # the profiler trace captured the first steps (TPU.PROFILE_DIR)
    assert any(f.endswith((".pb", ".json.gz", ".xplane.pb"))
               for _, _, fs in os.walk(c.TPU.PROFILE_DIR) for f in fs)

    c2 = c.clone()
    c2.TPU.ORBAX = False
    c2.DATA.RESUME = odir
    out = run_training(c2, max_epochs=2, log=lambda *a, **k: None)
    assert [h["epoch"] for h in out["history"]] == [2]
    assert os.path.exists(os.path.join(c.DATA.SAVEDIR, "synth_orbax",
                                       "checkpoint",
                                       "checkpoint_epoch2.pth.tar"))


def test_cli_test_native_ceil16_mode(cfg, trained):
    """TEST.IMAGE_H/W = 0: the reference's native-size protocol
    (test.py:75-85) — each image resized up to the next 16-multiple,
    per-shape compiled, map resized back to the exact native size."""
    from cli.test import run_test

    c = cfg.clone()
    c.TEST.IMAGE_H = c.TEST.IMAGE_W = 0
    c.TEST.CHECKPOINT = os.path.join(c.DATA.SAVEDIR, "synth", "checkpoint",
                                     "checkpoint_epoch2.pth.tar")
    c.TEST.MODEL_CONFIG = os.path.join(c.DATA.SAVEDIR, "synth",
                                       "layer_configs", "layer_config_0.bin")
    res = run_test(c, log=lambda *a, **k: None)
    sal_dir = res["datasets"]["ECSSD"]["sal_dir"]
    img_dir = os.path.join(c.TEST.DATASET_PATH, "ECSSD", "images")
    names = sorted(os.listdir(img_dir))
    assert len(os.listdir(sal_dir)) == len(names) == 8
    for name in names:
        native = cv2.imread(os.path.join(img_dir, name))
        sal = cv2.imread(os.path.join(
            sal_dir, os.path.splitext(name)[0] + ".png"), cv2.IMREAD_GRAYSCALE)
        assert sal.shape == native.shape[:2]  # exact native size restored
        assert sal.dtype == np.uint8
    """TPU.TEST_RESIDENT: the HBM-resident TESTALL sweep evaluates each
    checkpoint as one dispatch (no PNGs) and writes cli.eval-compatible
    Fmeasure artifacts; runs sharded here (TPU.MESH_DEVICES=2)."""
    from cli.test import run_testall_resident

    c = cfg.clone()
    c.TASK = "synth"
    c.TPU.TEST_RESIDENT = True
    c.TEST.BEGIN = 1
    c.TEST.INTERVAL = 1
    c.TEST.MODEL_CONFIG = os.path.join(c.DATA.SAVEDIR, "synth",
                                       "layer_configs", "layer_config_0.bin")
    best = run_testall_resident(c, log=lambda *a, **k: None)
    assert "ECSSD" in best and best["ECSSD"]["epoch"] >= 1
    assert 0.0 < best["ECSSD"]["max_f"] <= 1.0
    out_dir = os.path.join(c.DATA.SAVEDIR, "synth")
    # resident-protocol artifacts live under distinct names so they never
    # clobber/mix with cli.eval's reference-protocol files
    assert os.path.exists(os.path.join(out_dir,
                                       "FmeasureResults_ECSSD_resident.txt"))
    rep = os.path.join(out_dir, "FmeasureResult_ECSSD_1_resident.txt")
    with open(rep) as f:
        lines = f.read().splitlines()
    assert len(lines) == 263 and lines[-1].startswith("MAE:")


def test_cli_testall_sweep_and_best_epoch(cfg, trained):
    """TEST.TESTALL traverses checkpoint_epoch{BEGIN,+INTERVAL,...} and eval
    tracks the best epoch by Max-F across the range (reference test/eval
    epoch-range protocol, eval.py:34-76)."""
    from cli.eval import run_eval
    from cli.test import run_testall

    c = cfg.clone()
    c.TPU.TEST_PREPROCESS = "device"  # covers the decode-only inference front-end
    c.TEST.BEGIN = 1
    c.TEST.INTERVAL = 1
    c.TEST.MODEL_CONFIG = os.path.join(c.DATA.SAVEDIR, "synth",
                                       "layer_configs", "layer_config_0.bin")
    runs = run_testall(c, log=lambda *a, **k: None)
    # epochs 1 and 2 exist from the trained fixture (3 may exist from the
    # resume test depending on order; accept >= 2 sweeps)
    epochs = [r["epoch"] for r in runs]
    assert epochs[:2] == [1, 2]
    for r in runs:
        assert len(os.listdir(r["datasets"]["ECSSD"]["sal_dir"])) == 8

    best = run_eval(c, epoch_range=(1, max(epochs) + 1),
                    log=lambda *a, **k: None)
    assert best["ECSSD"]["epoch"] in epochs
    # pair lists dumped for every evaluated epoch (eval.py:52-59 artifact)
    for e in epochs:
        assert os.path.isfile(os.path.join(c.DATA.SAVEDIR, "synth",
                                           f"val_ECSSD_{e}.txt"))


def test_cli_resident_mode_trains(cfg, trained):
    """TPU.PREPROCESS='resident': the whole epoch runs as one dispatched
    program over the HBM-resident uint8 dataset (data/resident.py)."""
    from cli.train import run_training

    c = cfg.clone()
    c.TASK = "synth_resident"
    c.TPU.PREPROCESS = "resident"
    c.TPU.RESIDENT_STORE_HW = 80
    out = run_training(c, max_epochs=2, log=lambda *a, **k: None)
    assert [h["epoch"] for h in out["history"]] == [1, 2]
    assert all(np.isfinite(h["loss"]) for h in out["history"])
    assert np.isfinite(out["best_mae"])
    assert os.path.exists(os.path.join(c.DATA.SAVEDIR, "synth_resident",
                                       "checkpoint",
                                       "checkpoint_epoch2.pth.tar"))


def test_cli_finetune_resident_mode(cfg, trained):
    from cli.finetune import run_finetune

    c = cfg.clone()
    c.TPU.PREPROCESS = "resident"
    c.TPU.RESIDENT_STORE_HW = 80
    out = run_finetune(c, from_epoch=2, max_epochs=1,
                       log=lambda *a, **k: None)
    assert np.isfinite(out["best_mae"])
    assert os.path.exists(os.path.join(out["ft_dir"],
                                       "checkpoint_epoch1.pth.tar"))


def test_cli_finetune_device_mode(cfg, trained):
    """TPU.PREPROCESS=device in cli.finetune runs the on-device front-end
    (decode-only host -> jitted crop/flip/resize/normalize), same as
    cli.train — it used to silently fall back to the host float pipeline."""
    import pytest

    from cli.finetune import run_finetune

    c = cfg.clone()
    c.TPU.PREPROCESS = "device"
    out = run_finetune(c, from_epoch=2, max_epochs=1,
                       log=lambda *a, **k: None)
    assert np.isfinite(out["best_mae"])

    c.TPU.PREPROCESS = "nonsense"
    with pytest.raises(SystemExit, match="host|hybrid|device|resident"):
        run_finetune(c, from_epoch=2, max_epochs=1, log=lambda *a, **k: None)
