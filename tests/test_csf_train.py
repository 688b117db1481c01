"""CSF training-path tests: solver semantics (frozen BNs, grad accumulation,
masked-sum loss) and the .lst data pipeline + CLI driver end-to-end."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod100k_tpu.arch.csf_res2net import csf_init
from sod100k_tpu.train.csf_step import (
    csf_partition,
    make_csf_eval_step,
    make_csf_optimizer,
    make_csf_train_step,
)

cv2 = pytest.importorskip("cv2")


def _params():
    return csf_init(jax.random.key(0))


def test_csf_partition_freezes_reference_bns():
    trainable, state = csf_partition(_params())
    flat_t = {jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(trainable)}

    def t(path):
        return "['" + "']['".join(path.split(".")) + "']" in flat_t

    assert not t("base.bn1.scale")                      # frozen (:125)
    assert not t("base.layer1.0.bn1.scale")             # frozen (:45)
    assert not t("base.layer1.0.bns.0.offset")          # frozen (:60-62)
    # the reference freezes the downsample CONV (downsample._modules['1'],
    # :156-157); the downsample BN affines TRAIN
    assert not t("base.layer2.0.downsample.1.kernel")
    assert t("base.layer2.0.downsample.2.scale")
    assert t("base.conv1.1.scale")                      # stem BN trainable
    assert t("base.layer1.0.conv1.kernel")              # convs trainable
    assert t("fuse.bns.0.scale")                        # head GN trainable
    assert not t("base.layer1.0.bn1.mean")              # stats are state


def test_csf_grad_accumulation_updates_every_k():
    params = _params()
    trainable, state = csf_partition(params)
    tx = make_csf_optimizer(iter_size=2)
    opt_state = tx.init(trainable)
    step = make_csf_train_step(tx, iter_size=2, batch_size=1, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32)),
        "target": jnp.asarray((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32)),
    }
    before = trainable["cls_layer"]["kernel"]
    t1, opt_state, m1 = step(trainable, state, opt_state, batch, jnp.float32(5e-5))
    # first micro-step: gradients accumulated, no parameter update
    np.testing.assert_array_equal(np.asarray(t1["cls_layer"]["kernel"]),
                                  np.asarray(before))
    t2, opt_state, m2 = step(t1, state, opt_state, batch, jnp.float32(5e-5))
    assert not np.array_equal(np.asarray(t2["cls_layer"]["kernel"]),
                              np.asarray(before))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_csf_iter_size_folds_into_batch():
    """The accumulation schedule is a free lever: K micro-steps of batch b
    (iter_size=K) produce the SAME optimizer step as ONE folded step of
    batch K*b (iter_size=1) — the loss sums BCE over samples and divides by
    iter_size*batch either way, and the frozen-BN forward has no cross-
    sample coupling. This is the TPU scale-out recipe (one gradient
    all-reduce per optimizer step instead of K; docs/DESIGN.md §11)."""
    params = _params()
    trainable, state = csf_partition(params)
    rng = np.random.default_rng(7)
    imgs = rng.standard_normal((4, 32, 32, 3), dtype=np.float32)
    gts = (rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32)

    # accumulated: iter_size=2, batch 2, two micro-steps
    tx = make_csf_optimizer(iter_size=2)
    opt_state = tx.init(trainable)
    step = make_csf_train_step(tx, iter_size=2, batch_size=2, donate=False)
    t_acc = trainable
    for k in range(2):
        b = {"image": jnp.asarray(imgs[2 * k:2 * k + 2]),
             "target": jnp.asarray(gts[2 * k:2 * k + 2])}
        t_acc, opt_state, _ = step(t_acc, state, opt_state, b,
                                   jnp.float32(5e-5))

    # folded: iter_size=1, batch 4, one step
    tx1 = make_csf_optimizer(iter_size=1)
    opt1 = tx1.init(trainable)
    step1 = make_csf_train_step(tx1, iter_size=1, batch_size=4, donate=False)
    t_fold, _, _ = step1(trainable, state, opt1,
                         {"image": jnp.asarray(imgs),
                          "target": jnp.asarray(gts)}, jnp.float32(5e-5))

    # reduction-order fp noise on a near-zero gradient is amplified by
    # Adam's normalization up to ~the lr for isolated elements (the same
    # bounded phenomenon tests/test_trajectory.py documents): require
    # near-exact equality except for a vanishing fraction of entries that
    # must still be bounded by one full Adam step (~lr).
    n_tot, n_loose = 0, 0
    for a, b in zip(jax.tree.leaves(t_acc), jax.tree.leaves(t_fold)):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        assert d.max() <= 1.2e-4  # one Adam step at lr=5e-5, both signs
        n_tot += d.size
        n_loose += int((d > 2e-6).sum())
    assert n_loose <= max(2, n_tot // 10000), (n_loose, n_tot)


def test_csf_remat_step_matches_plain():
    """--remat (jax.checkpoint'd forward) must change only the schedule,
    not the math: identical loss and updated params vs the plain step."""
    params = _params()
    trainable, state = csf_partition(params)
    rng = np.random.default_rng(1)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32)),
        "target": jnp.asarray((rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32)),
    }
    results = {}
    for remat in (False, True):
        tx = make_csf_optimizer(iter_size=1)
        opt_state = tx.init(trainable)
        step = make_csf_train_step(tx, iter_size=1, batch_size=2,
                                   donate=False, remat=remat)
        t, _, m = step(trainable, state, opt_state, batch, jnp.float32(5e-5))
        results[remat] = (float(m["loss"]), t)
    assert results[False][0] == results[True][0]
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7)


def test_csf_masked_loss_equals_native():
    """Padded-batch masked-sum BCE == native-size sum BCE."""
    import optax

    from sod100k_tpu.arch.csf_res2net import csf_apply

    params = jax.tree.map(jnp.asarray, _params())
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 37, 45, 3)).astype(np.float32)
    tgt = (rng.random((1, 37, 45, 1)) > 0.5).astype(np.float32)

    logits = csf_apply(params, jnp.asarray(img)).astype(jnp.float32)
    native = float(jnp.sum(optax.sigmoid_binary_cross_entropy(
        logits, jnp.asarray(tgt))))

    pi = np.zeros((1, 64, 64, 3), np.float32)
    pt = np.zeros((1, 64, 64, 1), np.float32)
    pm = np.zeros((1, 64, 64, 1), np.float32)
    pi[0, :37, :45], pt[0, :37, :45], pm[0, :37, :45] = img[0], tgt[0], 1
    plog = csf_apply(params, jnp.asarray(pi)).astype(jnp.float32)
    padded = float(jnp.sum(optax.sigmoid_binary_cross_entropy(
        plog, jnp.asarray(pt)) * jnp.asarray(pm)))
    # padding perturbs conv borders inside the valid region; the *loss
    # protocol* (sum over valid pixels) must match to a tight tolerance
    assert padded == pytest.approx(native, rel=2e-2)


@pytest.fixture(scope="module")
def csf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("csfdata")
    (root / "imgs").mkdir()
    (root / "gts").mkdir()
    rng = np.random.default_rng(4)
    lines = []
    for i in range(4):
        h, w = int(rng.integers(40, 64)), int(rng.integers(40, 64))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        gt = (rng.random((h, w)) > 0.6).astype(np.uint8) * 255
        cv2.imwrite(str(root / "imgs" / f"{i}.jpg"), img)
        cv2.imwrite(str(root / "gts" / f"{i}.png"), gt)
        lines.append(f"imgs/{i}.jpg gts/{i}.png")
    (root / "train.lst").write_text("\n".join(lines) + "\n")
    (root / "test.lst").write_text("\n".join(f"imgs/{i}.jpg" for i in range(4)) + "\n")
    return root


def test_csf_cli_train_and_test(csf_root, tmp_path):
    from cli.csf import run_csf_test, run_csf_train

    config = types.SimpleNamespace(
        lr=5e-5, wd=5e-4, pretrained_model="", epoch=1, batch_size=2,
        load="", save_folder=str(tmp_path / "out"), epoch_save=1, iter_size=2,
        show_every=2, train_root=str(csf_root),
        train_list=str(csf_root / "train.lst"), arch="res2net50",
        image_size=48, mesh_devices=2,  # data-parallel over 2 virtual devices
    )
    os.makedirs(config.save_folder)
    out = run_csf_train(config, log=lambda *a, **k: None)
    final = os.path.join(out["save_folder"], "models", "final.pth")
    assert os.path.exists(final)

    config.model = final
    config.test_root = str(csf_root)
    config.test_list = str(csf_root / "test.lst")
    config.test_fold = str(tmp_path / "maps")
    res = run_csf_test(config, log=lambda *a, **k: None)
    assert res["n"] == 4
    assert len(os.listdir(config.test_fold)) == 4

    # the driver's device-quantized uint8 readback must be bit-identical to
    # the reference's host-side (255 * sigmoid).astype(uint8) at native size
    from sod100k_tpu.data.csf_dataset import CSFTestData
    from sod100k_tpu.interop.torch_ckpt import load_checkpoint
    from sod100k_tpu.train.params import merge

    params = csf_init(jax.random.key(0), backbone="res2net50")
    loaded, _ = load_checkpoint(final)
    params = jax.tree.map(jnp.asarray, merge(params, loaded))
    ds = CSFTestData(config.test_root, config.test_list)
    s = ds[0]
    f = make_csf_eval_step("res2net50")(params, jnp.asarray(s["image"][None]))
    expect = (255 * np.asarray(f)[0, ..., 0]).astype(np.uint8)
    name = os.path.splitext(os.path.basename(s["name"]))[0]
    got = cv2.imread(os.path.join(config.test_fold, name + "_sal_fuse.png"),
                     cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(got, expect)

    # --test_batch > 1 (uniform-size speed protocol): batched dispatch with a
    # padded trailing partial must write bit-identical maps to the B=1 loop
    rng = np.random.default_rng(7)
    os.makedirs(csf_root / "uni", exist_ok=True)
    for i in range(3):
        cv2.imwrite(str(csf_root / "uni" / f"u{i}.jpg"),
                    rng.integers(0, 255, (48, 56, 3), dtype=np.uint8))
    (csf_root / "uni.lst").write_text(
        "\n".join(f"uni/u{i}.jpg" for i in range(3)) + "\n")
    config.test_list = str(csf_root / "uni.lst")
    outs = {}
    for tb in (1, 2):
        config.test_batch = tb
        config.test_fold = str(tmp_path / f"maps_tb{tb}")
        run_csf_test(config, log=lambda *a, **k: None)
        outs[tb] = {f: cv2.imread(os.path.join(config.test_fold, f),
                                  cv2.IMREAD_GRAYSCALE)
                    for f in sorted(os.listdir(config.test_fold))}
    assert sorted(outs[1]) == sorted(outs[2]) and len(outs[1]) == 3
    for f in outs[1]:
        np.testing.assert_array_equal(outs[1][f], outs[2][f])


def test_csf_cli_train_and_test_res2net101(csf_root, tmp_path):
    """CLI plumbing for the 101 tier (north-star config #5): --arch
    res2net101 threads through train mode (checkpoint save + final.pth)
    and test mode (native-size u8 *_sal_fuse.png maps, the right backbone
    rebuilt from config.arch at load). Math parity is pinned by the
    live-torch oracles (test_csf.py / test_trajectory.py, parametrized
    over both backbones); this covers the driver surface at toy size."""
    from cli.csf import run_csf_test, run_csf_train

    config = types.SimpleNamespace(
        lr=5e-5, wd=5e-4, pretrained_model="", epoch=1, batch_size=2,
        load="", save_folder=str(tmp_path / "out101"), epoch_save=1,
        iter_size=2, show_every=2, train_root=str(csf_root),
        train_list=str(csf_root / "train.lst"), arch="res2net101",
        image_size=48,
    )
    os.makedirs(config.save_folder)
    out = run_csf_train(config, log=lambda *a, **k: None)
    final = os.path.join(out["save_folder"], "models", "final.pth")
    assert os.path.exists(final)

    config.model = final
    config.test_root = str(csf_root)
    config.test_list = str(csf_root / "test.lst")
    config.test_fold = str(tmp_path / "maps101")
    res = run_csf_test(config, log=lambda *a, **k: None)
    assert res["n"] == 4
    assert len(os.listdir(config.test_fold)) == 4


def test_resident_csf_epoch_matches_host_math(csf_root):
    """One resident CSF epoch == a host emulation with the same PRNG draws:
    gather by the same permutation, same per-sample flips, cv2-dialect
    normalization — checked through a checksum 'loss' that is sensitive to
    pixel position (catches wrong flip axis / normalization / gather)."""
    from sod100k_tpu.data.csf_dataset import CSFTrainData
    from sod100k_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from sod100k_tpu.data.resident import (
        build_resident_dataset,
        make_resident_csf_epoch_fn,
    )

    ds = CSFTrainData(str(csf_root), str(csf_root / "train.lst"))
    rdata = build_resident_dataset(ds, store_hw=(32, 32))
    bs = 2

    col = jnp.arange(32, dtype=jnp.float32)[None, None, :, None]

    def fake_step(t, s, o, batch, lr):
        loss = (jnp.sum(batch["image"] * col)
                + jnp.sum(batch["target"][..., 0] * col[..., 0]))
        return t, o, {"loss": loss}

    epoch_fn = make_resident_csf_epoch_fn(fake_step, batch_size=bs)
    t0, o0 = {"w": jnp.zeros(())}, {"m": jnp.zeros(())}
    _, _, losses = epoch_fn(t0, {}, o0, rdata, jax.random.key(7),
                            jnp.float32(0.0))

    # host emulation with the identical random draws
    kperm, kflip = jax.random.split(jax.random.key(7))
    n = rdata["image_u8"].shape[0]
    nb = n // bs
    perm = np.asarray(jax.random.permutation(kperm, n)[: nb * bs]).reshape(nb, bs)
    flips = np.asarray(jax.random.bernoulli(kflip, 0.5, (nb, bs)))
    imgs = np.asarray(rdata["image_u8"])
    gts = np.asarray(rdata["gt_u8"])
    ccol = np.arange(32, dtype=np.float32)
    for b in range(nb):
        want = 0.0
        for j in range(bs):
            im = imgs[perm[b, j]]
            gt = gts[perm[b, j]]
            if flips[b, j]:
                im, gt = im[:, ::-1], gt[:, ::-1]
            imn = (im.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            want += float((imn * ccol[None, :, None]).sum())
            want += float((gt.astype(np.float32) / 255.0 * ccol[None, :]).sum())
        assert float(losses[b]) == pytest.approx(want, rel=1e-5)


def test_csf_cli_train_resident(csf_root, tmp_path):
    """--preprocess resident: the driver trains end-to-end from HBM-resident
    data (one dispatch per epoch) and saves loadable checkpoints."""
    from cli.csf import run_csf_train

    config = types.SimpleNamespace(
        lr=5e-5, wd=5e-4, pretrained_model="", epoch=2, batch_size=2,
        load="", save_folder=str(tmp_path / "out"), epoch_save=2, iter_size=2,
        show_every=2, train_root=str(csf_root),
        train_list=str(csf_root / "train.lst"), arch="res2net50",
        image_size=32, mesh_devices=2, preprocess="resident",
        dtype="bfloat16",
    )
    os.makedirs(config.save_folder)
    out = run_csf_train(config, log=lambda *a, **k: None)
    assert len(out["losses"]) >= 2
    assert all(np.isfinite(v) for v in out["losses"])
    final = os.path.join(out["save_folder"], "models", "final.pth")
    assert os.path.exists(final)


def test_csf_cli_train_native_mesh_shape_fallback(csf_root, tmp_path):
    """--mesh_shape with native-size buckets: buckets below the GSPMD
    spatial-extent boundary (docs/DESIGN.md section 10) must fall back to
    replication — identical math, logged once per H — instead of crashing
    mid-training. The fixture's 40-64px images all land in a 64x64 bucket,
    below the 96px CSF boundary, so every batch takes the fallback."""
    from cli.csf import run_csf_train

    logs: list[str] = []
    config = types.SimpleNamespace(
        lr=5e-5, wd=5e-4, pretrained_model="", epoch=1, batch_size=2,
        load="", save_folder=str(tmp_path / "out"), epoch_save=1, iter_size=2,
        show_every=2, train_root=str(csf_root),
        train_list=str(csf_root / "train.lst"), arch="res2net50",
        image_size=0, mesh_shape="2x2",
    )
    os.makedirs(config.save_folder)
    out = run_csf_train(config, log=lambda *a, **k: logs.append(" ".join(
        str(x) for x in a)))
    assert os.path.exists(os.path.join(out["save_folder"], "models",
                                       "final.pth"))
    fallback = [l for l in logs if "replicating instead of" in l]
    assert len(fallback) == 1, logs  # warned once per distinct H
    assert "H=64" in fallback[0]


def test_csf_cli_test_mesh_shape_2d(csf_root, tmp_path):
    """--mesh_shape in test mode: batched dispatches shard over the 2-D
    mesh (per-shape GSPMD validity check; these <96px images take the
    data-only fallback branch) and the written maps are bit-identical to
    the plain B=1 loop."""
    from cli.csf import run_csf_test, run_csf_train

    config = types.SimpleNamespace(
        lr=5e-5, wd=5e-4, pretrained_model="", epoch=1, batch_size=2,
        load="", save_folder=str(tmp_path / "out"), epoch_save=1, iter_size=2,
        show_every=2, train_root=str(csf_root),
        train_list=str(csf_root / "train.lst"), arch="res2net50",
        image_size=48,
    )
    os.makedirs(config.save_folder)
    out = run_csf_train(config, log=lambda *a, **k: None)
    config.model = os.path.join(out["save_folder"], "models", "final.pth")
    config.test_root = str(csf_root)
    config.test_list = str(csf_root / "test.lst")

    config.test_fold = str(tmp_path / "maps_plain")
    config.test_batch = 1
    run_csf_test(config, log=lambda *a, **k: None)

    logs: list[str] = []
    config.test_fold = str(tmp_path / "maps_mesh")
    config.test_batch = 2
    config.mesh_shape = "2x2"
    run_csf_test(config, log=lambda *a, **k: logs.append(
        " ".join(str(x) for x in a)))
    assert any("2-D mesh" in l for l in logs), logs

    plain = sorted(os.listdir(tmp_path / "maps_plain"))
    meshed = sorted(os.listdir(tmp_path / "maps_mesh"))
    assert plain == meshed and len(plain) == 4
    for name in plain:
        a = (tmp_path / "maps_plain" / name).read_bytes()
        b = (tmp_path / "maps_mesh" / name).read_bytes()
        assert a == b, name


def test_csf_cli_train_resident_mesh_shape_2d(csf_root, tmp_path):
    """--preprocess resident + --mesh_shape: the one-dispatch epoch scans
    run with gathered batches constrained data x spatial
    (mesh.epoch_feed_sharding) — the driver path for the small-batch 2-D
    scale-out story. 96px is the smallest CSF-safe spatial-sharding size
    (deepest stride-2 input = 96/16 = 6 rows)."""
    from cli.csf import run_csf_train

    config = types.SimpleNamespace(
        lr=5e-5, wd=5e-4, pretrained_model="", epoch=1, batch_size=2,
        load="", save_folder=str(tmp_path / "out"), epoch_save=1, iter_size=2,
        show_every=2, train_root=str(csf_root),
        train_list=str(csf_root / "train.lst"), arch="res2net50",
        image_size=96, mesh_shape="2x2", preprocess="resident",
    )
    os.makedirs(config.save_folder)
    out = run_csf_train(config, log=lambda *a, **k: None)
    assert all(np.isfinite(v) for v in out["losses"])
    assert os.path.exists(os.path.join(out["save_folder"], "models",
                                       "final.pth"))


def test_csf_resident_rejects_undersized_dataset(csf_root, tmp_path):
    """--preprocess resident with batch_size > dataset size used to scan
    ZERO steps per epoch and still write checkpoints; now it fails loudly
    like cli.train's resident guard."""
    import pytest

    from cli.csf import run_csf_train

    config = types.SimpleNamespace(
        lr=5e-5, wd=5e-4, pretrained_model="", epoch=1, batch_size=64,
        load="", save_folder=str(tmp_path / "out"), epoch_save=1, iter_size=2,
        show_every=2, train_root=str(csf_root),
        train_list=str(csf_root / "train.lst"), arch="res2net50",
        image_size=32, preprocess="resident",
    )
    os.makedirs(config.save_folder)
    with pytest.raises(SystemExit, match="at least one full batch"):
        run_csf_train(config, log=lambda *a, **k: None)


@pytest.mark.skipif(not os.path.isdir("/root/reference/CSF+Res2Net"),
                    reason="reference not mounted")
def test_bce2d_matches_reference_torch():
    """Class-balanced bce2d == the live reference solver.bce2d
    (CSF+Res2Net/solver.py:129-144) on identical logits/targets, for the
    reductions torch accepts ('mean'/'sum'/'none'; the reference's default
    reduction=None is not a valid torch reduction and raises there)."""
    import sys

    import torch

    from sod100k_tpu.train.csf_step import bce2d

    sys.path.insert(0, "/root/reference/CSF+Res2Net")
    import importlib

    # solver.py's module scope does `import torchvision.utils as vutils`
    # (solver.py:11) purely for its save_image helper, which bce2d never
    # touches; torchvision is not installed here, so satisfy the import
    # with an empty shim.
    if "torchvision" not in sys.modules:
        torchvision = types.ModuleType("torchvision")
        torchvision.utils = types.ModuleType("torchvision.utils")
        sys.modules["torchvision"] = torchvision
        sys.modules["torchvision.utils"] = torchvision.utils

    solver = importlib.import_module("solver")

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    target = (rng.random((2, 1, 16, 16)) > 0.6).astype(np.float32)
    # a few non-{0,1} pixels: both implementations weight them to zero
    target[0, 0, :2, :2] = 0.5

    for reduction in ("mean", "sum", "none"):
        want = solver.bce2d(torch.from_numpy(logits),
                            torch.from_numpy(target),
                            reduction=reduction).numpy()
        got = np.asarray(bce2d(jnp.asarray(logits), jnp.asarray(target),
                               reduction=reduction))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
