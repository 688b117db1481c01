"""Device front-end parity: crop+resize gather vs host crop-then-resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod100k_tpu.data.device_pipeline import (
    crop_resize_bilinear,
    preprocess_infer_batch,
    preprocess_train_batch,
)
from sod100k_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD, resize_bilinear_np


def test_crop_resize_matches_host_crop_then_resize():
    rng = np.random.default_rng(0)
    img = rng.random((57, 63, 3)).astype(np.float32) * 255
    for (r1, r2, c1, c2) in [(0, 1, 0, 1), (5, 3, 7, 2), (14, 15, 14, 15)]:
        ch, cw = 57 - r1 - r2, 63 - c1 - c2
        want = resize_bilinear_np(img[r1:r1 + ch, c1:c1 + cw], (32, 40))
        got = np.asarray(crop_resize_bilinear(
            jnp.asarray(img),
            (jnp.int32(r1), jnp.int32(ch), jnp.int32(c1), jnp.int32(cw)),
            (32, 40)))
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_preprocess_batch_no_augment_matches_host():
    rng = np.random.default_rng(1)
    h, w = 50, 61
    img = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)
    gt = rng.integers(0, 255, (2, h, w), dtype=np.uint8)
    out = preprocess_train_batch(
        jnp.asarray(img), jnp.asarray(gt),
        jnp.asarray([[h, w], [h, w]], np.int32),
        jax.random.key(0), out_hw=(32, 32), augment=False)
    for i in range(2):
        want = (resize_bilinear_np(img[i].astype(np.float64) / 255.0, (32, 32))
                - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(np.asarray(out["image"][i]), want, atol=1e-4)
        want_g = resize_bilinear_np(gt[i].astype(np.float64) / 255.0, (32, 32))
        np.testing.assert_allclose(np.asarray(out["target"][i, ..., 0]),
                                   want_g, atol=1e-4)


def test_preprocess_batch_augment_runs_and_respects_padding():
    rng = np.random.default_rng(2)
    # true content 40x45 inside a 64x64 pad: outputs must never sample the pad
    img = np.zeros((1, 64, 64, 3), np.uint8)
    img[0, :40, :45] = rng.integers(1, 255, (40, 45, 3), dtype=np.uint8)
    gt = np.zeros((1, 64, 64), np.uint8)
    gt[0, :40, :45] = 255
    out = preprocess_train_batch(
        jnp.asarray(img), jnp.asarray(gt), jnp.asarray([[40, 45]], np.int32),
        jax.random.key(3), out_hw=(32, 32), augment=True)
    im = np.asarray(out["image"][0])
    tg = np.asarray(out["target"][0])
    assert np.isfinite(im).all()
    # every target pixel comes from the all-255 GT region
    np.testing.assert_allclose(tg, 1.0, atol=1e-6)
    # and no output image pixel equals the normalized zero-pad everywhere
    assert (np.abs(im - (0 - IMAGENET_MEAN) / IMAGENET_STD).max(axis=-1) > 1e-3).all()


def test_preprocess_infer_batch_matches_host_test_protocol(tmp_path):
    """Fixed-size inference front-end == preprocess_test_image on disk files."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.pipeline import _imread_rgb_u8, preprocess_test_image

    rng = np.random.default_rng(3)
    paths = []
    for i, (h, w) in enumerate([(41, 53), (64, 64), (90, 70)]):
        p = tmp_path / f"im{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        paths.append(str(p))

    imgs = np.zeros((3, 128, 128, 3), np.uint8)
    hws = np.zeros((3, 2), np.int32)
    for i, p in enumerate(paths):
        u8 = _imread_rgb_u8(p)
        imgs[i, :u8.shape[0], :u8.shape[1]] = u8
        hws[i] = u8.shape[:2]
    got = np.asarray(preprocess_infer_batch(
        jnp.asarray(imgs), jnp.asarray(hws), out_hw=(48, 48)))
    for i, p in enumerate(paths):
        want, _ = preprocess_test_image(p, (48, 48))
        np.testing.assert_allclose(got[i], want[0], atol=2e-3)


def test_resize_to_native_canvas_matches_cv2():
    """Dynamic-size device upsample == cv2.INTER_LINEAR on the valid region
    (the val-protocol resize-back, cli/common.py val_mae)."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.device_pipeline import resize_to_native_canvas

    rng = np.random.default_rng(5)
    pred = rng.random((64, 64)).astype(np.float32)
    for (h, w) in [(37, 45), (90, 120), (64, 64), (13, 101)]:
        want = cv2.resize(pred, (w, h), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(resize_to_native_canvas(
            jnp.asarray(pred), jnp.asarray([h, w], np.int32), (128, 128)))
        np.testing.assert_allclose(got[:h, :w], want, atol=1e-5)


def test_resident_val_matches_host_protocol(tmp_path):
    """One-dispatch resident validation == the host val_mae loop (forward at
    train size -> per-image native resize-back -> trunc-quantized L1)."""
    cv2 = pytest.importorskip("cv2")
    from cli.common import val_mae
    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.data.pipeline import SalData
    from sod100k_tpu.data.resident import (
        build_resident_val_dataset,
        make_resident_val_fn,
    )
    from sod100k_tpu.train.step import make_eval_step

    rng = np.random.default_rng(7)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    for i, (h, w) in enumerate([(70, 90), (55, 48), (80, 80), (48, 96),
                                (64, 72)]):
        cv2.imwrite(str(tmp_path / "images" / f"v{i}.jpg"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        gt = (rng.random((h, w)) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(tmp_path / "GT" / f"v{i}.png"), gt)

    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    # fresh x100-conv init explodes in EVAL mode (stored kaiming * 100 with
    # identity running BN stats — faithful to the reference, which has the
    # same property); scale kernels into the band where the untrained
    # forward produces varied, finite maps
    params = jax.tree_util.tree_map_with_path(
        lambda p, a: a / 6.0 if jax.tree_util.keystr(p).endswith("['kernel']")
        else a, params)
    params = jax.tree.map(jnp.asarray, params)
    ds = SalData(str(tmp_path), (48, 48), mode="val")
    host = val_mae(make_eval_step(lc), params, ds, 2, log=lambda *a: None)

    data = build_resident_val_dataset(ds, (48, 48), batch_size=2)
    canvas = data.pop("_canvas_hw")
    assert data["image_u8"].shape[0] == 6  # 5 padded to a batch multiple
    assert float(jnp.sum(data["weight"])) == 5.0
    val_fn = make_resident_val_fn(make_eval_step(lc, from_u8=True),
                                  batch_size=2, canvas_hw=canvas)
    got = float(val_fn(params, data))
    # host path feeds float-resized inputs, resident stores uint8 (<1/255
    # input delta); the protocol itself (resize-back + trunc + L1) is exact
    assert got == pytest.approx(host, abs=3e-3)


def test_hybrid_batches_match_host_pipeline(tmp_path):
    """Hybrid front-end (uint8 host aug/resize + fused device normalize) is
    the host pipeline up to uint8 rounding (< 1/255 pre-normalization)."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.pipeline import SalData, batches, hybrid_batches

    rng = np.random.default_rng(6)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    for i in range(4):
        h, w = 60 + 3 * i, 70 - 2 * i
        cv2.imwrite(str(tmp_path / "images" / f"c{i}.png"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / "GT" / f"c{i}.png"),
                    rng.integers(0, 255, (h, w), dtype=np.uint8))
    ds = SalData(str(tmp_path), (32, 32), augmentation=False)
    (hb,) = list(hybrid_batches(ds, 4, shuffle=False))
    (fb,) = list(batches(ds, 4, shuffle=False))
    assert hb["image_u8"].dtype == np.uint8
    norm = ((hb["image_u8"].astype(np.float32) / 255.0 - IMAGENET_MEAN)
            / IMAGENET_STD)
    # 0.5/255 quantization / STD=0.225 ~ 0.0087; resize rounding doubles it
    np.testing.assert_allclose(norm, fb["image"], atol=0.02)
    np.testing.assert_allclose(hb["target_u8"].astype(np.float32) / 255.0,
                               fb["target"], atol=0.005)


def test_host_augmentation_is_index_deterministic(tmp_path):
    """Augmentation draws are keyed on (seed, epoch seed, sample index), so
    host/hybrid epochs are bit-reproducible at ANY num_threads (the
    reference's multi-worker DataLoader is thread-schedule-dependent here).
    VERDICT r2 item 4."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.pipeline import SalData, batches, hybrid_batches

    rng = np.random.default_rng(3)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    for i in range(8):
        h, w = 64 + 2 * i, 80 - 3 * i
        cv2.imwrite(str(tmp_path / "images" / f"d{i}.jpg"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / "GT" / f"d{i}.png"),
                    rng.integers(0, 255, (h, w), dtype=np.uint8))

    def epoch(itfn, n_threads, seed):
        ds = SalData(str(tmp_path), (32, 32), seed=5)
        return [{k: np.asarray(v) for k, v in b.items()}
                for b in itfn(ds, 4, shuffle=True, seed=seed,
                              num_threads=n_threads)]

    for itfn in (batches, hybrid_batches):
        a = epoch(itfn, 1, seed=11)
        b = epoch(itfn, 4, seed=11)
        assert len(a) == len(b) == 2
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])
        # different epoch seeds produce different augmentation draws
        c = epoch(itfn, 1, seed=12)
        assert any(not np.array_equal(x[k], y[k])
                   for x, y in zip(a, c) for k in x)


def test_raw_batches_bucket_padding(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.pipeline import SalData, raw_batches

    rng = np.random.default_rng(4)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    sizes = [(70, 90), (90, 70), (80, 80), (75, 85)]
    for i, (h, w) in enumerate(sizes):
        cv2.imwrite(str(tmp_path / "images" / f"a{i}.jpg"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / "GT" / f"a{i}.png"),
                    rng.integers(0, 255, (h, w), dtype=np.uint8))
    ds = SalData(str(tmp_path), (32, 32))
    (batch,) = list(raw_batches(ds, 4, shuffle=False, pad_multiple=64))
    assert batch["image_u8"].shape == (4, 128, 128, 3)  # 90 -> 128 bucket
    assert batch["gt_u8"].shape == (4, 128, 128)
    assert batch["image_u8"].dtype == np.uint8
    # valid region carries the decoded pixels, the pad is zero
    for i in range(4):
        h, w = batch["valid_hw"][i]
        assert (h, w) == sizes[i]
        assert batch["image_u8"][i, h:].sum() == 0
        assert batch["image_u8"][i, :, w:].sum() == 0
        assert batch["image_u8"][i, :h, :w].sum() > 0


def test_data_cache_decodes_once_and_matches(tmp_path, monkeypatch):
    """SalData(cache=True) decodes each file once; all three sample dialects
    (raw/hybrid/float) share the cache and match the uncached dataset."""
    cv2 = pytest.importorskip("cv2")
    import sod100k_tpu.data.pipeline as pl

    rng = np.random.default_rng(8)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    for i in range(2):
        cv2.imwrite(str(tmp_path / "images" / f"e{i}.png"),
                    rng.integers(0, 255, (40, 50, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / "GT" / f"e{i}.png"),
                    rng.integers(0, 255, (40, 50), dtype=np.uint8))
    calls = {"n": 0}
    orig = pl._imread_rgb_u8

    def counting(path):
        calls["n"] += 1
        return orig(path)

    monkeypatch.setattr(pl, "_imread_rgb_u8", counting)
    ds = pl.SalData(str(tmp_path), (32, 32), augmentation=False, cache=True)
    ds.raw_item(0)
    ds.raw_item(0)
    ds.hybrid_item(0)
    sample_cached = ds[0]
    assert calls["n"] == 1  # one decode for four touches

    ds_nc = pl.SalData(str(tmp_path), (32, 32), augmentation=False)
    np.testing.assert_array_equal(ds.raw_item(1)["image_u8"],
                                  ds_nc.raw_item(1)["image_u8"])
    np.testing.assert_allclose(sample_cached["image"], ds_nc[0]["image"],
                               atol=1e-6)
    np.testing.assert_allclose(sample_cached["target"], ds_nc[0]["target"],
                               atol=1e-6)


def test_resident_salmetric_matches_host_protocol(tmp_path):
    """One-dispatch resident test+eval (the TESTALL sweep) == the host
    chain on the same u8-resized inputs: per-image forward -> cv2-dialect
    native resize-back -> trunc(sigmoid*255) PNG quantization ->
    SalMetricAccumulator + S-measure."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.data.pipeline import SalData
    from sod100k_tpu.data.resident import (
        build_resident_val_dataset,
        make_resident_salmetric_fn,
    )
    from sod100k_tpu.metrics.salmetric import (
        SalMetricAccumulator,
        result_from_sums,
    )
    from sod100k_tpu.metrics.smeasure import s_measure_batch
    from sod100k_tpu.train.step import make_eval_step

    rng = np.random.default_rng(11)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    sizes = [(70, 90), (55, 48), (80, 80), (48, 96), (64, 72)]
    for i, (h, w) in enumerate(sizes):
        cv2.imwrite(str(tmp_path / "images" / f"v{i}.jpg"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        gt = (rng.random((h, w)) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(tmp_path / "GT" / f"v{i}.png"), gt)

    lc = init_layers(8, [0.5, 0.5])
    params = jax.tree.map(lambda a: jnp.asarray(a) / 6.0,
                          csnet_init(jax.random.key(0), lc))
    es = make_eval_step(lc, from_u8=True)
    ds = SalData(str(tmp_path), (48, 48), mode="val")

    acc = SalMetricAccumulator()
    s_sum = 0.0
    wf_sum = 0.0
    from sod100k_tpu.metrics.wfmeasure import weighted_f_measure

    for i in range(len(ds)):
        img, gt = ds._decode_u8(i)
        h, w = gt.shape
        r = cv2.resize(img, (48, 48), interpolation=cv2.INTER_LINEAR)
        pred = np.asarray(es(params, jnp.asarray(r[None])))[0, ..., 0]
        up = cv2.resize(pred, (w, h), interpolation=cv2.INTER_LINEAR)
        sal255 = np.trunc(up * 255.0)
        acc.update_batch(sal255[None], gt[None].astype(np.float32))
        s_sum += float(s_measure_batch(
            sal255[None] / 255.0, (gt[None] > 128).astype(np.float32),
            np.ones((1, h, w), np.float32))[0])
        wf_sum += weighted_f_measure(sal255 / 255.0, gt > 128)
    host = acc.result()
    host["s_measure"] = s_sum / len(ds)
    host["weighted_f"] = wf_sum / len(ds)

    data = build_resident_val_dataset(ds, (48, 48), batch_size=2,
                                      with_wf_tables=True)
    canvas = data.pop("_canvas_hw")
    fn = make_resident_salmetric_fn(es, batch_size=2, canvas_hw=canvas)
    got = result_from_sums(fn(params, data))

    assert got["mae"] == pytest.approx(host["mae"], abs=1e-4)
    assert got["max_f"] == pytest.approx(host["max_f"], abs=1e-4)
    assert got["adaptive_f"] == pytest.approx(host["adaptive_f"], abs=1e-4)
    assert got["adaptive_e"] == pytest.approx(host["adaptive_e"], abs=1e-4)
    assert got["s_measure"] == pytest.approx(host["s_measure"], abs=1e-4)
    assert got["weighted_f"] == pytest.approx(host["weighted_f"], abs=5e-4)
    np.testing.assert_allclose(got["precision"], host["precision"], atol=2e-4)
    np.testing.assert_allclose(got["recall"], host["recall"], atol=2e-4)
    np.testing.assert_allclose(got["emeasure"], host["emeasure"], atol=2e-4)

    # HBM budget guard: over-budget wF tables are skipped with a reason
    # (TPU.RESIDENT_WF_MAX_MIB) instead of claiming 8 B/canvas-px silently
    small = build_resident_val_dataset(ds, (48, 48), batch_size=2,
                                       with_wf_tables=True,
                                       wf_budget_bytes=16)
    assert "wf_idx" not in small and "wf_weight" not in small
    assert "MiB" in small["_wf_skipped"]
    big = build_resident_val_dataset(ds, (48, 48), batch_size=2,
                                     with_wf_tables=True,
                                     wf_budget_bytes=1 << 30)
    assert "wf_idx" in big and "_wf_skipped" not in big


def test_eval_step_quantize_u8_matches_float_path():
    """quantize_u8 (cli.test hybrid/device modes, 4x smaller readback) is
    exactly trunc(sigmoid*255) of the float path's output."""
    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.train.step import make_eval_step

    lc = init_layers(8, [0.5, 0.5])
    params = jax.tree.map(
        lambda a: jnp.asarray(a) / 6.0,  # tame the x100 conv scaling at init
        csnet_init(jax.random.key(0), lc))
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), dtype=np.uint8))
    f = make_eval_step(lc, from_u8=True)(params, img)
    q = make_eval_step(lc, from_u8=True, quantize_u8=True)(params, img)
    assert q.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(q), np.trunc(np.asarray(f) * 255.0).astype(np.uint8))


def test_batch_iterators_accept_zero_workers(tmp_path):
    """DATA.WORKERS=0 (the torch in-process-loading convention) must not
    crash the thread-pool iterators."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.pipeline import SalData, batches

    rng = np.random.default_rng(5)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    for i in range(2):
        cv2.imwrite(str(tmp_path / "images" / f"z{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / "GT" / f"z{i}.png"),
                    rng.integers(0, 255, (64, 64), dtype=np.uint8))
    ds = SalData(str(tmp_path), (32, 32))
    (b,) = list(batches(ds, 2, shuffle=False, num_threads=0))
    assert b["image"].shape == (2, 32, 32, 3)


def test_raw_batches_rejects_too_small_images(tmp_path):
    """The device front-end applies the host Augment's minimum-size guard on
    the host (the jitted crop cannot raise data-dependently and would emit a
    degenerate gather instead)."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.pipeline import SalData, raw_batches

    rng = np.random.default_rng(6)
    (tmp_path / "images").mkdir()
    (tmp_path / "GT").mkdir()
    cv2.imwrite(str(tmp_path / "images" / "tiny.jpg"),
                rng.integers(0, 255, (24, 64, 3), dtype=np.uint8))
    cv2.imwrite(str(tmp_path / "GT" / "tiny.png"),
                rng.integers(0, 255, (24, 64), dtype=np.uint8))
    ds = SalData(str(tmp_path), (32, 32))
    with pytest.raises(ValueError, match="too small for augmentation"):
        list(raw_batches(ds, 1, shuffle=False))
