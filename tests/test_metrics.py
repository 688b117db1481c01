"""Metric-suite parity: JAX salmetric and native C++ salmetric vs a literal
brute-force oracle of the reference formulas (sal_metric.cpp:86-185)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from sod100k_tpu.metrics.salmetric import (
    BETA2,
    EPSILON,
    SalMetricAccumulator,
    format_report,
)

RNG = np.random.default_rng(3)


def _brute_force(sals, gts):
    """Direct transcription of the reference math: per-image MAE and 256-pass
    threshold P/R, macro-averaged; F from averaged P/R."""
    n = len(sals)
    mae = 0.0
    precision = np.zeros(256)
    recall = np.zeros(256)
    for sal, gt in zip(sals, gts):
        sal = sal.astype(np.float64)
        gt = gt.astype(np.float64)
        mae += np.mean(np.abs(sal - gt) / 255.0) / n
        b = gt > 128
        b_sum = b.sum()
        for th in range(256):
            a = sal > th
            ab = (a & b).sum()
            precision[th] += ((ab + EPSILON) / (a.sum() + EPSILON)) / n
            recall[th] += ((ab + EPSILON) / (b_sum + EPSILON)) / n
    f = (1 + BETA2) * precision * recall / (BETA2 * precision + recall)
    fmax, argmax = 0.0, 0
    for th in range(256):
        if f[th] > fmax:
            fmax, argmax = f[th], th
    return {
        "mae": mae, "precision": precision, "recall": recall, "fmeasure": f,
        "max_f": fmax, "argmax": argmax, "mean_f": f.mean(),
        "precision_at_max": precision[argmax], "recall_at_max": recall[argmax],
        "mean_precision": precision.mean(), "mean_recall": recall.mean(),
    }


def _synthetic(n=6, hw=(33, 41)):
    sals, gts = [], []
    for i in range(n):
        sals.append(RNG.integers(0, 256, size=hw, dtype=np.uint8))
        # blobby GT: threshold smooth noise for realistic fg/bg areas
        g = RNG.random(hw)
        gts.append(np.where(g > 0.6, 255, 0).astype(np.uint8))
    # degenerate cases: empty GT / full GT
    gts[0][:] = 0
    gts[1][:] = 255
    return sals, gts


def test_jax_salmetric_matches_brute_force():
    sals, gts = _synthetic()
    want = _brute_force(sals, gts)
    acc = SalMetricAccumulator()
    for s, g in zip(sals, gts):
        acc.update_batch(s[None].astype(np.float32), g[None].astype(np.float32))
    got = acc.result()
    assert got["mae"] == pytest.approx(want["mae"], rel=1e-6)
    np.testing.assert_allclose(got["precision"], want["precision"], rtol=1e-5)
    np.testing.assert_allclose(got["recall"], want["recall"], rtol=1e-5)
    assert got["max_f"] == pytest.approx(want["max_f"], rel=1e-5)
    assert got["argmax"] == want["argmax"]
    assert got["mean_f"] == pytest.approx(want["mean_f"], rel=1e-5)


def test_jax_salmetric_padded_batches_match_per_image():
    sals, gts = _synthetic(n=4, hw=(17, 19))
    a = SalMetricAccumulator()
    for s, g in zip(sals, gts):
        a.update_batch(s[None].astype(np.float32), g[None].astype(np.float32))
    # same data as one padded batch with masks
    H, W = 24, 24
    sal_p = np.zeros((4, H, W), np.float32)
    gt_p = np.zeros((4, H, W), np.float32)
    m = np.zeros((4, H, W), np.float32)
    for i, (s, g) in enumerate(zip(sals, gts)):
        sal_p[i, :17, :19] = s
        gt_p[i, :17, :19] = g
        m[i, :17, :19] = 1
    b = SalMetricAccumulator()
    b.update_batch(sal_p, gt_p, mask=m)
    ra, rb = a.result(), b.result()
    assert ra["mae"] == pytest.approx(rb["mae"], rel=1e-6)
    np.testing.assert_allclose(ra["precision"], rb["precision"], rtol=1e-6)
    np.testing.assert_allclose(ra["fmeasure"], rb["fmeasure"], rtol=1e-6)


def test_report_format_contract():
    sals, gts = _synthetic(n=2)
    acc = SalMetricAccumulator()
    for s, g in zip(sals, gts):
        acc.update_batch(s[None].astype(np.float32), g[None].astype(np.float32))
    rep = format_report(acc.result())
    lines = rep.split("\n")
    # eval.py:68-70 contract: last 8 newline-split fields = 7 summaries + ''
    assert len(lines) == 256 + 7 + 1
    tail = lines[-8:]
    assert tail[0].startswith("Max_F-measre:")
    assert tail[6].startswith("MAE:")
    assert tail[7] == ""
    float(tail[0].split()[1])  # eval.py reads token 1 of the MaxF line


@pytest.mark.skipif(shutil.which("make") is None, reason="no make")
def test_native_salmetric_matches_brute_force(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.metrics import native

    try:
        native.build()
    except RuntimeError as e:
        pytest.skip(f"native build unavailable: {e}")
    sals, gts = _synthetic(n=5, hw=(21, 27))
    sal_paths, gt_paths, listing = [], [], []
    for i, (s, g) in enumerate(zip(sals, gts)):
        sp, gp = str(tmp_path / f"{i}_sal.png"), str(tmp_path / f"{i}_gt.png")
        cv2.imwrite(sp, s)
        cv2.imwrite(gp, g)
        sal_paths.append(sp)
        gt_paths.append(gp)
        listing.append(f"{sp} {gp}")
    want = _brute_force(sals, gts)

    got = native.do_evaluation(4, sal_paths, gt_paths, print_stdout=False)
    assert got["images"] == 5
    assert got["mae"] == pytest.approx(want["mae"], rel=1e-5)
    assert got["max_f"] == pytest.approx(want["max_f"], rel=1e-5)
    np.testing.assert_allclose(got["precision"], want["precision"], rtol=1e-5)

    # CLI stdout contract (what reference eval.py parses)
    lst = tmp_path / "pairs.lst"
    lst.write_text("\n".join(listing) + "\n")
    out = subprocess.run([native.cli_path(), str(lst), "2"],
                         capture_output=True, text=True, check=True).stdout
    tail = out.split("\n")[-8:]
    assert tail[0].split()[0] == "Max_F-measre:"
    assert float(tail[0].split()[1]) == pytest.approx(want["max_f"], abs=1e-5)
    assert float(tail[6].split()[1]) == pytest.approx(want["mae"], abs=1e-5)


@pytest.mark.skipif(shutil.which("make") is None, reason="no make")
def test_compiled_extension_matches_ctypes(tmp_path):
    """The CPython extension module (py_salmetric.cc) must return the exact
    dict the ctypes C-ABI path does, and expose the reference Cython
    binding's PySalMetric class surface (salmetric.pyx)."""
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.metrics import native

    ext = native.load_extension()
    if ext is None:
        pytest.skip("extension unavailable (no toolchain/Python headers)")
    sals, gts = _synthetic(n=4, hw=(19, 23))
    sal_paths, gt_paths = [], []
    for i, (s, g) in enumerate(zip(sals, gts)):
        sp, gp = str(tmp_path / f"{i}_s.png"), str(tmp_path / f"{i}_g.png")
        cv2.imwrite(sp, s)
        cv2.imwrite(gp, g)
        sal_paths.append(sp)
        gt_paths.append(gp)

    # ONE worker thread in both paths: the pool's work-stealing makes the
    # per-image accumulation ORDER nondeterministic at >1 thread, so two
    # runs differ by double-ULPs (measured 5.5e-17 on 28% of thresholds) —
    # single-thread keeps the bit-exact comparison meaningful
    via_ext = ext.do_evaluation(1, sal_paths, gt_paths, print_stdout=False)
    lib = native._load()  # force the ctypes path for comparison
    import ctypes

    n = len(sal_paths)
    sal_arr = (ctypes.c_char_p * n)(*[s.encode() for s in sal_paths])
    gt_arr = (ctypes.c_char_p * n)(*[s.encode() for s in gt_paths])
    out = (ctypes.c_double * (7 + 512))()
    rc = lib.salmetric_evaluate(sal_arr, gt_arr, n, 1, 0, out)
    assert rc == via_ext["images"] == 4
    assert via_ext["mae"] == out[0]
    assert via_ext["max_f"] == out[1]
    np.testing.assert_array_equal(via_ext["precision"], list(out[7:7 + 256]))

    # the stateful class surface of the reference binding; the threaded
    # path is compared at tolerance (reduction-order ULPs)
    m = ext.PySalMetric(num_thread=2)
    m.load_list(sal_paths, gt_paths)
    got = m.do_evaluation()
    assert got["mae"] == pytest.approx(via_ext["mae"], abs=1e-12)
    m.set_num_thread(1)
    assert m.do_evaluation()["max_f"] == via_ext["max_f"]

    # type errors surface as Python exceptions, not crashes
    with pytest.raises(TypeError):
        ext.do_evaluation(2, [1, 2], gt_paths, print_stdout=False)
    with pytest.raises(ValueError):
        ext.do_evaluation(2, [], [], print_stdout=False)


def test_e_measure_matches_spatial_definition():
    """Closed-form E over confusion counts == the direct spatial computation
    of the enhanced-alignment measure on binarized maps."""
    sals, gts = _synthetic(n=3, hw=(29, 31))

    def direct_e(sal, gt, th):
        fm = (sal.astype(np.float64) > th).astype(np.float64)
        g = (gt.astype(np.float64) > 128).astype(np.float64)
        # official degenerate-GT special cases (Fan et al. released code /
        # PySODMetrics): the alignment formula is prediction-independent
        # when dG == 0. Normalization is the official n-1.
        if g.sum() == 0:
            return (1.0 - fm).sum() / (g.size - 1)
        if g.sum() == g.size:
            return fm.sum() / (g.size - 1)
        dfm = fm - fm.mean()
        dg = g - g.mean()
        align = 2 * dfm * dg / (dfm**2 + dg**2 + 1e-12)
        return (((align + 1) ** 2) / 4).sum() / (g.size - 1)

    acc = SalMetricAccumulator()
    for s, g in zip(sals, gts):
        acc.update_batch(s[None].astype(np.float32), g[None].astype(np.float32))
    res = acc.result()
    for th in (0, 64, 128, 200, 255):
        want = np.mean([direct_e(s, g, th) for s, g in zip(sals, gts)])
        assert res["emeasure"][th] == pytest.approx(want, rel=1e-5)
    # upper bound is n/(n-1), not 1: the official normalization
    assert 0.0 < res["mean_e"] <= res["max_e"] <= 1.0 + 1.0 / (29 * 31 - 1)


def test_s_measure_sanity():
    from sod100k_tpu.metrics.smeasure import s_measure

    gt = np.zeros((32, 32), np.float32)
    gt[8:24, 8:24] = 1.0
    # perfect prediction -> high S; inverted -> low S
    hi = float(s_measure(gt, gt))
    lo = float(s_measure(1.0 - gt, gt))
    mid = float(s_measure(np.full_like(gt, 0.5), gt))
    assert hi > 0.95
    assert lo < 0.35
    assert lo < mid < hi
    # degenerate GTs follow the reference special cases
    empty = np.zeros_like(gt)
    assert float(s_measure(np.zeros_like(gt), empty)) == pytest.approx(1.0)
    assert float(s_measure(np.ones_like(gt), empty)) == pytest.approx(0.0)


def test_s_measure_mask_equals_native_size():
    """Padded inputs with a validity mask must score identically to the
    unpadded image (the masked statistics ignore the padding entirely)."""
    from sod100k_tpu.metrics.smeasure import s_measure

    rng = np.random.default_rng(5)
    h, w = 23, 31
    gt = (rng.random((h, w)) > 0.6).astype(np.float32)
    sal = rng.random((h, w)).astype(np.float32)
    want = float(s_measure(sal, gt))
    H, W = 32, 48
    sal_p = np.zeros((H, W), np.float32)
    gt_p = np.zeros((H, W), np.float32)
    m = np.zeros((H, W), np.float32)
    sal_p[:h, :w], gt_p[:h, :w], m[:h, :w] = sal, gt, 1.0
    got = float(s_measure(sal_p, gt_p, m))
    assert got == pytest.approx(want, abs=1e-5)


def _smeasure_oracle(pred: np.ndarray, gt: np.ndarray) -> float:
    """Numpy transcription of Fan et al.'s reference S-measure implementation
    (Structure-measure, ICCV 2017; author's public MATLAB/Python port),
    independent of the jit version's masked-reduction formulation."""
    eps = 1e-8
    pred = pred.astype(np.float64)
    gt = gt.astype(bool)
    u = gt.mean()
    if u == 0:
        return float(1.0 - pred.mean())
    if u == 1:
        return float(pred.mean())

    def obj(x):
        if x.size == 0:
            return 0.0
        m = x.mean()
        s = x.std(ddof=1) if x.size > 1 else 0.0
        return 2.0 * m / (m * m + 1.0 + s + eps)

    s_object = u * obj(pred[gt]) + (1 - u) * obj((1.0 - pred)[~gt])

    rows, cols = gt.shape
    total = gt.sum()
    # 1-based rounded centroid (reference centroid())
    y = int(np.round((gt.sum(axis=1) * np.arange(1, rows + 1)).sum() / total))
    x = int(np.round((gt.sum(axis=0) * np.arange(1, cols + 1)).sum() / total))

    def ssim(p, g):
        n = p.size
        if n <= 1:
            return 1.0
        mx, my = p.mean(), g.mean()
        vx = ((p - mx) ** 2).sum() / (n - 1)
        vy = ((g - my) ** 2).sum() / (n - 1)
        sxy = ((p - mx) * (g - my)).sum() / (n - 1)
        alpha = 4 * mx * my * sxy
        beta = (mx * mx + my * my) * (vx + vy)
        if alpha != 0:
            return alpha / (beta + eps)
        return 1.0 if beta == 0 else 0.0

    gtf = gt.astype(np.float64)
    area = rows * cols
    s_region = 0.0
    for (rs, cs) in (((0, y), (0, x)), ((0, y), (x, cols)),
                     ((y, rows), (0, x)), ((y, rows), (x, cols))):
        p = pred[rs[0]:rs[1], cs[0]:cs[1]]
        g = gtf[rs[0]:rs[1], cs[0]:cs[1]]
        s_region += (p.size / area) * ssim(p.ravel(), g.ravel())

    return float(max(0.5 * s_object + 0.5 * s_region, 0.0))


def test_s_measure_matches_reference_transcription():
    from sod100k_tpu.metrics.smeasure import s_measure

    rng = np.random.default_rng(11)
    cases = []
    # blobby GTs with noisy predictions (typical SOD shapes)
    for i in range(4):
        h, w = int(rng.integers(24, 64)), int(rng.integers(24, 64))
        cy, cx = rng.integers(6, h - 6), rng.integers(6, w - 6)
        yy, xx = np.mgrid[0:h, 0:w]
        gt = (((yy - cy) ** 2 + (xx - cx) ** 2)
              < int(rng.integers(4, min(h, w) // 2)) ** 2)
        sal = np.clip(gt * 0.8 + rng.random((h, w)) * 0.3, 0, 1)
        cases.append((sal.astype(np.float32), gt.astype(np.float32)))
    # unstructured random case
    cases.append((rng.random((33, 47)).astype(np.float32),
                  (rng.random((33, 47)) > 0.5).astype(np.float32)))
    for sal, gt in cases:
        want = _smeasure_oracle(sal, gt)
        got = float(s_measure(sal, gt))
        assert got == pytest.approx(want, abs=1e-5), (got, want)


def test_eval_backends_agree_on_dirty_pairs(tmp_path):
    """Device and native backends must produce identical numbers on dirty
    data: both skip unreadable/size-mismatched pairs but keep the LISTED
    pair count as the macro-average divisor (the reference's
    sal_metric.cpp:158-162 semantics)."""
    cv2 = pytest.importorskip("cv2")
    from cli.eval import _pairs, evaluate_pairs_device, evaluate_pairs_native

    sal_dir = tmp_path / "sal"
    gt_dir = tmp_path / "gt"
    sal_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(7):
        h, w = 60 + i, 70
        cv2.imwrite(str(sal_dir / f"x{i}.png"),
                    rng.integers(0, 256, (h, w), dtype=np.uint8))
        cv2.imwrite(str(gt_dir / f"x{i}.png"),
                    (rng.random((h, w)) > 0.5).astype(np.uint8) * 255)
    (sal_dir / "x3.png").write_bytes(b"not a png")  # unreadable sal
    cv2.imwrite(str(gt_dir / "x5.png"),  # GT at the wrong resolution
                (rng.random((10, 10)) > 0.5).astype(np.uint8) * 255)

    pairs = _pairs(str(sal_dir), str(gt_dir))
    assert len(pairs) == 7
    d = evaluate_pairs_device(pairs, batch=4, log=lambda *a: None)
    n = evaluate_pairs_native(pairs)
    assert n["images"] == 5  # both skipped the same two pairs
    for k in ("max_f", "mae", "mean_f", "mean_precision", "mean_recall"):
        assert d[k] == pytest.approx(n[k], abs=1e-5), (k, d[k], n[k])
    assert len(n["fmeasure"]) == 256  # native carries the full F curve too


def test_e_measure_degenerate_gt_special_cases():
    """Official E-measure semantics for degenerate GT (Fan et al.'s released
    code / PySODMetrics): an all-background GT scores the prediction's
    background fraction and an all-foreground GT its foreground fraction —
    NOT the prediction-independent 1/4 the closed form alone would give
    (dG == 0 kills the alignment term)."""
    h, w = 17, 23
    zeros = np.zeros((h, w), np.float32)
    full = np.full((h, w), 255.0, np.float32)

    def em(sal, gt):
        acc = SalMetricAccumulator()
        acc.update_batch(sal[None], gt[None])
        return acc.result()["emeasure"]

    # the official normalization is /(n-1): perfect degenerate scores land
    # at n/(n-1), marginally above 1 (a known PySODMetrics oddity we
    # reproduce exactly)
    n = float(h * w)
    top = n / (n - 1)
    # empty GT: perfect prediction (all background) -> n/(n-1) everywhere
    np.testing.assert_allclose(em(zeros, zeros), top, rtol=1e-6)
    # empty GT: worst prediction (all foreground) -> 0 below saturation
    e = em(full, zeros)
    assert np.all(e[:255] == 0.0)
    np.testing.assert_allclose(e[255], top, rtol=1e-6)  # sal > 255 is empty
    # full-fg GT: perfect prediction -> n/(n-1) below saturation
    e = em(full, full)
    np.testing.assert_allclose(e[:255], top, rtol=1e-6)
    assert e[255] == 0.0
    # full-fg GT: worst prediction -> 0
    np.testing.assert_allclose(em(zeros, full), 0.0)

    # a half-covered prediction on empty GT scores its background count/(n-1)
    half = np.zeros((h, w), np.float32)
    half[: h // 2] = 255.0
    want = (n - (h // 2) * w) / (n - 1)
    np.testing.assert_allclose(em(half, zeros)[:255], want, rtol=1e-6)


def _wfm_oracle(sal, fg):
    """Independent brute-force Fbw (Margolin CVPR'14): explicit O(N*M)
    nearest-foreground search and direct-loop Gaussian convolution. Only
    valid on GTs where every background pixel has a UNIQUE nearest
    foreground pixel (tie-breaking in the fast distance transform is
    implementation-defined)."""
    sal = sal.astype(np.float64)
    fg = fg.astype(bool)
    h, w = fg.shape
    err = np.abs(sal - fg)
    fg_pts = np.argwhere(fg)
    dep = err.copy()
    dist = np.zeros((h, w))
    for r in range(h):
        for c in range(w):
            if fg[r, c]:
                continue
            d2 = (fg_pts[:, 0] - r) ** 2 + (fg_pts[:, 1] - c) ** 2
            k = int(np.argmin(d2))
            assert (d2 == d2[k]).sum() == 1, "oracle GT must be tie-free"
            dist[r, c] = np.sqrt(d2[k])
            dep[r, c] = err[fg_pts[k, 0], fg_pts[k, 1]]
    g = np.arange(7) - 3.0
    kern = np.exp(-(g[:, None] ** 2 + g[None, :] ** 2) / 50.0)
    kern /= kern.sum()
    sm = np.zeros((h, w))
    for r in range(h):
        for c in range(w):
            for dr in range(-3, 4):
                for dc in range(-3, 4):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < h and 0 <= cc < w:
                        sm[r, c] += kern[dr + 3, dc + 3] * dep[rr, cc]
    emin = np.where(fg & (sm < err), sm, err)
    ew = emin * np.where(fg, 1.0, 2.0 - np.exp(np.log(0.5) / 5.0 * dist))
    tpw = fg.sum() - ew[fg].sum()
    rec = 1.0 - ew[fg].mean()
    prec = tpw / (tpw + ew[~fg].sum() + 1e-12)
    return 2.0 * rec * prec / (rec + prec + 1e-12)


def test_weighted_f_measure_matches_brute_force():
    from sod100k_tpu.metrics.wfmeasure import weighted_f_measure

    # tie-free GTs: a single foreground pixel, and a half-plane (the unique
    # nearest foreground of bg pixel (r,c) is ((k-1),c))
    point = np.zeros((14, 11), bool)
    point[4, 7] = True
    half = np.zeros((12, 13), bool)
    half[:5] = True
    for gt in (point, half):
        sal = RNG.random(gt.shape)
        np.testing.assert_allclose(
            weighted_f_measure(sal, gt), _wfm_oracle(sal, gt),
            rtol=0, atol=1e-10)


def test_weighted_f_measure_properties():
    from sod100k_tpu.metrics.wfmeasure import (
        weighted_f_measure,
        weighted_f_measure_batch,
    )

    gt = np.zeros((20, 20), bool)
    gt[5:14, 6:16] = True
    perfect = gt.astype(np.float64)
    np.testing.assert_allclose(weighted_f_measure(perfect, gt), 1.0,
                               atol=1e-9)
    assert weighted_f_measure(1.0 - perfect, gt) < 1e-9
    noisy = np.clip(perfect + 0.3 * RNG.random(gt.shape), 0, 1)
    noisier = np.clip(perfect + 0.6 * RNG.random(gt.shape), 0, 1)
    assert 0 < weighted_f_measure(noisier, gt) \
        < weighted_f_measure(noisy, gt) < 1
    # all-background GT scores 0 by convention
    assert weighted_f_measure(noisy, np.zeros_like(gt)) == 0.0
    # padded batch with hw extents == per-image on the crops (padding must
    # not count as background)
    sal_p = np.full((2, 32, 32), 0.5)  # nonzero pad: counts as FP if scored
    gt_p = np.zeros((2, 32, 32), bool)
    sal_p[0, :20, :20], gt_p[0, :20, :20] = noisy, gt
    sal_p[1, :20, :20], gt_p[1, :20, :20] = noisier, gt
    hw = np.asarray([[20, 20], [20, 20]])
    got = weighted_f_measure_batch(sal_p, gt_p, hw)
    np.testing.assert_allclose(
        got, [weighted_f_measure(noisy, gt), weighted_f_measure(noisier, gt)])
    assert got[0] != weighted_f_measure(sal_p[0], gt_p[0])


def test_weighted_f_device_matches_host():
    """wf_per_image_device (the resident TESTALL sweep's on-device Fbw,
    GT-static tables precomputed on host) == weighted_f_measure_batch on
    padded canvases, including degenerate all-background / all-foreground
    crops. The f32 device accumulation vs the host's f64 bounds the
    tolerance."""
    import jax.numpy as jnp

    from sod100k_tpu.metrics.wfmeasure import (
        precompute_wf_tables,
        weighted_f_measure_batch,
        wf_per_image_device,
    )

    ch, cw = 40, 36
    sizes = [(40, 36), (25, 30), (33, 18), (25, 30), (40, 36)]
    n = len(sizes)
    sal = np.zeros((n, ch, cw))
    gt = np.zeros((n, ch, cw), np.uint8)
    hw = np.asarray(sizes, np.int32)
    mask = np.zeros((n, ch, cw), np.float32)
    for i, (h, w) in enumerate(sizes):
        sal[i, :h, :w] = RNG.random((h, w))
        gt[i, :h, :w] = (RNG.random((h, w)) > 0.6).astype(np.uint8) * 255
        mask[i, :h, :w] = 1.0
        sal[i, h:, :] = sal[i, :, w:] = 0.7  # padding junk: must be ignored
    gt[3] = 0                      # all-background crop -> 0 by convention
    gt[4, :, :] = 255              # all-foreground crop

    tables = precompute_wf_tables(gt, hw)
    got = np.asarray(wf_per_image_device(
        jnp.asarray(sal), jnp.asarray(gt), jnp.asarray(mask),
        jnp.asarray(tables["wf_idx"]), jnp.asarray(tables["wf_weight"])))
    want = weighted_f_measure_batch(sal, gt > 128, hw)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
    assert got[3] == 0.0


def test_eval_device_backend_reports_weighted_f(tmp_path):
    """evaluate_pairs_device(with_wfmeasure=True) averages the per-image
    Fbw over the listed pair count, on the unpadded images."""
    cv2 = pytest.importorskip("cv2")
    from cli.eval import _pairs, evaluate_pairs_device
    from sod100k_tpu.metrics.wfmeasure import weighted_f_measure

    sal_dir = tmp_path / "sal"
    gt_dir = tmp_path / "gt"
    sal_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.default_rng(1)
    expected = 0.0
    for i in range(3):
        h, w = 40 + 7 * i, 50
        gt = np.zeros((h, w), np.uint8)
        gt[8:h - 8, 10:w - 10] = 255
        sal = np.clip(gt.astype(np.int32)
                      + rng.integers(-120, 120, (h, w)), 0, 255).astype(np.uint8)
        cv2.imwrite(str(sal_dir / f"x{i}.png"), sal)
        cv2.imwrite(str(gt_dir / f"x{i}.png"), gt)
        expected += weighted_f_measure(sal / 255.0, gt > 128) / 3
    pairs = _pairs(str(sal_dir), str(gt_dir))
    res = evaluate_pairs_device(pairs, batch=2, with_wfmeasure=True,
                                log=lambda *a: None)
    assert res["weighted_f"] == pytest.approx(expected, abs=1e-9)
    assert 0 < res["weighted_f"] < 1


def test_adaptive_f_matches_brute_force():
    """Device adaptive-F == a direct numpy transcription of the protocol
    (binarize at min(2*mean, 255), F-beta^2=0.3, zero-intersection -> 0),
    per-image and through padded batches / the accumulator."""
    from sod100k_tpu.metrics.salmetric import adaptive_f_per_image

    def oracle(sal, gt):
        sal = sal.astype(np.float64)
        th = min(2.0 * sal.mean(), 255.0)
        binary = sal >= th
        pos = gt.astype(np.float64) > 128
        inter = (binary & pos).sum()
        if inter == 0:
            return 0.0
        pre = inter / binary.sum()
        rec = inter / pos.sum()
        return (1 + BETA2) * pre * rec / (BETA2 * pre + rec)

    sals, gts = _synthetic(n=5, hw=(23, 31))  # includes empty + full GT
    want = [oracle(s, g) for s, g in zip(sals, gts)]
    got = np.asarray(adaptive_f_per_image(
        np.stack(sals).astype(np.float32), np.stack(gts).astype(np.float32),
        np.ones((5, 23, 31), np.float32)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # padded batch with masks: padding must not shift the adaptive
    # threshold (it enters the per-image mean if unmasked)
    H, W = 32, 40
    sal_p = np.full((5, H, W), 200.0, np.float32)
    gt_p = np.zeros((5, H, W), np.float32)
    m = np.zeros((5, H, W), np.float32)
    for i, (s, g) in enumerate(zip(sals, gts)):
        sal_p[i, :23, :31] = s
        gt_p[i, :23, :31] = g
        m[i, :23, :31] = 1
    got_p = np.asarray(adaptive_f_per_image(sal_p, gt_p, m))
    np.testing.assert_allclose(got_p, want, atol=1e-6)

    acc = SalMetricAccumulator()
    acc.update_batch(sal_p, gt_p, mask=m)
    assert acc.result()["adaptive_f"] == pytest.approx(np.mean(want), abs=1e-6)


def test_adaptive_e_matches_brute_force():
    """Device adaptive-E (closed form over confusion counts) == a direct
    numpy transcription of the PySODMetrics 'adp' protocol: binarize at
    min(2*mean, 255), full SPATIAL alignment-matrix E-measure of that
    binary map, official degenerate-GT special cases, n-1 normalization —
    per-image, through padded batches, and via the accumulator."""
    from sod100k_tpu.metrics.salmetric import adaptive_e_per_image

    def oracle(sal, gt):
        eps = 1e-12
        sal = sal.astype(np.float64)
        th = min(2.0 * sal.mean(), 255.0)
        fm = (sal >= th).astype(np.float64)
        g = (gt.astype(np.float64) > 128).astype(np.float64)
        n = sal.size
        if g.sum() == 0:
            enhanced_sum = float((1.0 - fm).sum())
        elif g.sum() == n:
            enhanced_sum = float(fm.sum())
        else:
            df = fm - fm.mean()
            dg = g - g.mean()
            align = 2.0 * df * dg / (df * df + dg * dg + eps)
            enhanced_sum = float((np.square(align + 1.0) / 4.0).sum())
        return enhanced_sum / (n - 1.0 + eps)

    sals, gts = _synthetic(n=5, hw=(23, 31))  # includes empty + full GT
    want = [oracle(s, g) for s, g in zip(sals, gts)]
    got = np.asarray(adaptive_e_per_image(
        np.stack(sals).astype(np.float32), np.stack(gts).astype(np.float32),
        np.ones((5, 23, 31), np.float32)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # padded batch with masks: padding must enter neither the adaptive
    # threshold nor the alignment means / pixel count
    H, W = 32, 40
    sal_p = np.full((5, H, W), 200.0, np.float32)
    gt_p = np.zeros((5, H, W), np.float32)
    m = np.zeros((5, H, W), np.float32)
    for i, (s, g) in enumerate(zip(sals, gts)):
        sal_p[i, :23, :31] = s
        gt_p[i, :23, :31] = g
        m[i, :23, :31] = 1
    got_p = np.asarray(adaptive_e_per_image(sal_p, gt_p, m))
    np.testing.assert_allclose(got_p, want, atol=1e-5)

    acc = SalMetricAccumulator()
    acc.update_batch(sal_p, gt_p, mask=m)
    assert acc.result()["adaptive_e"] == pytest.approx(np.mean(want), abs=1e-5)

    # an all-masked (padding) row scores exactly 0, like adaptive-F — not
    # the degenerate-GT closed form's 1/eps sentinel
    zero_mask = np.zeros((1, 8, 8), np.float32)
    got_0 = np.asarray(adaptive_e_per_image(
        np.full((1, 8, 8), 100.0, np.float32),
        np.zeros((1, 8, 8), np.float32), zero_mask))
    assert got_0[0] == 0.0


def test_eval_dirs_mode_scores_csf_dumps(tmp_path):
    """cli.eval --dirs SAL GT --sal-suffix _sal_fuse: layout-free scoring
    of cli.csf test-mode dumps (suffixed names, mixed GT extensions) with
    the full suite — values equal to the hand-paired device path."""
    cv2 = pytest.importorskip("cv2")
    from cli.eval import evaluate_pairs_device, run_eval_dirs

    sal_dir = tmp_path / "fold"
    gt_dir = tmp_path / "gt"
    sal_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.default_rng(9)
    pairs = []
    for i, ext in enumerate((".png", ".jpg", ".png")):
        h, w = 36 + 4 * i, 40
        gt = np.zeros((h, w), np.uint8)
        gt[8:h - 8, 8:w - 8] = 255
        sal = np.clip(gt.astype(np.int32)
                      + rng.integers(-90, 90, (h, w)), 0, 255).astype(np.uint8)
        cv2.imwrite(str(sal_dir / f"im{i}_sal_fuse.png"), sal)
        cv2.imwrite(str(gt_dir / f"im{i}{ext}"), gt)
        pairs.append((str(sal_dir / f"im{i}_sal_fuse.png"),
                      str(gt_dir / f"im{i}{ext}")))
    # a stray unpaired sal file must be ignored, not crash the pairing
    cv2.imwrite(str(sal_dir / "orphan_sal_fuse.png"),
                np.zeros((8, 8), np.uint8))

    want = evaluate_pairs_device(pairs, with_wfmeasure=True,
                                 log=lambda *a: None)
    got = run_eval_dirs(str(sal_dir), str(gt_dir), suite="full",
                        sal_suffix="_sal_fuse", log=lambda *a, **k: None)
    for key in ("mae", "max_f", "mean_f", "adaptive_f", "adaptive_e",
                "max_e", "mean_e", "s_measure", "weighted_f"):
        assert got[key] == pytest.approx(want[key], abs=1e-9), key

    # native backend agrees on the reference block
    got_n = run_eval_dirs(str(sal_dir), str(gt_dir), backend="native",
                          sal_suffix="_sal_fuse", log=lambda *a, **k: None)
    assert got_n["max_f"] == pytest.approx(want["max_f"], abs=5e-5)

    # explicit refusals instead of silent drops / empty results
    with pytest.raises(SystemExit, match="wfmeasure"):
        run_eval_dirs(str(sal_dir), str(gt_dir), backend="native",
                      wfmeasure=True, sal_suffix="_sal_fuse",
                      log=lambda *a, **k: None)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no sal/GT pairs"):
        run_eval_dirs(str(empty), str(gt_dir), log=lambda *a, **k: None)


def test_eval_suite_full_reports_everything(tmp_path):
    """cli.eval --suite full: ONE invocation reports the whole modern suite
    — MAE, max/mean/adaptive F, max/mean/adaptive E, S, wF — on BOTH
    backends (host fallbacks fill what the native tool doesn't compute),
    each value equal to its per-metric path."""
    cv2 = pytest.importorskip("cv2")
    from cli.eval import _pairs, evaluate_pairs_device, run_eval
    from sod100k_tpu.config import get_cfg

    sal_dir = tmp_path / "save" / "m" / "ECSSD_0"
    gt_dir = tmp_path / "data" / "ECSSD" / "GT"
    sal_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i in range(4):
        h, w = 40 + 3 * i, 44
        gt = np.zeros((h, w), np.uint8)
        gt[10:h - 10, 8:w - 8] = 255
        sal = np.clip(gt.astype(np.int32)
                      + rng.integers(-100, 100, (h, w)), 0, 255).astype(np.uint8)
        cv2.imwrite(str(sal_dir / f"p{i}.png"), sal)
        cv2.imwrite(str(gt_dir / f"p{i}.png"), gt)

    cfg = get_cfg()
    cfg.TASK = "m"
    cfg.DATA.SAVEDIR = str(tmp_path / "save")
    cfg.TEST.DATASET_PATH = str(tmp_path / "data")
    cfg.TEST.DATASETS = ["ECSSD"]

    want = evaluate_pairs_device(_pairs(str(sal_dir), str(gt_dir)),
                                 with_wfmeasure=True, log=lambda *a: None)
    labels = {"MaxF": "max_f", "MAE": "mae", "MeanF": "mean_f",
              "AdpF": "adaptive_f", "MaxE": "max_e", "MeanE": "mean_e",
              "AdpE": "adaptive_e", "S": "s_measure", "wF": "weighted_f"}
    for backend in ("device", "native"):
        lines = []
        run_eval(cfg, epoch_range=(0, 1), backend=backend, suite="full",
                 log=lambda msg, display=True: lines.append(str(msg)))
        rep = next(ln for ln in lines if ln.startswith("epoch 0"))
        toks = rep.split()
        got = {toks[j]: float(toks[j + 1])
               for j in range(3, len(toks) - 1, 2)}
        for label, key in labels.items():
            assert label in got, (backend, rep)
            assert got[label] == pytest.approx(want[key], abs=5e-5), \
                (backend, label)

    # dirty-data contract under --suite full: a pair list where nothing
    # decodes must complete (native divisor semantics) with the modern-
    # metric fill skipped, not crash on an empty accumulator
    bad_sal = tmp_path / "save" / "m" / "ECSSD_1"
    bad_sal.mkdir()
    (bad_sal / "p0.png").write_bytes(b"\x89PNG truncated")
    assert (tmp_path / "data" / "ECSSD" / "GT" / "p0.png").exists()
    lines = []
    run_eval(cfg, epoch_range=(1, 2), backend="native", suite="full",
             log=lambda msg, display=True: lines.append(str(msg)))
    assert any("fallback skipped" in ln for ln in lines), lines
    assert any(ln.startswith("epoch 1") for ln in lines), lines
