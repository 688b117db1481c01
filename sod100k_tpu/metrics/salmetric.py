"""SalMetric as vectorized on-device reductions.

Reproduces the reference C++ tool's math exactly
(/root/reference/CSNet_training/SalMetric/src/sal_metric.cpp):

- MAE per image: mean(|sal - gt|) / 255 over raw grayscale values (:86-97),
- precision/recall at 256 thresholds with strict comparisons
  (sal > th, gt > 128) and EPSILON = 1e-4 added to both numerator and
  denominator (:99-120, hpp:51),
- per-threshold P/R macro-averaged over images (:157-163),
- F-measure with beta^2 = 0.3 computed from the averaged P/R (:164-175),
- Max-F over thresholds (strict >, argmax initialized to 0), Mean-F/P/R.

Instead of a 256-pass pixel scan per image, one histogram pass per image
yields every threshold count: #(sal > th) = total - cumsum(hist)[th]. Images
are processed in padded batches with validity masks so arbitrary sizes compile
to a handful of fixed shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

THRESHOLDS = 256
EPSILON = 1e-4
BETA2 = 0.3


@functools.partial(jax.jit, static_argnames=())
def _per_image_stats(sal: jax.Array, gt: jax.Array, mask: jax.Array):
    """Per-image (mae, precision[256], recall[256]).

    sal/gt: (B, H, W) float32 grayscale in [0, 255] (integral values, as read
    from 8-bit PNGs); mask: (B, H, W) float32 validity (padding = 0).
    """
    sal = sal.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    npix = jnp.sum(mask, axis=(1, 2))

    mae = jnp.sum(jnp.abs(sal - gt) / 255.0 * mask, axis=(1, 2)) / npix

    pos = (gt > THRESHOLDS / 2).astype(jnp.float32) * mask  # gt > 128
    b_sum = jnp.sum(pos, axis=(1, 2))

    # threshold counts as dense compare+reduce, NOT a scatter histogram:
    # TPU scatters serialize (measured 354 ms for a (128,400,400) batch vs
    # ~2 ms for this form — the compare/select/sum chain fuses onto the VPU
    # and each lax.scan chunk re-reads sal once). Counts are sums of f32
    # ones (< 2^24 per image), so the arithmetic is exact. floor() keeps
    # the 8-bit-PNG binning for non-integral inputs (the old histogram's
    # astype(int32): 100.7 bins as 100, NOT counted in #(sal > 100)).
    flat_sal = jnp.floor(jnp.clip(sal, 0, 255)).reshape(sal.shape[0], -1)
    flat_mask = mask.reshape(mask.shape[0], -1)
    flat_pos = pos.reshape(pos.shape[0], -1)

    def chunk(_, th_c):
        gt_th = flat_sal[:, :, None] > th_c[None, None, :]
        a = jnp.sum(jnp.where(gt_th, flat_mask[:, :, None], 0.0), axis=1)
        f = jnp.sum(jnp.where(gt_th, flat_pos[:, :, None], 0.0), axis=1)
        return None, (a, f)

    k = 16
    ths = jnp.arange(THRESHOLDS, dtype=jnp.float32).reshape(-1, k)
    _, (a_s, ab_s) = jax.lax.scan(chunk, None, ths)
    # (256/k, B, k) -> (B, 256): a_sum[b, th] = #(sal > th), strict >
    a_sum = jnp.moveaxis(a_s, 0, 1).reshape(sal.shape[0], THRESHOLDS)
    ab = jnp.moveaxis(ab_s, 0, 1).reshape(sal.shape[0], THRESHOLDS)

    precision = (ab + EPSILON) / (a_sum + EPSILON)
    recall = (ab + EPSILON) / (b_sum[:, None] + EPSILON)
    emeasure = _e_measure_from_counts(ab, a_sum, b_sum[:, None], npix[:, None])
    return mae, precision, recall, emeasure


def _e_measure_from_counts(tp, a, b, n):
    """Enhanced-alignment measure (E-measure, Fan et al. IJCAI'18) per
    threshold, in closed form over confusion counts.

    For binary FM/GT the bias-corrected maps take two values each, so the
    alignment matrix phi = 2*dF*dG / (dF^2 + dG^2) takes four values weighted
    by (TP, FP, FN, TN) — the full spatial computation collapses onto the
    histogram counts already gathered for precision/recall.

    Degenerate GT takes the official special cases (Fan et al.'s released
    code / PySODMetrics): all-background GT scores the prediction's
    background pixel count and all-foreground GT its foreground count — the
    general closed form would otherwise collapse to a prediction-independent
    constant 1/4 (dG == 0 kills the alignment term identically). The
    normalization is the official n-1 (PySODMetrics-exact, including its
    known oddity that degenerate-GT scores can marginally exceed 1 by
    n/(n-1)).
    """
    eps = 1e-12
    mu_f = a / n
    mu_g = b / n
    fp = a - tp
    fn = b - tp
    tn = n - a - b + tp

    def enhanced(df, dg):
        align = 2.0 * df * dg / (df * df + dg * dg + eps)
        return jnp.square(align + 1.0) / 4.0

    e_sum = (tp * enhanced(1 - mu_f, 1 - mu_g)
             + fp * enhanced(1 - mu_f, -mu_g)
             + fn * enhanced(-mu_f, 1 - mu_g)
             + tn * enhanced(-mu_f, -mu_g))
    norm = n - 1.0 + eps
    e_general = e_sum / norm
    e_empty_gt = (n - a) / norm   # prediction's background pixel count
    e_full_gt = a / norm          # prediction's foreground pixel count
    return jnp.where(b == 0, e_empty_gt,
                     jnp.where(b == n, e_full_gt, e_general))


def _adaptive_binarize(sal: jax.Array, gt: jax.Array, mask: jax.Array):
    """Shared preamble of the adaptive protocols: binarize each prediction
    at min(2 * its own masked mean, 255) (>= convention), GT at > 128.

    DIALECT NOTE: the threshold is taken on the RAW [0, 255] map — the
    dialect of this whole suite and of the reference SalMetric tool. The
    public PySODMetrics suite min-max-normalizes predictions first
    (`_prepare_data`), which changes EVERY metric (not just the adaptive
    ones) on maps that don't span the full range; since our maps are
    trunc(sigmoid*255) u8 dumps scored against the reference contract, we
    keep the raw dialect consistently rather than mixing conventions.
    Returns (binary, pos, npix) with npix clamped to >= 1."""
    sal = sal.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    npix = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
    mean = jnp.sum(sal * mask, axis=(1, 2)) / npix
    th = jnp.minimum(2.0 * mean, 255.0)
    binary = (sal >= th[:, None, None]).astype(jnp.float32) * mask
    pos = (gt.astype(jnp.float32) > THRESHOLDS / 2).astype(jnp.float32) * mask
    return binary, pos, npix


@jax.jit
def adaptive_f_per_image(sal: jax.Array, gt: jax.Array, mask: jax.Array):
    """Per-image adaptive F-measure (the third standard F protocol in SOD
    evaluation, alongside max-F and mean-F; the convention of Achanta et
    al. CVPR'09 as the public PySODMetrics suite defines the metric — see
    _adaptive_binarize for the deliberate raw-[0,255] dialect): binarize
    each prediction at min(2 * its own mean, 255), then F with
    beta^2 = 0.3 from that single binarization. Zero intersection
    (including empty GT) scores 0. sal/gt: (B, H, W) in [0, 255]; mask
    marks valid pixels."""
    binary, pos, _ = _adaptive_binarize(sal, gt, mask)
    inter = jnp.sum(binary * pos, axis=(1, 2))
    eps = 1e-12
    pre = inter / jnp.maximum(jnp.sum(binary, axis=(1, 2)), eps)
    rec = inter / jnp.maximum(jnp.sum(pos, axis=(1, 2)), eps)
    f = (1 + BETA2) * pre * rec / (BETA2 * pre + rec + eps)
    return jnp.where(inter > 0, f, 0.0)


@jax.jit
def adaptive_e_per_image(sal: jax.Array, gt: jax.Array, mask: jax.Array):
    """Per-image adaptive E-measure (the 'adp' protocol of the public
    PySODMetrics suite, completing the max/mean/adaptive triple for E like
    adaptive_f_per_image does for F; see _adaptive_binarize for the
    deliberate raw-[0,255] dialect): binarize each prediction at
    min(2 * its own mean, 255) — the same adaptive threshold and >=
    convention as adaptive-F — then score that single binary map with the
    E-measure confusion-count closed form, including the official
    degenerate-GT special cases (_e_measure_from_counts). An all-masked
    (padding) row scores 0 like adaptive-F — never the closed form's
    1/eps sentinel — so no consumer depends on exact-zero weights.

    sal/gt: (B, H, W) in [0, 255]; mask marks valid pixels (padding = 0)."""
    binary, pos, npix = _adaptive_binarize(sal, gt, mask)
    tp = jnp.sum(binary * pos, axis=(1, 2))
    a = jnp.sum(binary, axis=(1, 2))
    b = jnp.sum(pos, axis=(1, 2))
    e = _e_measure_from_counts(tp, a, b, npix)
    valid = jnp.sum(mask.astype(jnp.float32), axis=(1, 2)) > 0
    return jnp.where(valid, e, 0.0)


class SalMetricAccumulator:
    """Streaming macro-average accumulator over an image set."""

    def __init__(self) -> None:
        self.n = 0
        self.mae = 0.0
        self.precision = np.zeros(THRESHOLDS, np.float64)
        self.recall = np.zeros(THRESHOLDS, np.float64)
        self.emeasure = np.zeros(THRESHOLDS, np.float64)
        self.adaptive_f = 0.0
        self.adaptive_e = 0.0

    def update_batch(self, sal: np.ndarray, gt: np.ndarray,
                     mask: np.ndarray | None = None, count: int | None = None):
        """sal/gt: (B, H, W) in [0,255]; mask marks valid pixels; count marks
        valid images (trailing padded images ignored)."""
        if mask is None:
            mask = np.ones(sal.shape, np.float32)
        # ship operands ONCE: the three jitted calls share the same device
        # arrays (a fresh jnp.asarray per call would re-upload each batch
        # three times — ~61 MB/chunk over the 35 ms-RPC tunnel)
        sal_d, gt_d, mask_d = (jnp.asarray(sal), jnp.asarray(gt),
                               jnp.asarray(mask))
        mae, pre, rec, em = _per_image_stats(sal_d, gt_d, mask_d)
        af = adaptive_f_per_image(sal_d, gt_d, mask_d)
        ae = adaptive_e_per_image(sal_d, gt_d, mask_d)
        k = sal.shape[0] if count is None else count
        self.n += k
        self.mae += float(jnp.sum(mae[:k]))
        self.precision += np.asarray(jnp.sum(pre[:k], axis=0), np.float64)
        self.recall += np.asarray(jnp.sum(rec[:k], axis=0), np.float64)
        self.emeasure += np.asarray(jnp.sum(em[:k], axis=0), np.float64)
        self.adaptive_f += float(jnp.sum(af[:k]))
        self.adaptive_e += float(jnp.sum(ae[:k]))

    def result(self) -> dict:
        assert self.n > 0, "no images accumulated"
        p = self.precision / self.n
        r = self.recall / self.n
        f = ((1 + BETA2) * p * r) / (BETA2 * p + r)
        # strict > with fmax initialized to 0 (sal_metric.cpp:151-172)
        argmax = 0
        fmax = 0.0
        for th in range(THRESHOLDS):
            if f[th] > fmax:
                fmax = float(f[th])
                argmax = th
        e = self.emeasure / self.n
        return {
            "mae": self.mae / self.n,
            "precision": p,
            "recall": r,
            "fmeasure": f,
            "max_f": fmax,
            "mean_f": float(f.mean()),
            "argmax": argmax,
            "precision_at_max": float(p[argmax]),
            "recall_at_max": float(r[argmax]),
            "mean_precision": float(p.mean()),
            "mean_recall": float(r.mean()),
            "emeasure": e,
            "max_e": float(e.max()),
            "mean_e": float(e.mean()),
            "adaptive_f": self.adaptive_f / self.n,
            "adaptive_e": self.adaptive_e / self.n,
        }


def result_from_sums(sums) -> dict:
    """Build the result dict from device-side PER-BATCH metric sums (the
    resident test+eval sweep, data/resident.py:make_resident_salmetric_fn;
    each leaf carries a leading (nb,) batch axis): the cross-batch
    reduction happens here in float64 so long f32 carry chains on device
    cannot drift rankings on large splits. Same aggregation as
    SalMetricAccumulator.result plus "s_measure"."""

    def total(v):
        return np.asarray(v, np.float64).sum(axis=0)

    acc = SalMetricAccumulator()
    acc.n = int(round(float(total(sums["n"]))))
    acc.mae = float(total(sums["mae_sum"]))
    acc.precision = total(sums["p_sum"])
    acc.recall = total(sums["r_sum"])
    acc.emeasure = total(sums["e_sum"])
    if "a_sum" in sums:
        acc.adaptive_f = float(total(sums["a_sum"]))
    if "ae_sum" in sums:
        acc.adaptive_e = float(total(sums["ae_sum"]))
    res = acc.result()
    res["s_measure"] = float(total(sums["s_sum"])) / acc.n
    if "w_sum" in sums:
        res["weighted_f"] = float(total(sums["w_sum"])) / acc.n
    return res


def _g(v: float) -> str:
    """C++ `cout << float` default formatting: 6 significant digits."""
    return f"{v:g}"


def format_report(res: dict) -> str:
    """Reproduce the reference CLI stdout contract (sal_metric.cpp:164-185):
    256 threshold lines then exactly seven summary lines (eval.py:68-70 parses
    the last 8 newline-split fields)."""
    lines = []
    for th in range(THRESHOLDS):
        lines.append(
            f"Threshold {th}:\tMAE: {_g(res['mae'])}\tPrecision: "
            f"{_g(res['precision'][th])}\tRecall: {_g(res['recall'][th])}"
            f"\tFmeasure: {_g(res['fmeasure'][th])}"
        )
    lines.append(f"Max_F-measre:   {_g(res['max_f'])}")
    lines.append(f"Mean_F-measre:  {_g(res['mean_f'])}")
    lines.append(f"Precision:      {_g(res['precision_at_max'])}")
    lines.append(f"Recall:         {_g(res['recall_at_max'])}")
    lines.append(f"Mean_Precision: {_g(res['mean_precision'])}")
    lines.append(f"Mean_Recall:    {_g(res['mean_recall'])}")
    lines.append(f"MAE:            {_g(res['mae'])}")
    return "\n".join(lines) + "\n"
