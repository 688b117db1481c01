"""Weighted F-measure (Margolin et al., CVPR 2014).

"How to Evaluate Foreground Maps" — the weighted Fbw metric that, together
with MAE / F-beta / E-measure / S-measure, forms the standard modern SOD
evaluation suite. It is NOT in the reference's SalMetric tool
(sal_metric.cpp computes MAE + 256-threshold P/R/F only) — additive scope,
like metrics/smeasure.py.

The algorithm weighs each pixel's error by (a) its dependency on nearby
foreground errors and (b) its distance from the foreground region:

  E   = |sal - gt|                       (gt binary {0,1}, sal in [0,1])
  Et  = E with every background pixel replaced by the error at its nearest
        foreground pixel (Euclidean distance transform with indices)
  EA  = Et convolved with a 7x7 sigma-5 Gaussian (zero-padded borders)
  Emin= min(E, EA) on foreground pixels where smoothing reduced the error;
        E elsewhere
  B   = 1 on foreground; 2 - exp(ln(0.5)/5 * dist_to_fg) on background
  Ew  = Emin * B
  TPw = |FG| - sum(Ew over FG),  FPw = sum(Ew over BG)
  Rw  = 1 - mean(Ew over FG),    Pw  = TPw / (TPw + FPw + eps)
  Fbw = (1 + beta2) Pw Rw / (beta2 Pw + Rw + eps),  beta2 = 1

This runs on the host (numpy + scipy): the distance transform is
data-dependent and sequential — a poor fit for the TPU's vector units —
while per-image cost is ~ms, far below the PNG decode that precedes it in
cli.eval. Degenerate all-background GT scores 0 (no foreground to weigh —
the convention of the author's public code and PySODMetrics).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-12
BETA2 = 1.0  # the paper uses beta^2 = 1 (harmonic mean), unlike F-beta's 0.3


def _gauss_kernel(size: int = 7, sigma: float = 5.0) -> np.ndarray:
    half = (size - 1) / 2.0
    g = np.arange(size) - half
    k = np.exp(-(g[:, None] ** 2 + g[None, :] ** 2) / (2.0 * sigma**2))
    return k / k.sum()


def weighted_f_measure(sal: np.ndarray, gt: np.ndarray) -> float:
    """Fbw for one image. sal: float map scaled to [0,1]; gt: binary
    foreground mask (any dtype; nonzero = foreground). Shapes must match."""
    from scipy.ndimage import convolve, distance_transform_edt

    sal = np.asarray(sal, np.float64)
    fg = np.asarray(gt).astype(bool)
    assert sal.shape == fg.shape, (sal.shape, fg.shape)
    if not fg.any():
        return 0.0

    err = np.abs(sal - fg.astype(np.float64))
    # distance_transform_edt(~fg) gives, per background pixel, the distance
    # to (and index of) the nearest foreground pixel; 0/self on foreground
    dist, idx = distance_transform_edt(~fg, return_indices=True)
    dep = err.copy()
    bg = ~fg
    dep[bg] = err[idx[0][bg], idx[1][bg]]
    smoothed = convolve(dep, _gauss_kernel(), mode="constant", cval=0.0)
    emin = np.where(fg & (smoothed < err), smoothed, err)
    weight = np.where(bg, 2.0 - np.exp(np.log(0.5) / 5.0 * dist), 1.0)
    ew = emin * weight

    n_fg = float(fg.sum())
    tpw = n_fg - float(ew[fg].sum())
    fpw = float(ew[bg].sum())
    recall = 1.0 - float(ew[fg].mean())
    precision = tpw / (tpw + fpw + EPS)
    return float((1.0 + BETA2) * recall * precision
                 / (recall + BETA2 * precision + EPS))


def weighted_f_measure_batch(sal: np.ndarray, gt: np.ndarray,
                             hw: np.ndarray | None = None) -> np.ndarray:
    """Fbw per image over a (possibly padded) batch. sal/gt: (N, H, W);
    hw: optional (N, 2) valid extents — metric runs on the unpadded crop
    (padding must NOT count as background: it would inflate the weighted
    false positives of border-adjacent foreground)."""
    out = np.empty(sal.shape[0], np.float64)
    for i in range(sal.shape[0]):
        if hw is not None:
            h, w = int(hw[i, 0]), int(hw[i, 1])
            out[i] = weighted_f_measure(sal[i, :h, :w], gt[i, :h, :w])
        else:
            out[i] = weighted_f_measure(sal[i], gt[i])
    return out
