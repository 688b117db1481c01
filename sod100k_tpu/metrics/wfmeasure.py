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


def precompute_wf_tables(gts_u8: np.ndarray, hws: np.ndarray) -> dict:
    """GT-static tables that let the weighted F-measure run ON DEVICE.

    Everything data-dependent and sequential in Fbw — the Euclidean distance
    transform and its nearest-foreground indices — depends ONLY on the ground
    truth, which is static per dataset. So the resident TESTALL sweep
    precomputes it here (host scipy, once per split) and per checkpoint the
    device does only sal-dependent work: one gather (nearest-FG error), one
    7x7 depthwise conv (the Gaussian), and masked reductions
    (wf_per_image_device).

    gts_u8: (N, ch, cw) uint8 native-GT canvas (build_resident_val_dataset
    layout); hws: (N, 2) valid extents. Foreground is gt > 128 (the protocol
    of cli.eval --wfmeasure and every other metric in the suite).

    Returns numpy {"wf_idx": (N, ch*cw) int32 — flat CANVAS index of the
    nearest foreground pixel (self on foreground, 0 outside the crop or when
    the crop has no foreground), "wf_weight": (N, ch, cw) float32 — the
    Margolin B weight (1 on FG, 2 - exp(ln(.5)/5 * dist) on BG, 0 outside
    the crop)}.
    """
    from scipy.ndimage import distance_transform_edt

    n, ch, cw = gts_u8.shape
    idx_flat = np.zeros((n, ch * cw), np.int32)
    weight = np.zeros((n, ch, cw), np.float32)
    for i in range(n):
        h, w = int(hws[i, 0]), int(hws[i, 1])
        fg = gts_u8[i, :h, :w] > 128
        if not fg.any():
            continue  # device scores 0 via its n_fg == 0 guard
        # distances/indices within the CROP — padding must not shift the
        # nearest-foreground assignment (the host metric runs on the crop)
        dist, idx = distance_transform_edt(~fg, return_indices=True)
        w_crop = np.where(fg, 1.0, 2.0 - np.exp(np.log(0.5) / 5.0 * dist))
        weight[i, :h, :w] = w_crop
        flat = np.zeros((ch, cw), np.int64)
        flat[:h, :w] = idx[0].astype(np.int64) * cw + idx[1]
        idx_flat[i] = flat.reshape(-1).astype(np.int32)
    return {"wf_idx": idx_flat, "wf_weight": weight}


def wf_per_image_device(sal01, gt_u8, mask, wf_idx, wf_weight):
    """Per-image weighted F-measure on device (jax), given the GT-static
    tables from precompute_wf_tables. Matches weighted_f_measure to f32
    accumulation error (the host runs f64; errors sum over ~1e5 pixels so
    expect ~1e-5 relative).

    sal01: (B, ch, cw) float map in [0, 1] (sal255/255 — the PNG protocol);
    gt_u8: (B, ch, cw) canvas GTs; mask: (B, ch, cw) validity;
    wf_idx: (B, ch*cw) int32; wf_weight: (B, ch, cw) float32.
    """
    import jax
    import jax.numpy as jnp

    b, ch, cw = sal01.shape
    maskf = mask.astype(jnp.float32)
    fg = (gt_u8.astype(jnp.float32) > 128.0) & (maskf > 0)
    fgf = fg.astype(jnp.float32)
    err = jnp.abs(sal01.astype(jnp.float32) - fgf) * maskf
    # dependency term: background error replaced by the error at the nearest
    # foreground pixel — a gather over the canvas-flattened error map
    err_near = jnp.take_along_axis(
        err.reshape(b, -1), wf_idx, axis=1).reshape(b, ch, cw)
    dep = jnp.where(fg, err, err_near) * maskf
    # 7x7 sigma-5 Gaussian, zero padding: dep is zero outside the crop, so a
    # SAME conv over the canvas equals scipy's constant-0 conv over the crop
    k = jnp.asarray(_gauss_kernel(), jnp.float32)
    smoothed = jax.lax.conv_general_dilated(
        dep[:, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
    emin = jnp.where(fg & (smoothed < err), smoothed, err)
    ew = emin * wf_weight
    n_fg = jnp.sum(fgf, axis=(1, 2))
    ew_fg = jnp.sum(ew * fgf, axis=(1, 2))
    ew_bg = jnp.sum(ew * maskf * (1.0 - fgf), axis=(1, 2))
    safe_n = jnp.maximum(n_fg, 1.0)
    tpw = n_fg - ew_fg
    recall = 1.0 - ew_fg / safe_n
    precision = tpw / (tpw + ew_bg + EPS)
    fbw = ((1.0 + BETA2) * recall * precision
           / (recall + BETA2 * precision + EPS))
    return jnp.where(n_fg > 0, fbw, 0.0)


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
