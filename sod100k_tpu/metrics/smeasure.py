"""Structure-measure (S-measure) as a static-shape on-device reduction.

S-measure (Fan et al., ICCV 2017, "Structure-measure: A New Way to Evaluate
Foreground Maps") is named in this project's evaluation suite alongside
MAE/F-beta (it is *not* in the reference's SalMetric tool — additive scope).
Formulas follow the author's public reference implementation:

    S = alpha * S_object + (1 - alpha) * S_region,  alpha = 0.5
    gt all-background -> S = 1 - mean(sal); all-foreground -> S = mean(sal)

S_object: per fg/bg region x of sal (or 1-sal),
    o(x) = 2*mean(x) / (mean(x)^2 + 1 + std(x) + eps), combined with weight
    mu = mean(gt).
S_region: image split into 4 quadrants at the (rounded) gt centroid; per
quadrant the paper's SSIM variant with area weights.

Every statistic is a masked reduction over a fixed-shape array — the dynamic
centroid split uses broadcasted-iota masks, and an optional validity mask
supports padded batches exactly (padding contributes to nothing, including
quadrant areas), so arbitrary image sizes compile to one kernel per bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-8
ALPHA = 0.5


def _masked_mean(x, m):
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def _masked_var(x, m, mean):
    n = jnp.maximum(jnp.sum(m), 1.0)
    # unbiased (N-1) like the reference MATLAB cov/std
    return jnp.sum(jnp.square(x - mean) * m) / jnp.maximum(n - 1.0, 1.0)


def _object_score(x, region):
    mean = _masked_mean(x, region)
    std = jnp.sqrt(_masked_var(x, region, mean))
    return 2.0 * mean / (jnp.square(mean) + 1.0 + std + EPS)


def _s_object(sal, gt, valid):
    mu = _masked_mean(gt, valid)
    o_fg = _object_score(sal, gt * valid)
    o_bg = _object_score(1.0 - sal, (1.0 - gt) * valid)
    return mu * o_fg + (1.0 - mu) * o_bg


def _ssim_paper(sal, gt, m):
    n = jnp.maximum(jnp.sum(m), 1.0)
    mx = _masked_mean(sal, m)
    my = _masked_mean(gt, m)
    vx = _masked_var(sal, m, mx)
    vy = _masked_var(gt, m, my)
    sxy = jnp.sum((sal - mx) * (gt - my) * m) / jnp.maximum(n - 1.0, 1.0)
    alpha = 4.0 * mx * my * sxy
    beta = (jnp.square(mx) + jnp.square(my)) * (vx + vy)
    return jnp.where(
        alpha != 0.0,
        alpha / (beta + EPS),
        jnp.where(beta == 0.0, 1.0, 0.0),
    )


def _s_region(sal, gt, valid):
    h, w = gt.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gtv = gt * valid
    total = jnp.maximum(jnp.sum(gtv), EPS)
    # valid-image extent (padding sits at high indices)
    vh = jnp.maximum(jnp.max(rows * valid), 1.0) + 1.0
    vw = jnp.maximum(jnp.max(cols * valid), 1.0) + 1.0
    # centroid, rounded like the reference implementation
    cy = jnp.round(jnp.sum(rows * gtv) / total) + 1.0
    cx = jnp.round(jnp.sum(cols * gtv) / total) + 1.0
    cy = jnp.where(jnp.sum(gtv) == 0, jnp.round(vh / 2.0), cy)
    cx = jnp.where(jnp.sum(gtv) == 0, jnp.round(vw / 2.0), cx)

    top = rows < cy
    left = cols < cx
    quads = [(top & left), (top & ~left), (~top & left), (~top & ~left)]
    area = jnp.maximum(jnp.sum(valid), 1.0)
    score = jnp.zeros((), jnp.float32)
    for q in quads:
        m = q.astype(jnp.float32) * valid
        wgt = jnp.sum(m) / area
        score = score + wgt * _ssim_paper(sal, gtv, m)
    return score


@jax.jit
def s_measure(sal: jax.Array, gt: jax.Array,
              valid: jax.Array | None = None) -> jax.Array:
    """sal in [0,1] float, gt binary {0,1} float, both (H, W); optional
    validity mask for padded inputs (same shape)."""
    sal = sal.astype(jnp.float32)
    gt = (gt > 0.5).astype(jnp.float32)
    v = jnp.ones_like(gt) if valid is None else valid.astype(jnp.float32)
    mu = _masked_mean(gt, v)
    s = ALPHA * _s_object(sal, gt, v) + (1 - ALPHA) * _s_region(sal, gt, v)
    mean_sal = _masked_mean(sal, v)
    s = jnp.where(mu == 0.0, 1.0 - mean_sal, jnp.where(mu == 1.0, mean_sal, s))
    return jnp.maximum(s, 0.0)


@functools.partial(jax.jit, static_argnames=())
def s_measure_batch(sal: jax.Array, gt: jax.Array,
                    valid: jax.Array | None = None) -> jax.Array:
    """Batched S-measure over (B, H, W) arrays (padded batches via valid)."""
    if valid is None:
        return jax.vmap(lambda s, g: s_measure(s, g))(sal, gt)
    return jax.vmap(s_measure)(sal, gt, valid)
