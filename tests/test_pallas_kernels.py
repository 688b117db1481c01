"""Pallas kernel correctness (interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod100k_tpu.ops.conv import conv2d
from sod100k_tpu.ops.norm import prelu
from sod100k_tpu.ops.pallas.dw_chain import fold_bn_eval, fused_dw_chain

RNG = np.random.default_rng(7)


def _chain_params(c):
    return (
        jnp.asarray(RNG.standard_normal((3, 3, c), dtype=np.float32) * 0.1),
        jnp.asarray(RNG.random(c).astype(np.float32) + 0.5),
        jnp.asarray(RNG.standard_normal(c).astype(np.float32)),
        jnp.asarray(RNG.standard_normal(c).astype(np.float32) * 0.25),
    )


def _ref_pass(x, w, s, b, a):
    y = conv2d(x, w[:, :, None, :], padding=1, groups=x.shape[-1])
    return prelu(y * s + b, a)


@pytest.mark.parametrize("shape", [(2, 40, 36, 13), (1, 17, 23, 5), (2, 64, 64, 24)])
def test_fused_dw_chain_matches_lax(shape):
    n, h, w, c = shape
    x = jnp.asarray(RNG.standard_normal(shape, dtype=np.float32))
    w1, s1, b1, a1 = _chain_params(c)
    w2, s2, b2, a2 = _chain_params(c)
    want = _ref_pass(_ref_pass(x, w1, s1, b1, a1), w2, s2, b2, a2)
    got = fused_dw_chain(x, w1, s1, b1, a1, w2, s2, b2, a2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fold_bn_eval_matches_batchnorm_infer():
    from sod100k_tpu.ops.norm import batchnorm_infer

    c = 9
    bn = {
        "scale": jnp.asarray(RNG.standard_normal(c).astype(np.float32)),
        "offset": jnp.asarray(RNG.standard_normal(c).astype(np.float32)),
        "mean": jnp.asarray(RNG.standard_normal(c).astype(np.float32)),
        "var": jnp.asarray(RNG.random(c).astype(np.float32) + 0.2),
    }
    x = jnp.asarray(RNG.standard_normal((2, 5, 6, c), dtype=np.float32))
    s, b = fold_bn_eval(bn)
    np.testing.assert_allclose(np.asarray(x * s + b),
                               np.asarray(batchnorm_infer(x, bn)), atol=1e-5)


def test_csnet_pallas_path_matches_default():
    from sod100k_tpu.arch.csnet import csnet_apply, csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.ops.goct import ApplyCtx
    from sod100k_tpu.ops.pallas import dw_chain

    # interpret-mode pallas for the CPU test mesh
    orig = dw_chain.fused_dw_chain

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    dw_chain.fused_dw_chain = interp
    try:
        lc = init_layers(8, [0.5, 0.5])
        params = csnet_init(jax.random.key(0), lc)
        # realistic BN stats so eval mode stays finite under the x100 scaling
        def calm(node):
            for k, v in node.items():
                if isinstance(v, dict):
                    if "var" in v:
                        v["var"] = jnp.full_like(v["var"], 1e4)
                    else:
                        calm(v)
        calm(params)
        x = jnp.asarray(RNG.standard_normal((1, 32, 32, 3), dtype=np.float32))
        want = csnet_apply(params, x, lc, ApplyCtx())
        got = csnet_apply(params, x, lc, ApplyCtx(pallas=True))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
    finally:
        dw_chain.fused_dw_chain = orig
