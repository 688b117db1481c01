"""Serving artifact round-trip: export -> deserialize -> numerical match."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sod100k_tpu.arch.csnet import csnet_apply, csnet_init
from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.ops.goct import ApplyCtx
from sod100k_tpu.serve import export_artifact, load_artifact


def test_export_roundtrip_matches_live_forward(tmp_path):
    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    out = export_artifact(str(tmp_path / "art"), "csnet", params, lc,
                          batch=2, hw=(64, 64), dtype=jnp.float32)
    model = load_artifact(out)
    assert model.input_shape == (2, 64, 64, 3)
    assert model.meta["family"] == "csnet"

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    got = model(x)
    want = np.asarray(jax.nn.sigmoid(
        csnet_apply(params, jnp.asarray(x), lc, ApplyCtx()).astype(jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # artifact is self-contained bytes on disk
    assert (tmp_path / "art" / "model.stablehlo").stat().st_size > 10_000

    # any request batch routes onto the buckets (pad/chunk); spatial
    # dims are the hard contract
    np.testing.assert_allclose(model(x[:1]), want[:1], atol=1e-5)
    with pytest.raises(AssertionError):
        model(np.zeros((2, 32, 64, 3), np.float32))  # wrong spatial size


def test_export_multi_bucket_routing(tmp_path):
    """A multi-batch artifact serves any N: pad to the smallest covering
    bucket, chunk over the largest."""
    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(2), lc)
    out = export_artifact(str(tmp_path / "mb"), "csnet", params, lc,
                          batch=[2, 4], hw=(64, 64), dtype=jnp.float32)
    model = load_artifact(out)
    assert model.batches == [2, 4]
    assert model.input_shape == (4, 64, 64, 3)

    x = np.random.default_rng(3).standard_normal((7, 64, 64, 3)).astype(np.float32)
    want = np.asarray(jax.nn.sigmoid(
        csnet_apply(params, jnp.asarray(x), lc, ApplyCtx()).astype(jnp.float32)))
    for n in (1, 2, 3, 4, 7):  # tail pad, exact, mid bucket, exact, chunked
        np.testing.assert_allclose(model(x[:n]), want[:n], atol=1e-5)


def test_export_csf_family(tmp_path):
    from sod100k_tpu.arch.csf_res2net import csf_apply, csf_init

    params = csf_init(jax.random.key(1))
    out = export_artifact(str(tmp_path / "csf"), "csf", params, "res2net50",
                          batch=1, hw=(64, 64), dtype=jnp.float32)
    model = load_artifact(out)
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    want = np.asarray(jax.nn.sigmoid(csf_apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), "res2net50")))
    np.testing.assert_allclose(model(x), want, atol=1e-5)
