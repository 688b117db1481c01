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


def test_export_u8_wire(tmp_path):
    """wire="u8" artifacts take raw uint8 RGB (normalize fused, bit-identical
    f32 math) and return trunc(sigmoid*255) uint8 — exactly the quantization
    of the f32-wire artifact's output on the host-normalized input."""
    from sod100k_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    lc = init_layers(8, [0.5, 0.5])
    params = jax.tree.map(lambda a: jnp.asarray(a) / 6.0,
                          csnet_init(jax.random.key(4), lc))
    out8 = export_artifact(str(tmp_path / "u8"), "csnet", params, lc,
                           batch=2, hw=(64, 64), dtype=jnp.float32,
                           wire="u8")
    outf = export_artifact(str(tmp_path / "f32"), "csnet", params, lc,
                           batch=2, hw=(64, 64), dtype=jnp.float32)
    m8, mf = load_artifact(out8), load_artifact(outf)
    assert m8.meta["wire"] == "u8"

    raw = np.random.default_rng(5).integers(0, 255, (2, 64, 64, 3),
                                            dtype=np.uint8)
    got = m8(raw)
    assert got.dtype == np.uint8
    norm = ((raw.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)
    want = np.trunc(mf(norm) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(got, want)

    # the u8-wire artifact refuses float inputs instead of silently
    # wrapping them into garbage pixels (old-contract clients fail loudly)
    with pytest.raises(TypeError):
        m8(norm)


@pytest.mark.parametrize("backbone", ["res2net50", "res2net101"])
def test_export_csf_family(tmp_path, backbone):
    from sod100k_tpu.arch.csf_res2net import csf_apply, csf_init

    params = csf_init(jax.random.key(1), backbone=backbone)
    out = export_artifact(str(tmp_path / "csf"), "csf", params, backbone,
                          batch=1, hw=(64, 64), dtype=jnp.float32)
    model = load_artifact(out)
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    want = np.asarray(jax.nn.sigmoid(csf_apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), backbone)))
    np.testing.assert_allclose(model(x), want, atol=1e-5)


def test_artifact_version_skew_message(tmp_path):
    """Compat metadata: a doctored calling-convention version (or corrupted
    program bytes) fails with a clear version message naming the exporting
    jax, not a deserializer traceback."""
    import json

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers

    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    out = export_artifact(str(tmp_path / "skew"), "csnet", params, lc,
                          batch=1, hw=(64, 64), dtype=jnp.float32)
    meta_path = f"{out}/meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["jax_version"] == jax.__version__
    assert isinstance(meta["calling_convention_version"], int)

    meta["calling_convention_version"] = 1  # far below any supported version
    meta["jax_version"] = "0.0.1"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(RuntimeError, match="calling convention"):
        load_artifact(out)

    # corrupted program bytes with plausible meta: guarded deserialize
    with open(meta_path, "w") as f:
        json.dump({**meta, "calling_convention_version": None,
                   "jax_version": "9.9.9"}, f)
    with open(f"{out}/model_b1.stablehlo", "wb") as f:
        f.write(b"not a stablehlo payload")
    with pytest.raises(RuntimeError, match="9.9.9"):
        load_artifact(out)


def test_serving_artifact_data_parallel_mesh(tmp_path):
    """load_artifact(mesh_devices=N) serves the exported program
    data-parallel: GSPMD re-partitions the baked-constants forward under a
    batch in_sharding, bit-exact vs the single-device path. Buckets not
    divisible by the device count stay single-device (the b=3 bucket)."""
    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    # scale down: an untrained x100-conv model explodes in eval mode
    params = jax.tree.map(lambda a: a * 0.02, params)
    out = export_artifact(str(tmp_path / "art"), "csnet", params, lc,
                          batch=[3, 8], hw=(48, 48), dtype=jnp.float32)

    single = load_artifact(out)
    dp = load_artifact(out, mesh_devices=4)
    assert dp._batch_sharding is not None

    rng = np.random.default_rng(1)
    for n in (8, 3, 11):  # full bucket, odd bucket, chunked overflow
        x = rng.standard_normal((n, 48, 48, 3)).astype(np.float32)
        a, b = single(x), dp(x)
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)

    # the sharded bucket really executes over the mesh
    y = dp._jitted[8](jnp.zeros((8, 48, 48, 3), jnp.float32))
    assert len(y.sharding.device_set) == 4
    # the indivisible bucket stays single-device
    y3 = dp._jitted[3](jnp.zeros((3, 48, 48, 3), jnp.float32))
    assert len(y3.sharding.device_set) == 1
