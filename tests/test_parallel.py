"""Sharding tests: 2-D (data x spatial) forward equivalence and Orbax
round-trip with shardings."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sod100k_tpu.arch.csnet import csnet_apply, csnet_init
from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.ops.goct import ApplyCtx

LC = init_layers(8, [0.5, 0.5])


def test_spatial_sharded_forward_matches_single_device():
    """GSPMD halo exchange through convs/resampling must reproduce the
    single-device forward (train-mode BN keeps activations finite)."""
    params = csnet_init(jax.random.key(0), LC)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 64, 64, 3), dtype=np.float32))

    def fwd(p, v):
        return csnet_apply(p, v, LC, ApplyCtx(train=True))

    ref = np.asarray(fwd(params, x))
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "spatial"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    out = np.asarray(jax.jit(
        fwd, out_shardings=NamedSharding(mesh, P("data", "spatial")))(ps, xs))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_csf_spatial_sharded_forward_matches_single_device():
    """The second model family under the 2-D mesh: Res2Net's strided stem /
    bottlenecks and the CSF head's interpolate-to-shape octave resampling
    must survive H-axis GSPMD partitioning (halo exchanges) bit-closely.

    eval-mode BN (running stats) so the forward is deterministic; 64px input
    keeps the deepest feature map at 2x2 — the spatial shards become
    degenerate there, which is exactly the hard case for halo logic."""
    from sod100k_tpu.arch.csf_res2net import csf_apply, csf_init

    params = csf_init(jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 64, 64, 3), dtype=np.float32))

    def fwd(p, v):
        return csf_apply(p, v, "res2net50")

    ref = np.asarray(fwd(params, x))
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "spatial"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    out = np.asarray(jax.jit(
        fwd, out_shardings=NamedSharding(mesh, P("data", "spatial")))(ps, xs))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_orbax_round_trip_with_sharded_arrays(tmp_path):
    from sod100k_tpu.parallel.mesh import make_mesh, replicate
    from sod100k_tpu.train.checkpoint import restore_native, save_native

    mesh = make_mesh(4)
    trainable = replicate({"w": jnp.arange(8.0).reshape(2, 4)}, mesh)
    state = {"bn": {"mean": jnp.zeros(3)}}
    opt = {"mu": jnp.ones(2)}
    path = str(tmp_path / "ck")
    save_native(path, trainable, state, opt, epoch=11)
    r = restore_native(path)
    assert int(r["epoch"]) == 11
    np.testing.assert_array_equal(np.asarray(r["trainable"]["w"]),
                                  np.arange(8.0).reshape(2, 4))
    np.testing.assert_array_equal(np.asarray(r["opt_state"]["mu"]), np.ones(2))
