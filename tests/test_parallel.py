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

    eval-mode BN (running stats) so the forward is deterministic. 64px input
    makes the deepest feature 2x2: in this forward-only program the
    partitioner all-gathers before the degenerate stride-2 convs, so the
    result is exact — but the TRAINING direction at this size is in the
    measured-broken GSPMD regime (docs/DESIGN.md section 10), which is why
    check_spatial_extent rejects 2-D meshes below 96px for CSF and the
    train-step oracle below runs at 96."""
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


def test_mesh_shape_parsing_and_feed_sharding():
    """TPU.MESH_SHAPE plumbing: parse, 2-D mesh construction, rank-aware
    feed shardings (image-like arrays spatial on H; side arrays data-only)."""
    import pytest

    from sod100k_tpu.parallel.mesh import (
        feed_sharding,
        make_mesh_2d,
        parse_mesh_shape,
        shard_feed,
    )

    assert parse_mesh_shape("4x2") == (4, 2)
    assert parse_mesh_shape("1X8") == (1, 8)
    for bad in ("", "4", "4x0", "ax2", "4x2x1"):
        with pytest.raises(ValueError):
            parse_mesh_shape(bad)
    with pytest.raises(ValueError):
        make_mesh_2d(4, 4)  # 16 > 8 visible devices

    mesh = make_mesh_2d(2, 4)
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    assert feed_sharding(mesh, 4).spec == P("data", "spatial")
    assert feed_sharding(mesh, 3).spec == P("data", "spatial")
    assert feed_sharding(mesh, 2).spec == P("data")

    batch = shard_feed({"image": np.zeros((4, 16, 16, 3), np.float32),
                        "hw": np.zeros((4, 2), np.int32),
                        "names": ["a"] * 4}, mesh)
    assert batch["image"].sharding.spec == P("data", "spatial")
    assert batch["hw"].sharding.spec == P("data")
    assert batch["names"] == ["a"] * 4

    from sod100k_tpu.parallel.mesh import make_mesh

    mesh1 = make_mesh(4)
    assert feed_sharding(mesh1, 4).spec == P("data")


def test_stride2_conv_spatial_shard_boundary():
    """Regression pin for the measured XLA GSPMD validity boundary
    (jax 0.9.0; docs/DESIGN.md section 10): an H-sharded stride-2 conv is
    bit-exact at input extent >= MIN_STRIDE2_INPUT — the regime every
    product spatial mesh relies on (check_spatial_extent enforces it).
    Below that extent the forward is silently wrong (rel-err ~1.0 measured
    at h<=4); we only assert the safe side so an upstream fix doesn't break
    the suite."""
    import pytest

    from sod100k_tpu.ops.conv import conv2d
    from sod100k_tpu.parallel.mesh import (
        MIN_STRIDE2_INPUT,
        check_spatial_extent,
    )

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    devs = np.array(jax.devices())
    for h in (MIN_STRIDE2_INPUT, 8):
        x = jnp.asarray(rng.standard_normal((2, h, h, 8)), jnp.float32)
        f = lambda v: conv2d(v, k, stride=2, padding=1)
        cos = jnp.asarray(rng.standard_normal(jax.eval_shape(f, x).shape),
                          jnp.float32)
        g = jax.jit(jax.grad(lambda v: jnp.sum(f(v) * cos)))
        fwd_ref, grad_ref = np.asarray(jax.jit(f)(x)), np.asarray(g(x))
        for s in (2, 4):
            if h % s:
                continue
            mesh = Mesh(devs[: 2 * s].reshape(2, s), ("data", "spatial"))
            xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
            np.testing.assert_array_equal(np.asarray(jax.jit(f)(xs)), fwd_ref,
                                          err_msg=f"fwd h={h} s={s}")
            np.testing.assert_allclose(np.asarray(g(xs)), grad_ref,
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"grad h={h} s={s}")

    # the guard that keeps products out of the broken regime
    check_spatial_extent(96, 16, 2, "CSF")     # 336-recipe-like: fine
    check_spatial_extent(224, 4, 4, "CSNet")   # train default: fine
    check_spatial_extent(64, 16, 1, "CSF")     # 1-D data mesh: exempt
    with pytest.raises(ValueError, match="stride-2"):
        check_spatial_extent(64, 16, 2, "CSF")   # deepest input 4 rows
    with pytest.raises(ValueError, match="fewer rows"):
        check_spatial_extent(96, 16, 4, "CSF")   # 3 deep rows < 4 shards


def test_csf_spatial_sharded_train_step_matches_single_device():
    """The training direction of the CSF scaling story: loss AND gradients
    through the GSPMD halo exchanges (backward of strided convs / pools /
    interpolate-to-shape resampling under H-partitioning) must match the
    single-device math. Compares (a) value_and_grad of the exact solver loss
    (BCE sum / (iter*batch), frozen-BN eval forward) leaf-by-leaf, and
    (b) one real make_csf_train_step update, sharded vs unsharded.

    96px height (H/16 = 6 at the deepest strided conv) keeps the program
    out of the measured-broken GSPMD regime — below that, spatially-sharded
    strided convs silently compute wrong values (f64-probed; see
    parallel.mesh.MIN_STRIDE2_INPUT and
    test_stride2_conv_spatial_shard_boundary). W stays small (unsharded) to
    keep the CPU compile cheap."""
    import optax

    from sod100k_tpu.arch.csf_res2net import csf_apply, csf_init
    from sod100k_tpu.train.csf_step import (
        csf_partition,
        make_csf_optimizer,
        make_csf_train_step,
    )
    from sod100k_tpu.train.params import merge

    iter_size, bs = 2, 2
    h, w = 96, 32
    params = csf_init(jax.random.key(2))
    trainable, state = csf_partition(params)
    rng = np.random.default_rng(7)
    batch = {
        "image": jnp.asarray(rng.standard_normal((bs, h, w, 3),
                                                 dtype=np.float32)),
        "target": jnp.asarray((rng.random((bs, h, w, 1)) > 0.5)
                              .astype(np.float32)),
    }

    def loss_fn(t):
        logits = csf_apply(merge(t, state), batch["image"], "res2net50")
        bce = optax.sigmoid_binary_cross_entropy(
            logits.astype(jnp.float32), batch["target"])
        return jnp.sum(bce) / (iter_size * bs)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(trainable)

    # 2 data x 2 spatial: the largest mesh the guard admits at H=96
    # (deepest feature H/32 = 3 rows >= spatial shards)
    from sod100k_tpu.parallel.mesh import check_spatial_extent

    check_spatial_extent(h, 16, 2, "CSF")
    mesh = Mesh(np.array(jax.devices())[:4].reshape(2, 2),
                ("data", "spatial"))
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data", "spatial"))
    batch_sh = jax.tree.map(lambda a: jax.device_put(a, dsh), batch)
    t_sh = jax.tree.map(lambda a: jax.device_put(a, repl), trainable)

    def loss_sh(t, b):
        logits = csf_apply(merge(t, state), b["image"], "res2net50")
        bce = optax.sigmoid_binary_cross_entropy(
            logits.astype(jnp.float32), b["target"])
        return jnp.sum(bce) / (iter_size * bs)

    loss, grads = jax.jit(jax.value_and_grad(loss_sh))(t_sh, batch_sh)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat = {jax.tree_util.keystr(p): g
            for p, g in jax.tree_util.tree_leaves_with_path(grads)}
    for path, g_ref in flat_ref:
        name = jax.tree_util.keystr(path)
        g_ref = np.asarray(g_ref)
        # f32 reduction-order noise only: scale atol to the leaf's own
        # magnitude (f64 probes show the sharded math is exact to ~1e-6 rel;
        # the broken GSPMD regime this oracle exists to catch shows whole
        # leaves off by ~0.4 rel)
        np.testing.assert_allclose(
            np.asarray(flat[name]), g_ref,
            rtol=1e-3, atol=1e-4 * max(np.abs(g_ref).max(), 1.0),
            err_msg=name)

    # the product step (MultiSteps accumulation) executes sharded and its
    # loss metric matches; the accumulated micro-grads are the grads already
    # verified leaf-by-leaf above
    tx = make_csf_optimizer(iter_size=iter_size)
    step = make_csf_train_step(tx, iter_size=iter_size, batch_size=bs,
                               donate=False)
    opt = jax.tree.map(lambda a: jax.device_put(a, repl), tx.init(trainable))
    s_sh = jax.tree.map(lambda a: jax.device_put(a, repl), state)
    t2, _, m = step(t_sh, s_sh, opt, batch_sh, jnp.float32(5e-5))
    np.testing.assert_allclose(float(m["loss"]), float(ref_loss), rtol=1e-5)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(t2))


def test_csnet_2d_sharded_train_step_matches_single_device():
    """CSNet's FULL train step (dynamic-wd penalty, global-batch BN stats,
    Adam update) on the 2-D data x spatial mesh must reproduce single-device
    math: BN means/vars reduce over batch AND H shards, the penalty's GAP
    hooks reduce over sharded H, and every gradient flows through the halo
    exchanges. Complements the CSF oracle above and the 1-D DP oracle in
    test_train.py::test_sharded_step_matches_single_device.

    64px input is guard-safe for CSNet (deepest stride-2 conv input is
    64/4 = 16 rows >= parallel.mesh.MIN_STRIDE2_INPUT)."""
    from sod100k_tpu.parallel.mesh import check_spatial_extent
    from sod100k_tpu.train.optim import make_adam_dwd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    check_spatial_extent(64, 4, 2, "CSNet")
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.standard_normal((4, 64, 64, 3),
                                                 dtype=np.float32)),
        "target": jnp.asarray((rng.random((4, 64, 64, 1)) > 0.5)
                              .astype(np.float32)),
    }
    outs = []
    for sharded in (False, True):
        params = csnet_init(jax.random.key(5), LC)
        trainable, state = partition(params)
        tx = make_adam_dwd(trainable)
        opt = tx.init(trainable)
        step = make_train_step(LC, tx, flops_weight=5.0, batch_size=4,
                               donate=False)
        b = batch
        if sharded:
            mesh = Mesh(np.array(jax.devices())[:4].reshape(2, 2),
                        ("data", "spatial"))
            repl = NamedSharding(mesh, P())
            dsh = NamedSharding(mesh, P("data", "spatial"))
            b = jax.tree.map(lambda a: jax.device_put(a, dsh), batch)
            trainable, state, opt = (
                jax.tree.map(lambda a: jax.device_put(a, repl), t)
                for t in (trainable, state, opt))
        t, s, o, m = step(trainable, state, opt, b, jnp.float32(1e-4),
                          jnp.float32(1.0))
        outs.append((float(m["loss"]), float(m["penalty"]), t, s))
    assert abs(outs[0][0] - outs[1][0]) < 1e-5, (outs[0][0], outs[1][0])
    assert abs(outs[0][1] - outs[1][1]) / max(outs[0][1], 1e-9) < 1e-5
    for which in (2, 3):  # params after update, BN state
        for a, b_ in zip(jax.tree.leaves(outs[0][which]),
                         jax.tree.leaves(outs[1][which])):
            # cross-device reduction order -> ~1e-7 stat shifts; Adam's
            # rsqrt can amplify to ~1e-4 on near-zero-moment params, and
            # BN variance leaves carry O(100) magnitudes — scale atol to
            # the leaf
            b_ = np.asarray(b_)
            np.testing.assert_allclose(
                np.asarray(a), b_,
                atol=1e-3 * max(1.0, float(np.abs(b_).max())))


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


def test_resident_epoch_2d_sharded_matches_unsharded():
    """The one-dispatch resident epoch with a 2-D data x spatial
    batch_sharding (mesh.epoch_feed_sharding — what the drivers now pass
    under TPU.MESH_SHAPE) must reproduce the unsharded epoch: same per-step
    losses/penalties and the same final params through on-device gather ->
    augment -> train-step under H-partitioning.

    32px steps are guard-safe for CSNet (deepest stride-2 conv input is
    32/4 = 8 rows >= parallel.mesh.MIN_STRIDE2_INPUT)."""
    from sod100k_tpu.data.resident import make_resident_epoch_fn
    from sod100k_tpu.parallel.mesh import check_spatial_extent, epoch_feed_sharding
    from sod100k_tpu.train.optim import make_adam_dwd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    check_spatial_extent(32, 4, 2, "CSNet")
    rng = np.random.default_rng(9)
    bs = 4
    # exactly one batch (nb=1): a multi-step epoch diverges CHAOTICALLY
    # between shard layouts on this dialect — step 1's ~1e-6 reduction-order
    # noise is a ~1e-4 effective-weight shift through the x100 convs, which
    # moves step 2's activations/BN statistics at the 1e-2 level (measured).
    # One step pins the whole gather -> augment -> train-step program with
    # step-oracle-tight tolerances; more steps only add noise, not power.
    rdata = {
        "image_u8": jnp.asarray(rng.integers(
            0, 255, (bs, 40, 40, 3), dtype=np.uint8)),
        "gt_u8": jnp.asarray(rng.integers(
            0, 255, (bs, 40, 40), dtype=np.uint8)),
    }
    outs = []
    for sharded in (False, True):
        params = csnet_init(jax.random.key(6), LC)
        trainable, state = partition(params)
        tx = make_adam_dwd(trainable)
        opt = tx.init(trainable)
        step = make_train_step(LC, tx, flops_weight=3.0, batch_size=bs,
                               donate=False)
        bsh, rd = None, rdata
        if sharded:
            mesh = Mesh(np.array(jax.devices())[:4].reshape(2, 2),
                        ("data", "spatial"))
            assert epoch_feed_sharding(mesh).spec == P("data", "spatial")
            bsh = epoch_feed_sharding(mesh)
            repl = NamedSharding(mesh, P())
            trainable, state, opt = (
                jax.tree.map(lambda a: jax.device_put(a, repl), t)
                for t in (trainable, state, opt))
            rd = jax.tree.map(lambda a: jax.device_put(a, repl), rdata)
        epoch_fn = make_resident_epoch_fn(step, batch_size=bs,
                                          out_hw=(32, 32), batch_sharding=bsh)
        t, s, o, losses, pens = epoch_fn(
            trainable, state, opt, rd, jax.random.key(3),
            jnp.float32(1e-4), jnp.float32(1.0))
        outs.append((np.asarray(losses), np.asarray(pens), t, s))
    # single-step losses match to ~1e-7 (cross-device reduction order only);
    # the failure mode this oracle exists to catch (the GSPMD strided-conv
    # bug) shows ~0.4 rel errors
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4)
    for which in (2, 3):  # final params, BN state
        for a, b in zip(jax.tree.leaves(outs[0][which]),
                        jax.tree.leaves(outs[1][which])):
            # reduction-order noise, Adam-rsqrt amplified (same tolerance
            # rationale as the 2-D step oracle above)
            b = np.asarray(b)
            np.testing.assert_allclose(
                np.asarray(a), b,
                atol=1e-3 * max(1.0, float(np.abs(b).max())))
