"""Training-stack tests: step mechanics, DP-sharding equivalence, and
dynamic-weight-decay parity against the reference hook machinery."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod100k_tpu.arch.csnet import csnet_apply, csnet_init
from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.interop.torch_ckpt import pytree_to_state_dict
from sod100k_tpu.ops.goct import ApplyCtx
from sod100k_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from sod100k_tpu.train import dynamic_wd
from sod100k_tpu.train.optim import make_adam_dwd, multistep_lr
from sod100k_tpu.train.params import map_with_path, merge, partition
from sod100k_tpu.train.step import make_train_step, quantized_mae

LC = init_layers(8, [0.5, 0.5])


def _batch(n=4, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.standard_normal((n, hw, hw, 3), dtype=np.float32)),
        "target": jnp.asarray((rng.random((n, hw, hw, 1)) > 0.5).astype(np.float32)),
    }


def _setup(batch_size=4, flops_weight=3.0):
    params = csnet_init(jax.random.key(0), LC)
    trainable, state = partition(params)
    tx = make_adam_dwd(trainable, weight_decay=5e-3)
    opt_state = tx.init(trainable)
    step = make_train_step(LC, tx, flops_weight=flops_weight, flops_expand=2.0,
                           batch_size=batch_size)
    return trainable, state, opt_state, step


def test_partition_merge_round_trip():
    params = csnet_init(jax.random.key(0), LC)
    t, s = partition(params)
    flat = [jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(t)]
    assert not any("mean" in k or "var" in k for k in flat)
    merged = merge(t, s)
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)


def test_train_step_decreases_loss():
    trainable, state, opt_state, step = _setup()
    batch = _batch()
    losses = []
    for _ in range(25):
        trainable, state, opt_state, m = step(
            trainable, state, opt_state, batch, jnp.float32(1e-2), jnp.float32(1.0)
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.02, (losses[0], losses[-1])
    assert float(m["penalty"]) > 0.0


def test_sharded_step_matches_single_device():
    """DP over the 8-device mesh must reproduce single-device math exactly
    (global-batch BN stats + mean loss under jit sharding)."""
    batch = _batch(n=8)
    outs = []
    for n_dev in (1, 8):
        trainable, state, opt_state, step = _setup(batch_size=8)
        mesh = make_mesh(n_dev)
        b = shard_batch(batch, mesh)
        t = replicate(trainable, mesh)
        s = replicate(state, mesh)
        o = replicate(opt_state, mesh)
        t, s, o, m = step(t, s, o, b, jnp.float32(1e-4), jnp.float32(1.0))
        outs.append((float(m["loss"]), t))
    assert abs(outs[0][0] - outs[1][0]) < 1e-6
    la = jax.tree.leaves(outs[0][1])
    lb = jax.tree.leaves(outs[1][1])
    for a, b_ in zip(la, lb):
        # cross-device reduction order shifts batch stats by ~1e-7, which
        # Adam's rsqrt can amplify to ~1e-4 on near-zero-moment params
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_wd_mask_replicates_reference_group_split():
    params = csnet_init(jax.random.key(0), LC)
    trainable, _ = partition(params)
    from sod100k_tpu.train.optim import _wd_mask

    mask = _wd_mask(trainable)
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_leaves_with_path(mask)}

    def get(path):
        return flat["['" + "']['".join(path.split(".")) + "']"]

    assert get("stage1.0.conv1x1.bns.0.scale") is False
    assert get("stage1.0.conv3x3_1.bns.0.scale") is False
    assert get("stage1.0.conv3x3_2.bns.0.scale") is True   # reference quirk
    assert get("stage1.0.conv1x1.bns.0.offset") is True    # biases keep decay
    assert get("oct_fuse.fuse.bns.0.scale") is True        # head not exempt
    assert get("stage1.0.conv1x1.conv.kernel") is True


def test_multistep_lr_matches_reference_quirk():
    # scheduler.step() at epoch start => milestone m fires when epoch+1 >= m
    assert multistep_lr(1e-4, [200, 250], 198) == pytest.approx(1e-4)
    assert multistep_lr(1e-4, [200, 250], 199) == pytest.approx(1e-5)
    assert multistep_lr(1e-4, [200, 250], 249) == pytest.approx(1e-6)


def test_quantized_mae_matches_reference_protocol():
    import torch

    rng = np.random.default_rng(1)
    pred = rng.random((1, 9, 9, 1)).astype(np.float32)
    gt = rng.random((1, 9, 9, 1)).astype(np.float32)
    want = torch.nn.functional.l1_loss(
        (torch.from_numpy(pred) * 255.0).int().float() / 255.0,
        torch.from_numpy(gt),
    ).item()
    got = float(quantized_mae(jnp.asarray(pred), jnp.asarray(gt)))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.skipif(not os.path.isdir("/root/reference/CSNet_training"),
                    reason="reference not mounted")
def test_dynamic_wd_penalty_matches_reference_hooks():
    """Our explicit regularizer must equal the reference's Oct_bn_hook
    accumulation (csnet.py:391-410) on identical weights and inputs."""
    import collections
    import collections.abc

    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    import torch

    sys.path.insert(0, "/root/reference/CSNet_training")
    for m in ("model", "model.csnet", "model.conv2d"):
        sys.modules.pop(m, None)
    from model import csnet as ref_csnet

    params = csnet_init(jax.random.key(1), LC)
    ref_lc = ref_csnet.init_layers(8, [0.5, 0.5])
    model = ref_csnet.CSNet(layer_config=ref_lc)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          pytree_to_state_dict(params).items()}
    missing = model.load_state_dict(sd, strict=False)
    assert not missing.unexpected_keys
    model.flops_hook(expandflop=2.0)
    model.set_batchsize(4)
    # train mode on both sides: the x100 conv scaling makes eval-mode
    # activations explode at init; batch-stat BN keeps them normalized
    # (matches the reference training loop, train.py:191).
    model.train()

    batch = _batch(n=4, hw=16, seed=7)
    x_t = torch.from_numpy(np.asarray(batch["image"]).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        model(x_t)
    want = float(model.get_flops())

    trainable, state = partition(params)
    ctx = ApplyCtx(train=True, collect_gap=True)
    csnet_apply(merge(trainable, state), batch["image"], LC, ctx)
    fw = dynamic_wd.flop_weight_map(LC, 2.0)
    got = float(dynamic_wd.penalty(trainable, ctx.gap, fw, batch_size=4))
    assert got == pytest.approx(want, rel=1e-4)


def test_bf16_training_prunes_same_architecture_as_f32():
    """bf16-compute training (mixed precision: bf16 activations, f32 params/
    BN/loss/optimizer) must drive the dynamic-weight-decay pruning signal to
    the same architecture decision as f32 on the synthetic fixture — the
    gate for serving the bf16 recipe (dynamic-wd semantics csnet.py:391-410).
    """
    import numpy as np

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.prune.finetune import prune
    from sod100k_tpu.train.optim import make_adam_dwd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    lc = init_layers(8, [0.5, 0.5])
    rng = np.random.default_rng(0)
    n_steps, bsz = 80, 4
    batches = [
        {"image": jnp.asarray(rng.standard_normal((bsz, 48, 48, 3),
                                                  dtype=np.float32)),
         "target": jnp.asarray((rng.random((bsz, 48, 48, 1)) > 0.5
                                ).astype(np.float32))}
        for _ in range(8)
    ]

    # a high penalty weight + flops_expand=2.0 compresses the reference's
    # 300-epoch gamma separation into 80 steps: per-stage/branch flop
    # weights differ, so gammas split into clusters with a genuine gap
    # (the real recipe prunes a bimodal distribution too; thresholding
    # inside an undifferentiated blob would compare numerical noise)
    def train(compute_dtype):
        params = csnet_init(jax.random.key(7), lc)
        trainable, state = partition(params)
        tx = make_adam_dwd(trainable, weight_decay=5e-3)
        opt_state = tx.init(trainable)
        step = make_train_step(lc, tx, flops_weight=100.0, flops_expand=2.0,
                               batch_size=bsz, donate=False,
                               compute_dtype=compute_dtype)
        for i in range(n_steps):
            trainable, state, opt_state, m = step(
                trainable, state, opt_state, batches[i % len(batches)],
                jnp.float32(1e-2), jnp.float32(1.0))
        from sod100k_tpu.train.params import merge

        return merge(trainable, state), float(m["loss"])

    params_f32, loss_f32 = train(None)
    params_bf16, loss_bf16 = train(jnp.bfloat16)
    # losses track closely (mixed precision keeps f32 accumulation)
    assert loss_bf16 == pytest.approx(loss_f32, rel=0.05)

    def gammas_of(params):
        return np.concatenate([
            np.abs(np.asarray(leaf)).ravel()
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
            if "bns" in jax.tree_util.keystr(path)
            and jax.tree_util.keystr(path).endswith("['scale']")])

    # the gammas themselves are f32 parameters in BOTH runs; bf16 enters the
    # decay only through the penalty's GAP(|activation|) statistics, so the
    # pruning signal tracks f32 closely but not bitwise (measured max
    # deviation ~4e-3 after 80 amplified steps on this structure-free noise
    # fixture). Gate at the decision level: threshold in the largest gap of
    # the f32 distribution (non-trivial: prunes a real cluster) and require
    # >= 98% per-channel mask agreement and a matching channel budget.
    # The gap search is capped below every layer's max |gamma| in BOTH runs:
    # on this amplified fixture the globally-largest gap can sit above a
    # whole block's gammas, and a fully-dead block is unrepresentable
    # (derive_pruned_config raises — the reference's rebuild cannot express
    # it either).
    from sod100k_tpu.prune.finetune import _collect_gammas, _layer_paths

    cap = min(
        float(np.abs(_collect_gammas(p, lc, path, lc.entries[layer])).max())
        for p in (params_f32, params_bf16)
        for layer, path in enumerate(_layer_paths(lc)))
    g32 = np.sort(gammas_of(params_f32))
    gaps = np.diff(g32)
    mids = (g32[:-1] + g32[1:]) / 2.0
    valid = np.flatnonzero(mids < cap)
    assert valid.size, "no inter-cluster gap below the block-survival cap"
    i = int(valid[np.argmax(gaps[valid])])
    assert 0 < i + 1 < g32.size, "gamma distribution must have two clusters"
    thres = float(mids[i])

    _, lc_f32, masks_f32 = prune(params_f32, lc, thres)
    _, lc_bf16, masks_bf16 = prune(params_bf16, lc, thres)
    total = agree = kept32 = kept16 = 0
    for mf, mb in zip(masks_f32, masks_bf16):
        assert len(mf) == len(mb)
        for bf, bb in zip(mf, mb):
            bf, bb = np.asarray(bf), np.asarray(bb)
            total += bf.size
            agree += int((bf == bb).sum())
            kept32 += int(bf.sum())
            kept16 += int(bb.sum())
    assert 0 < kept32 < total, "threshold must actually prune something"
    assert agree / total >= 0.98, (
        f"bf16 prune decisions diverged: {agree}/{total} agree "
        f"(kept f32 {kept32}, bf16 {kept16})")
    assert abs(kept32 - kept16) <= 0.02 * total
