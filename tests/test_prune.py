"""Prune machinery parity vs the reference's finetune_model /
build_model_with_weight run live on identical weights."""

import os
import sys

import jax
import numpy as np
import pytest

from sod100k_tpu.arch.csnet import csnet_apply, csnet_init, count_params
from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.interop.torch_ckpt import pytree_to_state_dict, state_dict_to_pytree
from sod100k_tpu.prune.finetune import prune

LC = init_layers(8, [0.5, 0.5])
THRES = 0.3


def _randomized_params(seed=5):
    """Params whose BN gammas are uniform [0,1] so ~THRES of channels prune,
    with at least one surviving channel per branch."""
    params = csnet_init(jax.random.key(0), LC)
    rng = np.random.default_rng(seed)

    def walk(node):
        for k, v in node.items():
            if isinstance(v, dict):
                if "scale" in v and "mean" in v:  # a BN dict
                    c = v["scale"].shape[0]
                    g = rng.uniform(0.0, 1.0, size=c).astype(np.float32)
                    g[rng.integers(c)] = 0.9  # keep the branch alive
                    v["scale"] = jax.numpy.asarray(g)
                    # non-trivial running stats: the reference RESETS
                    # mean/var on prune (load_BN_weight copies only
                    # weight/bias) — perturbing them here makes the
                    # bit-equality oracle sensitive to that semantic
                    v["mean"] = jax.numpy.asarray(
                        rng.normal(0, 0.5, size=c).astype(np.float32))
                    v["var"] = jax.numpy.asarray(
                        rng.uniform(0.5, 2.0, size=c).astype(np.float32))
                else:
                    walk(v)

    walk(params)
    return params


def test_prune_reduces_and_still_runs():
    params = _randomized_params()
    new_params, new_lc, masks = prune(params, LC, THRES)
    assert count_params(new_params) < count_params(params)
    assert sum(sum(e.out_split) for e in new_lc.entries) < \
        sum(sum(e.out_split) for e in LC.entries)
    x = jax.numpy.zeros((1, 32, 32, 3))
    y = csnet_apply(jax.tree.map(jax.numpy.asarray, new_params), x, new_lc)
    assert y.shape == (1, 32, 32, 1)


@pytest.mark.skipif(not os.path.isdir("/root/reference/CSNet_training"),
                    reason="reference not mounted")
def test_prune_matches_reference_machinery(tmp_path):
    import collections
    import collections.abc

    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    import torch

    sys.path.insert(0, "/root/reference/CSNet_training")
    for m in ("model", "model.csnet", "model.conv2d"):
        sys.modules.pop(m, None)
    from model import csnet as ref

    params = _randomized_params()
    new_params, new_lc, masks = prune(params, LC, THRES)

    # reference: load identical weights into the torch model, then prune
    ref_lc = ref.init_layers(8, [0.5, 0.5])
    model = ref.CSNet(layer_config=ref_lc)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          pytree_to_state_dict(params).items()}
    model.load_state_dict(sd, strict=False)
    ref_new_lc, ref_mask = ref.finetune_model(
        model, save_path=str(tmp_path), base_layer_config=ref_lc, thres=THRES)

    # layer_config parity
    for i, e in enumerate(new_lc.entries):
        np.testing.assert_array_equal(
            np.asarray(e.out_split), np.asarray(ref_new_lc[i][1]).astype(np.int64))
        if e.dil_split is not None:
            np.testing.assert_array_equal(
                np.asarray(e.dil_split), np.asarray(ref_new_lc[i][2]).astype(np.int64))

    # weight-gather parity: reference build_model_with_weight vs our gathers.
    # (The reference targets old numpy: csnet.py:798 builds a ragged np.array;
    # shim np.array with an object-dtype fallback for the call.)
    import unittest.mock as mock

    orig_array = np.array

    def compat_array(*a, **k):
        try:
            return orig_array(*a, **k)
        except ValueError:
            return orig_array(a[0], dtype=object)

    with mock.patch.object(np, "array", compat_array):
        slim = ref.build_model_with_weight(ref_new_lc, model, ref_mask)
    ref_pytree = state_dict_to_pytree(slim.state_dict())
    flat_ref = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(ref_pytree)}
    flat_ours = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                 jax.tree_util.tree_leaves_with_path(new_params)}
    assert flat_ref.keys() == flat_ours.keys()
    for k in flat_ref:
        np.testing.assert_allclose(flat_ours[k], flat_ref[k], atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_prune_trajectory_end_to_end():
    """The headline trajectory (docs/PRUNE_TRAJECTORY.md) at the calibrated
    demo scale: dynamic-wd training until BN-gamma sparsity plateaus ->
    prune -> BN re-estimation -> cosine finetune, all in the resident
    one-dispatch-per-epoch mode. Asserts the run-to-run-robust invariants
    (numerics diverge chaotically over the 2,400 steps, so the exact masks
    and MAEs vary; see the doc's variance note): a large parameter drop,
    near-free pruning at the plateau, and a functional finetuned slim model
    well below failure-mode MAE (severed nets score ~0.2+; the trivial
    all-zero predictor ~0.067).

    ~45 min on the single-core CPU mesh — deselected by default (slow
    marker); run with `pytest -m slow tests/test_prune.py`.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.prune_trajectory import run_trajectory

    res = run_trajectory(train_epochs=600, ft_epochs=30, basewidth=8,
                         images=32, size=48, batch=8, lr=2e-3,
                         flops_weight=30.0, log=lambda *a, **k: None)
    assert res["gamma_sparsity_pct"] > 30, res
    assert res["param_drop_pct"] > 25, res
    # pruning at the plateau is near-free (dead channels carry no signal)
    assert res["mae_post_prune"] < res["mae_pre_prune"] + 0.05, res
    # the finetuned slim model is functional (not a severed 1-channel net)
    assert res["mae_post_finetune"] < 0.15, res
    assert res["mae_post_finetune"] <= res["mae_pre_prune"] * 1.6, res
