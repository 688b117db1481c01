"""Golden parity: JAX CSNet vs the reference PyTorch checkpoints.

Goldens are produced by tools/gen_goldens.py from the *reference* model code
and shipped checkpoints; the BASELINE gate is saliency-map (sigmoid) MAE
<= 1e-3 — we hold ourselves to ~1e-5 on logits.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod100k_tpu.arch.csnet import count_params, csnet_apply, csnet_init
from sod100k_tpu.arch.layer_config import LayerConfig, init_layers
from sod100k_tpu.interop.torch_ckpt import (
    load_checkpoint,
    pytree_to_state_dict,
    state_dict_to_pytree,
)

from conftest import GOLDEN_DIR, golden_input

CASES = [
    ("csnet_l_x2_224", "csnet-L-x2", (224, 224), 140894),
    ("csnet_l_x1_224", "csnet-L-x1", (224, 224), 93647),
    ("csnet_l_x2_320", "csnet-L-x2", (320, 320), 140894),
]


def _stem(name):
    return f"/root/reference/CSNet/checkpoints/{name}/{name}"


@pytest.mark.parametrize("gname,ck,hw,n_params", CASES)
def test_checkpoint_parity(gname, ck, hw, n_params):
    golden = os.path.join(GOLDEN_DIR, gname + ".npz")
    if not (os.path.exists(golden) and os.path.exists(_stem(ck) + ".bin")):
        pytest.skip("goldens / reference checkpoints not available")
    lc = LayerConfig.load(_stem(ck) + ".bin")
    params, meta = load_checkpoint(_stem(ck) + ".pth.tar")
    assert count_params(params) == n_params
    g = np.load(golden)
    assert int(g["epoch"]) == meta["epoch"]

    x = jnp.asarray(golden_input(hw).transpose(0, 2, 3, 1))
    params = jax.tree.map(jnp.asarray, params)
    y = jax.jit(lambda p, v: csnet_apply(p, v, lc))(params, x)
    got = np.asarray(y)[..., 0]
    want = g["logits"][:, 0]
    assert np.abs(got - want).max() < 1e-3
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    assert np.abs(sig(got) - sig(want)).mean() < 1e-5


def test_state_dict_round_trip():
    stem = _stem("csnet-L-x2")
    if not os.path.exists(stem + ".pth.tar"):
        pytest.skip("reference checkpoints not available")
    params, _ = load_checkpoint(stem + ".pth.tar")
    sd = pytree_to_state_dict(params)
    back = state_dict_to_pytree(sd)
    flat_a = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(params)}
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(back)}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_init_layers_matches_reference_generator():
    """init_layers(40, [0.5, 0.5]) must equal the reference's epoch-0 config
    (csnet.py:414-518): widths, stage ends collapsing to one branch, CSF
    thirds + dilation splits."""
    lc = init_layers(40, [0.5, 0.5])
    assert lc.stages == (3, 4, 6, 4)
    assert len(lc.entries) == 21
    assert lc.entries[0].in_split == (3,)
    assert lc.entries[0].out_split == (20, 20)
    # stage2 end collapses to single branch of 2*w
    assert lc.entries[7].out_split == (80,)
    assert lc.fuse.in_split == (80, 160, 160)
    assert lc.fuse.out_split == (26, 53, 53)
    assert lc.ms.dil_split == (
        (5, 5, 5, 5, 6), (10, 10, 10, 10, 13), (10, 10, 10, 10, 13),
    )
    assert lc.fuse1x1.out_split == (132,)


def test_layer_config_pickle_round_trip(tmp_path):
    lc = init_layers(20, [0.5, 0.5])
    p = str(tmp_path / "lc.bin")
    lc.save(p)
    lc2 = LayerConfig.load(p)
    assert lc == lc2


def test_fresh_init_forward_shape():
    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    x = jnp.zeros((1, 64, 64, 3))
    y = csnet_apply(params, x, lc)
    assert y.shape == (1, 64, 64, 1)
