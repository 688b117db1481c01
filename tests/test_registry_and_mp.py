"""Architecture registry + mixed-precision train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod100k_tpu.arch import get_arch, register_arch
from sod100k_tpu.arch.csnet import csnet_init
from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.train.optim import make_adam_dwd
from sod100k_tpu.train.params import partition
from sod100k_tpu.train.step import make_train_step

LC = init_layers(8, [0.5, 0.5])


def test_registry_resolves_and_rejects():
    entry = get_arch("csnet")
    params = entry.init(jax.random.key(0), LC)
    y = entry.apply(params, jnp.zeros((1, 32, 32, 3)), LC)
    assert y.shape == (1, 32, 32, 1)
    with pytest.raises(KeyError):
        get_arch("nope")
    register_arch("csnet_alias", entry.init, entry.apply)
    assert get_arch("csnet_alias").init is entry.init


def test_mixed_precision_train_step_converges():
    params = csnet_init(jax.random.key(0), LC)
    trainable, state = partition(params)
    tx = make_adam_dwd(trainable, weight_decay=5e-3)
    opt_state = tx.init(trainable)
    step = make_train_step(LC, tx, flops_weight=3.0, flops_expand=2.0,
                           batch_size=4, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((4, 16, 16, 3), dtype=np.float32)),
        "target": jnp.asarray((rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)),
    }
    losses = []
    for _ in range(15):
        trainable, state, opt_state, m = step(
            trainable, state, opt_state, batch, jnp.float32(1e-2), jnp.float32(1.0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params stay f32
    assert trainable["cls_layer"]["kernel"].dtype == jnp.float32
