"""Multi-host worker for tests/test_multihost.py (NOT collected by pytest).

Launched N times (one process per "host", 4 virtual CPU devices each) with
SOD100K_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID set — the same env contract the
product CLIs use (cli/common.py:data_mesh_for -> multihost.init_from_env).
Runs the REAL CSNet train step over the global mesh, each process feeding only
its rows of a deterministic global batch, and prints a JSON line with the
final loss + a parameter checksum for the parent to compare against
single-process math.

Only ``global_batch`` runs at import time — the parent test imports it to
reproduce the math single-process.
"""

import json
import os
import sys

import numpy as np


def global_batch(n=8, hw=32, seed=0):
    """The SAME global batch on every process (index-deterministic, like the
    product host pipelines)."""
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((n, hw, hw, 3)).astype(np.float32),
        "target": (rng.random((n, hw, hw, 1)) > 0.5).astype(np.float32),
    }


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir
    jax.config.update(
        "jax_compilation_cache_dir",
        hygienic_cache_dir(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")))

    from sod100k_tpu.parallel import multihost

    assert multihost.init_from_env(), "worker needs SOD100K_COORDINATOR env"

    import jax.numpy as jnp

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.parallel.mesh import make_mesh, make_mesh_2d, replicate
    from sod100k_tpu.train.optim import make_sgd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    assert jax.process_count() == int(os.environ["SOD100K_NUM_PROCESSES"])
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    trainable, state = partition(params)
    # SGD+momentum: linear in the gradients, so cross-process reduction-order
    # noise (gloo vs single-process psum trees) stays ~1e-6 through the whole
    # trajectory — Adam's m/sqrt(v) normalization amplifies it via sign flips
    # on near-zero grads (measured 6e-4 after 2 steps). Adam DP equivalence is
    # pinned single-process in test_train.py; THIS oracle pins cross-process
    # collectives.
    tx = make_sgd(momentum=0.9)
    opt_state = tx.init(trainable)

    mesh = make_mesh()  # all 8 global devices, 1-D data
    multihost.check_mesh_process_layout(mesh)
    trainable = replicate(trainable, mesh)
    state = replicate(state, mesh)
    opt_state = replicate(opt_state, mesh)

    step = make_train_step(lc, tx, batch_size=8, donate=False)
    feeds = [multihost.global_feed(
        multihost.local_slice_feed(global_batch(seed=i)), mesh)
        for i in range(2)]
    # AOT-compile, then rendezvous BEFORE the first dispatch: the gloo
    # collective-context handshake times out (~30 s) if one process is still
    # minutes deep in an uncached XLA compile (multihost.barrier docstring)
    compiled = step.lower(trainable, state, opt_state, feeds[0],
                          jnp.float32(1e-3), jnp.float32(0.0)).compile()
    multihost.barrier("step-compiled")
    losses = []
    for i in range(2):
        trainable, state, opt_state, m = compiled(
            trainable, state, opt_state, feeds[i],
            jnp.float32(1e-3), jnp.float32(0.0))
        losses.append(float(m["loss"]))  # replicated: readable on every host
    checksum = float(sum(float(jnp.sum(jnp.abs(l)))
                         for l in jax.tree.leaves(trainable)))

    # 2-D data x spatial mesh: global feed assembly + a real reduction over it
    mesh2d = make_mesh_2d(4, 2)
    multihost.check_mesh_process_layout(mesh2d)
    feed2d = multihost.global_feed(
        multihost.local_slice_feed(global_batch(seed=7)), mesh2d)
    assert feed2d["image"].shape == (8, 32, 32, 3)
    sum_c = jax.jit(lambda b: b["image"].sum()).lower(feed2d).compile()
    multihost.barrier("sum2d-compiled")
    sum2d = float(sum_c(feed2d))

    # a spatial axis crossing hosts must be rejected loudly
    bad = make_mesh_2d(1, 8)
    try:
        multihost.check_mesh_process_layout(bad)
        raise AssertionError("1x8 mesh over 2 hosts should be rejected")
    except ValueError:
        pass

    print(json.dumps({
        "pid": jax.process_index(),
        "primary": multihost.is_primary(),
        "loss0": losses[0],
        "loss": losses[1],
        "checksum": checksum,
        "sum2d": sum2d,
    }), flush=True)


if __name__ == "__main__":
    main()
