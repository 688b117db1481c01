"""Secondary driver-captured benchmarks -> bench_extras.json (repo root).

bench.py stays the single-JSON-line flagship metric; this tool regenerates
the README performance table's other rows with one command:

    python tools/bench_extras.py [--skip-e2e] [--skip-csf] [--skip-step]

Entries:
- CSNet-L-x2 train-step throughput (full dynamic-wd recipe) f32 B=128/B=24
  and bf16 B=128. Unlike bench.py's lax.scan chaining (needed for ~ms
  forwards), train steps run 100-300 ms, so K donated steps are dispatched
  asynchronously from a Python loop (device executes back-to-back; the
  ~35 ms tunnel RPC overlaps) and one RPC is subtracted at the final block.
  A scan-of-steps was tried and OOMs HBM at f32 B=128: inside a while-loop
  body XLA loses the buffer-donation freedom the real driver has.
- CSF+Res2Net-50 336x336 train micro-step (reference Solver protocol,
  solver.py:76-77 speed test is inference FPS; we record both the B=1
  protocol step and a B=8 throughput step).
- End-to-end cli.train epoch throughput on a synthetic DUTS-TR-shaped
  directory (300x400 JPEGs) for each TPU.PREPROCESS placement
  (hybrid / device / host) — the host->device link and the single host
  core are the end-to-end constraints on this machine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.common import enable_compile_cache  # noqa: E402

enable_compile_cache()

RPC_LATENCY_S = 0.035
REPEATS = 3


def _force(carry) -> float:
    """Force device execution by a host readback of one (tiny) leaf.

    Over the axon tunnel block_until_ready can return at dispatch-ack, not
    execution (measured: it reported a B=128 f32 train step at 3.2 ms when
    the forward alone is ~10 ms) — a value transfer cannot lie."""
    leaf = jax.tree.leaves(carry)[0]
    return float(np.asarray(leaf).ravel()[0])


def _timed_chain(step_once, carry, k: int = 8) -> tuple[float, object]:
    """Per-step seconds for k async-dispatched donated steps (carry threads
    through so steps execute back-to-back on device), minus one RPC."""
    carry = step_once(carry)  # compile + warm
    _force(carry)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(k):
            carry = step_once(carry)
        _force(carry)
        best = min(best, time.perf_counter() - t0)
    return max(best - RPC_LATENCY_S, 1e-9) / k, carry


def bench_inference_latency(entries: list) -> None:
    """Single-image serving latency (B=1): CSNet-L-x2 @224 bf16 and
    CSF+Res2Net-50 @336 bf16 (the reference's FPS speed-test protocol is
    per-image, solver.py:76-77). Sub-ms/ms-scale programs, so K iterations
    are chained inside ONE lax.scan dispatch like bench.py."""
    import time

    from jax import lax

    def scan_latency(fn, x0, k=50):
        def body(x, _):
            y = fn(x)
            return x + y.mean().astype(x.dtype) * 1e-6, ()

        run = jax.jit(lambda v: jnp.sum(
            lax.scan(body, v, None, length=k)[0].astype(jnp.float32)))
        float(run(x0))  # compile + warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return max(best - RPC_LATENCY_S, 1e-9) / k

    # CSNet-L-x2 (shipped checkpoint arch when available)
    from sod100k_tpu.arch.csnet import csnet_apply, csnet_init
    from sod100k_tpu.arch.layer_config import LayerConfig, init_layers
    from sod100k_tpu.ops.goct import ApplyCtx

    stem = "/root/reference/CSNet/checkpoints/csnet-L-x2/csnet-L-x2"
    if os.path.exists(stem + ".bin"):
        from sod100k_tpu.interop.torch_ckpt import load_checkpoint

        lc = LayerConfig.load(stem + ".bin")
        params, _ = load_checkpoint(stem + ".pth.tar")
    else:
        lc = init_layers(40, [0.5, 0.5])
        params = csnet_init(jax.random.key(0), lc)
    p16 = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 224, 224, 3), dtype=np.float32), jnp.bfloat16)
    ms = scan_latency(
        lambda v: jax.nn.sigmoid(csnet_apply(p16, v, lc, ApplyCtx())), x) * 1e3
    print(f"# csnet B=1 224 bf16 latency: {ms:.3f} ms "
          f"({1e3 / ms:.0f} img/s serial)", file=sys.stderr)
    entries.append({"metric": "csnet_l_x2_224_infer_latency_ms[bf16,B=1]",
                    "value": round(ms, 3), "unit": "ms"})

    from sod100k_tpu.arch.csf_res2net import csf_apply, csf_init

    cparams = csf_init(jax.random.key(3))
    c16 = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), cparams)
    xc = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 336, 336, 3), dtype=np.float32), jnp.bfloat16)
    ms = scan_latency(
        lambda v: jax.nn.sigmoid(csf_apply(c16, v, "res2net50")), xc, k=25) * 1e3
    print(f"# csf_res2net50 B=1 336 bf16 latency: {ms:.3f} ms "
          f"({1e3 / ms:.0f} FPS)", file=sys.stderr)
    entries.append({"metric": "csf_res2net50_336_infer_latency_ms[bf16,B=1]",
                    "value": round(ms, 3), "unit": "ms"})

    # batched CSF throughput (the reference's FPS protocol is serial B=1,
    # solver.py:62-78; this is the TPU serving number — HBM-BW-bound at
    # B=32, see tools/perf_probe.py csf / docs/DESIGN.md)
    xb = jnp.asarray(np.random.default_rng(4).standard_normal(
        (32, 336, 336, 3), dtype=np.float32), jnp.bfloat16)
    ms = scan_latency(
        lambda v: jax.nn.sigmoid(csf_apply(c16, v, "res2net50")), xb, k=20) * 1e3
    print(f"# csf_res2net50 B=32 336 bf16: {ms:.2f} ms/batch "
          f"({32e3 / ms:.0f} img/s)", file=sys.stderr)
    entries.append({"metric": "csf_res2net50_336_infer_img_per_sec[bf16,B=32]",
                    "value": round(32e3 / ms, 1), "unit": "images/sec"})

    # north-star config #5's backbone: CSF+Res2Net-101 (stage depths
    # [3,4,23,3]) at the same 336^2 B=32 protocol
    c101 = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                        csf_init(jax.random.key(3), backbone="res2net101"))
    ms = scan_latency(
        lambda v: jax.nn.sigmoid(csf_apply(c101, v, "res2net101")), xb,
        k=20) * 1e3
    print(f"# csf_res2net101 B=32 336 bf16: {ms:.2f} ms/batch "
          f"({32e3 / ms:.0f} img/s)", file=sys.stderr)
    entries.append({"metric": "csf_res2net101_336_infer_img_per_sec[bf16,B=32]",
                    "value": round(32e3 / ms, 1), "unit": "images/sec"})


def bench_serving_artifact(entries: list) -> None:
    """Exported StableHLO artifact throughput: the deployment path (weights
    baked in, loaded without model code) must match the live bf16 forward
    (bench.py's ~4k img/s)."""
    import tempfile
    import time

    from jax import lax

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import LayerConfig, init_layers
    from sod100k_tpu.serve import export_artifact, load_artifact

    stem = "/root/reference/CSNet/checkpoints/csnet-L-x2/csnet-L-x2"
    if os.path.exists(stem + ".bin"):
        from sod100k_tpu.interop.torch_ckpt import load_checkpoint

        lc = LayerConfig.load(stem + ".bin")
        params, _ = load_checkpoint(stem + ".pth.tar")
    else:
        lc = init_layers(40, [0.5, 0.5])
        params = csnet_init(jax.random.key(0), lc)
    batch = 128
    art = export_artifact(tempfile.mkdtemp(prefix="sod_art_"), "csnet",
                          params, lc, batch=batch, hw=(224, 224),
                          dtype=jnp.bfloat16)
    model = load_artifact(art)

    def body(x, _):
        y = model._exp.call(x)
        return x + y.mean().astype(x.dtype) * 1e-6, ()

    k = 20
    run = jax.jit(lambda v: jnp.sum(
        lax.scan(body, v, None, length=k)[0].astype(jnp.float32)))
    x0 = jnp.asarray(np.random.default_rng(5).standard_normal(
        (batch, 224, 224, 3), dtype=np.float32))
    float(run(x0))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    secs = max(best - RPC_LATENCY_S, 1e-9) / k
    ips = batch / secs
    print(f"# serving artifact bf16 B=128: {secs * 1e3:.2f} ms/batch = "
          f"{ips:.0f} img/s", file=sys.stderr)
    entries.append({
        "metric": "csnet_l_x2_224_serving_artifact_img_per_sec[bf16,B=128]",
        "value": round(ips, 1), "unit": "images/sec"})


def bench_csnet_train_steps(entries: list) -> None:
    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.train.optim import make_adam_dwd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    lc = init_layers(40, [0.5, 0.5])  # csnet-L-x2 seed arch (expand=2)
    params = csnet_init(jax.random.key(0), lc)
    trainable, state = partition(params)
    tx = make_adam_dwd(trainable, weight_decay=5e-3)
    K = 8

    for batch_size, dtype_name in ((128, "f32"), (24, "f32"), (128, "bf16")):
        cdt = jnp.bfloat16 if dtype_name == "bf16" else None
        step = make_train_step(lc, tx, flops_weight=3.0, flops_expand=2.0,
                               batch_size=batch_size, compute_dtype=cdt)
        opt_state = tx.init(trainable)
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(rng.standard_normal(
                (batch_size, 224, 224, 3), dtype=np.float32)),
            "target": jnp.asarray((rng.random(
                (batch_size, 224, 224, 1)) > 0.5).astype(np.float32)),
        }

        def once(carry):
            t, s, o = carry
            t, s, o, _ = step(t, s, o, batch, jnp.float32(1e-4),
                              jnp.float32(1.0))
            return (t, s, o)

        # fresh device copies: the donated carry must not alias the arrays
        # reused by the next dtype/batch configuration
        carry0 = jax.tree.map(lambda a: jnp.array(a, copy=True),
                              (trainable, state, opt_state))
        secs, _ = _timed_chain(once, carry0, K)
        ips = batch_size / secs
        print(f"# csnet train step {dtype_name} B={batch_size}: "
              f"{secs * 1e3:.1f} ms/step = {ips:.0f} img/s", file=sys.stderr)
        entries.append({
            "metric": f"csnet_l_x2_224_train_step_img_per_sec[{dtype_name},B={batch_size}]",
            "value": round(ips, 1), "unit": "images/sec"})


def bench_csf_steps(entries: list) -> None:
    from sod100k_tpu.arch.csf_res2net import csf_init
    from sod100k_tpu.train.csf_step import (
        csf_partition,
        make_csf_optimizer,
        make_csf_train_step,
    )

    K = 4
    # res2net101 [3,4,23,3] is north-star config #5's backbone; one bf16
    # throughput row keeps its training cost measured alongside the 50's
    plans = {"res2net50": ((1, "f32"), (8, "f32"), (8, "bf16"), (32, "bf16")),
             "res2net101": ((8, "bf16"),)}
    for arch, combos in plans.items():
        params = csf_init(jax.random.key(1), backbone=arch)
        trainable, state = csf_partition(params)
        for batch_size, dtype_name in combos:
            cdt = jnp.bfloat16 if dtype_name == "bf16" else None
            tx = make_csf_optimizer(iter_size=10)
            opt_state = tx.init(trainable)
            step = make_csf_train_step(tx, backbone=arch, iter_size=10,
                                       batch_size=batch_size,
                                       compute_dtype=cdt)
            rng = np.random.default_rng(0)
            batch = {
                "image": jnp.asarray(rng.standard_normal(
                    (batch_size, 336, 336, 3), dtype=np.float32)),
                "target": jnp.asarray((rng.random(
                    (batch_size, 336, 336, 1)) > 0.5).astype(np.float32)),
            }

            def once(carry):
                t, o = carry
                t, o, _ = step(t, state, o, batch, jnp.float32(5e-5))
                return (t, o)

            carry0 = jax.tree.map(lambda a: jnp.array(a, copy=True),
                                  (trainable, opt_state))
            secs, _ = _timed_chain(once, carry0, K)
            print(f"# csf_{arch} 336 train micro-step {dtype_name} "
                  f"B={batch_size}: {secs * 1e3:.1f} ms "
                  f"({batch_size / secs:.1f} img/s)", file=sys.stderr)
            suffix = f"[B={batch_size}]" if dtype_name == "f32" \
                else f"[{dtype_name},B={batch_size}]"
            entries.append({
                "metric": f"csf_{arch}_336_train_microstep_ms{suffix}",
                "value": round(secs * 1e3, 2), "unit": "ms"})


def bench_csf_resident_epoch(entries: list) -> None:
    """Resident-CSF training throughput: uint8 dataset in HBM at 336^2, one
    dispatched scan per epoch (cli.csf --preprocess resident --dtype
    bfloat16). The per-batch host paths ship 336^2 pixels over the ~36 MB/s
    tunnel (~100 img/s ceiling at uint8, ~25 at f32) — resident pays one RPC
    per epoch instead."""
    from sod100k_tpu.arch.csf_res2net import csf_init
    from sod100k_tpu.data.resident import make_resident_csf_epoch_fn
    from sod100k_tpu.train.csf_step import (
        csf_partition,
        make_csf_optimizer,
        make_csf_train_step,
    )

    n, batch_size = 256, 8
    rng = np.random.default_rng(9)
    rdata = {
        "image_u8": jax.device_put(rng.integers(
            0, 255, (n, 336, 336, 3), dtype=np.uint8)),
        "gt_u8": jax.device_put(rng.integers(
            0, 255, (n, 336, 336), dtype=np.uint8)),
    }
    params = csf_init(jax.random.key(1))
    trainable, state = csf_partition(params)
    tx = make_csf_optimizer(iter_size=10)
    step = make_csf_train_step(tx, iter_size=10, batch_size=batch_size,
                               donate=False, compute_dtype=jnp.bfloat16)
    epoch_fn = make_resident_csf_epoch_fn(step, batch_size=batch_size)

    def once(carry):
        t, o, k = carry
        t, o, losses = epoch_fn(t, state, o, rdata, jax.random.key(0),
                                jnp.float32(5e-5))
        return (t, o, k + losses[-1] * 1e-9)

    carry0 = (jax.tree.map(lambda a: jnp.array(jnp.asarray(a), copy=True),
                           trainable),
              tx.init(trainable), jnp.float32(0.0))
    secs, _ = _timed_chain(once, carry0, k=2)
    ips = (n // batch_size) * batch_size / secs
    print(f"# csf resident epoch bf16 B={batch_size} (n={n} @336): "
          f"{secs * 1e3:.0f} ms/epoch = {ips:.1f} img/s", file=sys.stderr)
    entries.append({
        "metric": f"csf_res2net50_336_resident_train_img_per_sec[bf16,B={batch_size}]",
        "value": round(ips, 1), "unit": "images/sec"})


def bench_resident_val(entries: list) -> None:
    """One-dispatch resident validation throughput (cli.train's per-epoch val
    when TPU.PREPROCESS=resident): forward at 224 + per-image native
    resize-back + quantized L1, whole val split per dispatch."""
    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.data.resident import (
        build_resident_val_dataset,
        make_resident_val_fn,
    )
    from sod100k_tpu.train.step import make_eval_step

    class SynthVal:
        """DUTS-shaped val split without disk IO (mixed orientations)."""

        def __init__(self, n: int):
            self.n = n
            self.rng = np.random.default_rng(11)

        def __len__(self) -> int:
            return self.n

        def _decode_u8(self, i: int):
            h, w = (300, 400) if i % 2 else (400, 300)
            return (self.rng.integers(0, 255, (h, w, 3), np.uint8),
                    self.rng.integers(0, 255, (h, w), np.uint8))

    n, batch = 512, 128
    lc = init_layers(40, [0.5, 0.5])
    params = jax.tree.map(jnp.asarray, csnet_init(jax.random.key(0), lc))
    data = build_resident_val_dataset(SynthVal(n), (224, 224), batch)
    canvas = data.pop("_canvas_hw")
    val_fn = make_resident_val_fn(
        make_eval_step(lc, from_u8=True, compute_dtype=jnp.bfloat16),
        batch_size=batch, canvas_hw=canvas)
    float(val_fn(params, data))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(val_fn(params, data))
        best = min(best, time.perf_counter() - t0)
    secs = max(best - RPC_LATENCY_S, 1e-9)
    print(f"# resident val ({n} imgs, canvas {canvas}, bf16 B={batch}): "
          f"{secs * 1e3:.0f} ms = {n / secs:.0f} img/s", file=sys.stderr)
    entries.append({
        "metric": f"csnet_l_x2_resident_val_img_per_sec[bf16,B={batch},n={n}]",
        "value": round(n / secs, 1), "unit": "images/sec"})


def bench_resident_testall(entries: list) -> None:
    """Per-checkpoint throughput of the HBM-resident TESTALL sweep
    (TPU.TEST_RESIDENT): forward + native resize-back + PNG-exact
    quantization + full metric suite (MAE/P/R/F/E/S) in ONE dispatch,
    metric sums only over the wire. Compare against the host protocol's
    e2e test img/s + eval time per checkpoint."""
    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.data.resident import (
        build_resident_val_dataset,
        make_resident_salmetric_fn,
    )
    from sod100k_tpu.metrics.salmetric import result_from_sums
    from sod100k_tpu.train.step import make_eval_step

    class SynthVal:
        def __init__(self, n: int):
            self.n = n
            self.rng = np.random.default_rng(13)

        def __len__(self) -> int:
            return self.n

        def _decode_u8(self, i: int):
            h, w = (300, 400) if i % 2 else (400, 300)
            return (self.rng.integers(0, 255, (h, w, 3), np.uint8),
                    self.rng.integers(0, 255, (h, w), np.uint8))

    n, batch = 512, 128
    lc = init_layers(40, [0.5, 0.5])
    params = jax.tree.map(jnp.asarray, csnet_init(jax.random.key(0), lc))
    data = build_resident_val_dataset(SynthVal(n), (224, 224), batch)
    canvas = data.pop("_canvas_hw")
    fn = make_resident_salmetric_fn(
        make_eval_step(lc, from_u8=True, compute_dtype=jnp.bfloat16),
        batch_size=batch, canvas_hw=canvas)
    result_from_sums(fn(params, data))  # compile + warm (readback forces)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        result_from_sums(fn(params, data))
        best = min(best, time.perf_counter() - t0)
    secs = max(best - RPC_LATENCY_S, 1e-9)
    print(f"# resident testall ({n} imgs, canvas {canvas}, bf16 B={batch}): "
          f"{secs * 1e3:.0f} ms/checkpoint = {n / secs:.0f} img/s",
          file=sys.stderr)
    entries.append({
        "metric": f"csnet_l_x2_resident_testall_img_per_sec[bf16,B={batch},n={n}]",
        "value": round(n / secs, 1), "unit": "images/sec"})


def make_synth_duts(root: str, n: int = 512) -> str:
    """DUTS-TR-shaped synthetic set: 300x400/400x300 JPEGs + GT PNGs."""
    from sod100k_tpu.data.synth import make_synth_split

    return make_synth_split(root, n, hw=(400, 300))


def bench_e2e_train(entries: list, data_root: str) -> None:
    import tempfile

    from cli.train import run_training
    from sod100k_tpu.config import get_cfg

    make_synth_duts(data_root)
    # the three placements at the reference recipe (B=24 f32), plus the
    # recommended high-throughput config (hybrid + bf16 + B=128)
    for mode, dtype, bsz in (("hybrid", "float32", 24),
                             ("device", "float32", 24),
                             ("host", "float32", 24),
                             ("resident", "float32", 24),
                             ("hybrid", "bfloat16", 128),
                             ("device", "bfloat16", 128),
                             ("resident", "bfloat16", 128)):
        cfg = get_cfg()
        cfg.TASK = f"bench_{mode}_{dtype}_{bsz}"
        cfg.MODEL.BASIC_SPLIT = [0.5, 0.5]
        cfg.LOSS.MLOSS = 1
        cfg.DATA.DIR = data_root
        cfg.DATA.BATCH_SIZE = bsz
        cfg.TPU.DTYPE = dtype
        cfg.DATA.WORKERS = 4
        cfg.DATA.SAVEDIR = tempfile.mkdtemp(prefix="sod_bench_")
        cfg.AUTO.ENABLE = True
        cfg.AUTO.EXPAND = 2.0
        cfg.AUTO.FLOPS.ENABLE = True
        cfg.AUTO.FLOPS.WEIGHT = 3.0
        cfg.SOLVER.METHOD = "Adam_dynamic_weight_decay"
        cfg.TPU.PREPROCESS = mode
        out = run_training(cfg, max_epochs=2, log=lambda *a, **k: None)
        ips = out["history"][-1]["img_per_sec"]  # epoch 2 = warm
        tag = "" if dtype == "float32" else ",bf16"
        print(f"# e2e cli.train epoch img/s ({mode} preprocess, {dtype}, "
              f"B={bsz}): {ips:.1f}", file=sys.stderr)
        entries.append({
            "metric": f"csnet_l_x2_224_e2e_train_img_per_sec[{mode}_preprocess{tag},B={bsz}]",
            "value": round(ips, 1), "unit": "images/sec"})


def bench_e2e_test(entries: list, data_root: str) -> None:
    """End-to-end cli.test throughput (decode -> preprocess -> forward ->
    resize-back -> PNG dump) per TEST_PREPROCESS placement, bf16 B=128 at
    224^2 on a 512-image synthetic set. The driver pipelines one batch deep
    (async dispatch overlaps host decode + readback with device compute)."""
    import tempfile

    from cli.test import run_test
    from sod100k_tpu.config import get_cfg
    from sod100k_tpu.data.synth import make_synth_split

    ds = "SYNTH-TE"
    make_synth_split(os.path.join(data_root, ds), 512, hw=(400, 300))
    stem = "/root/reference/CSNet/checkpoints/csnet-L-x2/csnet-L-x2"
    if not os.path.exists(stem + ".bin"):
        print("# e2e test bench skipped (shipped checkpoint unavailable)",
              file=sys.stderr)
        return
    for mode in ("hybrid", "device", "host"):
        cfg = get_cfg()
        cfg.TASK = f"bench_test_{mode}"
        cfg.TEST.MODEL_CONFIG = stem + ".bin"
        cfg.TEST.CHECKPOINT = stem + ".pth.tar"
        cfg.TEST.DATASET_PATH = data_root
        cfg.TEST.DATASETS = [ds]
        cfg.TEST.IMAGE_H = cfg.TEST.IMAGE_W = 224
        cfg.DATA.BATCH_SIZE = 128
        cfg.DATA.WORKERS = 4
        cfg.TPU.DTYPE = "bfloat16"
        cfg.TPU.TEST_PREPROCESS = mode
        cfg.DATA.SAVEDIR = tempfile.mkdtemp(prefix="sod_benchtest_")
        run_test(cfg, log=lambda *a, **k: None)  # compile + warm
        out = run_test(cfg, log=lambda *a, **k: None)
        ips = out["datasets"][ds]["img_per_sec"]
        print(f"# e2e cli.test img/s ({mode} preprocess, bf16, B=128): "
              f"{ips:.1f}", file=sys.stderr)
        entries.append({
            "metric": f"csnet_l_x2_224_e2e_test_img_per_sec[{mode}_preprocess,bf16,B=128]",
            "value": round(ips, 1), "unit": "images/sec"})

    # ceil-to-16 NATIVE-size protocol (TEST.IMAGE_H/W=0, the reference
    # test.py:75-98 dialect): per-image reference loop vs --test_batch
    # same-resized-shape batching (bit-identical PNGs — tests/test_cli.py).
    # Uniform 320^2 inputs = ONE compiled shape per mode, like the m_r
    # regime; the delta is amortized dispatch latency.
    ds_u = "SYNTH-TE-UNI"
    make_synth_split(os.path.join(data_root, ds_u), 128, hw=(320, 320),
                     jitter=0, alternate_orientation=False)
    for tb in (1, 16):
        cfg = get_cfg()
        cfg.TASK = f"bench_test_native_tb{tb}"
        cfg.TEST.MODEL_CONFIG = stem + ".bin"
        cfg.TEST.CHECKPOINT = stem + ".pth.tar"
        cfg.TEST.DATASET_PATH = data_root
        cfg.TEST.DATASETS = [ds_u]
        cfg.TEST.IMAGE_H = cfg.TEST.IMAGE_W = 0  # native protocol
        cfg.TEST.BATCH = tb
        cfg.DATA.WORKERS = 4
        cfg.TPU.DTYPE = "bfloat16"
        cfg.DATA.SAVEDIR = tempfile.mkdtemp(prefix="sod_benchtest_")
        run_test(cfg, log=lambda *a, **k: None)  # compile + warm
        out = run_test(cfg, log=lambda *a, **k: None)
        ips = out["datasets"][ds_u]["img_per_sec"]
        print(f"# e2e cli.test native ceil-16 img/s (test_batch={tb}, "
              f"bf16, 320^2 uniform): {ips:.1f}", file=sys.stderr)
        entries.append({
            "metric": f"csnet_l_x2_native320_e2e_test_img_per_sec"
                      f"[test_batch={tb},bf16]",
            "value": round(ips, 1), "unit": "images/sec"})


def bench_csf_e2e_test(entries: list, data_root: str) -> None:
    """End-to-end CSF test-mode FPS (the reference's speed protocol,
    solver.py:76-77: decode -> forward -> native-size *_sal_fuse.png dump)
    on a uniform 336^2 synthetic list — the m_r resized-MSRA shape regime.
    Measures the reference B=1 loop vs --test_batch batched serving, both
    with the u8-in/u8-out wire format and one-deep pipelining."""
    import tempfile
    import types

    import cv2

    from cli.csf import run_csf_test

    root = os.path.join(data_root, "CSF-MR")
    lst = os.path.join(root, "test.lst")
    if not os.path.exists(lst):
        os.makedirs(os.path.join(root, "Imgs"), exist_ok=True)
        rng = np.random.default_rng(3)
        names = []
        for i in range(256):
            cv2.imwrite(os.path.join(root, "Imgs", f"m{i}.jpg"),
                        rng.integers(0, 255, (336, 336, 3), dtype=np.uint8))
            names.append(f"Imgs/m{i}.jpg")
        with open(lst, "w") as f:
            f.write("\n".join(names) + "\n")

    # random-init weights are fine for a speed protocol (same FLOPs)
    from cli.common import save_torch_checkpoint
    from sod100k_tpu.arch.csf_res2net import csf_init

    ck = os.path.join(root, "init.pth")
    if not os.path.exists(ck):
        p = csf_init(jax.random.key(0), backbone="res2net50")
        save_torch_checkpoint(ck, jax.tree.map(np.asarray, p), epoch=0,
                              arch="csf_res2net50")

    for tb in (1, 16):
        config = types.SimpleNamespace(
            arch="res2net50", model=ck, test_root=root, test_list=lst,
            test_fold=tempfile.mkdtemp(prefix="csf_benchtest_"),
            dtype="bfloat16", test_batch=tb)
        run_csf_test(config, log=lambda *a, **k: None)  # compile + warm
        out = run_csf_test(config, log=lambda *a, **k: None)
        fps = out["fps"]
        print(f"# e2e cli.csf test FPS (336^2 uniform, bf16, "
              f"test_batch={tb}): {fps:.1f}", file=sys.stderr)
        entries.append({
            "metric": f"csf_res2net50_336_e2e_test_fps[bf16,test_batch={tb}]",
            "value": round(fps, 1), "unit": "images/sec"})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--skip-e2e-train", action="store_true")
    ap.add_argument("--skip-e2e-test", action="store_true")
    ap.add_argument("--skip-csf", action="store_true")
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--skip-latency", action="store_true")
    ap.add_argument("--skip-serving", action="store_true")
    ap.add_argument("--skip-val", action="store_true")
    ap.add_argument("--data-dir", default="/tmp/sod100k_bench_data_v2")
    args = ap.parse_args()

    entries: list = []
    if not args.skip_serving:
        bench_serving_artifact(entries)
    if not args.skip_latency:
        bench_inference_latency(entries)
    if not args.skip_step:
        bench_csnet_train_steps(entries)
    if not args.skip_csf:
        bench_csf_steps(entries)
        bench_csf_resident_epoch(entries)
    if not args.skip_val:
        bench_resident_val(entries)
        bench_resident_testall(entries)
    if not args.skip_e2e:
        if not args.skip_e2e_train:
            bench_e2e_train(entries, args.data_dir)
        if not args.skip_e2e_test:
            bench_e2e_test(entries, args.data_dir)
            bench_csf_e2e_test(entries, args.data_dir)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_extras.json")
    # merge by metric name so partial (--skip-*) runs refresh their rows
    # without clobbering the rest
    merged: dict = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = {e["metric"]: e for e in json.load(f)["entries"]}
        except Exception:
            merged = {}
    merged.update({e["metric"]: e for e in entries})
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].platform,
                   "entries": list(merged.values())}, f, indent=1)
    print(json.dumps(entries))


if __name__ == "__main__":
    main()
