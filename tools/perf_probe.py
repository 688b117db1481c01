"""Perf probes: model-component ablations + depthwise-conv layout microbench.

Run on the TPU to map where forward time goes (informs Pallas/fusion work):
  python tools/perf_probe.py ablate   # full vs no-dw vs nearest-upsample
  python tools/perf_probe.py dwlayout # depthwise 3x3: NHWC vs W-in-lanes
  python tools/perf_probe.py scatter  # 256-bin scatter hist vs compare-scan
  python tools/perf_probe.py trainb   # bf16 train-step batch sweep
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir

jax.config.update("jax_compilation_cache_dir",
                  hygienic_cache_dir("/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

B, K, R = 128, 20, 224
RPC = 0.035


def timeit(tag, run, x0):
    t0 = time.perf_counter()
    float(run(x0))  # compile + first run (also _best_ms's warmup contract)
    c = time.perf_counter() - t0
    print(f"{tag}: {_best_ms(run, x0):.2f} ms/batch (compile {c:.0f}s)",
          flush=True)


def scan_run(apply, x0):
    def body(x, _):
        y = jax.nn.sigmoid(apply(x))
        return x + y.mean().astype(x.dtype) * 1e-6, ()

    return jax.jit(lambda v: jnp.sum(
        lax.scan(body, v, None, length=K)[0].astype(jnp.float32)))


def ablate():
    import sod100k_tpu.arch.csnet as csnet_mod
    import sod100k_tpu.ops.goct as goct
    from sod100k_tpu.arch.csnet import csnet_apply
    from sod100k_tpu.arch.layer_config import LayerConfig
    from sod100k_tpu.interop.torch_ckpt import load_checkpoint
    from sod100k_tpu.ops.goct import ApplyCtx

    stem = "/root/reference/CSNet/checkpoints/csnet-L-x2/csnet-L-x2"
    lc = LayerConfig.load(stem + ".bin")
    params, _ = load_checkpoint(stem + ".pth.tar")
    p = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, R, R, 3), dtype=np.float32), jnp.bfloat16)

    timeit("full", lambda x: csnet_apply(p, x, lc, ApplyCtx()), x0)
    # hold x0 fixed; monkeypatch pieces
    orig_dw = goct.simplified_goct_cbr
    goct.simplified_goct_cbr = lambda ctx, path, prm, xset, *, split, padding=1: xset
    csnet_mod.simplified_goct_cbr = goct.simplified_goct_cbr
    timeit("no-dw-chains", lambda x: csnet_apply(p, x, lc, ApplyCtx()), x0)
    goct.simplified_goct_cbr = orig_dw
    csnet_mod.simplified_goct_cbr = orig_dw

    import sod100k_tpu.ops.resample as rs
    orig_up = rs.upsample_bilinear

    def nearest(x, f):
        if f == 1:
            return x
        return jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)

    rs.upsample_bilinear = nearest
    goct.upsample_bilinear = nearest
    timeit("nearest-upsample", lambda x: csnet_apply(p, x, lc, ApplyCtx()), x0)
    rs.upsample_bilinear = orig_up
    goct.upsample_bilinear = orig_up


def dwlayout():
    C, H, W = 24, 224, 224
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C), dtype=np.float32), jnp.bfloat16)
    x_nhwc = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32), jnp.bfloat16)
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    w_oihw = jnp.transpose(w, (3, 2, 0, 1))

    def dw_nhwc(x):
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn,
                                        feature_group_count=C,
                                        preferred_element_type=jnp.float32
                                        ).astype(x.dtype)

    def dw_nchw(x):
        dn = lax.conv_dimension_numbers(x.shape, w_oihw.shape,
                                        ("NCHW", "OIHW", "NCHW"))
        return lax.conv_general_dilated(x, w_oihw, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn,
                                        feature_group_count=C,
                                        preferred_element_type=jnp.float32
                                        ).astype(x.dtype)

    def dw_shift(x):  # NCHW via 9 shifted adds on (H, W) planes (VPU-native)
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        out = jnp.zeros_like(x, dtype=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = w_oihw[:, 0, dy, dx].reshape(1, C, 1, 1).astype(jnp.float32)
                out = out + xp[:, :, dy:dy + H, dx:dx + W].astype(jnp.float32) * tap
        return out.astype(x.dtype)

    for tag, fn, x in [("dw NHWC (C lanes)", dw_nhwc, x_nhwc),
                       ("dw NCHW (W lanes)", dw_nchw, x_nchw),
                       ("dw shift-FMA NCHW", dw_shift, x_nchw)]:
        def body(v, _):
            y = fn(v)
            return v + y.mean().astype(v.dtype) * 1e-6, ()

        run = jax.jit(lambda v, body=body: jnp.sum(
            lax.scan(body, v, None, length=K)[0].astype(jnp.float32)))
        timeit(tag, run, x)


def scatter():
    """Why metrics/salmetric.py avoids .at[].add: TPU scatters serialize.
    Measured (r2): scatter 354 ms vs compare-scan 7 ms on (128,400,400)."""
    Bb, H, W = 128, 400, 400
    rng = np.random.default_rng(0)
    sal = jnp.asarray(rng.integers(0, 256, (Bb, H, W)).astype(np.float32))
    mask = jnp.ones((Bb, H, W), jnp.float32)

    @jax.jit
    def hist_scatter(s, m):
        idx = s.astype(jnp.int32).reshape(Bb, -1)
        h = jnp.zeros((Bb, 256), jnp.float32)
        h = h.at[jnp.arange(Bb)[:, None], idx].add(m.reshape(Bb, -1))
        return jnp.sum(h)

    @jax.jit
    def counts_scan(s, m):
        fs, fm = s.reshape(Bb, -1), m.reshape(Bb, -1)

        def chunk(_, th_c):
            gt = fs[:, :, None] > th_c[None, None, :]
            return None, jnp.sum(jnp.where(gt, fm[:, :, None], 0.0), axis=1)

        _, a = lax.scan(chunk, None,
                        jnp.arange(256, dtype=jnp.float32).reshape(-1, 16))
        return jnp.sum(a)

    for tag, fn in [("scatter hist", hist_scatter),
                    ("compare-scan counts", counts_scan)]:
        float(fn(sal, mask))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(sal, mask))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {max(best - RPC, 0.0) * 1e3:.1f} ms/batch128 "
              "(0.0 = below tunnel-RPC noise)", flush=True)


def trainb():
    """bf16 train-step batch sweep. Measured (r2): B=128 525 img/s is the
    sweet spot; B=192 338, B=256 459 — XLA tiling aligns at 128."""
    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.train.optim import make_adam_dwd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    lc = init_layers(40, [0.5, 0.5])
    trainable, state = partition(
        jax.tree.map(jnp.asarray, csnet_init(jax.random.key(0), lc)))
    tx = make_adam_dwd(trainable, weight_decay=5e-3)
    rng = np.random.default_rng(0)
    for Bb in (64, 128, 192, 256):
        step = make_train_step(lc, tx, flops_weight=3.0, flops_expand=2.0,
                               batch_size=Bb, compute_dtype=jnp.bfloat16)
        batch = {"image": jnp.asarray(
                     rng.standard_normal((Bb, 224, 224, 3)), jnp.float32),
                 "target": jnp.asarray(
                     (rng.random((Bb, 224, 224, 1)) > 0.5), jnp.float32)}
        carry = jax.tree.map(lambda a: jnp.array(a, copy=True),
                             (trainable, state, tx.init(trainable)))

        def once(c):
            t, s, o = c
            t, s, o, _ = step(t, s, o, batch, jnp.float32(1e-4),
                              jnp.float32(1.0))
            return (t, s, o)

        carry = once(carry)
        float(np.asarray(jax.tree.leaves(carry)[0]).ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                carry = once(carry)
            float(np.asarray(jax.tree.leaves(carry)[0]).ravel()[0])
            best = min(best, (time.perf_counter() - t0 - RPC) / 4)
        print(f"train step bf16 B={Bb}: {best * 1e3:.1f} ms = "
              f"{Bb / best:.0f} img/s", flush=True)


def _best_ms(run, x0, k=K):
    """Best of 3 of a K-chained jitted program, tunnel-RPC subtracted."""
    float(run(x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    return (best - RPC) / k * 1e3


def _cost(fn, *args):
    """(flops, bytes accessed) of the compiled program, nan if unavailable."""
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return (float(c.get("flops", np.nan)),
                float(c.get("bytes accessed", np.nan)))
    except Exception:
        return float("nan"), float("nan")


# v5e single-chip peaks (public: 197 bf16 TFLOP/s, 819 GB/s HBM)
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BW = 819e9


def csf(arch: str = "res2net50"):
    """CSF+Res2Net @336 single-chip characterization (`csf [res2net101]`
    picks the backbone; default res2net50): why is the train
    micro-step's throughput flat ~330 img/s from B=8 to B=32, and how much
    MFU headroom does batched inference have? Reports measured ms + compiled
    FLOPs / bytes (XLA cost_analysis) per program variant -> MFU and HBM-BW
    utilization against v5e peaks, plus a DCE-truncated per-stage backbone
    decomposition (consuming only stage k's output dead-code-eliminates the
    rest)."""
    from sod100k_tpu.arch.csf_res2net import (
        csf_apply,
        csf_init,
        res2net_features,
    )
    from sod100k_tpu.train.csf_step import (
        csf_partition,
        make_csf_optimizer,
        make_csf_train_step,
    )

    params = csf_init(jax.random.key(3), backbone=arch)
    p16 = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    rng = np.random.default_rng(3)

    def report(tag, ms, n_img, fl, by):
        mfu = fl / (ms * 1e-3) / V5E_PEAK_FLOPS * 100
        bwu = by / (ms * 1e-3) / V5E_PEAK_BW * 100
        print(f"{tag}: {ms:.2f} ms = {n_img / (ms * 1e-3):.0f} img/s | "
              f"{fl / 1e9:.0f} GF -> {mfu:.1f}% MFU | "
              f"{by / 1e9:.2f} GB -> {bwu:.0f}% BW", flush=True)

    # --- batched bf16 inference sweep -------------------------------------
    for Bb in (1, 8, 32, 64):
        x = jnp.asarray(rng.standard_normal(
            (Bb, 336, 336, 3), dtype=np.float32), jnp.bfloat16)
        fwd = lambda v: csf_apply(p16, v, arch)  # noqa: E731
        ms = _best_ms(scan_run(fwd, x), x)
        # _cost is on the single (un-scanned) forward: do NOT divide by K —
        # _best_ms already reports per-iteration time.
        fl, by = _cost(lambda v: jax.nn.sigmoid(fwd(v)), x)
        report(f"infer bf16 B={Bb}", ms, Bb, fl, by)

    # --- per-stage backbone decomposition at B=32 --------------------------
    Bb = 32
    x = jnp.asarray(rng.standard_normal(
        (Bb, 336, 336, 3), dtype=np.float32), jnp.bfloat16)
    prev_ms, prev_fl = 0.0, 0.0
    for k in range(4):
        trunc = lambda v, k=k: res2net_features(p16["base"], v, arch)[k]  # noqa: E731
        ms = _best_ms(scan_run(trunc, x), x)
        fl, _ = _cost(trunc, x)
        print(f"backbone through stage{k + 1} B={Bb}: {ms:.2f} ms "
              f"(stage{k + 1} alone {ms - prev_ms:.2f} ms, "
              f"{(fl - prev_fl) / 1e9:.0f} GF, "
              f"{(fl - prev_fl) / max(ms - prev_ms, 1e-9) / 1e-3 / V5E_PEAK_FLOPS * 100:.1f}% MFU)",
              flush=True)
        prev_ms, prev_fl = ms, fl
    full = lambda v: csf_apply(p16, v, arch)  # noqa: E731
    ms_full = _best_ms(scan_run(full, x), x)
    print(f"full B={Bb}: {ms_full:.2f} ms "
          f"(CSF head alone ~{ms_full - prev_ms:.2f} ms)", flush=True)

    # --- train micro-step B=8/B=32 bf16: measured vs cost model ------------
    # remat A/B: recomputing the forward during backward (nothing_saveable)
    # was the natural hypothesis for a BW-bound low-MFU step — measured, it
    # LOSES (B=32: 127 vs 98 ms) because the recomputed activations spill
    # back to HBM instead of staying in VMEM, adding traffic. Kept as the
    # regression check for that conclusion.
    trainable, state = csf_partition(params)
    for Bb, remat in ((8, False), (32, False), (8, True), (32, True)):
        tx = make_csf_optimizer(iter_size=10)
        step = make_csf_train_step(tx, backbone=arch, iter_size=10,
                                   batch_size=Bb,
                                   compute_dtype=jnp.bfloat16, remat=remat)
        batch = {
            "image": jnp.asarray(rng.standard_normal(
                (Bb, 336, 336, 3), dtype=np.float32)),
            "target": jnp.asarray(
                (rng.random((Bb, 336, 336, 1)) > 0.5).astype(np.float32)),
        }
        opt_state = tx.init(trainable)

        def once(c):
            t, o = c
            t, o, _ = step(t, state, o, batch, jnp.float32(5e-5))
            return (t, o)

        carry = jax.tree.map(lambda a: jnp.array(a, copy=True),
                             (trainable, opt_state))
        carry = once(carry)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                carry = once(carry)
            float(np.asarray(jax.tree.leaves(carry)[0]).ravel()[0])
            best = min(best, (time.perf_counter() - t0 - RPC) / 4)
        fl, by = _cost(lambda t, s, o, b: step(t, s, o, b, jnp.float32(5e-5)),
                       trainable, state, opt_state, batch)
        tag = "remat" if remat else "plain"
        report(f"train micro-step bf16 B={Bb} [{tag}]", best * 1e3, Bb, fl, by)


if __name__ == "__main__":
    {"ablate": ablate, "dwlayout": dwlayout, "scatter": scatter,
     "trainb": trainb, "csf": csf}[sys.argv[1]](*sys.argv[2:])
