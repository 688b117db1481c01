"""Multi-chip scaling plan from compiled evidence, no slice required.

The container exposes ONE real TPU chip, so slice scaling can't be measured
directly. What CAN be produced — and checked by anyone — is the complete
communication story of the real sharded programs: this tool compiles the
PRODUCT train steps (the same make_train_step / make_csf_train_step +
parallel.mesh shardings every CLI uses) over virtual n-device meshes,
inventories the collectives XLA GSPMD inserted from the optimized HLO
(gradient/BN all-reduces, spatial halo collective-permutes), and folds the
byte counts into the measured single-chip step times (tools/
bench_reference.json) with an explicit ICI model to predict weak-scaling
efficiency per mesh shape.

Model (all constants visible, override via flags):
  t_ici(all-reduce)  = 2 * (n-1)/n * bytes / ICI_BW   (bidirectional ring)
  t_ici(halo)        = permute bytes / ICI_BW          (neighbor exchange)
  efficiency(weak)   = t_step / (t_step + t_ici)
with ICI_BW defaulting to 4.5e10 B/s per link direction (v5e-class ICI; the
point is the shape of the table, not the third digit — pass --ici-bw for
other fabrics). Per-device batch is held at the measured single-chip batch
(weak scaling), matching how the resident/e2e recipes scale out.

Usage:
  python tools/mesh_plan.py                    # CSNet flagship + CSF, default meshes
  python tools/mesh_plan.py --family csf --meshes 4x1,2x2,8x1,4x2
  python tools/mesh_plan.py --tiny             # small shapes (CI-speed)

Compiles on a virtual CPU mesh (self-bootstraps like __graft_entry__'s
dry-run when fewer devices are visible). Collective inventories are exact
properties of the compiled SPMD program; only the time model is a model.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# sync collective forms only: this tool compiles on the CPU backend (the
# virtual mesh), where GSPMD emits plain all-reduce/collective-permute/...
# ops. Async '-start' forms (TPU backends) carry tuple-of-(operand, result
# [, contexts]) shapes that would double-count bytes — run_plan asserts the
# CPU backend instead of guessing. The tuple branch tolerates one level of
# nested parens (TPU tiled layouts like {1,0:T(8,128)}).
_COLLECTIVE_RE = re.compile(
    r"=\s+((?:\((?:[^()]|\([^()]*\))*\)|[a-z0-9]+\[[^\]]*\]\S*))\s+"
    r"(all-reduce|collective-permute|all-gather|reduce-scatter|all-to-all)"
    r"\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    """Bytes of an HLO result shape ('f32[3,3,16]{...}' or a tuple)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_text):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue  # e.g. token[] / opaque
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_inventory(hlo_text: str) -> dict:
    """{op name: {"count": int, "bytes": int}} over an optimized HLO module.

    Bytes are PER-DEVICE program bytes (SPMD: the module is the per-device
    program, so an all-reduce's result shape is the full replicated tensor
    and a halo permute's shape is the per-shard boundary slice)."""
    inv: dict = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        op = m.group(2)
        e = inv.setdefault(op, {"count": 0, "bytes": 0})
        e["count"] += 1
        e["bytes"] += _shape_bytes(m.group(1))
    return inv


def _mesh(data: int, spatial: int):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    need = data * spatial
    devs = jax.devices()[:need]
    if spatial > 1:
        return Mesh(np.asarray(devs).reshape(data, spatial),
                    ("data", "spatial"))
    return Mesh(np.asarray(devs), ("data",))


def _sds(shape, dtype, sharding):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)


def lower_csnet_step(mesh, *, per_dev_batch: int, hw: int, width: int):
    """Lower the PRODUCT CSNet train step (full recipe: dynamic-wd loss,
    Adam groups, BN stats) over `mesh` with the product feed shardings;
    returns optimized HLO text. Shapes are abstract — nothing allocates."""
    import jax
    import jax.numpy as jnp

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.parallel.mesh import feed_sharding, replicated
    from sod100k_tpu.train.optim import make_adam_dwd
    from sod100k_tpu.train.params import partition
    from sod100k_tpu.train.step import make_train_step

    lc = init_layers(width, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    trainable, state = partition(params)
    tx = make_adam_dwd(trainable, weight_decay=5e-3)
    opt_state = tx.init(trainable)
    B = per_dev_batch * mesh.shape["data"]
    step = make_train_step(lc, tx, flops_weight=3.0, flops_expand=2.0,
                           batch_size=B, donate=False)

    rep = replicated(mesh)
    bsh = feed_sharding(mesh, 4)
    abstract = lambda tree: jax.tree.map(  # noqa: E731
        lambda a: _sds(a.shape, a.dtype, rep), tree)
    batch = {"image": _sds((B, hw, hw, 3), jnp.float32, bsh),
             "target": _sds((B, hw, hw, 1), jnp.float32, bsh)}
    lowered = jax.jit(step).lower(
        abstract(trainable), abstract(state), abstract(opt_state), batch,
        _sds((), jnp.float32, rep), _sds((), jnp.float32, rep))
    n_grad = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(trainable))
    return lowered.compile().as_text(), 4 * n_grad


def lower_csf_step(mesh, *, per_dev_batch: int, hw: int,
                   iter_size: int = 10, arch: str = "res2net50"):
    """Lower the PRODUCT CSF micro-step (summed grad accumulation, frozen
    BN) over `mesh`; returns (optimized HLO text, grad bytes).

    ``iter_size=1`` is the FOLDED schedule: because the loss sums BCE over
    samples / (iter_size*batch) and the frozen-BN forward has no cross-
    sample coupling, K micro-steps of batch b are mathematically identical
    to one step of batch K*b (tests/test_csf_train.py::
    test_csf_iter_size_folds_into_batch) — and the folded program pays ONE
    gradient all-reduce per optimizer step instead of K."""
    import jax
    import jax.numpy as jnp

    from sod100k_tpu.arch.csf_res2net import csf_init
    from sod100k_tpu.parallel.mesh import (
        check_spatial_extent,
        feed_sharding,
        replicated,
    )
    from sod100k_tpu.train.csf_step import (
        csf_partition,
        make_csf_optimizer,
        make_csf_train_step,
    )

    spatial = mesh.shape.get("spatial", 1)
    check_spatial_extent(hw, 16, spatial, what="csf")
    params = csf_init(jax.random.key(1), backbone=arch)
    trainable, state = csf_partition(params)
    tx = make_csf_optimizer(iter_size=iter_size)
    opt_state = tx.init(trainable)
    B = per_dev_batch * mesh.shape["data"]
    step = make_csf_train_step(tx, backbone=arch, iter_size=iter_size,
                               batch_size=B, donate=False)

    rep = replicated(mesh)
    bsh = feed_sharding(mesh, 4)
    abstract = lambda tree: jax.tree.map(  # noqa: E731
        lambda a: _sds(a.shape, a.dtype, rep), tree)
    batch = {"image": _sds((B, hw, hw, 3), jnp.float32, bsh),
             "target": _sds((B, hw, hw, 1), jnp.float32, bsh)}
    lowered = jax.jit(step).lower(
        abstract(trainable), abstract(state), abstract(opt_state), batch,
        _sds((), jnp.float32, rep))
    n_grad = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(trainable))
    return lowered.compile().as_text(), 4 * n_grad


import numpy as np  # noqa: E402  (used by the lower_* helpers)


def predict(inv: dict, n_devices: int, step_ms: float,
            ici_bw: float) -> dict:
    """Fold a collective inventory into the ICI ring model: all-reduce
    moves 2(n-1)/n of its bytes per device (reduce-scatter + all-gather
    halves), single-phase collectives (all-gather, reduce-scatter,
    all-to-all) (n-1)/n, and collective-permute (halo exchange) is a
    neighbor transfer of its own bytes."""
    b = lambda k: inv.get(k, {"bytes": 0})["bytes"]  # noqa: E731
    ring2 = 2.0 * (n_devices - 1) / n_devices
    ring1 = (n_devices - 1) / n_devices
    t = (ring2 * b("all-reduce")
         + ring1 * (b("all-gather") + b("reduce-scatter") + b("all-to-all"))
         + b("collective-permute")) / ici_bw
    t_ici_ms = t * 1e3
    eff = step_ms / (step_ms + t_ici_ms) if step_ms else float("nan")
    return {"allreduce_mb": b("all-reduce") / 2**20,
            "halo_mb": b("collective-permute") / 2**20,
            "t_ici_ms": t_ici_ms, "weak_scaling_eff": eff}


# measured single-chip PER-IMAGE times for the weak-scaling prediction
# (tools/bench_reference.json rows). The per-dispatch compute time scales
# linearly with the per-device batch — measured flat img/s across batch for
# both families (CLAUDE.md / DESIGN §7d), so the extrapolation is safe.
_MEASURED = {
    "csnet": ("csnet_l_x2_224_train_step_img_per_sec[bf16,B=128]",
              lambda v: 1e3 / v),  # img/s -> ms/img
    "csf/res2net50": ("csf_res2net50_336_train_microstep_ms[bf16,B=8]",
                      lambda v: v / 8.0),
    "csf/res2net101": ("csf_res2net101_336_train_microstep_ms[bf16,B=8]",
                       lambda v: v / 8.0),
}


def _measured_per_img_ms(family: str, arch: str) -> float:
    import json

    with open(os.path.join(REPO, "tools", "bench_reference.json")) as f:
        ref = json.load(f)
    key, to_ms = _MEASURED[family if family == "csnet" else f"csf/{arch}"]
    return to_ms(ref[key])


# (family, schedule label, per-device batch per dispatch, kwargs)
def _schedules(family: str, tiny: bool) -> list:
    if family == "csnet":
        per_dev, hw, width = (2, 32, 8) if tiny else (128, 224, 40)
        return [("", per_dev,
                 dict(per_dev_batch=per_dev, hw=hw, width=width))]
    per_dev, hw = (2, 96) if tiny else (8, 336)
    # reference schedule: iter_size accumulation -> one all-reduce PER
    # MICRO-STEP; folded schedule: same math (tested), one per optimizer
    # step, so the dispatch covers iter_size x the images
    return [("micro-step (iter_size=10)", per_dev,
             dict(per_dev_batch=per_dev, hw=hw, iter_size=10)),
            ("folded (iter->batch)", per_dev * 10,
             dict(per_dev_batch=per_dev * 10, hw=hw, iter_size=1))]


def run_plan(family: str, meshes: list, *, tiny: bool,
             ici_bw: float, arch: str = "res2net50", log=print) -> list:
    import jax

    # the inventory parser handles the CPU backend's SYNC collective forms
    # (see _COLLECTIVE_RE); async '-start' tuples would be double-counted
    assert jax.devices()[0].platform == "cpu", \
        "mesh_plan compiles on the virtual CPU mesh (run via main())"
    rows = []
    lower = lower_csnet_step if family == "csnet" else lower_csf_step
    for label, per_dev_imgs, kwargs in _schedules(family, tiny):
        if family == "csf":
            kwargs = dict(kwargs, arch=arch)
        for d, s in meshes:
            n = d * s
            txt, grad_bytes = lower(_mesh(d, s), **kwargs)
            inv = collective_inventory(txt)
            step_ms = (float("nan") if tiny
                       else _measured_per_img_ms(family, arch) * per_dev_imgs)
            p = predict(inv, n, step_ms, ici_bw)
            name = (f"{family} {label}".strip() if family == "csnet"
                    else f"{family}[{arch}] {label}".strip())
            rows.append({"family": family, "schedule": label,
                         **({"arch": arch} if family == "csf" else {}),
                         "mesh": f"{d}x{s}", "devices": n,
                         "grad_mb": grad_bytes / 2**20,
                         "inventory": inv, **p, "step_ms": step_ms})
            counts = ", ".join(
                f"{k} x{v['count']} ({v['bytes'] / 2**20:.2f} MB)"
                for k, v in sorted(inv.items()))
            log(f"{name} mesh {d}x{s}: {counts or 'no collectives'}")
            log(f"  grad bytes {rows[-1]['grad_mb']:.2f} MB | ICI "
                f"{p['t_ici_ms']:.3f} ms vs compute {step_ms:.1f} ms "
                f"({per_dev_imgs} img/device/dispatch) -> "
                f"weak-scaling eff {p['weak_scaling_eff'] * 100:.2f}%")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--family", choices=("csnet", "csf", "both"),
                    default="both")
    ap.add_argument("--meshes", default="4x1,8x1,4x2,8x2")
    ap.add_argument("--tiny", action="store_true",
                    help="small shapes (fast compiles; no time prediction)")
    ap.add_argument("--ici-bw", type=float, default=4.5e10,
                    help="ICI bytes/s per link direction (model constant)")
    ap.add_argument("--arch", choices=("res2net50", "res2net101", "both"),
                    default="both",
                    help="CSF backbone(s) to plan (csnet ignores this)")
    ap.add_argument("--json", default="",
                    help="also write the rows (inventories + predictions) "
                         "to this JSON file")
    args = ap.parse_args()
    meshes = [tuple(int(v) for v in m.split("x"))
              for m in args.meshes.split(",")]
    need = max(d * s for d, s in meshes)

    import jax

    if len(jax.devices()) < need or jax.devices()[0].platform != "cpu":
        # self-bootstrap onto a virtual CPU mesh (same recipe as
        # __graft_entry__._reexec_on_virtual_cpu_mesh)
        env = dict(os.environ)
        keep = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                if p and "axon" not in p]
        env["PYTHONPATH"] = os.pathsep.join([REPO] + keep)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                         if "device_count" not in f)
        env["XLA_FLAGS"] = \
            f"{flags} --xla_force_host_platform_device_count={need}".strip()
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env, cwd=REPO).returncode)

    # persistent compile cache: the non-tiny plan compiles recipe-shape
    # programs on the single host core — reruns must hit the cache
    # (CLAUDE.md "enable it in any heavy script")
    from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      hygienic_cache_dir(os.path.join(REPO, ".jax_cache")))

    rows = []
    for family in (("csnet", "csf") if args.family == "both"
                   else (args.family,)):
        archs = (("res2net50",) if family == "csnet"
                 else (("res2net50", "res2net101") if args.arch == "both"
                       else (args.arch,)))
        for arch in archs:
            rows += run_plan(family, meshes, tiny=args.tiny,
                             ici_bw=args.ici_bw, arch=arch)
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump({"ici_bw": args.ici_bw, "rows": rows}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
