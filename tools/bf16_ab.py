"""bf16-vs-f32 training numerics A/B (CLAUDE.md roadmap item 4) -> docs/BF16_AB.md.

Same seed, same synthetic batches, full dynamic-weight-decay recipe
(csnet-L-x2 seed arch, B=24, lr 1e-4, penalty weight 3.0) trained for
--steps steps in f32 and in bf16-compute (mixed precision: bf16 activations,
f32 params/BN/loss/optimizer). Reports:

- loss / penalty trajectories (every --log-every steps),
- BN-gamma agreement: max|gamma_f32 - gamma_bf16|, rank correlation,
- pruning-decision agreement at quantile thresholds of the trained f32
  gammas (q20/q30/q50): identical layer_config yes/no + per-channel mask
  agreement %.

The pass/fail version of this study is tests/test_train.py::
test_bf16_training_prunes_same_architecture_as_f32 (gates arch equality on
the small fixture); this tool generates the full-size documented table.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli.common import enable_compile_cache  # noqa: E402

enable_compile_cache()


def gammas_of(params) -> np.ndarray:
    return np.concatenate([
        np.asarray(leaf, np.float64).ravel()
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if "bns" in jax.tree_util.keystr(path)
        and jax.tree_util.keystr(path).endswith("['scale']")])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--basewidth", type=int, default=40)
    args = ap.parse_args()

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.prune.finetune import prune
    from sod100k_tpu.train.optim import make_adam_dwd
    from sod100k_tpu.train.params import merge, partition
    from sod100k_tpu.train.step import make_train_step

    lc = init_layers(args.basewidth, [0.5, 0.5])
    rng = np.random.default_rng(0)
    batches = [
        {"image": jnp.asarray(rng.standard_normal(
            (args.batch, args.hw, args.hw, 3), dtype=np.float32)),
         "target": jnp.asarray((rng.random(
             (args.batch, args.hw, args.hw, 1)) > 0.5).astype(np.float32))}
        for _ in range(min(args.steps, 8))  # cycle a fixed pool
    ]

    def train(compute_dtype, tag):
        params = csnet_init(jax.random.key(7), lc)
        trainable, state = partition(params)
        tx = make_adam_dwd(trainable, weight_decay=5e-3)
        opt_state = tx.init(trainable)
        step = make_train_step(lc, tx, flops_weight=3.0, flops_expand=2.0,
                               batch_size=args.batch,
                               compute_dtype=compute_dtype)
        curve = []
        for i in range(args.steps):
            trainable, state, opt_state, m = step(
                trainable, state, opt_state, batches[i % len(batches)],
                jnp.float32(1e-4), jnp.float32(1.0))
            if (i + 1) % args.log_every == 0 or i == args.steps - 1:
                curve.append((i + 1, float(m["loss"]), float(m["penalty"])))
                print(f"# {tag} step {i + 1}: loss {curve[-1][1]:.5f} "
                      f"penalty {curve[-1][2]:.2f}", file=sys.stderr)
        return merge(jax.tree.map(np.asarray, trainable),
                     jax.tree.map(np.asarray, state)), curve

    p32, c32 = train(None, "f32")
    p16, c16 = train(jnp.bfloat16, "bf16")

    g32, g16 = gammas_of(p32), gammas_of(p16)

    def rank_corr(a, b):
        ra = np.argsort(np.argsort(a)).astype(np.float64)
        rb = np.argsort(np.argsort(b)).astype(np.float64)
        ra -= ra.mean()
        rb -= rb.mean()
        return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))

    lines = []
    lines.append("# bf16-vs-f32 training numerics A/B\n")
    lines.append(f"csnet-L-x2 seed arch (basewidth {args.basewidth}), "
                 f"B={args.batch} @{args.hw}px, {args.steps} steps, lr 1e-4, "
                 "dynamic-wd penalty weight 3.0, identical seed/batches. "
                 "Mixed precision = bf16 activations, f32 params/BN/loss/"
                 "optimizer. Regenerate: `python tools/bf16_ab.py`.\n")
    lines.append("\n## Loss / penalty trajectories\n")
    lines.append("| step | loss f32 | loss bf16 | penalty f32 | penalty bf16 |")
    lines.append("|---|---|---|---|---|")
    for (s, l32, q32v), (_, l16, q16v) in zip(c32, c16):
        lines.append(f"| {s} | {l32:.5f} | {l16:.5f} | {q32v:.2f} | {q16v:.2f} |")

    lines.append("\n## BN-gamma (pruning signal) agreement\n")
    lines.append(f"- max |gamma_f32 - gamma_bf16| = {np.abs(g32 - g16).max():.3e} "
                 f"(gamma range [{g32.min():.4f}, {g32.max():.4f}])")
    lines.append(f"- rank correlation (Spearman) = {rank_corr(np.abs(g32), np.abs(g16)):.6f}")

    lines.append("\n## Pruning-decision agreement (quantile thresholds)\n")
    lines.append("| threshold | kept f32 | kept bf16 | mask agreement | layer_config equal |")
    lines.append("|---|---|---|---|---|")
    for q in (0.2, 0.3, 0.5):
        th = float(np.quantile(np.abs(g32), q))
        _, lcA, mA = prune(p32, lc, th)
        _, lcB, mB = prune(p16, lc, th)
        tot = agree = keptA = keptB = 0
        for ma, mb in zip(mA, mB):
            for ba, bb in zip(ma, mb):
                ba, bb = np.asarray(ba), np.asarray(bb)
                tot += ba.size
                agree += int((ba == bb).sum())
                keptA += int(ba.sum())
                keptB += int(bb.sum())
        lines.append(f"| q{int(q * 100)} = {th:.4g} | {keptA}/{tot} | "
                     f"{keptB}/{tot} | {100.0 * agree / tot:.2f}% | "
                     f"{'yes' if lcA.entries == lcB.entries else 'NO'} |")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "BF16_AB.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
