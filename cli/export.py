"""Serving-artifact export driver.

Usage:
  python -m cli.export --config <yml> --out <dir> [--batch N] [--dtype bf16]
      exports the CSNet model named by TEST.MODEL_CONFIG/TEST.CHECKPOINT at
      TEST.IMAGE_H/W (224 when the config uses the ceil-to-16 mode).
  python -m cli.export --family csf --model <ckpt> --arch res2net50 \
      --out <dir> [--size 336]

The artifact (StableHLO + meta.json) loads with sod100k_tpu.serve
.load_artifact anywhere a jax runtime exists — no model code, checkpoint
interop, or layer_config plumbing at serving time.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from sod100k_tpu.serve import export_artifact


def main() -> None:
    ap = argparse.ArgumentParser(description="export a serving artifact")
    ap.add_argument("--config", default=None, metavar="FILE",
                    help="CSNet yml (uses TEST.MODEL_CONFIG/CHECKPOINT)")
    ap.add_argument("--family", default="csnet", choices=["csnet", "csf"])
    ap.add_argument("--model", default=None, help="csf checkpoint path")
    ap.add_argument("--arch", default="res2net50",
                    choices=["res2net50", "res2net101"])
    ap.add_argument("--size", type=int, default=336, help="csf input size")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", default="1",
                    help="batch size or comma list of bucket sizes "
                         "(e.g. 1,32,128); the loaded model routes any "
                         "request batch onto the buckets")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--wire", default="f32", choices=["f32", "u8"],
                    help="u8 = raw uint8 RGB in (normalize fused) and "
                         "trunc(sigmoid*255) uint8 out; 4x less traffic "
                         "both ways when the serving link is the "
                         "bottleneck")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    batch = [int(b) for b in str(args.batch).split(",")]

    if args.family == "csnet":
        if not args.config:
            raise SystemExit("--config required for csnet export")
        from sod100k_tpu.arch.layer_config import LayerConfig
        from sod100k_tpu.config import get_cfg
        from sod100k_tpu.interop.torch_ckpt import load_checkpoint

        cfg = get_cfg()
        cfg.merge_from_file(args.config)
        lc = LayerConfig.load(cfg.TEST.MODEL_CONFIG)
        params, _ = load_checkpoint(cfg.TEST.CHECKPOINT)
        hw = (cfg.TEST.IMAGE_H or 224, cfg.TEST.IMAGE_W or 224)
        out = export_artifact(args.out, "csnet", params, lc,
                              batch=batch, hw=hw, dtype=dtype,
                              wire=args.wire)
    else:
        if not args.model:
            raise SystemExit("--model required for csf export")
        from sod100k_tpu.arch.csf_res2net import csf_init
        from sod100k_tpu.interop.torch_ckpt import load_checkpoint
        from sod100k_tpu.train.params import merge

        params = csf_init(__import__("jax").random.key(0), backbone=args.arch)
        loaded, _ = load_checkpoint(args.model)
        params = merge(params, loaded)
        out = export_artifact(args.out, "csf", params, args.arch,
                              batch=batch, hw=(args.size, args.size),
                              dtype=dtype, wire=args.wire)
    print(f"exported serving artifact to {out}")


if __name__ == "__main__":
    main()
