"""Saliency evaluation driver (counterpart of the reference eval.py).

Usage: python -m cli.eval --config <yml> [--method task] [--range b,e]
                          [--backend device|native]

For each dataset and epoch: pair saliency PNGs (DATA.SAVEDIR/task/{ds}_{e})
with GTs (TEST.DATASET_PATH/{ds}/GT), evaluate MAE / 256-threshold P/R /
F-beta (+ S-measure on the device backend), log per-epoch reports, and track
the best epoch by Max-F (eval.py:34-76 semantics).

Backends:
- "device": on-device histogram reductions (sod100k_tpu.metrics.salmetric),
  batched by padded shape buckets; also reports S-measure.
- "native": the C++ CLI clone via ctypes (same math, no accelerator needed).
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np

from sod100k_tpu.config import get_cfg
from sod100k_tpu.metrics.salmetric import SalMetricAccumulator, format_report


def _pairs(sal_dir: str, gt_dir: str,
           sal_suffix: str = "") -> list[tuple[str, str]]:
    """Pair sal PNGs with same-named GTs; ``sal_suffix`` is stripped from
    the sal stem before matching (e.g. "_sal_fuse" pairs cli.csf test-mode
    dumps `name_sal_fuse.png` with `name.png`/`name.jpg` GTs)."""
    out = []
    for name in sorted(os.listdir(sal_dir)):
        if not name.endswith(".png"):
            continue
        stem = name[:-4]
        if sal_suffix and stem.endswith(sal_suffix):
            stem = stem[:-len(sal_suffix)]
        for ext in (".png", ".jpg", ".bmp"):
            gt = os.path.join(gt_dir, stem + ext)
            if os.path.exists(gt):
                out.append((os.path.join(sal_dir, name), gt))
                break
    return out


def _bucket_hw(h: int, w: int, step: int = 64) -> tuple[int, int]:
    from sod100k_tpu.data.csf_dataset import bucket_hw

    return bucket_hw(h, w, step)


def _png_size(path: str):
    """Header-only (h, w) read — no pixel decode; None when unreadable."""
    from PIL import Image

    try:
        with Image.open(path) as im:
            return im.size[1], im.size[0]
    except Exception:
        return None


def evaluate_pairs_device(pairs, batch: int = 32, with_smeasure: bool = True,
                          with_wfmeasure: bool = False, log=print) -> dict:
    """Shape-bucketed padded batches through the on-device accumulator.

    Bucketing uses header-only size reads (pixels decode per chunk, so
    memory stays bounded at one chunk regardless of dataset size); every
    chunk pads to `batch` images so each bucket compiles exactly one
    shape. Unreadable or size-mismatched pairs are skipped with a warning
    — the native backend (sal_metric.cpp:67-71) skips them too, so both
    backends agree on dirty data."""
    import cv2

    acc = SalMetricAccumulator()
    s_sum, s_n = 0.0, 0
    wf_sum = 0.0
    buckets: dict[tuple[int, int], list] = defaultdict(list)
    for sp, gp in pairs:
        hw = _png_size(sp)
        if hw is None or _png_size(gp) != hw:
            log(f"eval: skipping unreadable/mismatched pair {sp}")
            continue
        buckets[_bucket_hw(*hw)].append((sp, gp))

    from sod100k_tpu.metrics.smeasure import s_measure_batch

    for (bh, bw), items in buckets.items():
        for i in range(0, len(items), batch):
            chunk = items[i:i + batch]
            k = len(chunk)
            # pad to `batch` rows: ONE compiled shape per bucket (trailing
            # rows are all-zero-mask and excluded via count=k / sm[:k])
            sal_p = np.zeros((batch, bh, bw), np.float32)
            gt_p = np.zeros((batch, bh, bw), np.float32)
            m = np.zeros((batch, bh, bw), np.float32)
            skipped = 0
            for j, (sp, gp) in enumerate(chunk):
                sal = cv2.imread(sp, cv2.IMREAD_GRAYSCALE)
                gt = cv2.imread(gp, cv2.IMREAD_GRAYSCALE)
                if sal is None or gt is None or sal.shape != gt.shape:
                    log(f"eval: skipping undecodable pair {sp}")
                    skipped += 1
                    continue
                h, w = sal.shape
                jj = j - skipped
                sal_p[jj, :h, :w] = sal
                gt_p[jj, :h, :w] = gt
                m[jj, :h, :w] = 1
                if with_wfmeasure:
                    # host-side per image (distance transform is sequential
                    # work, a poor TPU fit); unpadded crop on purpose
                    from sod100k_tpu.metrics.wfmeasure import weighted_f_measure

                    wf_sum += weighted_f_measure(sal / 255.0, gt > 128)
            k -= skipped
            if not k:
                continue
            acc.update_batch(sal_p, gt_p, mask=m, count=k)
            if with_smeasure:
                sm = np.asarray(s_measure_batch(
                    sal_p / 255.0, (gt_p > 128).astype(np.float32), m))
                s_sum += float(sm[:k].sum())
                s_n += k
    # reference divisor semantics (sal_metric.cpp:158-162): macro averages
    # divide by the LISTED pair count — skipped/unreadable pairs still
    # count in the denominator — so both backends agree on dirty data
    if acc.n:
        acc.n = len(pairs)
        s_n = len(pairs)
    res = acc.result()
    if with_smeasure and s_n:
        res["s_measure"] = s_sum / s_n
    if with_wfmeasure and acc.n:
        res["weighted_f"] = wf_sum / acc.n
    return res


def evaluate_pairs_native(pairs, num_threads: int = 8) -> dict:
    from sod100k_tpu.metrics.salmetric import BETA2
    from sod100k_tpu.metrics.native import do_evaluation

    sal = [p[0] for p in pairs]
    gt = [p[1] for p in pairs]
    res = do_evaluation(num_threads, sal, gt, print_stdout=False)
    # derive the 256-bin F curve from the returned P/R so the per-epoch
    # FmeasureResult file carries the full reference report on this
    # backend too (sal_metric.cpp:164-175 math)
    p = np.asarray(res["precision"])
    r = np.asarray(res["recall"])
    res["fmeasure"] = ((1 + BETA2) * p * r) / (BETA2 * p + r)
    return res


def _fill_full_native(res: dict, pairs, log) -> None:
    """Host fallback for --suite full on the native backend: the C++ tool
    computes the reference block only; fill the modern metrics from the
    accumulator path (jax-on-CPU) + scipy wF. A pair list where NOTHING
    decodes is handled by the native tool alone (its divisor semantics) —
    skip the fill there instead of crashing on an empty accumulator."""
    try:
        extra = evaluate_pairs_device(pairs, with_wfmeasure=True, log=log)
    except AssertionError:
        log("eval: full-suite fallback skipped — no decodable pairs for "
            "the modern metrics")
        return
    for key in ("adaptive_f", "adaptive_e", "emeasure", "max_e", "mean_e",
                "s_measure", "weighted_f"):
        res[key] = extra[key]


def _report_line(prefix: str, res: dict, full: bool) -> str:
    report = (f"{prefix}: MaxF {res['max_f']:.6f} "
              f"MAE {res['mae']:.6f} MeanF {res['mean_f']:.6f}")
    if "adaptive_f" in res:
        report += f" AdpF {res['adaptive_f']:.6f}"
    if "max_e" in res:
        report += f" MaxE {res['max_e']:.6f}"
    if full and "mean_e" in res:
        report += (f" MeanE {res['mean_e']:.6f}"
                   f" AdpE {res['adaptive_e']:.6f}")
    if "s_measure" in res:
        report += f" S {res['s_measure']:.6f}"
    if "weighted_f" in res:
        report += f" wF {res['weighted_f']:.6f}"
    return report


def run_eval_dirs(sal_dir: str, gt_dir: str, *, backend: str = "device",
                  suite: str = "reference", wfmeasure: bool = False,
                  sal_suffix: str = "", log=print) -> dict:
    """Layout-free evaluation: score ANY saliency-dump directory against
    ANY GT directory (cli.eval --dirs). This is how cli.csf test-mode
    `*_sal_fuse.png` dumps get scored — the reference leaves that to
    external tools (PySODMetrics / the SalMetric CLI); here it is one
    command, with --sal-suffix pairing the suffixed names and --suite full
    available as everywhere else."""
    full = suite == "full"
    if wfmeasure and backend == "native" and not full:
        # never silently drop an explicitly requested metric: the C++ tool
        # computes the reference block only
        raise SystemExit("--wfmeasure is not computed by the native "
                         "backend; use --backend device or --suite full "
                         "(host fallback)")
    pairs = _pairs(sal_dir, gt_dir, sal_suffix=sal_suffix)
    if not pairs:
        raise SystemExit(f"no sal/GT pairs between {sal_dir} and {gt_dir} "
                         f"(sal_suffix={sal_suffix!r})")
    res = (evaluate_pairs_native(pairs) if backend == "native"
           else evaluate_pairs_device(pairs, with_wfmeasure=wfmeasure or full,
                                      log=log))
    if full and backend == "native":
        _fill_full_native(res, pairs, log)
    log(_report_line(f"{os.path.basename(os.path.normpath(sal_dir))} "
                     f"({len(pairs)} pairs)", res, full))
    return res


def run_eval(cfg, epoch_range=(0, 1), method: str | None = None,
             backend: str | None = None, datasets=None,
             wfmeasure: bool = False, suite: str = "reference",
             log=print) -> dict:
    """suite="reference" (default): the per-backend reference surface —
    MaxF/MAE/MeanF (+ the device backend's always-on extras), wF only
    behind `wfmeasure`. suite="full": ONE invocation reports the whole
    modern suite on either backend — MAE, max/mean/adaptive F, max/mean/
    adaptive E, S, wF — with host fallbacks (the jax-on-CPU accumulator +
    scipy wF) filling whatever the native backend doesn't compute. The
    per-epoch FmeasureResult file keeps the 7-line reference contract
    either way (format_report)."""
    if suite not in ("reference", "full"):
        raise SystemExit(f"--suite must be reference|full, got {suite}")
    full = suite == "full"
    method = method or cfg.TASK or cfg.MODEL.ARCH
    backend = backend or cfg.TPU.EVAL_BACKEND
    if backend == "device":
        from .common import enable_compile_cache

        enable_compile_cache()  # metric kernels compile per bucket shape
    datasets = datasets or cfg.TEST.DATASETS
    out_dir = os.path.join(cfg.DATA.SAVEDIR, method)
    os.makedirs(out_dir, exist_ok=True)
    best = {}
    for ds in datasets:
        best_f, best_epoch = 0.0, -1
        flog_path = os.path.join(out_dir, f"FmeasureResults_{ds}.txt")
        with open(flog_path, "a") as flog:
            for epoch in range(*epoch_range):
                sal_dir = os.path.join(out_dir, f"{ds}_{epoch}")
                gt_dir = os.path.join(cfg.TEST.DATASET_PATH, ds, "GT")
                if not os.path.isdir(sal_dir):
                    continue
                pairs = _pairs(sal_dir, gt_dir)
                if not pairs:
                    continue
                # inspectable "salpath gtpath" pair list (eval.py:52-59);
                # also directly consumable by the native salmetric CLI
                with open(os.path.join(out_dir, f"val_{ds}_{epoch}.txt"),
                          "w") as plist:
                    plist.writelines(f"{sp} {gp}\n" for sp, gp in pairs)
                res = (evaluate_pairs_native(pairs) if backend == "native"
                       else evaluate_pairs_device(
                           pairs, with_wfmeasure=wfmeasure or full, log=log))
                if full and backend == "native":
                    _fill_full_native(res, pairs, log)
                report = _report_line(f"epoch {epoch} {ds}", res, full)
                log(report)
                flog.write(report + "\n")
                with open(os.path.join(out_dir,
                                       f"FmeasureResult_{ds}_{epoch}.txt"),
                          "w") as f:
                    if "fmeasure" in res:
                        f.write(format_report(res))
                    else:
                        f.write(report + "\n")
                if res["max_f"] > best_f:
                    best_f, best_epoch = res["max_f"], epoch
        best[ds] = {"max_f": best_f, "epoch": best_epoch}
        log(f"best for {ds}: MaxF {best_f:.6f} @ epoch {best_epoch}")
    return best


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU SOD evaluation")
    parser.add_argument("--config", default=None, metavar="FILE")
    parser.add_argument("--dirs", nargs=2, default=None,
                        metavar=("SAL_DIR", "GT_DIR"),
                        help="layout-free mode: score SAL_DIR's PNGs "
                        "against GT_DIR directly (no config needed) — "
                        "e.g. a cli.csf test_fold with "
                        "--sal-suffix _sal_fuse")
    parser.add_argument("--sal-suffix", default="",
                        help="suffix stripped from sal names before GT "
                        "matching (cli.csf dumps use _sal_fuse)")
    parser.add_argument("--method", default=None)
    parser.add_argument("--range", default="0,1",
                        help="epoch range begin,end (python range semantics)")
    parser.add_argument("--backend", default=None,
                        choices=["device", "native", None])
    parser.add_argument("--wfmeasure", action="store_true",
                        help="also report the weighted F-measure (Margolin "
                        "CVPR'14; device backend only, host-side scipy)")
    parser.add_argument("--suite", default="reference",
                        choices=["reference", "full"],
                        help="'full' reports the whole modern suite from "
                        "one invocation (MAE, max/mean/adaptive F and E, "
                        "S-measure, weighted F) on either backend; "
                        "'reference' keeps the per-backend default surface")
    args = parser.parse_args()
    if args.dirs:
        run_eval_dirs(args.dirs[0], args.dirs[1],
                      backend=args.backend or "device", suite=args.suite,
                      wfmeasure=args.wfmeasure, sal_suffix=args.sal_suffix)
        return
    if not args.config:
        parser.error("--config is required (or use --dirs SAL GT)")
    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if not cfg.TASK:
        cfg.TASK = cfg.MODEL.ARCH
    b, e = (int(v) for v in args.range.split(","))
    run_eval(cfg, epoch_range=(b, e), method=args.method,
             backend=args.backend, wfmeasure=args.wfmeasure,
             suite=args.suite)


if __name__ == "__main__":
    main()
