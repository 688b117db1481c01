"""Perf-regression guard: fail when a flagship measured number regresses.

Usage:
  python tools/bench_check.py                # run bench.py, compare flagship
  python tools/bench_check.py --extras       # also regenerate the guarded
                                             # bench_extras rows and compare
                                             # (only THIS run's fresh
                                             # entries, never stale file rows)
  python tools/bench_check.py --extras-json bench_extras.json
                                             # compare an already-fresh file
  python tools/bench_check.py --tolerance 0.15

Reference values live in tools/bench_reference.json (recorded from real-TPU
runs; regenerate with --record after an intentional perf change). A row
fails when fresh < (1 - tolerance) * recorded. Off-TPU the check SKIPs
(exit 0) — these numbers are only meaningful on the real chip; pass
--force to compare anyway.

This makes the measured tables load-bearing (VERDICT r2 weak item 3): a
refactor that halves a row now fails one command instead of silently
shipping.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_PATH = os.path.join(REPO, "tools", "bench_reference.json")

# rows worth guarding (flagship + one per subsystem); keys must match the
# bench_extras.json metric names
GUARDED_EXTRAS = [
    "csnet_l_x2_224_train_step_img_per_sec[f32,B=128]",
    "csnet_l_x2_224_train_step_img_per_sec[bf16,B=128]",
    "csnet_l_x2_224_e2e_train_img_per_sec[resident_preprocess,bf16,B=128]",
    "csnet_l_x2_224_infer_latency_ms[bf16,B=1]",
    "csf_res2net50_336_train_microstep_ms[bf16,B=8]",
    "csf_res2net50_336_infer_img_per_sec[bf16,B=32]",
    "csf_res2net101_336_train_microstep_ms[bf16,B=8]",
    "csf_res2net101_336_infer_img_per_sec[bf16,B=32]",
    "csnet_l_x2_224_serving_artifact_img_per_sec[bf16,B=128]",
    "csnet_l_x2_resident_testall_img_per_sec[bf16,B=128,n=512]",
]
# for these, LOWER is better (latencies); everything else is a throughput
LOWER_IS_BETTER = ("_latency_ms", "_microstep_ms", "_ms[")


def on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def run_bench() -> dict:
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        raise SystemExit(f"bench.py failed:\n{out.stdout}\n{out.stderr}")
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"bench.py printed no JSON line:\n{out.stdout}")


def lower_is_better(metric: str) -> bool:
    return any(tag in metric for tag in LOWER_IS_BETTER)


def compare(metric: str, fresh: float, ref: float, tol: float) -> tuple[bool, str]:
    if lower_is_better(metric):
        ok = fresh <= ref * (1.0 + tol)
        rel = fresh / ref - 1.0
        word = "slower" if rel > 0 else "faster"
    else:
        ok = fresh >= ref * (1.0 - tol)
        rel = fresh / ref - 1.0
        word = "faster" if rel > 0 else "slower"
    status = "OK  " if ok else "FAIL"
    return ok, (f"{status} {metric}: fresh {fresh:g} vs recorded {ref:g} "
                f"({abs(rel) * 100:.1f}% {word}, tolerance {tol * 100:.0f}%)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tolerance", type=float, default=0.15)
    ap.add_argument("--extras", action="store_true",
                    help="regenerate the guarded bench_extras rows "
                         "(tools/bench_extras.py, slow) and compare them too")
    ap.add_argument("--extras-json", default="",
                    help="compare rows from an existing fresh "
                         "bench_extras.json instead of regenerating")
    ap.add_argument("--record", action="store_true",
                    help="write the fresh numbers as the new reference")
    ap.add_argument("--force", action="store_true",
                    help="run the comparison even off-TPU")
    args = ap.parse_args()

    if not on_tpu() and not args.force:
        print("bench_check: SKIP (no TPU attached; recorded numbers are "
              "real-chip measurements). Pass --force to compare anyway.")
        return

    ref = {}
    if os.path.isfile(REF_PATH):
        ref = json.load(open(REF_PATH))

    fresh: dict[str, float] = {}
    b = run_bench()
    fresh[b["metric"]] = float(b["value"])
    print(f"bench.py: {b['metric']} = {b['value']}")

    extras_path = args.extras_json
    rows = None
    if args.extras and not extras_path:
        # compare ONLY this run's regenerated entries (bench_extras prints
        # them as a JSON list on stdout) — never the merged bench_extras.json,
        # whose rows for skipped sections are stale recordings, not fresh
        # measurements. --skip-e2e-test drops the only sections with no
        # guarded row (JPEG/PNG host-codec e2e, slow and tunnel-bound).
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_extras.py"),
             "--skip-e2e-test"], cwd=REPO, check=True,
            stdout=subprocess.PIPE, text=True)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("["):
                rows = {e["metric"]: float(e["value"])
                        for e in json.loads(line)}
                break
        if rows is None:
            raise SystemExit("bench_extras.py printed no JSON entry list")
    elif extras_path:
        rows = {e["metric"]: float(e["value"])
                for e in json.load(open(extras_path))["entries"]}
    if rows is not None:
        for m in GUARDED_EXTRAS:
            if m in rows:
                fresh[m] = rows[m]
            else:
                print(f"WARN {m}: not regenerated — not compared")

    if args.record:
        merged = {**ref, **fresh}
        with open(REF_PATH, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"recorded {len(fresh)} rows into {REF_PATH}")
        return

    failures = 0
    for metric, value in fresh.items():
        if metric not in ref:
            print(f"WARN {metric}: no recorded reference (run --record)")
            continue
        ok, msg = compare(metric, value, ref[metric], args.tolerance)
        print(msg)
        failures += 0 if ok else 1
    if failures:
        raise SystemExit(f"bench_check: {failures} row(s) regressed beyond "
                         f"{args.tolerance * 100:.0f}%")
    print("bench_check: all guarded rows within tolerance")


if __name__ == "__main__":
    main()
