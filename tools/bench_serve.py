"""End-to-end throughput of the HTTP serving daemon on the attached device.

Exports a recipe-shape CSNet artifact (random init — perf only), starts
cli.serve's server in-process, and drives it closed-loop with concurrent
HTTP clients posting npy batches on the artifact's wire contract. Reports
served img/s against the direct ServingModel() baseline (same artifact, no
HTTP/batching layer), so the daemon's coalescing + transport overhead is
the measured delta.

Honest-timing notes (CLAUDE.md): ServingModel returns np.asarray(...) — a
real value readback — so both numbers are truthful even over the axon
tunnel. On the tunneled single chip the wire (~36 MB/s host->device)
bounds ANY pixel-shipping path at 224^2 (~240 img/s u8); the point of this
tool on that link is the served/direct ratio (daemon overhead), not the
absolute img/s a normally-attached host would see.

Usage:
  python tools/bench_serve.py                 # defaults: 224^2 u8 bf16
  python tools/bench_serve.py --clients 8 --req-batch 16 --secs 15
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _post_npy(url: str, arr: np.ndarray) -> np.ndarray:
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        url + "/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return np.load(io.BytesIO(r.read()))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--width", type=int, default=40,
                    help="CSNet base width (40 = csnet-L-x2 scale)")
    ap.add_argument("--buckets", default="8,32,128")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--wire", default="u8", choices=["u8", "f32"])
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--req-batch", type=int, default=16,
                    help="images per client request")
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--max-wait-ms", type=float, default=3.0)
    ap.add_argument("--json", default="", help="write results here too")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      hygienic_cache_dir(os.path.join(REPO, ".jax_cache")))

    from sod100k_tpu.arch.csnet import csnet_init
    from sod100k_tpu.arch.layer_config import init_layers
    from sod100k_tpu.serve import export_artifact, load_artifact
    from sod100k_tpu.serve_http import make_server

    buckets = [int(b) for b in args.buckets.split(",")]
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    lc = init_layers(args.width, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    with tempfile.TemporaryDirectory() as td:
        print(f"# exporting buckets {buckets} @ {args.hw}^2 "
              f"{args.dtype} wire={args.wire}", flush=True)
        path = export_artifact(os.path.join(td, "art"), "csnet", params, lc,
                               batch=buckets, hw=(args.hw, args.hw),
                               dtype=dtype, wire=args.wire)
        model = load_artifact(path)
        srv = make_server(model, port=0, max_wait_ms=args.max_wait_ms)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"

        rng = np.random.default_rng(0)
        big = max(buckets)
        mk = lambda n: (  # noqa: E731
            rng.integers(0, 256, (n, args.hw, args.hw, 3), dtype=np.uint8)
            if args.wire == "u8" else
            rng.standard_normal((n, args.hw, args.hw, 3)).astype(np.float32))

        # direct baseline: full-bucket calls, value readback included
        xb = mk(big)
        model(xb)  # warm (server warm-up covered the other buckets)
        t0 = time.monotonic()
        iters = 0
        # at least 5 iterations: over the tunnel one full-bucket call is
        # seconds of wire time and a 2-iter window is too noisy to quote
        while iters < 5 or time.monotonic() - t0 < max(3.0, args.secs / 3):
            model(xb)
            iters += 1
        direct = big * iters / (time.monotonic() - t0)
        print(f"# direct ServingModel: {direct:.1f} img/s "
              f"(B={big} x{iters})", flush=True)

        served_images = [0] * args.clients
        failures: list = []
        stop = time.monotonic() + args.secs

        def client(i):
            # failures recorded (not swallowed by the thread): a broken
            # response must fail the benchmark, never just deflate img/s
            try:
                x = mk(args.req_batch)
                while time.monotonic() < stop:
                    out = _post_npy(url, x)
                    if out.shape[0] != args.req_batch:
                        raise AssertionError(
                            f"client {i}: got {out.shape} for a "
                            f"{args.req_batch}-image request")
                    served_images[i] += args.req_batch
            except Exception as e:
                failures.append(e)

        before = srv.batcher.snapshot()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        t0 = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.monotonic() - t0
        if failures:
            for e in failures:
                print(f"# CLIENT FAILED: {type(e).__name__}: {e}",
                      file=sys.stderr)
            raise SystemExit(1)
        s = srv.batcher.snapshot()
        served = sum(served_images) / dt
        disp = s["dispatches"] - before["dispatches"]
        imgs = s["images"] - before["images"]
        row = {"direct_img_per_sec": round(direct, 1),
               "served_img_per_sec": round(served, 1),
               "served_over_direct": round(served / direct, 3),
               "clients": args.clients, "req_batch": args.req_batch,
               "dispatches": disp,
               "mean_dispatch_batch": round(imgs / max(disp, 1), 1),
               "hw": args.hw, "buckets": buckets,
               "wire": args.wire, "dtype": args.dtype,
               "platform": jax.devices()[0].platform}
        print(json.dumps(row))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(row, f, indent=1)
        srv.shutdown()
        srv.batcher.stop()


if __name__ == "__main__":
    main()
