"""Serve a deployment artifact over HTTP with dynamic micro-batching.

Usage:
  python -m cli.export ... --out art/            # make the artifact
  python -m cli.serve --artifact art/ --port 8000 [--mesh_devices 0]

Then:
  curl -s localhost:8000/healthz
  curl -s --data-binary @dog.jpg -H 'Content-Type: image/jpeg' \
       localhost:8000/predict > saliency.png
  curl -s localhost:8000/stats

The server owns the device from ONE dispatcher thread, coalesces concurrent
requests into batched dispatches (up to the largest exported shape bucket,
waiting at most --max-wait-ms after the first request), and warms every
bucket at startup so no client pays a compile. --mesh_devices serves
data-parallel over a 1-D device mesh (sod100k_tpu/serve.py).

The reference has no serving counterpart; this is TPU-native deployment
surface (docs/GUIDE.md "Serving").
"""

from __future__ import annotations

import argparse
import signal

from sod100k_tpu.serve import load_artifact
from sod100k_tpu.serve_http import make_server


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifact", required=True,
                    help="serving artifact directory (cli.export output)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-wait-ms", type=float, default=3.0,
                    help="batching window after the first queued request")
    ap.add_argument("--mesh_devices", type=int, default=None,
                    help="serve data-parallel: 0 = all visible devices, "
                         "N = first N (default single device)")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the per-bucket warm-up dispatches")
    args = ap.parse_args(argv)

    # persistent compile cache: warm-up compiles every bucket at startup —
    # reruns of the same artifact must not pay XLA again (CLAUDE.md)
    import os

    import jax

    from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        hygienic_cache_dir(os.path.join(os.getcwd(), ".jax_cache")))

    model = load_artifact(args.artifact, mesh_devices=args.mesh_devices)
    srv = make_server(model, args.host, args.port,
                      max_wait_ms=args.max_wait_ms,
                      warmup=not args.no_warmup)
    m = model.meta
    print(f"serving {m['family']} {m['h']}x{m['w']} wire={m.get('wire', 'f32')} "
          f"buckets={model.batches} on http://{srv.server_address[0]}:"
          f"{srv.server_address[1]}  (POST /predict, GET /healthz /stats)",
          flush=True)
    # SIGTERM (the orchestrator's stop signal) drains like ctrl-C: stop
    # accepting, let in-flight dispatches finish, join the dispatcher
    def _term(*_):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        srv.batcher.stop()


if __name__ == "__main__":
    main()
