"""HTTP serving daemon: micro-batching correctness, wire contracts, errors.

Covers sod100k_tpu/serve_http.py + cli/serve.py's server construction: one
dispatcher thread coalescing concurrent requests into batched dispatches
over the artifact's shape buckets, npy and encoded-image request formats on
both wire contracts, and protocol errors surfacing as 4xx instead of
poisoning the batch.
"""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sod100k_tpu.arch.csnet import csnet_init
from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
from sod100k_tpu.serve import export_artifact, load_artifact
from sod100k_tpu.serve_http import Batcher, DispatchError, make_server


class _FakeModel:
    """Minimal ServingModel surface for dispatcher-failure tests."""

    batches = [2]
    input_shape = (2, 8, 8, 3)
    meta = {"family": "fake", "wire": "f32"}

    def __init__(self, fail: bool = False):
        self.fail = fail

    def __call__(self, x):
        if self.fail:
            raise ValueError("boom inside dispatch")
        return np.zeros((np.asarray(x).shape[0], 8, 8, 1), np.float32)


def _post(url, data, ctype):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": ctype}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.read()


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(0), lc)
    path = export_artifact(
        str(tmp_path_factory.mktemp("art") / "f32"), "csnet", params, lc,
        batch=[2, 4], hw=(64, 64), dtype=jnp.float32)
    return load_artifact(path)


@pytest.fixture(scope="module")
def f32_server(f32_model):
    srv = make_server(f32_model, port=0, max_wait_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    yield srv, f32_model, url
    srv.shutdown()
    srv.batcher.stop()


def test_batcher_coalesces_concurrent_requests(f32_model):
    """3 concurrent submits (1+2+1 images) -> ONE batched dispatch whose
    per-request slices match direct model() calls."""
    b = Batcher(f32_model, max_wait_ms=50.0, autostart=False)
    rng = np.random.default_rng(0)
    xs = [rng.standard_normal((n, 64, 64, 3)).astype(np.float32)
          for n in (1, 2, 1)]
    results = [None] * 3

    def client(i):
        results[i] = b.submit(xs[i])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    deadline = time.monotonic() + 10
    while len(b._queue) < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert len(b._queue) == 3, "clients failed to enqueue"
    b.start()
    for t in threads:
        t.join(timeout=120)
    s = b.snapshot()
    assert s["dispatches"] == 1 and s["requests"] == 3 and s["images"] == 4
    assert s["batch_hist"] == {4: 1}
    for x, got in zip(xs, results):
        np.testing.assert_allclose(got, f32_model(x), atol=1e-5)
    b.stop()


def test_batcher_respects_bucket_cap(f32_model):
    """A queued request that would overflow the largest bucket waits for
    the next dispatch instead of forcing an oversized concat."""
    b = Batcher(f32_model, max_wait_ms=5.0, autostart=False)
    rng = np.random.default_rng(1)
    xs = [rng.standard_normal((3, 64, 64, 3)).astype(np.float32),
          rng.standard_normal((2, 64, 64, 3)).astype(np.float32)]
    results = [None, None]

    def client(i):
        results[i] = b.submit(xs[i])

    threads = [threading.Thread(target=client, args=(i,)) for i in (0, 1)]
    threads[0].start()
    while len(b._queue) < 1:
        time.sleep(0.005)
    threads[1].start()
    while len(b._queue) < 2:
        time.sleep(0.005)
    b.start()
    for t in threads:
        t.join(timeout=120)
    s = b.snapshot()
    assert s["dispatches"] == 2 and s["images"] == 5
    for x, got in zip(xs, results):
        np.testing.assert_allclose(got, f32_model(x), atol=1e-5)
    b.stop()


def test_batcher_oversized_request_chunks(f32_model):
    """A single request larger than the largest bucket dispatches alone;
    ServingModel's bucket routing chunks it."""
    b = Batcher(f32_model, max_wait_ms=1.0)
    x = np.random.default_rng(10).standard_normal(
        (7, 64, 64, 3)).astype(np.float32)
    got = b.submit(x)
    np.testing.assert_allclose(got, f32_model(x), atol=1e-5)
    s = b.snapshot()
    assert s["images"] == 7
    b.stop()
    with pytest.raises(RuntimeError):
        b.submit(x)


def test_submit_timeout_removes_queued_request():
    """A timed-out submit (client already got its 503) must not leave the
    request queued to consume a later batched dispatch."""
    b = Batcher(_FakeModel(), autostart=False)  # no dispatcher running
    with pytest.raises(TimeoutError):
        b.submit(np.zeros((1, 8, 8, 3), np.float32), timeout_s=0.05)
    assert b._queue == []
    b.stop()


def test_dispatch_failure_fresh_error_per_request():
    """A failed batched dispatch scatters a FRESH DispatchError per request
    (re-raising one shared instance concurrently mutates __traceback__)."""
    b = Batcher(_FakeModel(fail=True), max_wait_ms=50.0, autostart=False)
    errs = [None, None]

    def client(i):
        try:
            b.submit(np.zeros((1, 8, 8, 3), np.float32))
        except Exception as e:
            errs[i] = e

    threads = [threading.Thread(target=client, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    deadline = time.monotonic() + 10
    while len(b._queue) < 2 and time.monotonic() < deadline:
        time.sleep(0.005)
    b.start()
    for t in threads:
        t.join(timeout=60)
    assert all(isinstance(e, DispatchError) for e in errs), errs
    assert errs[0] is not errs[1]
    assert "boom inside dispatch" in str(errs[0])
    b.stop()


def test_http_dispatch_failure_is_500_not_400():
    """A model ValueError raised INSIDE the batched dispatch is a server
    failure (500) — never misreported as a client protocol error (400)."""
    srv = make_server(_FakeModel(fail=True), port=0, max_wait_ms=1.0,
                      warmup=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        x = np.zeros((1, 8, 8, 3), np.float32)
        code, body, _ = _post(url + "/predict", _npy_bytes(x),
                              "application/x-npy")
        assert code == 500 and b"boom inside dispatch" in body
    finally:
        srv.shutdown()
        srv.batcher.stop()


def test_http_malformed_content_length_is_400(f32_server):
    """Non-numeric or negative Content-Length gets a 400 response (a
    negative value would make read(-1) block until EOF — thread
    exhaustion); an absurd size gets 413 before any read."""
    import socket

    srv, model, url = f32_server
    host, port = srv.server_address
    for header, want in ((b"banana", b" 400 "), (b"-1", b" 400 "),
                         (b"99999999999", b" 413 ")):
        with socket.create_connection((host, port), timeout=30) as s:
            s.sendall(b"POST /predict HTTP/1.1\r\nHost: t\r\n"
                      b"Content-Type: application/x-npy\r\n"
                      b"Content-Length: " + header + b"\r\n\r\n")
            status = s.recv(4096).split(b"\r\n", 1)[0]
        assert want in status, (header, status)


def test_http_npy_roundtrip_and_meta(f32_server):
    srv, model, url = f32_server
    code, body = _get(url + "/healthz")
    meta = json.loads(body)
    assert code == 200 and meta["ok"] and meta["family"] == "csnet"

    x = np.random.default_rng(2).standard_normal(
        (3, 64, 64, 3)).astype(np.float32)
    code, body, ctype = _post(url + "/predict", _npy_bytes(x),
                              "application/x-npy")
    assert code == 200 and ctype == "application/x-npy"
    out = np.load(io.BytesIO(body))
    np.testing.assert_allclose(out, model(x), atol=1e-5)

    # single-image (H,W,3) convenience: response drops the batch dim too
    code, body, _ = _post(url + "/predict", _npy_bytes(x[0]),
                          "application/x-npy")
    assert code == 200
    out1 = np.load(io.BytesIO(body))
    assert out1.shape == (64, 64, 1)
    np.testing.assert_allclose(out1, model(x[:1])[0], atol=1e-5)

    code, body = _get(url + "/stats")
    s = json.loads(body)
    assert code == 200 and s["dispatches"] >= 1 and s["images"] >= 4


def test_http_protocol_errors(f32_server):
    srv, model, url = f32_server
    # wrong spatial size -> 400, with the contract named
    bad = np.zeros((1, 32, 32, 3), np.float32)
    code, body, _ = _post(url + "/predict", _npy_bytes(bad),
                          "application/x-npy")
    assert code == 400 and b"64" in body
    # junk content type -> 415
    code, body, _ = _post(url + "/predict", b"xx", "text/plain")
    assert code == 415
    # junk image bytes -> 400
    code, body, _ = _post(url + "/predict", b"not an image", "image/png")
    assert code == 400
    # unknown route -> 404
    code, body, _ = _post(url + "/elsewhere", b"", "application/x-npy")
    assert code == 404
    # a failed request must not wedge the dispatcher
    x = np.random.default_rng(3).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    code, body, _ = _post(url + "/predict", _npy_bytes(x),
                          "application/x-npy")
    assert code == 200


def test_http_concurrent_clients_all_correct(f32_server):
    srv, model, url = f32_server
    rng = np.random.default_rng(4)
    xs = [rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
          for _ in range(6)]
    outs = [None] * 6

    def client(i):
        code, body, _ = _post(url + "/predict", _npy_bytes(xs[i]),
                              "application/x-npy")
        assert code == 200
        outs[i] = np.load(io.BytesIO(body))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    for x, got in zip(xs, outs):
        assert got is not None
        np.testing.assert_allclose(got, model(x), atol=1e-5)


def test_http_image_wire_u8(tmp_path):
    """Encoded-image request on a u8-wire artifact: resize on the host,
    normalize fused on device, PNG saliency back — byte-exact vs the same
    path run directly."""
    cv2 = pytest.importorskip("cv2")
    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(5), lc)
    path = export_artifact(str(tmp_path / "u8"), "csnet", params, lc,
                           batch=2, hw=(64, 64), dtype=jnp.float32,
                           wire="u8")
    model = load_artifact(path)
    srv = make_server(model, port=0, max_wait_ms=5.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (80, 100, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        assert ok
        code, body, ctype = _post(url + "/predict", enc.tobytes(),
                                  "image/png")
        assert code == 200 and ctype == "image/png"
        got = cv2.imdecode(np.frombuffer(body, np.uint8),
                           cv2.IMREAD_GRAYSCALE)
        want = model(cv2.resize(img, (64, 64),
                                interpolation=cv2.INTER_LINEAR)[None])[0, ..., 0]
        np.testing.assert_array_equal(got, want)

        # float npy against the u8 wire -> 400 (never a silent coercion)
        fx = np.zeros((1, 64, 64, 3), np.float32)
        code, body, _ = _post(url + "/predict", _npy_bytes(fx),
                              "application/x-npy")
        assert code == 400 and b"uint8" in body

        # wider int dtype with out-of-range values -> 400 (astype(np.uint8)
        # would silently wrap 300 -> 44 into plausible garbage)
        ox = np.full((1, 64, 64, 3), 300, np.int32)
        code, body, _ = _post(url + "/predict", _npy_bytes(ox),
                              "application/x-npy")
        assert code == 400 and b"255" in body

        # in-range wider ints stay accepted (lossless cast)
        kx = cv2.resize(img, (64, 64),
                        interpolation=cv2.INTER_LINEAR)[None].astype(np.int32)
        code, body, _ = _post(url + "/predict", _npy_bytes(kx),
                              "application/x-npy")
        assert code == 200
    finally:
        srv.shutdown()
        srv.batcher.stop()


def test_server_composes_with_mesh_serving(tmp_path, f32_model):
    """cli.serve --mesh_devices: the daemon over a data-parallel-loaded
    artifact returns the same bytes as the single-device model."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    lc = init_layers(8, [0.5, 0.5])
    params = csnet_init(jax.random.key(8), lc)
    path = export_artifact(str(tmp_path / "dp"), "csnet", params, lc,
                           batch=[2, 4], hw=(64, 64), dtype=jnp.float32)
    dp = load_artifact(path, mesh_devices=2)
    single = load_artifact(path)
    srv = make_server(dp, port=0, max_wait_ms=5.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        x = np.random.default_rng(9).standard_normal(
            (4, 64, 64, 3)).astype(np.float32)
        code, body, _ = _post(url + "/predict", _npy_bytes(x),
                              "application/x-npy")
        assert code == 200
        out = np.load(io.BytesIO(body))
        np.testing.assert_allclose(out, single(x), atol=1e-6)
    finally:
        srv.shutdown()
        srv.batcher.stop()


def test_image_request_normalize_matches_host_protocol(f32_model):
    """The f32-wire image decode path applies the exact host-dialect
    normalize (pipeline IMAGENET constants) before batching."""
    from sod100k_tpu.serve_http import _decode_image_request
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    x = _decode_image_request(enc.tobytes(), f32_model)
    want = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_array_equal(x[0], want)
