"""Serving export: compile-free deployment artifacts via jax.export.

A serving artifact is a directory holding:
  model.stablehlo  — serialized exported computation (StableHLO + vjp-less
                     calling convention), weights baked in as constants
  meta.json        — input spec (batch, H, W, dtype), family, sigmoid output

The exported function is the inference forward (sigmoid saliency maps) at a
fixed batch/size/dtype — the shape discipline XLA serving wants. Artifacts
are loadable on any runtime with a compatible jax (load_artifact) without
the model-building code, checkpoint interop, or layer_config plumbing; the
runtime compiles the StableHLO for whatever accelerator is attached.

The reference has no serving story (its test.py rebuilds the torch graph
from source every run); this is TPU-native deployment surface.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _forward_fn(family: str, params, lc, dtype, wire: str = "f32"):
    if family == "csnet":
        from .arch.csnet import csnet_apply
        from .ops.goct import ApplyCtx

        def apply(image):
            return csnet_apply(params, image, lc, ApplyCtx())
    elif family == "csf":
        from .arch.csf_res2net import csf_apply

        def apply(image):
            return csf_apply(params, image, lc)
    else:
        raise ValueError(f"unknown family {family!r}")

    from .data.pipeline import normalize_u8_device, quantize_sigmoid_u8

    def fwd(image):
        if wire == "u8":
            # raw uint8 RGB in; same f32 normalize as the host dialect
            image = normalize_u8_device(image)
        sig = jax.nn.sigmoid(apply(image.astype(dtype)).astype(jnp.float32))
        if wire == "u8":
            # the PNG quantization on device; 4x smaller response
            return quantize_sigmoid_u8(sig)
        return sig

    return fwd


def export_artifact(out_dir: str, family: str, params, lc, *,
                    batch=1, hw: tuple[int, int] = (224, 224),
                    dtype=jnp.bfloat16, wire: str = "f32") -> str:
    """Write a serving artifact. `lc` is the LayerConfig for csnet or the
    backbone name ("res2net50"/"res2net101") for csf. Input contract:
    float32 NHWC, [0,1]-scaled and ImageNet-normalized (the cli.test host
    protocol); output float32 (N,H,W,1) sigmoid saliency. wire="u8" bakes
    the wire format the TPU drivers use into the artifact instead: raw
    uint8 RGB in (the /255 + ImageNet normalize fused into the program,
    bit-identical f32 math) and trunc(sigmoid*255) uint8 out — 4x less
    request/response traffic, the right contract when the serving link is
    the bottleneck.

    `batch` may be an int or a sequence of ints: each size exports its own
    program (model_b{N}.stablehlo) and the loaded ServingModel routes any
    request batch onto the buckets (pad to the smallest covering bucket;
    chunk over the largest). Static shape buckets are the XLA serving
    discipline — one compile per bucket, ever."""
    from jax import export as jexport

    batches = sorted({int(b) for b in
                      (batch if isinstance(batch, (list, tuple)) else [batch])})
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    fwd = _forward_fn(family, params, lc, dtype, wire)
    in_dtype = jnp.uint8 if wire == "u8" else jnp.float32
    os.makedirs(out_dir, exist_ok=True)
    for b in batches:
        spec = jax.ShapeDtypeStruct((b, hw[0], hw[1], 3), in_dtype)
        exp = jexport.export(jax.jit(fwd))(spec)
        with open(os.path.join(out_dir, f"model_b{b}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
    if len(batches) == 1:
        # legacy single-program name kept alongside for older loaders
        import shutil

        shutil.copyfile(
            os.path.join(out_dir, f"model_b{batches[0]}.stablehlo"),
            os.path.join(out_dir, "model.stablehlo"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"family": family, "batch": batches[-1],
                   "batches": batches, "h": hw[0], "w": hw[1],
                   "compute_dtype": jnp.dtype(dtype).name,
                   "wire": wire,
                   # compatibility metadata: load_artifact checks these and
                   # raises a clear version-skew message instead of leaking
                   # a StableHLO deserializer traceback
                   "jax_version": jax.__version__,
                   "calling_convention_version":
                       int(exp.calling_convention_version),
                   "input": ("uint8 NHWC RGB (normalize fused)"
                             if wire == "u8" else
                             "float32 NHWC, ImageNet-normalized"),
                   "output": ("uint8 (N,H,W,1) trunc(sigmoid*255)"
                              if wire == "u8" else
                              "float32 (N,H,W,1) sigmoid saliency")}, f,
                  indent=1)
    return out_dir


class ServingModel:
    """Loaded artifact: `model(images) -> saliency`.

    Any request batch N is served over the exported shape buckets: the
    smallest covering bucket handles the tail (padded by repeating the last
    image, padding discarded), the largest bucket handles overflow in
    chunks. Spatial dims must match the export exactly."""

    def __init__(self, path: str, mesh_devices: int | None = None):
        """mesh_devices: serve data-parallel over a 1-D device mesh —
        None/1 = single device (default), 0 = all visible devices, N = the
        first N. Exported programs are re-traceable, so GSPMD partitions the
        baked-constants forward under a batch in_sharding (verified
        bit-exact vs single-device in tests/test_serve.py); buckets not
        divisible by the device count stay single-device."""
        from jax import export as jexport

        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.batches = sorted(self.meta.get("batches", [self.meta["batch"]]))
        ndev = 1
        if mesh_devices is not None:
            ndev = min(mesh_devices or len(jax.devices()), len(jax.devices()))
        self._batch_sharding = None
        self._mesh_devices = ndev
        if ndev > 1:
            from .parallel.mesh import batch_sharding, make_mesh

            self._batch_sharding = batch_sharding(make_mesh(ndev))
        # version-skew guard: check the exporter's calling-convention
        # version against this runtime's supported range BEFORE touching the
        # serialized bytes, so an incompatible artifact fails with a clear
        # what/which-versions message instead of a deserializer traceback
        ccv = self.meta.get("calling_convention_version")
        exporter = self.meta.get("jax_version", "unknown")
        if ccv is not None:
            lo = getattr(jexport, "minimum_supported_calling_convention_version",
                         None)
            hi = getattr(jexport, "maximum_supported_calling_convention_version",
                         None)
            if (lo is not None and ccv < lo) or (hi is not None and ccv > hi):
                raise RuntimeError(
                    f"serving artifact at {path} is incompatible with this "
                    f"runtime: exported by jax {exporter} (calling convention "
                    f"v{ccv}), this jax {jax.__version__} supports "
                    f"v{lo}..v{hi}; re-export the artifact with a matching "
                    f"jax")
        self._jitted = {}
        for b in self.batches:
            fname = os.path.join(path, f"model_b{b}.stablehlo")
            if not os.path.exists(fname):  # single-program legacy artifact
                fname = os.path.join(path, "model.stablehlo")
            try:
                with open(fname, "rb") as f:
                    self._exp = jexport.deserialize(f.read())
            except Exception as e:
                raise RuntimeError(
                    f"failed to deserialize {fname} (exported by jax "
                    f"{exporter}, this runtime is jax {jax.__version__}): "
                    f"{e}; if the versions differ, re-export the artifact "
                    f"with this runtime's jax") from e
            if self._batch_sharding is not None and b % self._mesh_devices == 0:
                self._jitted[b] = jax.jit(
                    self._exp.call, in_shardings=(self._batch_sharding,))
            else:
                self._jitted[b] = jax.jit(self._exp.call)

    @property
    def input_shape(self) -> tuple[int, int, int, int]:
        m = self.meta
        return (m["batch"], m["h"], m["w"], 3)

    def __call__(self, images) -> np.ndarray:
        if self.meta.get("wire", "f32") == "u8":
            # refuse silent float->uint8 coercion: a client on the old f32
            # contract passing normalized floats (values ~[-2.6, 2.6]) would
            # wrap/truncate into garbage pixels and get plausible-looking
            # maps back with no error
            arr = np.asarray(images)
            if not np.issubdtype(arr.dtype, np.integer):
                raise TypeError(
                    f"wire='u8' artifact expects raw uint8 RGB images, got "
                    f"dtype {arr.dtype}; pass undecoded pixel values (the "
                    f"normalize is fused into the program)")
            x = arr.astype(np.uint8)
        else:
            x = np.asarray(images, np.float32)
        assert x.ndim == 4 and x.shape[1:] == self.input_shape[1:], \
            (x.shape, self.input_shape)
        outs, i, n = [], 0, x.shape[0]
        while i < n:
            rem = n - i
            b = next((b for b in self.batches if b >= rem), self.batches[-1])
            take = min(rem, b)
            chunk = x[i:i + take]
            if take < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - take, axis=0)])
            outs.append(np.asarray(self._jitted[b](jnp.asarray(chunk)))[:take])
            i += take
        return np.concatenate(outs) if len(outs) > 1 else outs[0]


def load_artifact(path: str, mesh_devices: int | None = None) -> ServingModel:
    return ServingModel(path, mesh_devices=mesh_devices)
