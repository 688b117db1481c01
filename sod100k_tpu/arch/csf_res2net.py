"""CSF+Res2Net: Cross-Stage-Fusion head on a Res2Net-v1b backbone (JAX).

Mirrors /root/reference/CSF+Res2Net/networks/csf_res2net.py:

- Res2Net v1b (:109-183): 3-conv stem (stride 2) + BN/ReLU + 3x3/2 maxpool,
  four stages of Bottle2neck blocks (baseWidth 26, scale 4) — hierarchical
  4-way split with cascaded 3x3 convs and running sum (:74-107), avg-pool
  downsample shortcuts (:148-155). Backbone batch-norms are *frozen*
  (requires_grad=False + net.eval() during training, solver.py:49), so they
  always run with running statistics here.
- CSF head (:233-259): 4-octave gOctConv fuse ([256,512,1024,2048] ->
  [128,256,512,512]) with the CSF resampling dialect and GroupNorm(32),
  PallMSBlock (plain convs, fixed width//5 dilation splits), 1x1 fuse to a
  single 1408-channel branch, classifier conv, bilinear upsample.

Param pytree mirrors torch module names (incl. Sequential indices like
base.conv1.0), so interop is the same key mapping as CSNet. res2net50 /
res2net101 differ only in the stage depths ([3,4,6,3] vs [3,4,23,3]).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d
from ..ops.goct import ApplyCtx, goct_cbr, pall_ms_block
from ..ops.norm import batchnorm_infer
from ..ops.resample import avg_pool_torch, max_pool_torch, resize_bilinear

LAYERS = {"res2net50": (3, 4, 6, 3), "res2net101": (3, 4, 23, 3)}
BASE_WIDTH = 26
SCALE = 4
EXPANSION = 4
PLANES = (64, 128, 256, 512)

FUSE_IN = (256, 512, 1024, 2048)
FUSE_OUT = (128, 256, 512, 512)
# cumulative downsampling at the input of the deepest TRUE strided conv
# (layer4 block 0's 3x3/2 convs see H/16); spatial-sharding validity checks
# key off this (parallel.mesh.check_spatial_extent)
DEEPEST_STRIDE2_FACTOR = 16


def _dil_split(width: int) -> tuple[int, ...]:
    each = width // 5
    return (each,) * 4 + (width - 4 * each,)


MS_DIL_SPLITS = tuple(_dil_split(w) for w in FUSE_OUT)


def _width(planes: int) -> int:
    return int(math.floor(planes * (BASE_WIDTH / 64.0)))


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _bn(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "offset": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _gn(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "offset": jnp.zeros((c,), dtype)}


def _conv_normal(key, kh, kw, cin, cout, std=0.01, dtype=jnp.float32):
    """solver weights_init: every nn.Conv2d ~ N(0, 0.01) (csf_res2net.py:264-268)."""
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def _block_init(key, inplanes, planes, has_down, dtype=jnp.float32):
    w = _width(planes)
    keys = jax.random.split(key, SCALE + 3)
    p = {
        "conv1": {"kernel": _conv_normal(keys[0], 1, 1, inplanes, w * SCALE)},
        "bn1": _bn(w * SCALE, dtype),
        "convs": {}, "bns": {},
        "conv3": {"kernel": _conv_normal(keys[1], 1, 1, w * SCALE,
                                         planes * EXPANSION)},
        "bn3": _bn(planes * EXPANSION, dtype),
    }
    for i in range(SCALE - 1):
        p["convs"][str(i)] = {"kernel": _conv_normal(keys[2 + i], 3, 3, w, w)}
        p["bns"][str(i)] = _bn(w, dtype)
    if has_down:
        p["downsample"] = {
            "1": {"kernel": _conv_normal(keys[-1], 1, 1, inplanes,
                                         planes * EXPANSION)},
            "2": _bn(planes * EXPANSION, dtype),
        }
    return p


def csf_init(key: jax.Array, backbone: str = "res2net50",
             dtype=jnp.float32) -> dict:
    layers = LAYERS[backbone]
    keys = jax.random.split(key, 16 + sum(layers))
    ki = iter(range(len(keys)))
    base = {
        "conv1": {
            "0": {"kernel": _conv_normal(keys[next(ki)], 3, 3, 3, 32)},
            "1": _bn(32, dtype),
            "3": {"kernel": _conv_normal(keys[next(ki)], 3, 3, 32, 32)},
            "4": _bn(32, dtype),
            "6": {"kernel": _conv_normal(keys[next(ki)], 3, 3, 32, 64)},
        },
        "bn1": _bn(64, dtype),
    }
    inplanes = 64
    for li, (planes, blocks) in enumerate(zip(PLANES, layers)):
        layer = {}
        for b in range(blocks):
            has_down = b == 0  # stride!=1 or channel change, always on block 0
            layer[str(b)] = _block_init(keys[next(ki)], inplanes, planes,
                                        has_down, dtype)
            inplanes = planes * EXPANSION
        base[f"layer{li + 1}"] = layer

    def cbr(key, cin, cout, out_split):
        k1 = jax.random.split(key, 2)
        # gOctaveConv dense weights keep kaiming-uniform (weights_init only
        # touches nn.Conv2d instances, csf_res2net.py:265)
        bound = math.sqrt(1.0 / cin)
        p = {"conv": {"kernel": jax.random.uniform(
            k1[0], (1, 1, cin, cout), dtype, minval=-bound, maxval=bound)},
            "bns": {}, "prelus": {}}
        for j, c in enumerate(out_split):
            p["bns"][str(j)] = _gn(c, dtype)
            p["prelus"][str(j)] = {"alpha": jnp.full((c,), 0.25, dtype)}
        return p

    ms = {"convs": {}}
    for j, (cin, split) in enumerate(zip(FUSE_OUT, MS_DIL_SPLITS)):
        cout = sum(split)
        mkeys = jax.random.split(keys[next(ki)], 5)
        ms["convs"][str(j)] = {
            "msconv": {str(d): {"kernel": _conv_normal(mkeys[d], 3, 3, cin,
                                                       split[d])}
                       for d in range(5)},
            "bn": _gn(cout, dtype),
            "prelu": {"alpha": jnp.full((cout,), 0.25, dtype)},
        }
    cls_key = jax.random.split(keys[next(ki)], 2)
    p = {
        "base": base,
        "fuse": cbr(keys[next(ki)], sum(FUSE_IN), sum(FUSE_OUT), FUSE_OUT),
        "ms": ms,
        "fuse1x1": cbr(keys[next(ki)], sum(FUSE_OUT), sum(FUSE_OUT),
                       (sum(FUSE_OUT),)),
        "cls_layer": {"kernel": _conv_normal(cls_key[0], 1, 1, sum(FUSE_OUT), 1),
                      "bias": jnp.zeros((1,), dtype)},
    }
    if dtype != jnp.float32:
        # the helpers above thread dtype inconsistently (conv kernels were
        # f32); normalize so a non-default dtype yields a uniform pytree
        p = jax.tree.map(lambda a: a.astype(dtype), p)
    return p


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _bn_relu(x, p):
    return jax.nn.relu(batchnorm_infer(x, p))


def _bottle2neck(p, x, planes, stride, stype):
    """Bottle2neck forward (csf_res2net.py:74-107); BNs frozen (eval-mode)."""
    w = _width(planes)
    out = _bn_relu(conv2d(x, p["conv1"]["kernel"]), p["bn1"])
    spx = [out[..., i * w:(i + 1) * w] for i in range(SCALE)]
    cat = []
    sp = None
    for i in range(SCALE - 1):
        sp = spx[i] if (i == 0 or stype == "stage") else sp + spx[i]
        sp = conv2d(sp, p["convs"][str(i)]["kernel"], stride=stride, padding=1)
        sp = _bn_relu(sp, p["bns"][str(i)])
        cat.append(sp)
    if stype == "normal":
        cat.append(spx[-1])
    else:  # 'stage': pool the passthrough chunk
        cat.append(avg_pool_torch(spx[-1], 3, stride, 1))
    out = jnp.concatenate(cat, axis=-1)
    out = batchnorm_infer(conv2d(out, p["conv3"]["kernel"]), p["bn3"])
    if "downsample" in p:
        r = avg_pool_torch(x, stride, stride, 0, ceil_mode=True,
                           count_include_pad=False) if stride > 1 else x
        r = batchnorm_infer(conv2d(r, p["downsample"]["1"]["kernel"]),
                            p["downsample"]["2"])
    else:
        r = x
    return jax.nn.relu(out + r)


def res2net_features(p: dict, x: jax.Array, backbone: str = "res2net50") -> list:
    """Backbone forward -> [layer1..layer4] features (csf_res2net.py:167-183)."""
    layers = LAYERS[backbone]
    s = p["conv1"]
    x = _bn_relu(conv2d(x, s["0"]["kernel"], stride=2, padding=1), s["1"])
    x = _bn_relu(conv2d(x, s["3"]["kernel"], padding=1), s["4"])
    x = conv2d(x, s["6"]["kernel"], padding=1)
    x = jax.nn.relu(batchnorm_infer(x, p["bn1"]))
    x = max_pool_torch(x, 3, 2, 1)
    feats = []
    for li, (planes, blocks) in enumerate(zip(PLANES, layers)):
        lp = p[f"layer{li + 1}"]
        stride = 1 if li == 0 else 2
        x = _bottle2neck(lp["0"], x, planes, stride, "stage")
        for b in range(1, blocks):
            x = _bottle2neck(lp[str(b)], x, planes, 1, "normal")
        feats.append(x)
    return feats


def csf_apply(params: dict, x: jax.Array, backbone: str = "res2net50",
              ctx: Optional[ApplyCtx] = None) -> jax.Array:
    """CSFNet forward: NHWC batch -> NHWC saliency logits at input size
    (csf_res2net.py:251-259)."""
    if ctx is None:
        ctx = ApplyCtx()
    feats = res2net_features(params["base"], x, backbone)
    y = goct_cbr(ctx, "fuse", params["fuse"], feats,
                 in_split=FUSE_IN, out_split=FUSE_OUT,
                 stride=1, padding=0, flavor="csf", norm="gn")
    y = pall_ms_block(ctx, "ms", params["ms"], y, dil_splits=MS_DIL_SPLITS,
                      norm="gn", x100=False)
    y = goct_cbr(ctx, "fuse1x1", params["fuse1x1"], y,
                 in_split=FUSE_OUT, out_split=(sum(FUSE_OUT),),
                 stride=1, padding=0, flavor="csf", norm="gn")
    logits = conv2d(y[0], params["cls_layer"]["kernel"],
                    params["cls_layer"]["bias"])
    return resize_bilinear(logits, x.shape[1:3])


# Published ImageNet weights (reference csf_res2net.py:15-18). The filename
# suffix is the torch-hub convention: first 8 hex chars of the file's sha256.
RES2NET_URLS = {
    "res2net50": "https://shanghuagao.oss-cn-beijing.aliyuncs.com/res2net/"
                 "res2net50_v1b_26w_4s-3cf99910.pth",
    "res2net101": "https://shanghuagao.oss-cn-beijing.aliyuncs.com/res2net/"
                  "res2net101_v1b_26w_4s-0812c246.pth",
}


def fetch_res2net_weights(backbone: str = "res2net50",
                          cache_dir: str | None = None,
                          timeout: float = 60.0) -> str | None:
    """Download (once) the published ImageNet checkpoint for ``backbone``
    into ``cache_dir`` and return its path; the torch-hub sha256 prefix in
    the filename is verified. Returns None when the network is unreachable
    (offline containers skip to random init / a local --pretrained_model,
    matching the reference's optional download, csf_res2net.py:143-144)."""
    import hashlib
    import urllib.error
    import urllib.request

    url = RES2NET_URLS[backbone]
    fname = url.rsplit("/", 1)[1]
    want_prefix = fname.rsplit("-", 1)[1].split(".")[0]
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "sod100k_tpu")
    path = os.path.join(cache_dir, fname)
    if os.path.isfile(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + ".part"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            h = hashlib.sha256()
            while chunk := r.read(1 << 20):
                h.update(chunk)
                f.write(chunk)
        if not h.hexdigest().startswith(want_prefix):
            os.remove(tmp)
            raise ValueError(
                f"checksum mismatch for {fname}: got {h.hexdigest()[:8]}, "
                f"want {want_prefix}")
        os.replace(tmp, path)
        return path
    except (urllib.error.URLError, OSError, TimeoutError):
        if os.path.exists(tmp):
            os.remove(tmp)
        return None


def load_res2net_backbone(params: dict, torch_path: str) -> dict:
    """Load an ImageNet res2net50/101_v1b torch checkpoint into params['base']
    (reference downloads it from model_urls, csf_res2net.py:15-18,143-144;
    strict=False semantics: fc weights ignored)."""
    from ..interop.torch_ckpt import load_checkpoint

    tree, _ = load_checkpoint(torch_path)
    tree.pop("fc", None)
    out = dict(params)
    base = dict(params["base"])
    for k, v in tree.items():
        if k in base or k.startswith(("conv1", "bn1", "layer")):
            base[k] = v
    out["base"] = base
    return out
