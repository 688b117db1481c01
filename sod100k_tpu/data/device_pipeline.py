"""Device-side image front-end: augment/resize/normalize as one jitted program.

The reference preprocesses on the host (skimage crop/flip/resize per worker,
prepare_data.py:26-133). On TPU the host is the bottleneck, so this module
moves everything after JPEG decode onto the device: the host ships uint8
pixels (padded to a bucket shape), and a single fused XLA program does

    random crop (<=15 px per edge) -> lr/ud flip -> bilinear resize to the
    train size -> [0,1] scaling -> ImageNet normalization

for the whole batch. The random crop + resize composes into one bilinear
gather with *traced* source coordinates (crop offsets are data, shapes are
static), which is exactly equivalent to the reference's crop-then-resize:
output pixel o samples absolute coordinate r1 + (o+0.5)*crop/out - 0.5,
clamped to the crop box (replicating skimage's effective edge handling).
Flips become output-side reversals (flip(resize(crop)) == resize applied to
the mirrored box).

Augmentation parameter *distributions* match Augment (prepare_data.py:38-57):
row1 ~ U[0,15), row2 ~ -U[0,15)-1, flip p=0.5 then lr/ud 50/50.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pipeline import IMAGENET_MEAN, IMAGENET_STD


def _axis_coords(out_len: int, start, size):
    """Absolute source coordinates for crop[start:start+size] -> out_len,
    half-pixel bilinear, clamped to the crop box. Callers must keep the
    crop box inside the image's valid region — there is no image-bounds
    clamp here (and _gather_bilinear_1d clips only to the array extent,
    which may include bucket padding)."""
    o = jnp.arange(out_len, dtype=jnp.float32)
    src = start + (o + 0.5) * (size / out_len) - 0.5
    return jnp.clip(src, start.astype(jnp.float32),
                    (start + size - 1).astype(jnp.float32))


def _gather_bilinear_1d(a: jax.Array, coords: jax.Array, axis: int) -> jax.Array:
    """Bilinear gather of HWC `a` at float `coords` along `axis`."""
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, a.shape[axis] - 1)
    lo = jnp.clip(lo, 0, a.shape[axis] - 1)
    frac = (coords - lo.astype(jnp.float32))
    a_lo = jnp.take(a, lo, axis=axis)
    a_hi = jnp.take(a, hi, axis=axis)
    shape = [1, 1, 1]
    shape[axis] = -1
    f = frac.reshape(shape)
    return a_lo * (1.0 - f) + a_hi * f


def crop_resize_bilinear(img: jax.Array, box, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear-resize the traced crop box (r1, ch, c1, cw) of one HWC image
    to out_hw. Shapes static; coordinates dynamic."""
    h_out, w_out = out_hw
    r1, ch, c1, cw = box
    ys = _axis_coords(h_out, r1, ch)
    xs = _axis_coords(w_out, c1, cw)
    out = _gather_bilinear_1d(img.astype(jnp.float32), ys, 0)
    out = _gather_bilinear_1d(out, xs, 1)
    return out


def resize_to_native_canvas(img: jax.Array, hw, canvas_hw: tuple[int, int]) -> jax.Array:
    """Bilinear-resize a whole HW(C) image to the traced size (hw[0], hw[1]),
    materialized in the top-left of a static (canvas_h, canvas_w) array
    (pixels beyond hw are meaningless — mask them). Half-pixel sampling with
    edge clamp, identical to cv2.INTER_LINEAR on the valid region; used to
    scale predictions back to each image's native GT resolution on device
    (the host protocol is cv2.resize, cli/common.py val_mae)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h_in, w_in = img.shape[0], img.shape[1]
    h = hw[0].astype(jnp.float32)
    w = hw[1].astype(jnp.float32)
    oy = jnp.arange(canvas_hw[0], dtype=jnp.float32)
    ox = jnp.arange(canvas_hw[1], dtype=jnp.float32)
    ys = jnp.clip((oy + 0.5) * (h_in / h) - 0.5, 0.0, h_in - 1)
    xs = jnp.clip((ox + 0.5) * (w_in / w) - 0.5, 0.0, w_in - 1)
    out = _gather_bilinear_1d(img.astype(jnp.float32), ys, 0)
    out = _gather_bilinear_1d(out, xs, 1)
    return out[..., 0] if squeeze else out


def _draw_augment_params(key, max_crop: int = 15, p_flip: float = 0.5):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    r1 = jax.random.randint(k1, (), 0, max_crop)
    r2 = jax.random.randint(k2, (), 0, max_crop) + 1  # from the end
    c1 = jax.random.randint(k3, (), 0, max_crop)
    c2 = jax.random.randint(k4, (), 0, max_crop) + 1
    do_flip = jax.random.uniform(k5) < p_flip
    flip_lr = jax.random.uniform(k6) < 0.5
    return r1, r2, c1, c2, do_flip, flip_lr


@functools.partial(jax.jit, static_argnames=("out_hw", "augment", "max_crop"))
def preprocess_train_batch(
    images_u8: jax.Array,   # (N, H, W, 3) uint8 (decoded, bucket-padded)
    gts_u8: jax.Array,      # (N, H, W) uint8
    valid_hw: jax.Array,    # (N, 2) int32 true sizes inside the padding
    key: jax.Array,
    *,
    out_hw: tuple[int, int] = (224, 224),
    augment: bool = True,
    max_crop: int = 15,
) -> dict:
    """Batched device front-end -> {"image": float32 NHWC normalized,
    "target": float32 NHW1 in [0,1]}."""

    def one(img, gt, hw, k):
        h = hw[0]
        w = hw[1]
        if augment:
            r1, r2, c1, c2, do_flip, flip_lr = _draw_augment_params(k, max_crop)
            box = (r1, h - r1 - r2, c1, w - c1 - c2)
        else:
            zero = jnp.int32(0)
            box = (zero, h, zero, w)
            do_flip = jnp.bool_(False)
            flip_lr = jnp.bool_(True)
        im = crop_resize_bilinear(img, box, out_hw) / 255.0
        g = crop_resize_bilinear(gt[..., None], box, out_hw) / 255.0
        flipped_im = jnp.where(flip_lr, im[:, ::-1], im[::-1])
        flipped_g = jnp.where(flip_lr, g[:, ::-1], g[::-1])
        im = jnp.where(do_flip, flipped_im, im)
        g = jnp.where(do_flip, flipped_g, g)
        im = (im - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return im, g

    keys = jax.random.split(key, images_u8.shape[0])
    ims, gs = jax.vmap(one)(images_u8, gts_u8, valid_hw, keys)
    return {"image": ims, "target": gs}


@functools.partial(jax.jit, static_argnames=("out_hw",))
def preprocess_infer_batch(
    images_u8: jax.Array,   # (N, H, W, 3) uint8 (decoded, bucket-padded)
    valid_hw: jax.Array,    # (N, 2) int32 true sizes inside the padding
    *,
    out_hw: tuple[int, int] = (224, 224),
) -> jax.Array:
    """Inference front-end (test.py:71-86 fixed-size protocol on device):
    bilinear-resize each image's valid region to out_hw, scale to [0,1],
    ImageNet-normalize. Returns float32 NHWC."""

    def one(img, hw):
        zero = jnp.int32(0)
        im = crop_resize_bilinear(img, (zero, hw[0], zero, hw[1]), out_hw)
        im = im / 255.0
        return (im - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    return jax.vmap(one)(images_u8, valid_hw)
