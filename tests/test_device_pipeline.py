"""Device front-end parity: crop+resize gather vs host crop-then-resize."""

import jax
import jax.numpy as jnp
import numpy as np

from sod100k_tpu.data.device_pipeline import (
    crop_resize_bilinear,
    preprocess_train_batch,
)
from sod100k_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD, resize_bilinear_np


def test_crop_resize_matches_host_crop_then_resize():
    rng = np.random.default_rng(0)
    img = rng.random((57, 63, 3)).astype(np.float32) * 255
    for (r1, r2, c1, c2) in [(0, 1, 0, 1), (5, 3, 7, 2), (14, 15, 14, 15)]:
        ch, cw = 57 - r1 - r2, 63 - c1 - c2
        want = resize_bilinear_np(img[r1:r1 + ch, c1:c1 + cw], (32, 40))
        got = np.asarray(crop_resize_bilinear(
            jnp.asarray(img),
            (jnp.int32(r1), jnp.int32(ch), jnp.int32(c1), jnp.int32(cw)),
            (32, 40)))
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_preprocess_batch_no_augment_matches_host():
    rng = np.random.default_rng(1)
    h, w = 50, 61
    img = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)
    gt = rng.integers(0, 255, (2, h, w), dtype=np.uint8)
    out = preprocess_train_batch(
        jnp.asarray(img), jnp.asarray(gt),
        jnp.asarray([[h, w], [h, w]], np.int32),
        jax.random.key(0), out_hw=(32, 32), augment=False)
    for i in range(2):
        want = (resize_bilinear_np(img[i].astype(np.float64) / 255.0, (32, 32))
                - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(np.asarray(out["image"][i]), want, atol=1e-4)
        want_g = resize_bilinear_np(gt[i].astype(np.float64) / 255.0, (32, 32))
        np.testing.assert_allclose(np.asarray(out["target"][i, ..., 0]),
                                   want_g, atol=1e-4)


def test_preprocess_batch_augment_runs_and_respects_padding():
    rng = np.random.default_rng(2)
    # true content 40x45 inside a 64x64 pad: outputs must never sample the pad
    img = np.zeros((1, 64, 64, 3), np.uint8)
    img[0, :40, :45] = rng.integers(1, 255, (40, 45, 3), dtype=np.uint8)
    gt = np.zeros((1, 64, 64), np.uint8)
    gt[0, :40, :45] = 255
    out = preprocess_train_batch(
        jnp.asarray(img), jnp.asarray(gt), jnp.asarray([[40, 45]], np.int32),
        jax.random.key(3), out_hw=(32, 32), augment=True)
    im = np.asarray(out["image"][0])
    tg = np.asarray(out["target"][0])
    assert np.isfinite(im).all()
    # every target pixel comes from the all-255 GT region
    np.testing.assert_allclose(tg, 1.0, atol=1e-6)
    # and no output image pixel equals the normalized zero-pad everywhere
    assert (np.abs(im - (0 - IMAGENET_MEAN) / IMAGENET_STD).max(axis=-1) > 1e-3).all()
