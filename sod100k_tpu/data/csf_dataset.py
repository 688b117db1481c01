""".lst-file driven datasets for the CSF+Res2Net pipeline.

Mirrors CSF+Res2Net/dataset/dataset.py: train lists of "img gt" path pairs
relative to a root; images cv2-decoded, RGB, /255, ImageNet-normalized
(:69-81); labels /255 single-channel (:98-107); random horizontal flip at
p=0.5 (:109-114). No resizing in the reference (native sizes, batch 1).

For the TPU, ``padded_batches`` groups samples into shape buckets
(ceil-to-`bucket` multiples) and emits fixed-shape padded batches with pixel
validity masks, so the masked-sum loss tracks the reference's (exact on
the loss pixels; conv borders see pad zeros, bounded by the parity test
at rel 2e-2) while XLA compiles one program per bucket. ``fixed_size`` instead resizes everything to
one shape (e.g. 336x336 for the Res2Net-101 recipe).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from .pipeline import IMAGENET_MEAN, IMAGENET_STD, resize_bilinear_np


def _load_image(path: str) -> np.ndarray:
    import cv2

    im = cv2.imread(path)
    if im is None:
        raise FileNotFoundError(path)
    im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    return (im - IMAGENET_MEAN) / IMAGENET_STD


def _load_label(path: str) -> np.ndarray:
    """Supported envelope: 8-bit grayscale GT PNGs (every published SOD GT
    set). For color GTs channel 0 is cv2-BGR blue vs the reference PIL-RGB
    red, and palette PNGs decode expanded instead of as indices — dialect
    divergences outside the envelope, not covered by the parity gates."""
    import cv2

    im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if im is None:
        raise FileNotFoundError(path)
    if im.ndim == 3:
        im = im[:, :, 0]
    return im.astype(np.float32)[..., None] / 255.0


class CSFTrainData:
    def __init__(self, data_root: str, data_list: str, seed: int = 0):
        self.root = data_root
        with open(data_list) as f:
            self.pairs = [line.split() for line in f.read().splitlines() if line]
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> dict:
        im_name, gt_name = self.pairs[idx][0], self.pairs[idx][1]
        img = _load_image(os.path.join(self.root, im_name))
        gt = _load_label(os.path.join(self.root, gt_name))
        if self.rng.integers(2) == 1:  # cv_random_flip
            img, gt = img[:, ::-1], gt[:, ::-1]
        return {"image": img, "target": gt}

    def _decode_u8(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Raw uint8 (image HWC RGB, gt HW) at native resolution — no flip
        and no normalization; the resident front-end does both on device."""
        import cv2

        im_name, gt_name = self.pairs[idx][0], self.pairs[idx][1]
        img = cv2.imread(os.path.join(self.root, im_name))
        if img is None:
            raise FileNotFoundError(os.path.join(self.root, im_name))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        gt = cv2.imread(os.path.join(self.root, gt_name), cv2.IMREAD_UNCHANGED)
        if gt is None:
            raise FileNotFoundError(os.path.join(self.root, gt_name))
        if gt.ndim == 3:
            gt = gt[:, :, 0]
        return img, gt


class CSFTestData:
    def __init__(self, data_root: str, data_list: str):
        self.root = data_root
        with open(data_list) as f:
            self.names = [line for line in f.read().splitlines() if line]

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, idx: int) -> dict:
        img = _load_image(os.path.join(self.root, self.names[idx]))
        return {"image": img, "name": self.names[idx],
                "size": img.shape[:2]}

    def get_u8(self, idx: int) -> dict:
        """Raw uint8 RGB at native size — for the TPU driver's u8 ship with
        on-device /255 + ImageNet normalize (4x less host->device traffic
        than the host-normalized f32 protocol, same math in f32 on device)."""
        import cv2

        path = os.path.join(self.root, self.names[idx])
        im = cv2.imread(path)
        if im is None:
            raise FileNotFoundError(path)
        return {"image": cv2.cvtColor(im, cv2.COLOR_BGR2RGB),
                "name": self.names[idx], "size": im.shape[:2]}


class CSFJointTrainData(CSFTrainData):
    """Saliency + edge-label variant (reference dataset/joint_dataset.py —
    unused by the shipped recipes but part of the data surface): .lst lines
    are "img gt edge"; samples carry an extra {"edge"} stream."""

    def __getitem__(self, idx: int) -> dict:
        parts = self.pairs[idx]
        img = _load_image(os.path.join(self.root, parts[0]))
        gt = _load_label(os.path.join(self.root, parts[1]))
        edge = _load_label(os.path.join(self.root, parts[2]))
        if self.rng.integers(2) == 1:
            img, gt, edge = img[:, ::-1], gt[:, ::-1], edge[:, ::-1]
        return {"image": img, "target": gt, "edge": edge}


CAFFE_BGR_MEAN = np.asarray([104.00699, 116.66877, 122.67892], np.float32)


def load_image_caffe(path: str) -> np.ndarray:
    """Legacy Caffe-style preprocessing (reference dataset/dataset_old.py):
    BGR order, raw 0-255 range, mean subtraction, no std scaling."""
    import cv2

    im = cv2.imread(path)
    if im is None:
        raise FileNotFoundError(path)
    return im.astype(np.float32) - CAFFE_BGR_MEAN


def bucket_hw(h: int, w: int, step: int) -> tuple[int, int]:
    """Ceil (h, w) to `step` multiples — the shared shape-bucket key used
    by padded batching here and by cli.eval's device backend."""
    return (-(-h // step) * step, -(-w // step) * step)


_bucket = bucket_hw  # internal alias


def padded_batches(dataset: CSFTrainData, batch_size: int = 1, *,
                   bucket: int = 32, shuffle: bool = True,
                   seed: int = 0) -> Iterator[dict]:
    """Shape-bucketed padded batches: {"image","target","mask"} fixed-shape
    per bucket; the masked-sum LOSS VALUE equals the native-size one on the
    real pixels, while activations near pad borders differ slightly
    (convs see zero padding inside their receptive fields — the parity
    test bounds the loss difference at rel 2e-2 with pretrained-scale
    weights)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    pending: dict[tuple[int, int], list] = {}
    for idx in order:
        s = dataset[int(idx)]
        key = _bucket(*s["image"].shape[:2], bucket)
        pending.setdefault(key, []).append(s)
        if len(pending[key]) == batch_size:
            yield _pad_stack(pending.pop(key), key)
    for key, rest in pending.items():
        yield _pad_stack(rest, key)


def _pad_stack(samples: list, hw: tuple[int, int]) -> dict:
    n = len(samples)
    bh, bw = hw
    img = np.zeros((n, bh, bw, 3), np.float32)
    tgt = np.zeros((n, bh, bw, 1), np.float32)
    msk = np.zeros((n, bh, bw, 1), np.float32)
    for i, s in enumerate(samples):
        h, w = s["image"].shape[:2]
        img[i, :h, :w] = s["image"]
        tgt[i, :h, :w] = s["target"]
        msk[i, :h, :w] = 1.0
    return {"image": img, "target": tgt, "mask": msk}


def fixed_size_batches(dataset: CSFTrainData, batch_size: int,
                       hw: tuple[int, int] = (336, 336), *,
                       shuffle: bool = True, seed: int = 0) -> Iterator[dict]:
    """Fixed-resolution batches (the 336x336 Res2Net-101 training recipe)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for b in range(len(order) // batch_size):
        samples = [dataset[int(i)] for i in order[b * batch_size:(b + 1) * batch_size]]
        img = np.stack([resize_bilinear_np(s["image"], hw) for s in samples])
        tgt = np.stack([resize_bilinear_np(s["target"], hw)[..., None]
                        for s in samples])
        yield {"image": img, "target": tgt}
