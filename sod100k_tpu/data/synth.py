"""Synthetic SOD dataset trees (images/*.jpg + GT/*.png with blobby saliency).

Shared by the smoke driver (cli.smoke --dry-data) and the benchmark tool
(tools/bench_extras.py); mirrors the reference's expected directory layout
(prepare_data.py: images/ + GT/ folders of paired files).
"""

from __future__ import annotations

import os

import numpy as np


def make_synth_split(split_dir: str, n: int, *, hw=(300, 400),
                     jitter: int = 0, alternate_orientation: bool = True,
                     seed: int = 7) -> str:
    """Write n blobby image/GT pairs under split_dir/{images,GT}.

    hw is the base (H, W); jitter adds +-jitter px per axis;
    alternate_orientation flips H/W for every other image (exercises the
    orientation-grouped bucketing of the device front-end). Idempotent:
    skips generation when the directory already holds >= n images."""
    import cv2

    img_dir = os.path.join(split_dir, "images")
    gt_dir = os.path.join(split_dir, "GT")
    if os.path.isdir(img_dir) and len(os.listdir(img_dir)) >= n:
        return split_dir
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        h, w = hw
        if alternate_orientation and i % 2:
            h, w = w, h
        if jitter:
            h += int(rng.integers(-jitter, jitter + 1))
            w += int(rng.integers(-jitter, jitter + 1))
        cy = int(rng.integers(h // 4, 3 * h // 4))
        cx = int(rng.integers(w // 4, 3 * w // 4))
        yy, xx = np.mgrid[0:h, 0:w]
        r = int(rng.integers(max(min(h, w) // 8, 4), max(min(h, w) // 3, 5)))
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        img[blob] = [190, 70, 60]
        cv2.imwrite(os.path.join(img_dir, f"s{i:04d}.jpg"), img)
        cv2.imwrite(os.path.join(gt_dir, f"s{i:04d}.png"),
                    (blob * 255).astype(np.uint8))
    return split_dir
