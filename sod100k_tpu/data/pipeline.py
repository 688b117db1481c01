"""Host-side data pipeline: decode/augment/resize/normalize + device prefetch.

Reproduces the reference's two preprocessing dialects:

- CSNet (utils/prepare_data.py:91-139): skimage float image in [0,1],
  grayscale->3-channel promotion, joint random crop (<=15px per edge) +
  lr/ud flip at p=0.5, bilinear resize (half-pixel, no anti-aliasing — cv2's
  INTER_LINEAR matches skimage's reflect/anti_aliasing=False for order-1),
  ImageNet mean/std normalization. Train GTs are resized; val GTs keep native
  resolution plus (h, w).
- test.py:71-86: fixed HxW resize, or round-up-to-16-multiple when H=W=0.

Outputs are NHWC float32 (TPU layout). An iterator wrapper overlaps host work
with device compute via a background thread + jax.device_put double buffering;
under a mesh it places shards directly (one host here, so a straight
device_put with a batch sharding).
"""

from __future__ import annotations

import math
import os
import queue
import threading
from typing import Iterator

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_u8_device(image):
    """THE u8 wire-in math, shared by every fused device front-end
    (make_train_step/make_eval_step from_u8, the CSF eval step, the
    resident CSF epoch, serving artifacts with wire="u8"): raw uint8 RGB ->
    (x/255 - mean)/std in f32, the same op order as the host dialect
    (reference dataset.py:69-81 / prepare_data.py:101-132) so results are
    bit-identical. Keep every caller on this ONE implementation — the
    cross-path bit-parity claims and tests pin this exact sequence."""
    import jax.numpy as jnp

    return (image.astype(jnp.float32) / 255.0
            - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def quantize_sigmoid_u8(sig):
    """THE u8 wire-out math (the PNG quantization applied on device):
    trunc(sig * 255) as uint8 — bit-identical to the host's
    (255 * pred).astype(np.uint8) on f32 sigmoid values. Single shared
    implementation for the same reason as normalize_u8_device."""
    import jax.numpy as jnp

    return jnp.trunc(sig * 255.0).astype(jnp.uint8)


def _imread_rgb(path: str) -> np.ndarray:
    """Read image as float32 RGB in [0,1] (skimage img_as_float semantics;
    float32 instead of float64 — identical to ~1e-7 and half the host
    bandwidth, which is the end-to-end bottleneck on this machine)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)  # prepare_data.py:118-120
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    img = img[:, :, ::-1]  # BGR -> RGB
    # img_as_float divides by the dtype's max (65535 for 16-bit PNGs);
    # dividing u16 by 255 would silently feed values up to 257 downstream
    scale = np.float32(65535.0 if img.dtype == np.uint16 else 255.0)
    return img.astype(np.float32) / scale


def _imread_rgb_u8(path: str) -> np.ndarray:
    """Decode-only reader for the device front-end: uint8 RGB HWC with the
    same grayscale->3-channel / drop-alpha promotion as _imread_rgb.
    16-bit sources downconvert via the high byte (the u8 front-ends trade
    sub-1/255 precision by design); other dtypes are rejected loudly."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    elif img.dtype != np.uint8:
        raise ValueError(f"unsupported image dtype {img.dtype}: {path}")
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB


def _imread_gray_u8(path: str) -> np.ndarray:
    """GT reader. Supported envelope: 8-bit single-channel PNGs (the format
    of every published SOD GT set). A COLOR GT would decode through cv2's
    Rec.601 luma here while the reference's skimage as_gray uses Rec.709 in
    float — a documented dialect divergence outside the envelope, not a
    target of the parity gates."""
    import cv2

    g = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if g is None:
        raise FileNotFoundError(path)
    return g


def resize_bilinear_np(img: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Half-pixel bilinear resize without anti-aliasing (skimage
    mode='reflect', anti_aliasing=False equivalent for order-1)."""
    import cv2

    out = cv2.resize(img.astype(np.float32), (hw[1], hw[0]),
                     interpolation=cv2.INTER_LINEAR)
    return out


def fold_files(folder: str) -> tuple[str, list[str]]:
    """All stems in a folder sharing one extension (prepare_data.py:13-23)."""
    names = sorted(os.listdir(folder))
    if not names:
        raise ValueError(f"empty data folder {folder}")
    ext = names[0].rsplit(".", 1)[-1]
    return ext, [n[: -(len(ext) + 1)] for n in names]


class Augment:
    """Joint crop+flip augmentation (prepare_data.py:26-88): random crop of
    up to size_h/size_w pixels per edge (at least 1 from bottom/right), then
    lr or ud flip with p_flip probability (lr/ud chosen 50/50).

    Draws are INDEX-DETERMINISTIC: each sample's crop/flip comes from a
    generator keyed on (base seed, epoch seed, sample index) — the same
    scheme the resident front-end uses on device — so epochs are
    bit-reproducible at any num_threads (the reference's multi-worker
    DataLoader is schedule-dependent here; we keep its distributions and
    fix the determinism). The iterators set the epoch seed via
    SalData.set_epoch_seed before fanning out to the thread pool."""

    def __init__(self, size_h: int = 15, size_w: int = 15,
                 p_flip: float = 0.5, seed: int = 0):
        self.size_h, self.size_w, self.p_flip = size_h, size_w, p_flip
        self.seed = seed

    def __call__(self, img: np.ndarray, target: np.ndarray,
                 key: tuple[int, int] = (0, 0)):
        h, w = img.shape[:2]
        if h <= self.size_h * 2 or w <= self.size_w * 2:
            # reference prepare_data.py guard: a crop could go empty
            raise ValueError(
                f"Image size too small for augmentation: {h}x{w} vs "
                f"crop margins {self.size_h}/{self.size_w}")
        rng = np.random.default_rng((self.seed, *key))
        r1 = int(rng.integers(self.size_h))
        r2 = -int(rng.integers(self.size_h)) - 1
        c1 = int(rng.integers(self.size_w))
        c2 = -int(rng.integers(self.size_w)) - 1
        flip = None
        if rng.random() < self.p_flip:
            flip = "lr" if rng.random() < 0.5 else "ud"

        def tf(a):
            a = a[r1:r2, c1:c2]
            if flip == "lr":
                a = a[:, ::-1]
            elif flip == "ud":
                a = a[::-1]
            return a

        return tf(img), tf(target)


class SalData:
    """images/*.jpg + GT/*.png dataset (prepare_data.py:91-139).

    cache=True keeps the DECODED uint8 image/GT pairs in RAM after first
    touch (~18 bytes/pixel-pair; DUTS-TR 10k images @300x400 ~ 4.3 GB).
    JPEG decode dominates host time on a single-core host and the
    augmentation stays per-epoch random, so epochs 2+ skip straight to
    crop/flip/resize. The reference re-decodes every epoch."""

    def __init__(self, data_dir: str, size: tuple[int, int],
                 augmentation: bool = True, mode: str = "train", seed: int = 0,
                 cache: bool = False):
        img_dir = os.path.join(data_dir, "images")
        if not os.path.isdir(img_dir):
            raise ValueError(
                "Please put your images in folder 'images' and GT in 'GT'")
        self.data_dir = data_dir
        self.img_ext, self.stems = fold_files(img_dir)
        self.size = size
        self.mode = mode
        self.aug = Augment(seed=seed) if (augmentation and mode == "train") else None
        self._epoch_seed = 0
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] | None = (
            {} if cache else None)

    def set_epoch_seed(self, epoch_seed: int) -> None:
        """Key this epoch's per-sample augmentation draws (the batch
        iterators call this with their shuffle seed, so (seed, epoch, idx)
        fully determines every draw regardless of thread scheduling)."""
        self._epoch_seed = int(epoch_seed)

    def _decode_u8(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """uint8 (image HWC, gt HW) at native resolution, RAM-cached."""
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        stem = self.stems[idx]
        img = _imread_rgb_u8(os.path.join(self.data_dir, "images",
                                          f"{stem}.{self.img_ext}"))
        gt = _imread_gray_u8(os.path.join(self.data_dir, "GT", f"{stem}.png"))
        if self._cache is not None:
            self._cache[idx] = (img, gt)
        return img, gt

    def __len__(self) -> int:
        return len(self.stems)

    def raw_item(self, idx: int) -> dict:
        """Decode-only sample for the device front-end: uint8 image/GT at
        native resolution (the host does no resize/normalize work)."""
        img, gt = self._decode_u8(idx)
        return {"image_u8": img, "gt_u8": gt,
                "hw": np.asarray(gt.shape[:2], np.int32)}

    def hybrid_item(self, idx: int) -> dict:
        """Hybrid front-end sample: crop/flip augmentation and resize run on
        the host but stay uint8 end-to-end (4x less host->device traffic and
        no float math on the host); [0,1] scaling + ImageNet normalization
        are fused into the train-step dispatch (train/step.py from_u8).
        u8 resize rounds to integers — within 1/255 of the reference's
        float path, indistinguishable at training time."""
        img, gt = self._decode_u8(idx)
        if self.aug is not None:
            img, gt = self.aug(img, gt, key=(self._epoch_seed, idx))
        import cv2

        img = cv2.resize(img, (self.size[1], self.size[0]),
                         interpolation=cv2.INTER_LINEAR)
        gt = cv2.resize(gt, (self.size[1], self.size[0]),
                        interpolation=cv2.INTER_LINEAR)
        return {"image_u8": np.ascontiguousarray(img),
                "target_u8": gt[..., None]}

    def __getitem__(self, idx: int) -> dict:
        # u8/255 is exactly _imread_rgb/_imread_gray's value; routing through
        # _decode_u8 lets the float host path share the decode cache
        img_u8, gt_u8 = self._decode_u8(idx)
        img = img_u8.astype(np.float32) / np.float32(255.0)
        gt = gt_u8.astype(np.float32) / np.float32(255.0)
        h, w = gt.shape
        if self.aug is not None:
            img, gt = self.aug(img, gt, key=(self._epoch_seed, idx))
        img = resize_bilinear_np(img, self.size)
        if self.mode == "train":
            gt = resize_bilinear_np(gt, self.size)
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        sample = {"image": img.astype(np.float32),
                  "target": gt.astype(np.float32)[..., None]}
        if self.mode != "train":
            sample["h"], sample["w"] = h, w
        return sample


def preprocess_test_image(path: str, hw: tuple[int, int] = (0, 0)):
    """test.py:71-86 protocol: fixed HxW resize, or ceil-to-16-multiple.

    Returns (image NHWC float32 with batch dim, (orig_h, orig_w))."""
    img = _imread_rgb(path)
    h, w = img.shape[:2]
    if hw[0] != 0 and hw[1] != 0:
        img = resize_bilinear_np(img, hw)
    elif h % 16 != 0 or w % 16 != 0:
        img = resize_bilinear_np(
            img, (math.ceil(h / 16) * 16, math.ceil(w / 16) * 16))
    else:
        img = img.astype(np.float32)
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img.astype(np.float32)[None], (h, w)


def batches(
    dataset: SalData,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    num_threads: int = 4,
) -> Iterator[dict]:
    """Epoch iterator of stacked numpy batches with threaded decode.
    Bit-reproducible at any num_threads: augmentation draws are keyed on
    (dataset seed, this seed, sample index), not on thread arrival order."""
    order = np.arange(len(dataset))
    if hasattr(dataset, "set_epoch_seed"):
        dataset.set_epoch_seed(seed)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n_full = len(order) // batch_size
    ends = n_full * batch_size
    if not drop_last and ends < len(order):
        n_full += 1

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(num_threads, 1)) as pool:
        for b in range(n_full):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            samples = list(pool.map(dataset.__getitem__, idxs))
            targets = [s["target"] for s in samples]
            batch = {"image": np.stack([s["image"] for s in samples])}
            if len({t.shape for t in targets}) == 1:
                batch["target"] = np.stack(targets)
            else:
                # val protocol: native-resolution GTs stay a ragged list
                # (reference val_collate, prepare_data.py:142-153)
                batch["target"] = targets
            if "h" in samples[0]:
                batch["h"] = [s["h"] for s in samples]
                batch["w"] = [s["w"] for s in samples]
            yield batch


def hybrid_batches(
    dataset: SalData,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    num_threads: int = 4,
) -> Iterator[dict]:
    """Epoch iterator of uint8 train-size batches (see SalData.hybrid_item):
    {"image_u8": (N,H,W,3) u8, "target_u8": (N,H,W,1) u8}. Augmentation is
    index-deterministic (see batches), so epochs are bit-reproducible at
    any num_threads."""
    order = np.arange(len(dataset))
    if hasattr(dataset, "set_epoch_seed"):
        dataset.set_epoch_seed(seed)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n_full = len(order) // batch_size
    if not drop_last and n_full * batch_size < len(order):
        n_full += 1

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(num_threads, 1)) as pool:
        for b in range(n_full):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            samples = list(pool.map(dataset.hybrid_item, idxs))
            yield {"image_u8": np.stack([s["image_u8"] for s in samples]),
                   "target_u8": np.stack([s["target_u8"] for s in samples])}


def raw_batches(
    dataset: SalData,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    num_threads: int = 4,
    pad_multiple: int = 64,
    group_by_aspect: bool = True,
    crop_margin: int = 15,
) -> Iterator[dict]:
    """Decode-only epoch iterator for the device front-end.

    Each batch is padded (bottom/right, zeros) to the per-batch max H/W
    rounded up to pad_multiple, so the jitted device preprocess sees a small
    set of bucket shapes (one XLA program per bucket, cached). Yields
    {"image_u8": (N,Hp,Wp,3) uint8, "gt_u8": (N,Hp,Wp) uint8,
     "valid_hw": (N,2) int32} — 4x less host->device traffic than float32
    and none of the reference's host-side crop/resize work
    (prepare_data.py:91-139 all moves on device).

    group_by_aspect keeps each batch single-orientation (landscape vs
    portrait, from header-only size reads, cached) so a mixed 400x300 /
    300x400 set pads to ~(448,320) buckets instead of (448,448) — ~1.5x
    fewer bytes over the host->device link. Shuffling stays random within
    each orientation group."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    # orientation grouping only under shuffle: deterministic (val/debug)
    # iteration keeps dataset order untouched
    if group_by_aspect and shuffle and len(order):
        sizes = getattr(dataset, "_header_sizes", None)
        if sizes is None:
            from PIL import Image

            sizes = np.asarray([
                Image.open(os.path.join(
                    dataset.data_dir, "images",
                    f"{s}.{dataset.img_ext}")).size[::-1]  # (h, w)
                for s in dataset.stems], np.int64)
            dataset._header_sizes = sizes
        landscape = sizes[order, 1] >= sizes[order, 0]
        order = np.concatenate([order[landscape], order[~landscape]])
    n_full = len(order) // batch_size
    ends = n_full * batch_size
    if not drop_last and ends < len(order):
        n_full += 1

    from concurrent.futures import ThreadPoolExecutor

    def up(v: int) -> int:
        return max(int(math.ceil(v / pad_multiple) * pad_multiple), pad_multiple)

    with ThreadPoolExecutor(max_workers=max(num_threads, 1)) as pool:
        for b in range(n_full):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            samples = list(pool.map(dataset.raw_item, idxs))
            hp = up(max(int(s["hw"][0]) for s in samples))
            wp = up(max(int(s["hw"][1]) for s in samples))
            n = len(samples)
            imgs = np.zeros((n, hp, wp, 3), np.uint8)
            gts = np.zeros((n, hp, wp), np.uint8)
            hws = np.zeros((n, 2), np.int32)
            for i, s in enumerate(samples):
                h, w = int(s["hw"][0]), int(s["hw"][1])
                if h <= crop_margin * 2 or w <= crop_margin * 2:
                    # the same guard the host Augment applies
                    # (prepare_data.py:26-88 semantics): on device the crop
                    # math cannot raise data-dependently and would silently
                    # emit a degenerate gather instead
                    raise ValueError(
                        f"Image size too small for augmentation: {h}x{w} vs "
                        f"crop margins {crop_margin}/{crop_margin}")
                imgs[i, :h, :w] = s["image_u8"]
                gts[i, :h, :w] = s["gt_u8"]
                hws[i] = (h, w)
            yield {"image_u8": imgs, "gt_u8": gts, "valid_hw": hws}


def device_prefetch(it: Iterator[dict], *, mesh=None, depth: int = 2) -> Iterator[dict]:
    """Overlap host batch production with device compute: a background thread
    stages device_put batches into a small queue. Under a mesh, arrays shard
    batch-on-data and (for image-like rank>=3 arrays on a 2-D mesh) H on the
    spatial axis."""
    import jax

    if mesh is not None:
        from ..parallel import multihost

        def place(batch: dict) -> dict:
            # multi-host: the iterator's batch order is index-deterministic,
            # so every process sees the same GLOBAL batch here; each keeps its
            # own rows and the runtime stitches the global array. Falls back
            # to plain shard_feed single-process.
            return multihost.global_feed(
                multihost.local_slice_feed(batch), mesh)
    else:
        dev = jax.devices()[0]

        def place(batch: dict) -> dict:
            return {k: (jax.device_put(v, dev)
                        if isinstance(v, np.ndarray) else v)
                    for k, v in batch.items()}

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()
    abandoned = threading.Event()

    def _put(item) -> bool:
        # bounded puts so an abandoned generator (consumer broke early /
        # raised) releases the producer instead of pinning device-resident
        # batches in HBM behind a forever-blocked q.put
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in it:
                if not _put(place(batch)):
                    return
            _put(stop)
        except BaseException as e:  # surface producer failures to the consumer
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        abandoned.set()  # GeneratorExit / consumer exception: free the queue
