"""Generate golden parity fixtures by running the *reference* PyTorch models.

Run once in an environment where /root/reference is mounted; writes small .npz
files under tests/goldens/ that the test suite compares against. Inputs are
reproduced from fixed numpy seeds inside the tests, so only outputs (and
checkpoint-derived metadata) are stored.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

CASES = [
    # (name, checkpoint dir, input hw)
    ("csnet_l_x2_224", f"{REF}/CSNet/checkpoints/csnet-L-x2/csnet-L-x2", (224, 224)),
    ("csnet_l_x2_320", f"{REF}/CSNet/checkpoints/csnet-L-x2/csnet-L-x2", (320, 320)),
    ("csnet_l_x1_224", f"{REF}/CSNet/checkpoints/csnet-L-x1/csnet-L-x1", (224, 224)),
]


def golden_input(hw: tuple[int, int], seed: int = 0) -> np.ndarray:
    """Deterministic normalized input batch, NCHW float32 (shared with tests)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((2, 3, hw[0], hw[1]), dtype=np.float32)


def main() -> None:
    import collections
    import collections.abc

    import torch

    # the reference targets pre-3.10 Python (collections.Iterable)
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable

    sys.path.insert(0, f"{REF}/CSNet")
    from model.csnet import build_model  # reference inference-only model

    os.makedirs(OUT, exist_ok=True)
    for name, stem, hw in CASES:
        model = build_model(predefine=stem + ".bin")
        ck = torch.load(stem + ".pth.tar", map_location="cpu", weights_only=False)
        model.load_state_dict(ck["state_dict"])
        model.eval()
        x = torch.from_numpy(golden_input(hw))
        with torch.no_grad():
            logits = model(x).numpy()
        np.savez_compressed(
            os.path.join(OUT, name + ".npz"),
            logits=logits.astype(np.float32),
            epoch=np.int32(ck["epoch"]),
        )
        print(name, logits.shape, float(np.abs(logits).mean()))


if __name__ == "__main__":
    main()
