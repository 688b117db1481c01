"""Tests for partial pretrained loading and auxiliary data modes."""

import numpy as np
import pytest

import jax

from sod100k_tpu.arch.csnet import csnet_init
from sod100k_tpu.arch.layer_config import init_layers
from sod100k_tpu.interop.torch_ckpt import load_pretrained, pytree_to_state_dict


def test_load_pretrained_key_intersection(tmp_path):
    import torch

    lc = init_layers(8, [0.5, 0.5])
    donor = csnet_init(jax.random.key(1), lc)
    target = csnet_init(jax.random.key(2), lc)
    # donor checkpoint with one tensor reshaped (must be skipped) and one
    # subtree missing
    sd = pytree_to_state_dict(donor)
    sd["cls_layer.weight"] = np.zeros((1, 5, 1, 1), np.float32)  # wrong shape
    removed = [k for k in sd if k.startswith("stage4.0.")]
    for k in removed:
        del sd[k]
    path = str(tmp_path / "donor.pth.tar")
    torch.save({"epoch": 3, "arch": "csnet", "state_dict": sd}, path)

    out = load_pretrained(target, path)
    # matched keys copied from donor
    np.testing.assert_array_equal(
        np.asarray(out["stage0"]["0"]["conv1x1"]["conv"]["kernel"]),
        np.asarray(donor["stage0"]["0"]["conv1x1"]["conv"]["kernel"]))
    # missing subtree and mismatched shapes keep the target values
    np.testing.assert_array_equal(
        np.asarray(out["stage4"]["0"]["conv1x1"]["conv"]["kernel"]),
        np.asarray(target["stage4"]["0"]["conv1x1"]["conv"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(out["cls_layer"]["kernel"]),
                                  np.asarray(target["cls_layer"]["kernel"]))


def test_csf_joint_and_caffe_modes(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from sod100k_tpu.data.csf_dataset import (
        CAFFE_BGR_MEAN,
        CSFJointTrainData,
        load_image_caffe,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (20, 22, 3), dtype=np.uint8)
    gt = rng.integers(0, 255, (20, 22), dtype=np.uint8)
    edge = rng.integers(0, 255, (20, 22), dtype=np.uint8)
    cv2.imwrite(str(tmp_path / "i.jpg"), img)
    cv2.imwrite(str(tmp_path / "g.png"), gt)
    cv2.imwrite(str(tmp_path / "e.png"), edge)
    (tmp_path / "joint.lst").write_text("i.jpg g.png e.png\n")

    ds = CSFJointTrainData(str(tmp_path), str(tmp_path / "joint.lst"))
    s = ds[0]
    assert s["image"].shape == (20, 22, 3)
    assert s["target"].shape == (20, 22, 1)
    assert s["edge"].shape == (20, 22, 1)

    caffe = load_image_caffe(str(tmp_path / "i.jpg"))
    assert caffe.shape == (20, 22, 3)
    # BGR raw-range mean subtraction (dataset_old.py semantics); jpg is lossy
    # so compare against the decoded pixels
    decoded = cv2.imread(str(tmp_path / "i.jpg")).astype(np.float32)
    np.testing.assert_allclose(caffe, decoded - CAFFE_BGR_MEAN, atol=1e-5)
