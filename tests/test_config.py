"""Config compatibility: every shipped reference YAML merges unchanged.

The yacs-subset reimplementation (config/node.py; yacs is unavailable here)
must accept all four YAML files the reference ships, including the YAML-1.1
string-float coercion cases ('1e-20'/'1e-40' parse as strings in YAML 1.1
and must coerce to float against a float default).
"""

import os

import pytest

from sod100k_tpu.config import get_cfg

REFERENCE = "/root/reference"
SHIPPED = [
    f"{REFERENCE}/CSNet_training/configs/csnet-L-x2_train.yml",
    f"{REFERENCE}/CSNet_training/configs/csnet-L-x2.yml",
    f"{REFERENCE}/CSNet/configs/csnet-L-x1.yml",
    f"{REFERENCE}/CSNet/configs/csnet-L-x2.yml",
]


@pytest.mark.parametrize("path", SHIPPED, ids=[os.path.basename(p) + "|" +
                                               p.split("/")[-3] for p in SHIPPED])
def test_shipped_reference_yaml_merges(path):
    if not os.path.isfile(path):
        pytest.skip("reference not mounted")
    cfg = get_cfg()
    cfg.merge_from_file(path)
    # schema-typed spot checks across the nodes each file touches
    assert isinstance(cfg.SOLVER.LR, float) and cfg.SOLVER.LR > 0
    assert isinstance(cfg.FINETUNE.THRES, float)  # the 1e-20/1e-40 coercion
    assert isinstance(cfg.MODEL.BASIC_SPLIT, list)
    assert isinstance(cfg.SOLVER.STEPS, list)
    assert cfg.MODEL.ARCH == "csnet"


def test_train_yaml_values_land():
    path = SHIPPED[0]
    if not os.path.isfile(path):
        pytest.skip("reference not mounted")
    cfg = get_cfg()
    cfg.merge_from_file(path)
    # the dynamic-wd training recipe (csnet-L-x2_train.yml:15-58)
    assert cfg.SOLVER.METHOD == "Adam_dynamic_weight_decay"
    assert cfg.AUTO.ENABLE and cfg.AUTO.FLOPS.ENABLE
    assert cfg.AUTO.FLOPS.WEIGHT == pytest.approx(3.0)
    assert cfg.DATA.BATCH_SIZE == 24
    assert cfg.SOLVER.STEPS == [200, 250]
