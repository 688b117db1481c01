"""tools/mesh_plan.py: the multi-chip communication story is compiled
evidence — these tests pin (a) the HLO collective-inventory parser, (b)
that the PRODUCT sharded CSNet step's compiled program carries at least
its gradient bytes in cross-device reduction traffic, and (c) that halo
exchange appears exactly when the mesh gains a spatial axis."""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "mesh_plan", os.path.join(REPO, "tools", "mesh_plan.py"))
mp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mp)


def test_collective_inventory_parser():
    hlo = """
  %ar = f32[100]{0} all-reduce(f32[100]{0} %a), replica_groups={}
  %t = (f32[4,2]{1,0}, bf16[8]{0}) all-reduce(%x, %y), channel_id=1
  %tiled = (f32[4,2]{1,0:T(8,128)}, f32[8]{0}) all-reduce(%x, %y)
  %cp = f32[2,1,64,3]{3,2,1,0} collective-permute(%h), source_target_pairs={{0,1}}
  %ag = u8[16]{0} all-gather(%q), dimensions={0}
  %not_a_collective = f32[9]{0} add(f32[9]{0} %a, f32[9]{0} %b)
  %async = (f32[64]{0}, f32[64]{0}) collective-permute-start(%h2)
"""
    inv = mp.collective_inventory(hlo)
    assert inv["all-reduce"]["count"] == 3
    assert inv["all-reduce"]["bytes"] == \
        400 + (4 * 2 * 4 + 8 * 2) + (4 * 2 * 4 + 8 * 4)
    # sync form counted; async '-start' tuples (operand+result, would
    # double-count) are NOT — the tool asserts the CPU backend instead
    assert inv["collective-permute"]["count"] == 1
    assert inv["collective-permute"]["bytes"] == 2 * 1 * 64 * 3 * 4
    assert inv["all-gather"]["bytes"] == 16
    assert "add" not in inv


def test_predict_model_sane():
    inv = {"all-reduce": {"count": 1, "bytes": 64 << 20},
           "collective-permute": {"count": 4, "bytes": 8 << 20}}
    p4 = mp.predict(inv, 4, step_ms=100.0, ici_bw=4.5e10)
    assert 0.0 < p4["weak_scaling_eff"] <= 1.0
    # more traffic -> lower efficiency
    inv2 = {"all-reduce": {"count": 1, "bytes": 640 << 20}}
    p4b = mp.predict(inv2, 4, step_ms=100.0, ici_bw=4.5e10)
    assert p4b["weak_scaling_eff"] < p4["weak_scaling_eff"]
    # no collectives -> perfect weak scaling
    assert mp.predict({}, 8, 100.0, 4.5e10)["weak_scaling_eff"] == 1.0


def test_csnet_sharded_step_communication_story():
    """Compile the real CSNet train step (tiny shapes) over 4x1 and 4x2
    meshes on the virtual CPU mesh and check the structural claims."""
    txt_dp, grad_bytes = mp.lower_csnet_step(
        mp._mesh(4, 1), per_dev_batch=2, hw=32, width=8)
    inv_dp = mp.collective_inventory(txt_dp)
    # gradients (+ global-batch BN stats, loss) must cross the mesh:
    # total reduction traffic >= the gradient bytes themselves
    red = sum(inv_dp.get(k, {"bytes": 0})["bytes"]
              for k in ("all-reduce", "reduce-scatter", "collective-permute",
                        "all-gather"))
    assert red >= grad_bytes

    txt_2d, _ = mp.lower_csnet_step(
        mp._mesh(4, 2), per_dev_batch=2, hw=32, width=8)
    inv_2d = mp.collective_inventory(txt_2d)
    # the spatial axis must introduce halo exchange: strictly more
    # collective-permutes than the pure-DP program
    cp_dp = inv_dp.get("collective-permute", {"count": 0})["count"]
    cp_2d = inv_2d.get("collective-permute", {"count": 0})["count"]
    assert cp_2d > cp_dp
