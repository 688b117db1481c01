"""Full-recipe smoke driver e2e: the real-data-readiness contract.

Runs cli.smoke's five-stage chain (train -> prune+finetune -> test ->
eval -> resident TESTALL sweep) on a synthetic DUTS-TR-shaped tree — the
exact path a real dataset would take with --data-root (reference flow:
train.py -> finetune.py -> test.py -> eval.py, SURVEY.md section 3)."""

import pytest

pytest.importorskip("cv2")


def test_smoke_dry_data_full_recipe(tmp_path):
    from cli.smoke import make_dry_data, run_smoke

    data_root = str(tmp_path / "data")
    make_dry_data(data_root, n_train=8, n_test=4, hw=(80, 96))
    out = run_smoke(data_root, str(tmp_path / "save"), train_epochs=1,
                    finetune_epochs=1, image_hw=64, batch_size=4,
                    log=lambda *a, **k: None)
    assert out["ok"], out
    assert out["eval"]["ECSSD"]["max_f"] > 0.0
    # the resident sweep scored the same checkpoints without PNGs
    assert out["resident_eval"]["ECSSD"]["epoch"] >= 1
