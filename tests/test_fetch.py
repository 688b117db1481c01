"""Offline-safe dataset fetcher: the zero-plumbing path for a future
environment with network (VERDICT r3 item 8). Exercised entirely offline by
pointing the archive URLs at file:// zips shaped exactly like the ECSSD
distribution (one nested folder per archive)."""

import json
import os
import zipfile

import numpy as np
import pytest

from sod100k_tpu.data import fetch as F


def _make_archives(tmp_path, n=5):
    cv2 = pytest.importorskip("cv2")
    src = tmp_path / "src"
    (src / "imgs").mkdir(parents=True)
    (src / "masks").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(str(src / "imgs" / f"{i:04d}.jpg"),
                    rng.integers(0, 255, (16, 20, 3), dtype=np.uint8))
        cv2.imwrite(str(src / "masks" / f"{i:04d}.png"),
                    (rng.random((16, 20)) > 0.5).astype(np.uint8) * 255)
    iz, gz = tmp_path / "images.zip", tmp_path / "gt.zip"
    for zpath, d, sub in ((iz, src / "imgs", "ECSSD_images"),
                          (gz, src / "masks", "ground_truth_mask")):
        with zipfile.ZipFile(zpath, "w") as z:
            for e in sorted(os.listdir(d)):
                z.write(d / e, f"{sub}/{e}")  # nested folder like the real zip
    return iz, gz


@pytest.fixture()
def tiny_spec(tmp_path, monkeypatch):
    iz, gz = _make_archives(tmp_path)
    monkeypatch.setitem(F.DATASETS, "TINY", {
        "archives": {"images": {"url": f"file://{iz}"},
                     "GT": {"url": f"file://{gz}"}},
        "count": 5,
    })
    return tmp_path


def test_fetch_extract_validate_and_tofu(tiny_spec, tmp_path):
    root = str(tmp_path / "data")
    logs = []
    got = F.fetch_dataset("TINY", root, log=logs.append)
    assert got == os.path.join(root, "TINY")
    assert len(os.listdir(os.path.join(got, "images"))) == 5
    assert len(os.listdir(os.path.join(got, "GT"))) == 5
    sums = json.load(open(os.path.join(root, "CHECKSUMS.json")))
    assert set(sums) == {"TINY/images", "TINY/GT"}
    # second call: tree complete -> no network, same dir
    assert F.fetch_dataset("TINY", root, log=logs.append) == got


def test_fetch_to_full_recipe_dress_rehearsal(tmp_path, monkeypatch):
    """The real-data day as ONE command (VERDICT r4 item 7): cli.smoke
    --fetch all from a COLD tmpdir — download (file:// stand-ins shaped
    like the real zips) -> validate/pin checksums -> train -> prune+
    finetune -> test -> eval -> resident sweep — exits 0 and emits the
    checkpoint-relative FmeasureResults accuracy tables. The moment a
    round has network, the real run is this command with real URLs."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    import sys

    from sod100k_tpu.data.synth import make_synth_split

    # file:// archives shaped like the real distributions (nested folder)
    for name, n, seed in (("DUTS-TR", 8, 3), ("ECSSD", 4, 4)):
        src = tmp_path / f"src_{name}"
        make_synth_split(str(src), n, hw=(96, 128), jitter=10, seed=seed)
        iz = tmp_path / f"{name}_images.zip"
        gz = tmp_path / f"{name}_gt.zip"
        for zpath, d, sub in ((iz, src / "images", f"{name}_images"),
                              (gz, src / "GT", "ground_truth_mask")):
            with zipfile.ZipFile(zpath, "w") as z:
                for e in sorted(os.listdir(d)):
                    z.write(d / e, f"{sub}/{e}")
        monkeypatch.setitem(F.DATASETS, name, {
            "archives": {"images": {"url": f"file://{iz}"},
                         "GT": {"url": f"file://{gz}"}},
            "count": n,
        })

    from cli.smoke import main

    root = str(tmp_path / "cold_data")
    save = str(tmp_path / "cold_save")
    monkeypatch.setattr(sys, "argv", [
        "smoke", "--fetch", "all", "--data-root", root, "--save-dir", save,
        "--train-epochs", "1"])
    with pytest.raises(SystemExit) as e:
        main()
    assert e.value.code == 0
    # the fetch actually populated the cold root (not the dry-data path)
    assert len(os.listdir(os.path.join(root, "DUTS-TR", "images"))) == 8
    sums = json.load(open(os.path.join(root, "CHECKSUMS.json")))
    assert "DUTS-TR/images" in sums and "ECSSD/GT" in sums
    # checkpoint-relative accuracy tables fell out of the eval stage
    table = os.path.join(save, "smoke", "FmeasureResults_ECSSD.txt")
    assert os.path.isfile(table)
    lines = open(table).read().strip().splitlines()
    assert lines and all("MaxF" in ln and "MAE" in ln for ln in lines)
    assert os.path.isfile(os.path.join(
        save, "smoke", "FmeasureResults_ECSSD_resident.txt"))


def test_fetch_rejects_checksum_mismatch(tiny_spec, tmp_path):
    root = str(tmp_path / "data2")
    bad = {"images": "0" * 64}
    assert F.fetch_dataset("TINY", root, expected=bad, log=lambda *_: None) \
        is None
    assert not os.path.isdir(os.path.join(root, "TINY", "images"))


def test_fetch_offline_returns_none(tmp_path, monkeypatch):
    monkeypatch.setitem(F.DATASETS, "GONE", {
        "archives": {"images": {"url": f"file://{tmp_path}/absent.zip"},
                     "GT": {"url": f"file://{tmp_path}/absent2.zip"}},
        "count": 1,
    })
    assert F.fetch_dataset("GONE", str(tmp_path / "d"),
                           log=lambda *_: None) is None


def test_fetch_unknown_name_lists_choices():
    with pytest.raises(ValueError, match="ECSSD"):
        F.fetch_dataset("ecssd", "/tmp/nowhere")  # lowercase typo


def test_fetch_bad_zip_removed_not_cached(tiny_spec, tmp_path):
    """An HTML error page saved as the archive (HTTP 200 lies) must not
    crash, and must be deleted so a retry re-downloads it."""
    root = tmp_path / "data3"
    arc = root / "TINY" / "images.zip"
    arc.parent.mkdir(parents=True)
    arc.write_bytes(b"<html>404 not found, honest</html>")
    logs = []
    assert F.fetch_dataset("TINY", str(root), log=logs.append) is None
    assert not arc.exists()  # garbage evicted -> retry can succeed
    assert any("not a zip" in m for m in logs)
    # retry now re-downloads the real archive and completes
    assert F.fetch_dataset("TINY", str(root), log=logs.append) is not None


def test_fetch_no_pin_on_failed_validation(tiny_spec, tmp_path, monkeypatch):
    """A structurally-short archive must NOT get its digest TOFU-pinned:
    after the mirror is fixed, the correct archive must be accepted."""
    monkeypatch.setitem(F.DATASETS["TINY"], "count", 99)  # force failure
    root = str(tmp_path / "data4")
    assert F.fetch_dataset("TINY", root, log=lambda *_: None) is None
    assert not os.path.isfile(os.path.join(root, "CHECKSUMS.json"))
    # the bad archive + partial tree are evicted, so the retry below
    # actually re-downloads instead of re-extracting the same garbage
    assert not os.path.isdir(os.path.join(root, "TINY"))
    # "mirror fixed": real count again -> retry succeeds with NO manual
    # cleanup, and only then pins
    monkeypatch.setitem(F.DATASETS["TINY"], "count", 5)
    assert F.fetch_dataset("TINY", root, log=lambda *_: None) is not None
    assert os.path.isfile(os.path.join(root, "CHECKSUMS.json"))


def test_fetch_shared_archive_with_prefixes(tmp_path, monkeypatch):
    """The DUTS-TR layout: ONE zip carrying both image and mask subtrees,
    selected by member prefix; downloads (copies) once."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    arc = tmp_path / "DUTS-TINY.zip"
    with zipfile.ZipFile(arc, "w") as z:
        for i in range(3):
            img = tmp_path / f"i{i}.jpg"
            msk = tmp_path / f"m{i}.png"
            cv2.imwrite(str(img),
                        rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
            cv2.imwrite(str(msk), (rng.random((8, 8)) > 0.5).astype(
                np.uint8) * 255)
            z.write(img, f"DUTS-TINY/DUTS-TINY-Image/s{i}.jpg")
            z.write(msk, f"DUTS-TINY/DUTS-TINY-Mask/s{i}.png")
    monkeypatch.setitem(F.DATASETS, "DTINY", {
        "archives": {
            "images": {"url": f"file://{arc}", "prefix": "DUTS-TINY-Image"},
            "GT": {"url": f"file://{arc}", "prefix": "DUTS-TINY-Mask"},
        },
        "count": 3,
    })
    got = F.fetch_dataset("DTINY", str(tmp_path / "root"),
                          log=lambda *_: None)
    assert got is not None
    assert sorted(os.listdir(os.path.join(got, "images"))) == [
        "s0.jpg", "s1.jpg", "s2.jpg"]
    assert sorted(os.listdir(os.path.join(got, "GT"))) == [
        "s0.png", "s1.png", "s2.png"]
