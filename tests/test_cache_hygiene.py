"""Compile-cache hygiene: the persistent .jax_cache must never serve an
XLA:CPU AOT entry compiled for a different host's CPU features (observed as
"could lead to SIGILL" loader errors when the cache crosses machines). The
fix versions the cache directory by a host-CPU fingerprint
(sod100k_tpu/utils/cache_hygiene.py) — these tests doctor a cache tree and
prove foreign root entries are purged while other hosts' stamped
subdirectories survive."""

import os

from sod100k_tpu.utils.cache_hygiene import (
    hygienic_cache_dir,
    host_cpu_fingerprint,
    is_benign_aot_loader_line,
)


def test_fingerprint_stable_and_nonempty():
    fp = host_cpu_fingerprint()
    assert fp == host_cpu_fingerprint()
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)


def test_hygienic_dir_purges_root_entries_keeps_foreign_subdirs(tmp_path):
    base = tmp_path / "cache"
    base.mkdir()
    # pre-hygiene residue at the root: unknown provenance, must go
    (base / "jit_train_step-deadbeef").write_bytes(b"aot blob")
    # another host's stamped cache: must survive (no cross-host thrash)
    other = base / ("f" * 12)
    other.mkdir()
    (other / "jit_entry-cafe").write_bytes(b"their blob")

    d = hygienic_cache_dir(str(base))
    assert d == str(base / host_cpu_fingerprint())
    assert os.path.isdir(d)
    assert not (base / "jit_train_step-deadbeef").exists()
    assert (other / "jit_entry-cafe").exists()

    # idempotent, and this host's own entries survive repeat calls
    mine = os.path.join(d, "jit_mine-0123")
    with open(mine, "w") as f:
        f.write("my blob")
    assert hygienic_cache_dir(str(base)) == d
    assert os.path.exists(mine)


def test_hygienic_dir_fresh_base(tmp_path):
    d = hygienic_cache_dir(str(tmp_path / "newcache"))
    assert os.path.isdir(d)


# verbatim shape of the loader error this XLA build emits on every same-host
# AOT cache reload (measured r4: fresh cache dir, entry written seconds
# earlier by the same host — the named "missing" feature is an LLVM tuning
# flag the loader's cpuid enumeration never lists)
_LOADER_LINE = (
    "E0819 17:49:38.665789   18933 cpu_aot_loader.cc:210] Loading XLA:CPU "
    "AOT result. Target machine feature +{feat} is not  supported on the "
    "host machine. Machine type used for XLA:CPU compilation doesn't match "
    "the machine type for execution. Compile machine features: [+64bit,"
    "+avx512f,+prefer-no-scatter,+prefer-no-gather] vs host machine "
    "features: [64bit,avx512f]. This could lead to execution errors such "
    "as SIGILL."
)


def test_benign_aot_loader_line_classification():
    # the two LLVM tuning flags: same-host noise, drop
    assert is_benign_aot_loader_line(_LOADER_LINE.format(feat="prefer-no-gather"))
    assert is_benign_aot_loader_line(_LOADER_LINE.format(feat="prefer-no-scatter"))
    # a REAL ISA mismatch (the genuine SIGILL hazard): must stay visible
    assert not is_benign_aot_loader_line(_LOADER_LINE.format(feat="avx512f"))
    assert not is_benign_aot_loader_line(_LOADER_LINE.format(feat="amx-bf16"))
    # ordinary stderr passes through
    assert not is_benign_aot_loader_line("Traceback (most recent call last):")
    assert not is_benign_aot_loader_line(
        "dryrun CSF+Res2Net(8, data x spatial): loss=1085.49")
    assert not is_benign_aot_loader_line("")
