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
