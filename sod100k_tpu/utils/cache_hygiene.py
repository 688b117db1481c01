"""Persistent-compile-cache hygiene.

The repo keeps a persistent XLA compile cache (.jax_cache) because first
compiles over the axon tunnel take minutes. The hazard: XLA:CPU entries are
AOT-compiled for the build host's CPU features, and jax's cache key does NOT
include them — an entry written on an AVX-512 host loads on a plainer host
with "could lead to SIGILL" loader errors (observed in the round-3 multichip
dry-run tail) and can kill the process mid-suite. TPU executables don't
depend on host CPU features, but cache keys are opaque hashes, so entries
can't be told apart by backend.

Remedy: version the cache location by a host-CPU-feature fingerprint — each
host family gets its own subdirectory under .jax_cache, so a cache shared
across machines (driver host vs build container on one filesystem) never
loads a foreign AOT entry AND never purges another host's warm entries.
Pre-hygiene entries at the directory root (unknown provenance) are removed
once.

One residual, MEASURED to be same-host noise (r4): this XLA build's AOT
loader warns "Target machine feature +prefer-no-gather/-scatter is not
supported on the host machine ... could lead to SIGILL" even when reloading
an entry the SAME process family wrote seconds earlier into a fresh cache
dir. Those two names are LLVM *tuning* flags the compile-side TargetMachine
records but the loader-side host-feature enumeration (cpuid-derived) never
lists — no cache partitioning can reconcile them. They are harmless
(tuning preferences, not ISA requirements). is_benign_aot_loader_line()
classifies exactly that artifact so callers that forward child stderr (the
multichip dry-run bootstrap) can drop the noise while passing REAL feature
mismatches (e.g. a missing +avx512f) through untouched.
"""

from __future__ import annotations

import hashlib
import os
import platform
import re


def host_cpu_fingerprint() -> str:
    """Stable hash of the CPU feature flags this host can execute.

    /proc/cpuinfo "flags" on Linux (the features XLA:CPU AOT entries are
    specialized against); falls back to the platform tuple elsewhere."""
    flags: set[str] = set()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags.update(line.split(":", 1)[1].split())
    except OSError:
        pass
    basis = " ".join(sorted(flags)) or platform.processor()
    return hashlib.sha256(
        f"{platform.machine()}|{basis}".encode()).hexdigest()[:12]


def hygienic_cache_dir(base: str) -> str:
    """The compile-cache directory for THIS host: `base`/<cpu fingerprint>.

    Also removes pre-hygiene cache files sitting at the `base` root — they
    may have been written by a CPU-feature-incompatible machine and loading
    them risks SIGILL; entries from other (still-stamped) hosts in their own
    subdirectories are left untouched."""
    d = os.path.join(base, host_cpu_fingerprint())
    os.makedirs(d, exist_ok=True)
    try:
        entries = os.listdir(base)
    except OSError:
        entries = []
    for entry in entries:
        p = os.path.join(base, entry)
        if os.path.isfile(p):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass  # another process cleaning concurrently
    return d


# LLVM tuning preferences (not ISA features): the AOT compile side records
# them in the TargetMachine feature string, the loader's cpuid-based host
# enumeration never lists them, so every same-host cache reload "mismatches"
# on exactly these. Measured benign (r4): fresh cache dir, same host, entry
# written seconds earlier — warning still fires, execution is correct.
_BENIGN_AOT_TUNING_FLAGS = ("prefer-no-gather", "prefer-no-scatter")

_AOT_LOADER_RE = re.compile(
    r"cpu_aot_loader.*Target machine feature \+(\S+) is not +supported")


def is_benign_aot_loader_line(line: str) -> bool:
    """True iff `line` is the known-benign XLA:CPU AOT loader warning: a
    cpu_aot_loader feature-mismatch complaint whose named feature is one of
    the LLVM tuning flags above. A mismatch on any REAL ISA feature (e.g.
    +avx512f missing on the host) returns False and must stay visible —
    that is the genuine SIGILL hazard the fingerprint directories prevent."""
    m = _AOT_LOADER_RE.search(line)
    return bool(m) and m.group(1) in _BENIGN_AOT_TUNING_FLAGS
