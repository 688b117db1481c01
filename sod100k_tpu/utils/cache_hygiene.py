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
"""

from __future__ import annotations

import hashlib
import os
import platform


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
