"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh; parity tests are
precision-checked (the compute path uses full-precision accumulation for f32,
so CPU and TPU agree to ~1e-6). Env vars must be set before jax imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-registers itself and overrides
# JAX_PLATFORMS; pin the platform again post-import (before any backend init).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache (keyed by HLO + platform, so it coexists with the
# TPU entries bench.py writes): the suite is dominated by XLA CPU compiles of
# the big train steps — reruns hit the cache and take a fraction of the time.
# The directory is versioned per host-CPU fingerprint: XLA:CPU AOT entries
# from a different machine would load with SIGILL risk (utils.cache_hygiene).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sod100k_tpu.utils.cache_hygiene import hygienic_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  hygienic_cache_dir(os.path.join(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "tests must run on the 8-device virtual CPU mesh"
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REFERENCE = "/root/reference"


def golden_input(hw, seed=0, batch=2):
    """Must match tools/gen_goldens.py:golden_input (NCHW float32)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, 3, hw[0], hw[1]), dtype=np.float32)


@pytest.fixture(scope="session")
def ref_csnet():
    """The live reference model.csnet module (torch), with the pre-3.10
    collections shim it needs; skips when the reference isn't mounted."""
    if not os.path.isdir(f"{REFERENCE}/CSNet_training"):
        pytest.skip("reference not mounted")
    import collections
    import collections.abc
    import sys

    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    sys.path.insert(0, f"{REFERENCE}/CSNet_training")
    for m in ("model", "model.csnet", "model.conv2d"):
        sys.modules.pop(m, None)
    from model import csnet as ref

    return ref


@pytest.fixture(scope="session")
def x2_stem():
    return f"{REFERENCE}/CSNet/checkpoints/csnet-L-x2/csnet-L-x2"


@pytest.fixture(scope="session")
def x1_stem():
    return f"{REFERENCE}/CSNet/checkpoints/csnet-L-x1/csnet-L-x1"
