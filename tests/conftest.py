"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests (SURVEY §4 plan item c) run against
`--xla_force_host_platform_device_count=8` so multi-chip code paths are
exercised without TPU hardware. Must run before jax is imported.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so the package imports without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-appends its platform to
# jax_platforms at interpreter start; override after import so tests run
# on the virtual 8-device CPU mesh regardless. OSDM_TPU_TESTS=1 keeps
# the real platform so the TPU-gated tests (fused-sampler parity,
# posterior-kernel) actually run on hardware instead of skipping.
if not os.environ.get("OSDM_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
