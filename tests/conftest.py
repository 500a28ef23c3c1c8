"""Test harness: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (the driver separately dry-runs multichip)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"   # tests never use the tunneled TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to the tunneled TPU at
# interpreter startup (before conftest runs) — every test compile would
# otherwise round-trip the tunnel.  Re-pin to host CPU post-import.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: repeat test runs skip XLA recompiles.
# NOTE: a separate directory from the TPU bench cache (.jax_cache) — CPU
# AOT executables are machine-feature-specific and loading entries
# compiled with a different feature set can SIGILL/segfault
# (cpu_aot_loader machine-type mismatch).
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
