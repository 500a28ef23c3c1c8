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
# (cpu_aot_loader machine-type mismatch).  The directory is keyed by a
# fingerprint of the host CPU features so a cache written on one machine
# is never loaded on another.
def _machine_key() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


_CACHE = os.path.join(os.path.dirname(__file__), "..",
                      f".jax_cache_cpu_{_machine_key()}")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------- markers
#
# `pytest -m smoke` = fast signal (<5 min warm): pure-host units + one
# tiny codec round trip per major path.  Everything else is the full
# verification net (run file-sharded via ./run_tests.sh).
_SMOKE_FILES = {
    "test_cabac.py", "test_native_cabac.py", "test_transforms.py",
    "test_depquant.py", "test_rate_ctrl.py", "test_utility_apps.py",
}
_SMOKE_TESTS = {
    "test_merge_candidates_order_and_dedup",
    "test_merge_candidates_parallel_merge_level",
    "test_merge_candidates_tmvp_hmvp",
    "test_intra_part_roundtrip_bitexact",
    "test_merge_p_roundtrip_bitexact",
    "test_mm_p_roundtrip",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "smoke: fast signal subset")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _SMOKE_FILES or item.name.split("[")[0] in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
