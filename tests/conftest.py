"""Test harness: run everything on an 8-device virtual CPU mesh.

This is the analog of the reference's local-cluster test rig
(grpc_testlib.h MakeTestCluster): multi-"chip" semantics without hardware.
Must run before jax initializes its backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# A site customization forces jax_platforms="axon,cpu" (the tunneled TPU),
# overriding the env var — override it back so tests run on the 8-device
# virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by XLA CPU compiles of the
# probing/scatter loops; cache them across runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long multi-process / subprocess-cluster tests")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
