"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers an axon TPU backend in every Python
process (JAX_PLATFORMS=axon in the env). Tests must run on CPU with 8 virtual
devices for sharding coverage, so we override the platform via jax.config
*before* any backend is initialized (conftest imports before test modules).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# EC-heavy graphs (MSM/pairing scans) compile slowly on XLA:CPU; cache them.
# NOTE: the CPU cache dir is SEPARATE from the TPU one (.jax_cache): axon
# (remote-TPU) runs compile on the server machine and persist CPU-AOT
# executables for the *server's* microarchitecture — loading those in a
# local CPU process SIGILL/segfaults. Never share the two dirs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long host-side checks (full final-exp powers etc.)"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
