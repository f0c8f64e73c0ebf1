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
# The cache dir is machine-keyed and separate from the TPU one — see
# poly_commit_tpu/utils/cache.py for the two failure modes that forces.
import sys  # noqa: E402

sys.path.insert(0, "/root/repo")
from poly_commit_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute XLA:CPU compiles or long host-side checks; "
        "skipped unless RUN_SLOW=1 (the 1-core eval box cannot afford them "
        "in the default suite run — they stay covered by opt-in runs and "
        "by the persistent compile cache once built)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW", "0") not in ("0", "false", ""):
        return
    skip = pytest.mark.skip(reason="slow: set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
