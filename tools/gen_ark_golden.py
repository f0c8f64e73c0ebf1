"""Regenerate tests/vectors/marlin_ark_golden.json (CPU backend).

Must configure the backend BEFORE importing the package: the axon TPU
plugin registers itself in every process and module imports would
initialize it (JAX_PLATFORMS=cpu in the env is not enough).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from poly_commit_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=True)

from poly_commit_tpu.pcs.ark_interop import marlin_ark_golden  # noqa: E402

print(json.dumps(marlin_ark_golden(), indent=1))
