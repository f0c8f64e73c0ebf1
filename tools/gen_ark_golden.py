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

from poly_commit_tpu.pcs.ark_interop import (  # noqa: E402
    marlin_ark_golden,
    marlin_ark_golden_bounded,
    sonic_ark_golden,
)

VEC = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")
for name, fn in (
    ("marlin_ark_golden.json", marlin_ark_golden),
    ("marlin_bounded_ark_golden.json", marlin_ark_golden_bounded),
    ("sonic_ark_golden.json", sonic_ark_golden),
):
    d = fn()
    with open(os.path.join(VEC, name), "w") as f:
        json.dump(d, f, indent=1)
    print(name, "check:", d["check"])
