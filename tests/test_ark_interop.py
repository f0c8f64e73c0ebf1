"""arkworks-interop golden vectors: the committed transcript must replay
byte-for-byte (see poly_commit_tpu/pcs/ark_interop.py for the Rust recipe
that reproduces the same bytes on a live arkworks build)."""

import json
import os

import pytest

from poly_commit_tpu.core import curve as C
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core.ark_compat import (
    ChaCha20Rng,
    ark_fp_rand,
    ark_g1_rand,
    ark_g2_rand,
    ark_test_rng,
)
from poly_commit_tpu.pcs.ark_interop import marlin_ark_golden

VECTORS = os.path.join(os.path.dirname(__file__), "vectors",
                       "marlin_ark_golden.json")


def test_g1_rand_is_in_subgroup():
    from poly_commit_tpu.core import hostec

    rng = ChaCha20Rng.from_rng(ark_test_rng())
    p = ark_g1_rand(rng, C.BLS12_381_G1)
    hg = hostec.host_group(C.BLS12_381_G1)
    assert p is not None
    # r * P == infinity via unreduced double-and-add
    acc = None
    r = FP.BLS12_381_R
    for bit in reversed(range(r.bit_length())):
        acc = hg._jdouble(acc)
        if (r >> bit) & 1:
            acc = hg._jmadd(acc, p)
    assert hg._jto_affine(acc) is None


def test_g2_rand_is_in_subgroup():
    from poly_commit_tpu.core import hostec

    rng = ChaCha20Rng.from_rng(ark_test_rng())
    q = ark_g2_rand(rng, C.BLS12_381_G2)
    hg = hostec.host_group(C.BLS12_381_G2)
    acc = None
    r = FP.BLS12_381_R
    for bit in reversed(range(r.bit_length())):
        acc = hg._jdouble(acc)
        if (r >> bit) & 1:
            acc = hg._jmadd(acc, q)
    assert hg._jto_affine(acc) is None


def test_fr_rand_deterministic():
    a = ark_fp_rand(ark_test_rng(), FP.FR_BLS12_381)
    b = ark_fp_rand(ark_test_rng(), FP.FR_BLS12_381)
    assert a == b != 0


def test_golden_vectors_replay():
    with open(VECTORS) as f:
        committed = json.load(f)
    regenerated = marlin_ark_golden(committed["degree"])
    assert regenerated == committed
    assert committed["check"] is True


def test_bounded_golden_vectors_replay():
    """Degree-bound + hiding transcript (shifted powers + gamma_g chain)."""
    from poly_commit_tpu.pcs.ark_interop import marlin_ark_golden_bounded

    path = os.path.join(os.path.dirname(__file__), "vectors",
                        "marlin_bounded_ark_golden.json")
    with open(path) as f:
        committed = json.load(f)
    regenerated = marlin_ark_golden_bounded(
        committed["degree"], committed["degree_bound"],
        committed["hiding_bound"],
    )
    assert regenerated == committed
    assert committed["check"] is True


def test_sonic_golden_vectors_replay():
    """SonicKZG10 transcript (neg-G2 powers + combined opening)."""
    from poly_commit_tpu.pcs.ark_interop import sonic_ark_golden

    path = os.path.join(os.path.dirname(__file__), "vectors",
                        "sonic_ark_golden.json")
    with open(path) as f:
        committed = json.load(f)
    regenerated = sonic_ark_golden(
        committed["degree"], committed["degree_bound"],
        committed["hiding_bound"],
    )
    assert regenerated == committed
    assert committed["check"] is True
