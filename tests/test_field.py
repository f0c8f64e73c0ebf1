"""Field arithmetic vs exact Python-int model (all four field specs)."""

import numpy as np
import pytest

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core.field_params import (
    FQ_BLS12_381,
    FR_BLS12_381,
    FR_BN254,
    FQ_BN254,
)

SPECS = [FR_BLS12_381, FQ_BLS12_381, FR_BN254, FQ_BN254]


def rand_ints(rng, spec, n):
    return [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % spec.modulus
            for _ in range(n)] + [0, 1, spec.modulus - 1]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(spec, rng):
    xs = rand_ints(rng, spec, 10)
    a = F.from_ints(spec, xs)
    assert F.to_ints(spec, a) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec, rng):
    xs = rand_ints(rng, spec, 12)
    ys = list(reversed(xs))
    a, b = F.from_ints(spec, xs), F.from_ints(spec, ys)
    p = spec.modulus
    assert F.to_ints(spec, F.add(spec, a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert F.to_ints(spec, F.sub(spec, a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert F.to_ints(spec, F.neg(spec, a)) == [(-x) % p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(spec, rng):
    xs = rand_ints(rng, spec, 12)
    ys = list(reversed(xs))
    a, b = F.from_ints(spec, xs), F.from_ints(spec, ys)
    p = spec.modulus
    assert F.to_ints(spec, F.mont_mul(spec, a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert F.to_ints(spec, F.mont_sqr(spec, a)) == [(x * x) % p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inv_pow(spec, rng):
    xs = rand_ints(rng, spec, 6)
    a = F.from_ints(spec, xs)
    p = spec.modulus
    expect = [pow(x, -1, p) if x else 0 for x in xs]
    assert F.to_ints(spec, F.inv(spec, a)) == expect
    assert F.to_ints(spec, F.batch_inv(spec, a)) == expect
    assert F.to_ints(spec, F.pow_const(spec, a, 17)) == [pow(x, 17, p) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_two_adic_root(spec):
    if spec.two_adicity < 2:
        pytest.skip("no interesting 2-adic subgroup")
    w = spec.two_adic_root
    assert pow(w, 1 << spec.two_adicity, spec.modulus) == 1
    assert pow(w, 1 << (spec.two_adicity - 1), spec.modulus) == spec.modulus - 1
