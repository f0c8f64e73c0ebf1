"""NTT and polynomial kernels vs exact Python models."""

import numpy as np
import pytest

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import ntt as NTT
from poly_commit_tpu.core import poly as P
from poly_commit_tpu.core.field_params import FR_BLS12_381, FR_BN254

S = FR_BLS12_381


def rand_ints(rng, mod, n):
    return [int.from_bytes(rng.bytes(40), "little") % mod for _ in range(n)]


def py_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


@pytest.mark.parametrize("spec", [FR_BLS12_381, FR_BN254], ids=lambda s: s.name)
@pytest.mark.parametrize("log_n", [3, 6])
def test_ntt_roundtrip_and_values(spec, log_n, rng):
    p = spec.modulus
    n = 1 << log_n
    coeffs = rand_ints(rng, p, n)
    a = F.from_ints(spec, coeffs)
    ev = NTT.ntt(spec, a)
    # forward values: p(w^i)
    d = NTT.domain(spec, log_n)
    got = F.to_ints(spec, ev)
    for i in [0, 1, n // 2, n - 1]:
        assert got[i] == py_eval(coeffs, d["pows"][i], p)
    # roundtrip
    back = NTT.intt(spec, ev)
    assert F.to_ints(spec, back) == coeffs


def test_ntt_batched(rng):
    p = S.modulus
    a0 = rand_ints(rng, p, 8)
    a1 = rand_ints(rng, p, 8)
    a = F.from_ints(S, [a0, a1])
    ev = NTT.ntt(S, a)
    back = NTT.intt(S, ev)
    assert F.to_ints(S, back) == [a0, a1]


def test_poly_eval_and_mul(rng):
    p = S.modulus
    ca = rand_ints(rng, p, 7)
    cb = rand_ints(rng, p, 5)
    a, b = F.from_ints(S, ca), F.from_ints(S, cb)
    xs = rand_ints(rng, p, 3)
    x = F.from_ints(S, xs)
    got = F.to_ints(S, P.evaluate(S, a, x))
    assert got == [py_eval(ca, xi, p) for xi in xs]

    prod = P.mul(S, a, b)
    expect = [0] * (len(ca) + len(cb) - 1)
    for i, ai in enumerate(ca):
        for j, bj in enumerate(cb):
            expect[i + j] = (expect[i + j] + ai * bj) % p
    assert F.to_ints(S, prod) == expect


def test_divide_by_linear(rng):
    p = S.modulus
    ca = rand_ints(rng, p, 9)
    z = rand_ints(rng, p, 1)[0]
    a = F.from_ints(S, ca)
    q, r = P.divide_by_linear(S, a, F.from_ints(S, z))
    qi = F.to_ints(S, q)
    ri = F.to_ints(S, r)
    # check a == q*(X-z) + r at a random point
    x = rand_ints(rng, p, 1)[0]
    lhs = py_eval(ca, x, p)
    rhs = (py_eval(qi, x, p) * (x - z) + ri) % p
    assert lhs == rhs
    assert ri == py_eval(ca, z, p)


def test_long_divide(rng):
    p = S.modulus
    num = rand_ints(rng, p, 10)
    den = rand_ints(rng, p, 4)
    den[-1] = den[-1] or 1
    q, r = P.long_divide(S, F.from_ints(S, num), F.from_ints(S, den))
    qi, ri = F.to_ints(S, q), F.to_ints(S, r)
    x = rand_ints(rng, p, 1)[0]
    assert py_eval(num, x, p) == (
        py_eval(qi, x, p) * py_eval(den, x, p) + py_eval(ri, x, p)
    ) % p


def test_vanishing_and_interpolate(rng):
    p = S.modulus
    xs = rand_ints(rng, p, 4)
    ys = rand_ints(rng, p, 4)
    van = P.vanishing_poly(S, F.from_ints(S, xs))
    vi = F.to_ints(S, van)
    for x in xs:
        assert py_eval(vi, x, p) == 0
    assert vi[-1] == 1  # monic
    interp = P.lagrange_interpolate(S, F.from_ints(S, xs), F.from_ints(S, ys))
    ii = F.to_ints(S, interp)
    for x, y in zip(xs, ys):
        assert py_eval(ii, x, p) == y


def test_mle(rng):
    p = S.modulus
    nv = 4
    table = rand_ints(rng, p, 1 << nv)
    point = rand_ints(rng, p, nv)
    t = F.from_ints(S, table)
    z = F.from_ints(S, point)
    got = F.to_ints(S, P.mle_evaluate(S, t, z))
    # direct: sum_b table[b] * eq(z, b), variable i at bit i
    expect = 0
    for b, v in enumerate(table):
        w = 1
        for i in range(nv):
            w = w * (point[i] if (b >> i) & 1 else (1 - point[i])) % p
        expect = (expect + v * w) % p
    assert got == expect
    # eq_table consistency: <table, eq> == evaluation
    eq = P.eq_table(S, z)
    prods = F.mont_mul(S, t, eq)
    import jax.numpy as jnp

    acc = F.zeros(S)
    for i in range(1 << nv):
        acc = F.add(S, acc, prods[i])
    assert F.to_ints(S, acc) == expect


def test_powers(rng):
    p = S.modulus
    x = rand_ints(rng, p, 1)[0]
    pw = P.powers(S, F.from_ints(S, x), 11)
    assert F.to_ints(S, pw) == [pow(x, i, p) for i in range(11)]


def test_ntt_limbs_first_matches_portable(rng):
    """core/ntt_lf (fused limbs-first tier) == core/ntt on random inputs,
    forward and inverse."""
    from poly_commit_tpu.core import ff, ntt as NTT, ntt_lf

    p = S.modulus
    for log_n in (4, 7):
        n = 1 << log_n
        ints = rand_ints(rng, p, n)
        a_last = F.from_ints(S, ints)          # (n, L)
        a_first = ff.from_ints(S, ints)        # (L, n)
        exp = F.to_ints(S, NTT.ntt(S, a_last))
        got = ff.to_ints(S, ntt_lf.ntt(S, a_first))
        assert got == exp
        back = ff.to_ints(S, ntt_lf.intt(S, ntt_lf.ntt(S, a_first)))
        assert back == [v % p for v in ints]
