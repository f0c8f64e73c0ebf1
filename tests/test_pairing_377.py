"""BLS12-377 G2 + pairing (the reference's second test curve: every pairing
scheme is instantiated over BLS12-377 AND BLS12-381,
/root/reference/poly-commit/src/marlin/marlin_pc/mod.rs:531-815) and the
generic pairing engine (core/pairing_generic.py) that serves both.

Ground truth used:
  - curve equations + subgroup order (structural: on-curve, r*P = inf)
  - D-twist consistency: b' == b / xi for xi = u
  - the decomposed fast final exponentiation vs the plain (q^12-1)/r power
  - BLS12-381 cross-check vs the independently validated core/host_pairing
"""

import pytest

from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core import pairing_generic as PG

Q = FP.BLS12_377_Q
R = FP.BLS12_377_R
G2X = FP.BLS12_377_G2_X
G2Y = FP.BLS12_377_G2_Y


def _e377():
    return PG.bls12_377()


def _g1_mul(P, k, q):
    def dbl(P):
        if P is None:
            return None
        x1, y1 = P
        lam = 3 * x1 * x1 * pow(2 * y1, -1, q) % q
        x3 = (lam * lam - 2 * x1) % q
        return (x3, (lam * (x1 - x3) - y1) % q)

    def add(P, S):
        if P is None:
            return S
        if S is None:
            return P
        if P[0] == S[0]:
            return dbl(P) if P[1] == S[1] else None
        lam = (S[1] - P[1]) * pow(S[0] - P[0], -1, q) % q
        x3 = (lam * lam - P[0] - S[0]) % q
        return (x3, (lam * (P[0] - x3) - P[1]) % q)

    acc = None
    for bit in bin(k)[2:]:
        acc = dbl(acc)
        if bit == "1":
            acc = add(acc, P)
    return acc


def test_377_g2_constants_structurally_valid():
    e = _e377()
    # b' = b / xi (D-twist, b = 1, xi = u)
    assert e.f2_mul(FP.BLS12_377_G2_B, e.xi) == (1 % Q, 0)
    # generator on curve: y^2 = x^3 + b'
    lhs = e.f2_mul(G2Y, G2Y)
    rhs = e.f2_add(e.f2_mul(e.f2_mul(G2X, G2X), G2X), FP.BLS12_377_G2_B)
    assert lhs == rhs


def test_377_g2_generator_has_order_r():
    e = _e377()

    def dbl(P):
        x1, y1 = P
        lam = e.f2_mul(
            e.f2_mul((3, 0), e.f2_mul(x1, x1)), e.f2_inv(e.f2_add(y1, y1))
        )
        x3 = e.f2_sub(e.f2_mul(lam, lam), e.f2_add(x1, x1))
        return (x3, e.f2_sub(e.f2_mul(lam, e.f2_sub(x1, x3)), y1))

    def add(P, S):
        if P is None:
            return S
        lam = e.f2_mul(e.f2_sub(S[1], P[1]), e.f2_inv(e.f2_sub(S[0], P[0])))
        x3 = e.f2_sub(e.f2_sub(e.f2_mul(lam, lam), P[0]), S[0])
        return (x3, e.f2_sub(e.f2_mul(lam, e.f2_sub(P[0], x3)), P[1]))

    base = (G2X, G2Y)
    # r*G = infinity cannot be represented affinely; check (r-1)*G == -G
    acc_r_minus_1 = None
    for bit in bin(R - 1)[2:]:
        if acc_r_minus_1 is not None:
            acc_r_minus_1 = dbl(acc_r_minus_1)
        if bit == "1":
            acc_r_minus_1 = (
                base if acc_r_minus_1 is None else add(acc_r_minus_1, base)
            )
    assert acc_r_minus_1[0] == G2X
    assert acc_r_minus_1[1] == e.f2_neg(G2Y)


def test_377_pairing_bilinear_and_nondegenerate():
    e = _e377()
    g1 = (FP.BLS12_377_G1_X, FP.BLS12_377_G1_Y, False)
    g2 = (G2X, G2Y, False)
    a, b = 7, 11
    ag1 = _g1_mul((g1[0], g1[1]), a, Q) + (False,)
    abg1 = _g1_mul((g1[0], g1[1]), a * b, Q) + (False,)
    v1 = e.pairing(ag1, g2)
    v2 = e.pairing(abg1, g2)
    assert v1 != e.f12_one()
    assert e.f12_pow(v1, b) == v2
    neg = (abg1[0], (Q - abg1[1]) % Q, False)
    assert e.pairing_product_is_one([abg1, neg], [g2, g2])
    assert not e.pairing_product_is_one([abg1, ag1], [g2, g2])
    # infinity entries contribute the identity
    assert e.pairing_product_is_one(
        [abg1, neg, (0, 0, True)], [g2, g2, g2]
    )


@pytest.mark.slow
def test_377_fast_final_exp_equals_plain_power():
    e = _e377()
    f = [(123456789 % Q, 987654321 % Q)] * 6
    f = list(f)
    f[0] = (1, 2)
    f[3] = (55, 77)
    assert e.final_exp(f) == e.f12_pow(f, (Q**12 - 1) // R)


def test_381_engine_matches_host_pairing():
    """The generic engine over BLS12-381 agrees with core/host_pairing on a
    real KZG-shaped product check."""
    from poly_commit_tpu.core import host_pairing as HP

    e = PG.bls12_381()
    q = FP.BLS12_381_Q
    g1 = (FP.BLS12_381_G1_X, FP.BLS12_381_G1_Y, False)
    g2 = (FP.BLS12_381_G2_X, FP.BLS12_381_G2_Y, False)
    s = 5
    sg1 = _g1_mul((g1[0], g1[1]), s, q) + (False,)
    neg_g1 = (g1[0], (q - g1[1]) % q, False)
    # e(5 G1, G2) * e(-G1, 5 G2) == 1; 5 G2 via the engine's own f2 ops
    def g2_mul(P, k):
        def dbl(P):
            x1, y1 = P
            lam = e.f2_mul(
                e.f2_mul((3, 0), e.f2_mul(x1, x1)),
                e.f2_inv(e.f2_add(y1, y1)),
            )
            x3 = e.f2_sub(e.f2_mul(lam, lam), e.f2_add(x1, x1))
            return (x3, e.f2_sub(e.f2_mul(lam, e.f2_sub(x1, x3)), y1))

        def add(P, S):
            lam = e.f2_mul(
                e.f2_sub(S[1], P[1]), e.f2_inv(e.f2_sub(S[0], P[0]))
            )
            x3 = e.f2_sub(e.f2_sub(e.f2_mul(lam, lam), P[0]), S[0])
            return (x3, e.f2_sub(e.f2_mul(lam, e.f2_sub(P[0], x3)), P[1]))

        acc = None
        for bit in bin(k)[2:]:
            if acc is not None:
                acc = dbl(acc)
            if bit == "1":
                acc = P if acc is None else add(acc, P)
        return acc

    sg2 = g2_mul((g2[0], g2[1]), s) + (False,)
    for engine_ok, host_ok in [
        (
            e.pairing_product_is_one([sg1, neg_g1], [g2, sg2]),
            HP.pairing_product_is_one([sg1, neg_g1], [g2, sg2]),
        ),
        (
            e.pairing_product_is_one([sg1, neg_g1], [g2, g2]),
            HP.pairing_product_is_one([sg1, neg_g1], [g2, g2]),
        ),
    ]:
        assert engine_ok == host_ok
    assert e.pairing_product_is_one([sg1, neg_g1], [g2, sg2])
