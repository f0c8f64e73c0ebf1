"""JAX pairing vs the exact Python model + algebraic properties."""

import numpy as np
import jax.numpy as jnp

from poly_commit_tpu.core import curve as C
from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core import pairing as PR
from tests import ref_pairing as RP
from tests.ref_ec import Fp, Fp2, RefWeierstrass

G1 = (FP.BLS12_381_G1_X, FP.BLS12_381_G1_Y)
G2 = (FP.BLS12_381_G2_X, FP.BLS12_381_G2_Y)
REF1 = RefWeierstrass(Fp(FP.BLS12_381_Q), FP.BLS12_381_B)
REF2 = RefWeierstrass(Fp2(FP.BLS12_381_Q, -1), (4, 4))
SPEC = FP.FQ_BLS12_381


def g1_dev(p):
    return (
        F.from_ints(SPEC, p[0]),
        F.from_ints(SPEC, p[1]),
        jnp.zeros((), bool),
    )


def g2_dev(p):
    x = jnp.stack([F.from_ints(SPEC, p[0][0]), F.from_ints(SPEC, p[0][1])])
    y = jnp.stack([F.from_ints(SPEC, p[1][0]), F.from_ints(SPEC, p[1][1])])
    return (x, y, jnp.zeros((), bool))


import pytest


@pytest.mark.slow  # XLA:CPU compile of the full Miller-loop kernel chain
def test_pairing_matches_reference_and_bilinear():
    e_ref = RP.pairing(G1, G2)
    e_jax = PR.pairing(g1_dev(G1), g2_dev(G2))
    assert PR.f12_to_ints(e_jax) == e_ref

    # bilinearity through the python-int model exponent
    a, b = 7, 11
    pa = REF1.mul(G1, a)
    qb = REF2.mul(G2, b)
    e2 = PR.pairing(g1_dev(pa), g2_dev(qb))
    assert PR.f12_to_ints(e2) == RP.f12_pow(e_ref, a * b)


def test_pairing_smoke_vs_reference():
    """Cheap always-on coverage: one device pairing against the python
    model (the slow-marked tests add bilinearity/cancellation sweeps).
    Shares the compiled pairing kernel with the slow tests, so on a warm
    cache it costs seconds."""
    e_ref = RP.pairing(G1, G2)
    e_jax = PR.pairing(g1_dev(G1), g2_dev(G2))
    assert PR.f12_to_ints(e_jax) == e_ref


@pytest.mark.slow  # XLA:CPU compile of the multi-pairing kernel chain
def test_multi_pairing_cancellation_and_infinity():
    # e(P, Q) * e(-P, Q) == 1
    negg1 = REF1.neg(G1)
    x = jnp.stack([g1_dev(G1)[0], g1_dev(negg1)[0]])
    y = jnp.stack([g1_dev(G1)[1], g1_dev(negg1)[1]])
    inf = jnp.zeros((2,), bool)
    qx = jnp.stack([g2_dev(G2)[0]] * 2)
    qy = jnp.stack([g2_dev(G2)[1]] * 2)
    qinf = jnp.zeros((2,), bool)
    assert bool(np.asarray(PR.pairing_check((x, y, inf), (qx, qy, qinf))))

    # infinity inputs give 1
    inf1 = (x[0], y[0], jnp.ones((), bool))
    e = PR.pairing(inf1, g2_dev(G2))
    assert bool(np.asarray(PR.f12_is_one(e)))
