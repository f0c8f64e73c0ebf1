"""Curve group ops vs the exact Python reference model."""

import numpy as np
import pytest

from poly_commit_tpu.core import curve as C
from poly_commit_tpu.core import field_params as FP
from tests.ref_ec import Fp, Fp2, RefEdwards, RefWeierstrass


def ref_group(g):
    if g.name == "bls12_381_g1":
        return RefWeierstrass(Fp(FP.BLS12_381_Q), FP.BLS12_381_B)
    if g.name == "bn254_g1":
        return RefWeierstrass(Fp(FP.BN254_Q), FP.BN254_B)
    if g.name == "bls12_377_g1":
        return RefWeierstrass(Fp(FP.BLS12_377_Q), FP.BLS12_377_B)
    if g.name == "bls12_381_g2":
        return RefWeierstrass(Fp2(FP.BLS12_381_Q, -1), (4, 4))
    raise ValueError(g.name)


def jax_affine_ints(g, p):
    x, y, inf = g.to_affine(p)
    xi, yi = g.fops.to_int(x), g.fops.to_int(y)
    return None if bool(np.asarray(inf)) else (xi, yi)


WGROUPS = [C.BLS12_381_G1, C.BLS12_381_G2, C.BN254_G1, C.BLS12_377_G1]


@pytest.mark.parametrize("g", WGROUPS, ids=lambda g: g.name)
def test_generator_on_curve(g):
    ref = ref_group(g)
    gen = (g.gen_x, g.gen_y)
    assert ref.on_curve(gen)
    gj = g.generator()
    f = g.fops
    assert bool(np.asarray(g.on_curve(gj[0], gj[1])))


@pytest.mark.parametrize("g", WGROUPS, ids=lambda g: g.name)
def test_add_double_mul(g):
    ref = ref_group(g)
    gen = (g.gen_x, g.gen_y)
    P2 = ref.double(gen)
    P3 = ref.add(P2, gen)
    P7 = ref.mul(gen, 7)

    gj = g.generator()
    d = g.double(gj)
    assert jax_affine_ints(g, d) == P2
    t = g.add(d, gj)
    assert jax_affine_ints(g, t) == P3
    # mixed add: (2G) + affine G
    m = g.madd(d, gj[0], gj[1])
    assert jax_affine_ints(g, m) == P3
    bits = np.array([1, 1, 1], dtype=np.uint32)  # 7
    s = g.scalar_mul(gj, bits)
    assert jax_affine_ints(g, s) == P7


@pytest.mark.parametrize("g", [C.BLS12_381_G1], ids=lambda g: g.name)
def test_edge_cases(g):
    ref = ref_group(g)
    gen = (g.gen_x, g.gen_y)
    gj = g.generator()
    inf = g.infinity()
    # P + O, O + P, O + O
    assert jax_affine_ints(g, g.add(gj, inf)) == gen
    assert jax_affine_ints(g, g.add(inf, gj)) == gen
    assert jax_affine_ints(g, g.add(inf, inf)) is None
    # P + P (add must fall into doubling)
    assert jax_affine_ints(g, g.add(gj, gj)) == ref.double(gen)
    # P + (-P)
    assert jax_affine_ints(g, g.add(gj, g.neg(gj))) is None
    # madd edge cases: O + affine Q, P + affine(-P)
    assert jax_affine_ints(g, g.madd(inf, gj[0], gj[1])) == gen
    ng = g.neg(gj)
    assert jax_affine_ints(g, g.madd(gj, ng[0], ng[1])) is None
    # madd doubling path
    assert jax_affine_ints(g, g.madd(gj, gj[0], gj[1])) == ref.double(gen)
    # subgroup order annihilates the generator
    r = g.scalar_spec.modulus
    bits = np.array([(r >> i) & 1 for i in reversed(range(r.bit_length()))], np.uint32)
    assert jax_affine_ints(g, g.scalar_mul(gj, bits)) is None


def test_batched_ops():
    g = C.BLS12_381_G1
    ref = ref_group(g)
    gen = (g.gen_x, g.gen_y)
    ks = [2, 3, 5, 11, 100]
    gj = g.generator(shape=(len(ks),))
    bits = np.array(
        [[(k >> i) & 1 for k in ks] for i in reversed(range(7))], np.uint32
    )
    pts = g.scalar_mul(gj, bits)
    x, y, inf = g.to_affine(pts)
    xi = g.fops.to_int(x)
    yi = g.fops.to_int(y)
    for j, k in enumerate(ks):
        expect = ref.mul(gen, k)
        assert (xi[j], yi[j]) == expect


def test_jubjub():
    g = C.JUBJUB
    ref = RefEdwards(FP.BLS12_381_R, FP.JUBJUB_D)
    gen = (FP.JUBJUB_G_X, FP.JUBJUB_G_Y)
    assert ref.on_curve(gen)
    gj = g.generator()
    assert bool(np.asarray(g.on_curve(gj[0], gj[1])))
    # doubling / addition / identity
    x, y, inf = g.to_affine(g.double(gj))
    assert (g.fops.to_int(x), g.fops.to_int(y)) == ref.add(gen, gen)
    idp = g.add(gj, g.neg(gj))
    assert bool(np.asarray(g.is_infinity(idp)))
    # order * cofactor kills the point
    k = FP.JUBJUB_R
    bits = np.array([(k >> i) & 1 for i in reversed(range(k.bit_length()))], np.uint32)
    kg = g.scalar_mul(gj, bits)
    assert bool(np.asarray(g.is_infinity(kg)))
