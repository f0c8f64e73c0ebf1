"""MarlinPST13 end-to-end (mirrors marlin_pst13_pc/mod.rs:693-844)."""

import pytest

from poly_commit_tpu.core.transcript import PoseidonSponge
from poly_commit_tpu.pcs import errors
from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial
from poly_commit_tpu.pcs.pst13 import MarlinPST13, MVPoly, divide_at_point

PC = MarlinPST13
SPEC = PC.spec


def test_divide_at_point_identity():
    """p(X) - p(z) == sum_i (X_i - z_i) w_i(X) at random points."""
    rng = HostRng(3)
    nv, deg = 3, 4
    poly = MVPoly.rand(rng, nv, deg, num_terms=10)
    z = [rng.field_int(SPEC) for _ in range(nv)]
    ws = divide_at_point(poly, z)
    p = SPEC.modulus
    for _ in range(3):
        x = [rng.field_int(SPEC) for _ in range(nv)]
        lhs = (poly.evaluate(x) - poly.evaluate(z)) % p
        rhs = 0
        for i, w in enumerate(ws):
            rhs = (rhs + (x[i] - z[i]) * w.evaluate(x)) % p
        assert lhs == rhs


def _run(nv=2, deg=2, num_polys=1, num_points=1, hiding=True, corrupt=False,
         seed=5):
    rng = HostRng(seed)
    pp = PC.setup(deg, num_vars=nv, rng=rng)
    ck, vk = PC.trim(pp, deg, 1)
    polys = [
        LabeledPolynomial(
            f"p{i}", MVPoly.rand(rng, nv, deg, num_terms=6),
            hiding_bound=1 if hiding else None, num_vars=nv,
        )
        for i in range(num_polys)
    ]
    comms, states = PC.commit(ck, polys, rng)
    query_set = set()
    for pi in range(num_points):
        pt = tuple(rng.field_int(SPEC) for _ in range(nv))
        for lp in polys:
            query_set.add((lp.label, (f"pt{pi}", pt)))
    sponge = PoseidonSponge(SPEC)
    proofs, values = PC.batch_open(ck, polys, comms, query_set, sponge, states, rng)
    if corrupt:
        k = sorted(values)[0]
        values = dict(values)
        values[k] = (values[k] + 1) % SPEC.modulus
    return bool(
        PC.batch_check(vk, comms, query_set, values, proofs, PoseidonSponge(SPEC))
    )


def test_single_poly():
    assert _run(nv=2, deg=2, num_polys=1, num_points=1, hiding=True)


def test_two_polys_two_points_no_hiding():
    assert _run(nv=2, deg=2, num_polys=2, num_points=2, hiding=False)


def test_three_vars():
    assert _run(nv=3, deg=2, num_polys=1, num_points=1, hiding=True, seed=9)


def test_wrong_value_rejected():
    assert not _run(nv=2, deg=2, corrupt=True)


def test_degree_too_large():
    rng = HostRng(7)
    pp = PC.setup(2, num_vars=2, rng=rng)
    ck, vk = PC.trim(pp, 2)
    lp = LabeledPolynomial("big", MVPoly(2, {(3, 0): 5}), num_vars=2)
    with pytest.raises(errors.PCError):
        PC.commit(ck, [lp], rng)
