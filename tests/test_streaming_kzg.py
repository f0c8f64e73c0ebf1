"""Streaming KZG: time prover, chunked (space-analogue) consistency,
multi-point opens, folded tree (mirrors streaming_kzg/tests.rs)."""

import numpy as np

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import poly as P
from poly_commit_tpu.core.field_params import FR_BLS12_381
from poly_commit_tpu.pcs import streaming_kzg as SK
from poly_commit_tpu.pcs.data_structures import HostRng

SPEC = FR_BLS12_381


def _poly(rng, n):
    return F.from_ints(SPEC, rng.field_ints(SPEC, n))


def test_single_point_open_verify():
    rng = HostRng(31)
    ck = SK.CommitterKey.new(11, 3, rng)
    vk = ck.verifier_key()
    f = _poly(rng, 12)
    comm = ck.commit(f)
    z = rng.field_int(SPEC)
    ev, proof = ck.open(f, z)
    expect = int(F.to_ints(SPEC, P.evaluate(SPEC, f, F.from_ints(SPEC, z))))
    assert ev == expect
    assert SK.verify(vk, comm, z, ev, proof)
    assert not SK.verify(vk, comm, z, (ev + 1) % SPEC.modulus, proof)


def test_chunked_commit_matches_plain():
    """time/space consistency (streaming_kzg/tests.rs:40-83)."""
    rng = HostRng(32)
    ck = SK.CommitterKey.new(11, 3, rng)
    f = _poly(rng, 12)
    plain = ck.commit(f)
    chunked = ck.commit_chunked(f, chunk=4)
    assert plain.point == chunked.point
    chunked5 = ck.commit_chunked(f, chunk=5)
    assert plain.point == chunked5.point


def test_multi_point_open_verify():
    rng = HostRng(33)
    ck = SK.CommitterKey.new(11, 3, rng)
    vk = ck.verifier_key()
    f1 = _poly(rng, 12)
    f2 = _poly(rng, 10)
    comms = [ck.commit(f1), ck.commit(f2)]
    pts = [rng.field_int(SPEC) for _ in range(3)]
    chal = rng.field_int(SPEC)
    proof = ck.batch_open_multi_points([f1, f2], pts, chal)

    def evals(f):
        return [
            int(F.to_ints(SPEC, P.evaluate(SPEC, f, F.from_ints(SPEC, z))))
            for z in pts
        ]

    e1, e2 = evals(f1), evals(f2)
    assert SK.verify_multi_points(vk, comms, pts, [e1, e2], proof, chal)
    bad = list(e1)
    bad[0] = (bad[0] + 1) % SPEC.modulus
    assert not SK.verify_multi_points(vk, comms, pts, [bad, e2], proof, chal)


def test_space_open_matches_time():
    """Chunked (space) single-point open == time open: identical evaluation
    and proof group element (space.rs:65-95, tests.rs:40-83)."""
    rng = HostRng(35)
    ck = SK.CommitterKey.new(11, 3, rng)
    f = _poly(rng, 12)
    z = rng.field_int(SPEC)
    ev_t, pf_t = ck.open(f, z)
    for chunk in (4, 5, 16):
        ev_s, pf_s = ck.open_chunked(f, z, chunk)
        assert ev_s == ev_t
        assert pf_s.point == pf_t.point


def test_space_multi_point_open_matches_time():
    """Chunked multi-point open == time open_multi_points; remainder equals
    f mod Z (space.rs:98-136)."""
    rng = HostRng(36)
    ck = SK.CommitterKey.new(11, 3, rng)
    f = _poly(rng, 12)
    pts = [rng.field_int(SPEC) for _ in range(3)]
    pf_t = ck.open_multi_points(f, pts)
    ptsd = F.from_ints(SPEC, pts)
    zpoly = P.vanishing_poly(SPEC, ptsd)
    _, rem_exp = P.long_divide(SPEC, f, zpoly)
    for chunk in (4, 6, 16):
        rem, pf_s = ck.open_multi_points_chunked(f, pts, chunk)
        assert pf_s.point == pf_t.point
        assert F.to_ints(SPEC, rem) == F.to_ints(SPEC, rem_exp)
        # remainder evaluates to f's values on the points
        for z in pts:
            zf = F.from_ints(SPEC, z)
            assert F.to_ints(SPEC, P.evaluate(SPEC, rem, zf)) == F.to_ints(
                SPEC, P.evaluate(SPEC, f, zf)
            )


def test_space_open_folding():
    """open_folding (space.rs:209-262): one pass produces the eta-combined
    proof over all folded polynomials + their remainders mod Z."""
    rng = HostRng(37)
    ck = SK.CommitterKey.new(15, 3, rng)
    f = _poly(rng, 16)
    rhos = [rng.field_int(SPEC) for _ in range(2)]  # levels of length 8, 4
    pts = [rng.field_int(SPEC) for _ in range(2)]
    etas = [rng.field_int(SPEC) for _ in range(2)]
    rems, proof = ck.open_folding_chunked(f, rhos, pts, etas, chunk=8)
    # expected: per-level quotient q_j = f_j / Z; proof = commit(sum eta_j q_j)
    folds = ck.fold_polynomials(f, rhos)
    ptsd = F.from_ints(SPEC, pts)
    zpoly = P.vanishing_poly(SPEC, ptsd)
    comb = None
    for fj, eta, rem in zip(folds, etas, rems):
        q, r = P.long_divide(SPEC, fj, zpoly)
        assert F.to_ints(SPEC, rem) == F.to_ints(SPEC, r)
        scaled = P.scale(SPEC, q, F.from_ints(SPEC, eta))
        comb = scaled if comb is None else P.add(SPEC, comb, scaled)
    exp = ck.commit(comb)
    assert proof.point == exp.point


def test_folded_tree():
    """Folded polynomials evaluate consistently: f^(j+1)(x^2) =
    (f^(j)(x) + f^(j)(-x))/2 + rho_j (f^(j)(x) - f^(j)(-x))/(2x)."""
    rng = HostRng(34)
    ck = SK.CommitterKey.new(15, 2, rng)
    f = _poly(rng, 16)
    rhos = [rng.field_int(SPEC) for _ in range(4)]
    folds = ck.fold_polynomials(f, rhos)
    assert [g.shape[0] for g in folds] == [8, 4, 2, 1]
    p = SPEC.modulus
    x = rng.field_int(SPEC)
    cur_ints = F.to_ints(SPEC, f)
    for rho, g in zip(rhos, folds):
        ev = cur_ints[0::2]
        od = cur_ints[1::2]
        expect = [(a + rho * b) % p for a, b in zip(ev, od + [0])]
        assert F.to_ints(SPEC, g) == (expect if len(expect) > 1 else expect)
        cur_ints = expect
    # commitments to the folds == commitments of the recomputed polys
    comms = ck.commit_folding(f, rhos)
    assert len(comms) == 4
