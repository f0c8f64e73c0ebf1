"""Two-curve scheme instantiation: Marlin/Sonic/PST13 over BLS12-377,
mirroring the reference's per-scheme two-curve test matrix
(/root/reference/poly-commit/src/marlin/marlin_pc/mod.rs:531-815 — every
pairing-scheme test runs over Bls12_377 AND Bls12_381).

The BLS12-381 instantiations are covered by test_marlin_pc.py /
test_sonic_pc.py / test_pst13.py; these drive the same protocol flows on
the second curve end-to-end (commit -> batch_open -> batch_check, degree
bounds + hiding for Marlin, wrong-value rejection).
"""

import pytest

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core.field_params import FR_BLS12_377
from poly_commit_tpu.core.transcript import PoseidonSponge
from poly_commit_tpu.pcs.data_structures import (
    HostRng,
    LabeledPolynomial,
)
from poly_commit_tpu.pcs.marlin_pc import MarlinKZG10_BLS12_377
from poly_commit_tpu.pcs.pst13 import MVPoly, MarlinPST13_BLS12_377
from poly_commit_tpu.pcs.sonic_pc import SonicKZG10_BLS12_377

SPEC = FR_BLS12_377


def _sponge():
    return PoseidonSponge(SPEC)


def _poly(rng, n, **kw):
    return LabeledPolynomial(
        kw.pop("label", "f"), F.from_ints(SPEC, rng.field_ints(SPEC, n)), **kw
    )


def _drive_univariate(PC, rng, hiding=False, bound=None):
    pp = PC.setup(16, rng=rng)
    enforced = [bound] if bound is not None else None
    ck, vk = PC.trim(pp, 12, 2 if hiding else 0, enforced)
    lp = _poly(
        rng, 9,
        hiding_bound=2 if hiding else None,
        degree_bound=bound,
    )
    comms, states = PC.commit(ck, [lp], rng if hiding else None)
    z = rng.field_int(SPEC)
    qs = {("f", ("z0", z))}
    proofs, values = PC.batch_open(ck, [lp], comms, qs, _sponge(), states, rng)
    assert PC.batch_check(vk, comms, qs, values, proofs, _sponge(), rng)
    # wrong value must reject
    bad = {k: (int(v) + 1) % SPEC.modulus for k, v in values.items()}
    assert not PC.batch_check(vk, comms, qs, bad, proofs, _sponge(), rng)
    return values


def test_marlin_377_end_to_end():
    _drive_univariate(MarlinKZG10_BLS12_377, HostRng(101))


def test_marlin_377_hiding_and_degree_bound():
    _drive_univariate(MarlinKZG10_BLS12_377, HostRng(102), hiding=True, bound=10)


def test_sonic_377_end_to_end():
    _drive_univariate(SonicKZG10_BLS12_377, HostRng(103))


def test_sonic_377_degree_bound():
    _drive_univariate(SonicKZG10_BLS12_377, HostRng(104), bound=10)


def test_pst13_377_end_to_end():
    PC = MarlinPST13_BLS12_377
    rng = HostRng(105)
    nv = 3
    pp = PC.setup(4, num_vars=nv, rng=rng)
    ck, vk = PC.trim(pp, 4)
    poly = MVPoly.rand(rng, nv, 4, num_terms=6, spec=SPEC)
    lp = LabeledPolynomial("m", poly, num_vars=nv, hiding_bound=2)
    comms, states = PC.commit(ck, [lp], rng)
    point = tuple(rng.field_int(SPEC) for _ in range(nv))
    qs = {("m", ("p0", point))}
    proofs, values = PC.batch_open(ck, [lp], comms, qs, _sponge(), states, rng)
    assert PC.batch_check(vk, comms, qs, values, proofs, _sponge(), rng)
    bad = {k: (int(v) + 1) % SPEC.modulus for k, v in values.items()}
    assert not PC.batch_check(vk, comms, qs, bad, proofs, _sponge(), rng)


def test_marlin_377_two_polys_one_point():
    PC = MarlinKZG10_BLS12_377
    rng = HostRng(106)
    pp = PC.setup(16, rng=rng)
    ck, vk = PC.trim(pp, 12)
    lps = [_poly(rng, 7, label="a"), _poly(rng, 11, label="b")]
    comms, states = PC.commit(ck, lps)
    z = rng.field_int(SPEC)
    qs = {("a", ("z0", z)), ("b", ("z0", z))}
    proofs, values = PC.batch_open(ck, lps, comms, qs, _sponge(), states, rng)
    assert len(values) == 2
    assert PC.batch_check(vk, comms, qs, values, proofs, _sponge(), rng)
