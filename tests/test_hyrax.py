"""HyraxPC end-to-end (mirrors hyrax/tests.rs; BN254 G1)."""

import numpy as np
import pytest

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.pcs import errors
from poly_commit_tpu.pcs.hyrax import HyraxPC, sample_generators
from tests.harness import rand_ml_poly, run_ml_template

PC = HyraxPC


def test_generators_on_curve():
    p = FP.FQ_BN254.modulus
    for (x, y) in sample_generators(4):
        assert y * y % p == (x**3 + FP.BN254_B) % p


def test_mle_evaluation_consistency():
    """The committed matrix + tensors reproduce mle_evaluate."""
    from poly_commit_tpu.core import poly as P
    from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial

    rng = HostRng(5)
    nv = 4
    table = rand_ml_poly(PC, rng, nv)
    point = tuple(rng.field_int(PC.spec) for _ in range(nv))
    lp = LabeledPolynomial("t", table, num_vars=nv)
    v = PC.evaluate_poly(lp, point)
    # exact reference: sum over hypercube of eq * value
    spec = PC.spec
    vals = F.to_ints(spec, table)
    pmod = spec.modulus
    acc = 0
    for b, val in enumerate(vals):
        term = val
        for i in range(nv):
            zi = point[i] % pmod
            term = term * (zi if (b >> i) & 1 else (1 - zi)) % pmod
        acc = (acc + term) % pmod
    assert v == acc


def test_single_poly():
    assert run_ml_template(PC, num_vars=4, num_polys=1, num_points=1)


def test_two_polys_two_points():
    assert run_ml_template(PC, num_vars=4, num_polys=2, num_points=2)


def test_odd_num_vars_rejected():
    from poly_commit_tpu.pcs.data_structures import HostRng

    with pytest.raises(errors.PCError):
        PC.setup(0, num_vars=3, rng=HostRng(0))


def test_tampered_proof_rejected():
    """Corrupting z in the dot-product argument must fail the check."""
    from poly_commit_tpu.core.transcript import PoseidonSponge
    from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial

    rng = HostRng(9)
    nv = 4
    pp = PC.setup(0, num_vars=nv, rng=rng)
    ck, vk = PC.trim(pp)
    lp = LabeledPolynomial("p", rand_ml_poly(PC, rng, nv), hiding_bound=1, num_vars=nv)
    comms, states = PC.commit(ck, [lp], rng)
    point = tuple(rng.field_int(PC.spec) for _ in range(nv))
    sponge = PoseidonSponge(PC.spec)
    proof = PC.open(ck, [lp], comms, point, sponge, states, rng)
    proof[0].z[0] = (proof[0].z[0] + 1) % PC.spec.modulus
    sponge2 = PoseidonSponge(PC.spec)
    assert not PC.check(vk, comms, point, [0], proof, sponge2)
