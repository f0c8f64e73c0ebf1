"""R1CS gadget layer driven by a REAL InnerProductArgPC proof.

The reference ships only the `PCCheckVar` interface (constraints.rs:119-190);
pcs/r1cs.py implements the substrate (ConstraintSystem, FpVar, NonNativeVar,
TEPointVar) plus an in-circuit IPA succinct check. Here we:

  * generate an InnerProductArgPC proof at degree 7 (JubJub, log_d = 3),
  * replay the verifier transcript on host to extract the opening challenge,
    the first round challenge, and the per-round u_j (the gadget consumes
    them as allocated inputs, per constraints.rs:104-115),
  * synthesize IpaSuccinctCheckGadget.succinct_check and assert the system
    is satisfied,
  * tamper with the claimed evaluation and assert it is NOT satisfied,
  * exercise the device-side satisfaction check (three sparse mat-vecs) on
    a small arithmetic circuit.
"""

import pytest

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core import poly as P
from poly_commit_tpu.core.serialize import field_to_bytes
from poly_commit_tpu.core.transcript import PoseidonSponge
from poly_commit_tpu.pcs import r1cs
from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial
from poly_commit_tpu.pcs.ipa_pc import (
    HGROUP,
    SPEC,
    InnerProductArgPC,
    _host_pt_bytes,
    _ro_challenge,
)

DEGREE = 7  # 2^3 - 1: three halving rounds


@pytest.fixture(scope="module")
def ipa_instance():
    """One real proof + the transcript values the gadget consumes."""
    PC = InnerProductArgPC
    rng = HostRng(99)
    pp = PC.setup(DEGREE, rng=rng)
    ck, vk = PC.trim(pp, DEGREE)
    coeffs = F.from_ints(SPEC, rng.field_ints(SPEC, DEGREE + 1))
    lp = LabeledPolynomial("f", coeffs)  # no hiding, no degree bound
    comms, states = PC.commit(ck, [lp])
    z = rng.field_int(SPEC)
    v = int(F.to_ints(SPEC, P.evaluate(SPEC, coeffs, F.from_ints(SPEC, z))))

    sponge = PoseidonSponge(SPEC)
    proof = PC.open(ck, [lp], comms, z, sponge, states)

    # the host verifier accepts, and hands us the round challenges u_j
    sponge2 = PoseidonSponge(SPEC)
    check_poly = PC.succinct_check(vk, comms, z, [v], proof, sponge2)
    assert check_poly is not None, "host succinct_check must accept"

    # replay the opening-challenge squeezes (one ch + one unused ch2 per
    # polynomial — ipa_pc.open squeezes both regardless of degree bounds)
    sponge3 = PoseidonSponge(SPEC)
    ch = sponge3.squeeze_challenge_128()
    _ch2 = sponge3.squeeze_challenge_128()

    # first round challenge = RO(combined_comm || z || combined_v)
    combined_comm = HGROUP.mul(comms[0].commitment.comm, ch)
    combined_v = ch * v % SPEC.modulus
    data = (
        _host_pt_bytes(combined_comm)
        + field_to_bytes(SPEC, z)
        + field_to_bytes(SPEC, combined_v)
    )
    first_round = _ro_challenge(data)
    return dict(
        vk=vk,
        comm=comms[0].commitment.comm,
        z=z,
        v=v,
        proof=proof,
        ch=ch,
        first_round=first_round,
        round_chs=list(check_poly.challenges),
    )


def _synthesize(inst, value_override=None):
    cs = r1cs.ConstraintSystem(FP.FR_BLS12_381)
    r = FP.JUBJUB_R
    v = inst["v"] if value_override is None else value_override
    comm_vars = [r1cs.TEPointVar.witness(cs, inst["comm"])]
    value_vars = [r1cs.NonNativeVar.witness(cs, r, v)]
    point_var = r1cs.NonNativeVar.witness(cs, r, inst["z"])
    h_var = r1cs.TEPointVar.witness(cs, inst["vk"].h)
    frc = r1cs.NonNativeVar.witness(cs, r, inst["first_round"])
    proof = inst["proof"]
    pf = r1cs.IpaProofVar(
        l_vec=[r1cs.TEPointVar.witness(cs, p) for p in proof.l_vec],
        r_vec=[r1cs.TEPointVar.witness(cs, p) for p in proof.r_vec],
        final_comm_key=r1cs.TEPointVar.witness(cs, proof.final_comm_key),
        c=r1cs.NonNativeVar.witness(cs, r, proof.c),
    )
    rand = r1cs.PCCheckRandomDataVar(
        opening_challenges=[r1cs.NonNativeVar.witness(cs, r, inst["ch"])],
        batching_rands=[
            r1cs.NonNativeVar.witness(cs, r, u) for u in inst["round_chs"]
        ],
    )
    r1cs.IpaSuccinctCheckGadget.succinct_check(
        cs, r, comm_vars, value_vars, point_var, h_var, frc, pf, rand, DEGREE
    )
    return cs


def test_valid_proof_satisfies(ipa_instance):
    cs = _synthesize(ipa_instance)
    assert cs.rows, "gadget must emit constraints"
    bad = cs.first_unsatisfied()
    assert bad is None, f"row {bad} unsatisfied on a valid proof"


def test_tampered_value_unsatisfied(ipa_instance):
    bad_v = (ipa_instance["v"] + 1) % FP.JUBJUB_R
    cs = _synthesize(ipa_instance, value_override=bad_v)
    assert cs.first_unsatisfied() is not None


def test_tampered_final_key_unsatisfied(ipa_instance):
    import dataclasses

    proof = ipa_instance["proof"]
    fx, fy = proof.final_comm_key
    bad = dict(ipa_instance)
    bad["proof"] = dataclasses.replace(
        proof, final_comm_key=(fx, (-fy) % FP.FR_BLS12_381.modulus)
    )
    cs = _synthesize(bad)
    assert cs.first_unsatisfied() is not None


def test_device_satisfaction_small_circuit():
    """is_satisfied_device on a small but non-trivial circuit: a TE point
    double-and-add plus a non-native mul (keeps the (rows, nnz) matvec on
    CPU small; the full IPA gadget is checked on host above)."""
    cs = r1cs.ConstraintSystem(FP.FR_BLS12_381)
    g = (FP.JUBJUB_G_X, FP.JUBJUB_G_Y)
    hg = HGROUP
    p1 = r1cs.TEPointVar.witness(cs, g)
    p1.enforce_on_curve()
    p2 = p1.double().add(p1)  # 3*G
    expected = hg.mul(g, 3)
    p2.enforce_equal(
        r1cs.TEPointVar(
            r1cs.FpVar.constant(cs, expected[0]),
            r1cs.FpVar.constant(cs, expected[1]),
        )
    )
    a = r1cs.NonNativeVar.witness(cs, FP.JUBJUB_R, 12345678901234567890)
    b = r1cs.NonNativeVar.witness(cs, FP.JUBJUB_R, 98765432109876543210)
    ab = a.mul(b)
    exp = 12345678901234567890 * 98765432109876543210 % FP.JUBJUB_R
    ab.enforce_congruent(r1cs.NonNativeVar.witness(cs, FP.JUBJUB_R, exp))
    assert cs.is_satisfied()
    assert cs.is_satisfied_device()

    # flip one witness: both checks must reject
    cs.assignment[2] = (cs.assignment[2] + 1) % cs.p
    assert not cs.is_satisfied()
    assert not cs.is_satisfied_device()
