"""Ligero (univariate + multilinear) and Brakedown end-to-end tests
(mirroring linear_codes/{univariate_ligero,multilinear_ligero,
multilinear_brakedown}/tests.rs)."""

import numpy as np
import pytest

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import ntt as NTT
from poly_commit_tpu.core.field_params import FR_BLS12_381, FR_BN254
from poly_commit_tpu.pcs import errors
from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial
from poly_commit_tpu.pcs.linear_codes import (
    MultilinearBrakedown,
    MultilinearLigero,
    UnivariateLigero,
)
from tests.harness import rand_ml_poly, rand_poly, run_ml_template, run_template


def test_reed_solomon_matches_direct_eval():
    """RS encode == evaluation on the extended domain (utils.rs:300-326)."""
    from poly_commit_tpu.pcs.linear_codes.ligero import LigeroPCParams, _rs_encode_rows

    spec = FR_BLS12_381
    rng = HostRng(1)
    msg_ints = rng.field_ints(spec, 8)
    msg = F.from_ints(spec, msg_ints)[None]
    ck = LigeroPCParams(spec=spec, rho_inv=4)
    enc = _rs_encode_rows(msg, ck)[0]
    d = NTT.domain(spec, 5)  # 8 * 4 = 32 points
    p = spec.modulus
    got = F.to_ints(spec, enc)
    for i in [0, 1, 7, 31]:
        w = int(d["pows"][i])
        expect = sum(c * pow(w, k, p) for k, c in enumerate(msg_ints)) % p
        assert got[i] == expect


def test_univariate_ligero_end_to_end():
    assert run_template(
        UnivariateLigero, max_degree=15, supported_degree=15,
        num_polys=1, num_points=1, hiding=False,
    )


def test_univariate_ligero_two_points():
    assert run_template(
        UnivariateLigero, max_degree=15, supported_degree=15,
        num_polys=2, num_points=2, hiding=False,
    )


def test_univariate_ligero_wrong_value():
    assert not run_template(
        UnivariateLigero, max_degree=15, supported_degree=15,
        num_polys=1, num_points=1, hiding=False, corrupt_value=True,
    )


def test_multilinear_ligero_end_to_end():
    assert run_ml_template(MultilinearLigero, num_vars=4, num_polys=1,
                           num_points=1, hiding=False)


def test_multilinear_ligero_wrong_value():
    assert not run_ml_template(
        MultilinearLigero, num_vars=4, num_polys=1, num_points=1,
        hiding=False, corrupt_value=True,
    )


def test_brakedown_base_case_end_to_end():
    # poly small enough that the expander recursion is empty (pure RS base)
    assert run_ml_template(MultilinearBrakedown, num_vars=4, num_polys=1,
                           num_points=1, hiding=False)


def test_brakedown_recursive_end_to_end():
    """Force at least one expander level with a small base_len."""
    from poly_commit_tpu.core.transcript import PoseidonSponge
    from poly_commit_tpu.pcs.linear_codes.brakedown import default_params

    PC = MultilinearBrakedown
    rng = HostRng(13)
    nv = 6
    pp = default_params(PC.spec, rng, 1 << nv, True, base_len=4)
    assert pp.a_dims, "expected a nontrivial recursion"
    ck = vk = pp
    lp = LabeledPolynomial("p", rand_ml_poly(PC, rng, nv), num_vars=nv)
    comms, states = PC.commit(ck, [lp], rng)
    point = tuple(rng.field_int(PC.spec) for _ in range(nv))
    qs = {("p", ("pt_0", point))}
    sponge = PoseidonSponge(PC.spec)
    proofs, values = PC.batch_open(ck, [lp], comms, qs, sponge, states, rng)
    sponge2 = PoseidonSponge(PC.spec)
    assert PC.batch_check(vk, comms, qs, values, proofs, sponge2)


def test_brakedown_degenerate_mats():
    """make_mat must accept zero-column / zero-nnz matrices: the dims
    recursion emits them for small base_len (e.g. nv=6/base_len=4 yields a
    (4, 0, 0) B level; the reference's SprsMat accepts these,
    brakedown.rs:260-333 + utils.rs:24-107)."""
    import numpy as np

    from poly_commit_tpu.core.field_params import FR_BLS12_381 as spec
    from poly_commit_tpu.core import field as Fld
    from poly_commit_tpu.pcs.linear_codes.brakedown import make_mat

    rng = HostRng(7)
    # zero columns: row_mul maps (n, L) -> (0, L)
    m0 = make_mat(spec, 4, 0, 0, rng)
    v = rng.field_elems(spec, 4)
    out = m0.row_mul(spec, v)
    assert out.shape == (0, spec.n_limbs)
    # zero nnz per row: output is all zeros of width m
    mz = make_mat(spec, 4, 3, 0, rng)
    out = mz.row_mul(spec, rng.field_elems(spec, 4))
    assert out.shape == (3, spec.n_limbs)
    assert np.all(np.asarray(Fld.to_ints(spec, out)) == 0)


def test_merkle_path_tamper_detected():
    from poly_commit_tpu.utils.merkle import MerkleTree, verify_path

    leaves = [bytes([i]) * 8 for i in range(5)]
    tree = MerkleTree(leaves)
    path = tree.generate_proof(3)
    assert verify_path(path, tree.root, leaves[3])
    assert not verify_path(path, tree.root, leaves[2])
    path.siblings[0] = b"corrupt"
    assert not verify_path(path, tree.root, leaves[3])
