"""Sharded-kernel consistency: N-chip results must equal single-chip results
(the analogue of the reference's streaming time/space consistency tests,
streaming_kzg/tests.rs:40-83)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poly_commit_tpu.core import curve as C
from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core import msm as M
from poly_commit_tpu.core import ntt as NTT
from poly_commit_tpu.parallel import mesh as PM

G1 = C.BLS12_381_G1


def _points(n, rng):
    ks = rng.integers(1, 1 << 30, size=n, dtype=np.int64)
    ksc = np.zeros((n, 16), np.uint32)
    ksc[:, 0] = ks & 0xFFFF
    ksc[:, 1] = (ks >> 16) & 0xFFFF
    return G1.to_affine(M.fixed_base_mul(G1, G1.generator(), jnp.asarray(ksc)))


def test_msm_sharded_matches_single(rng):
    n = 64
    mesh = PM.make_mesh(8)
    pts = _points(n, rng)
    sc_ints = [int(x) for x in rng.integers(0, 1 << 62, size=n)]
    sc = M.scalars_from_ints(G1.scalar_spec, sc_ints)

    single = M.msm(G1, sc, pts, 4, 4)
    sharded = PM.msm_sharded(G1, PM.shard_batch(sc, mesh),
                             tuple(PM.shard_batch(a, mesh) for a in pts),
                             mesh, 4, 2)
    assert bool(np.asarray(G1.eq(single, sharded)))


def test_msm_sharded_with_padding(rng):
    mesh = PM.make_mesh(8)
    n = 50  # not divisible by 8
    pts = _points(n, rng)
    sc_ints = [int(x) for x in rng.integers(0, 1 << 62, size=n)]
    sc = M.scalars_from_ints(G1.scalar_spec, sc_ints)
    single = M.msm(G1, sc, pts, 4, 4)
    psc, ppts = PM.pad_msm_inputs(G1, sc, pts, 8)
    sharded = PM.msm_sharded(G1, psc, ppts, mesh, 4, 2)
    assert bool(np.asarray(G1.eq(single, sharded)))


@pytest.mark.slow
def test_msm_sharded_fast_path(rng, monkeypatch):
    """The limbs-first fast kernel (core/msm_tpu) under shard_map — the
    actual TPU multi-chip hot path. POLY_COMMIT_FAST_MSM=1 forces its
    pure-JAX fallback on the CPU mesh; the traced branch exercises
    _fold_device/_combine_sw_device exactly as on hardware.

    slow: under the shard_map trace the CPU fallback's eager EC ops become
    one giant unrolled XLA:CPU module (>20 min, ~15 GB compile RSS on the
    1-core box). Covered by opt-in RUN_SLOW=1 runs and by the real-TPU
    bench, which exercises the same traced branch on hardware."""
    monkeypatch.setenv("POLY_COMMIT_FAST_MSM", "1")
    n = 16
    mesh = PM.make_mesh(4)
    pts = _points(n, rng)
    sc_ints = [int(x) for x in rng.integers(0, 1 << 62, size=n)]
    sc = M.scalars_from_ints(G1.scalar_spec, sc_ints)
    single = M.msm(G1, sc, pts, 4, 4)
    sharded = PM.msm_sharded(G1, PM.shard_batch(sc, mesh),
                             tuple(PM.shard_batch(a, mesh) for a in pts),
                             mesh)  # c/lanes None -> fast-path dispatch
    assert bool(np.asarray(G1.eq(single, sharded)))


def test_kzg_commit_under_mesh_bit_identical(rng):
    """kzg10.commit/open route their SRS MSMs through msm_sharded inside a
    use_mesh context; commitments and proofs must equal single-chip."""
    from poly_commit_tpu.core.field_params import FR_BLS12_381
    from poly_commit_tpu.pcs import kzg10
    from poly_commit_tpu.pcs.data_structures import HostRng

    spec = FR_BLS12_381
    hr = HostRng(21)
    pp = kzg10.setup(8, rng=hr)
    powers = kzg10.trim_powers(pp, 8)
    coeffs = F.from_ints(spec, hr.field_ints(spec, 9))
    z = hr.field_int(spec)
    c0, r0 = kzg10.commit(powers, coeffs, hiding_bound=2, rng=HostRng(5))
    p0 = kzg10.open(powers, coeffs, z, r0)
    mesh = PM.make_mesh(4)
    with PM.use_mesh(mesh):
        c1, r1 = kzg10.commit(powers, coeffs, hiding_bound=2, rng=HostRng(5))
        p1 = kzg10.open(powers, coeffs, z, r1)
    assert c0.point == c1.point
    assert p0.w == p1.w and p0.random_v == p1.random_v


def test_hyrax_commit_under_mesh_bit_identical(rng):
    """Hyrax row commits shard the row axis under use_mesh; commitments
    must equal single-chip (hyrax/mod.rs:233-242's rayon loop analogue)."""
    from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial
    from poly_commit_tpu.pcs.hyrax import HyraxPC

    hr = HostRng(31)
    nv = 4
    pp = HyraxPC.setup(0, num_vars=nv, rng=hr)
    ck, _ = HyraxPC.trim(pp, 0)
    evals = F.from_ints(HyraxPC.spec, hr.field_ints(HyraxPC.spec, 1 << nv))
    poly = LabeledPolynomial("f", evals, num_vars=nv)
    c0, _ = HyraxPC.commit(ck, [poly], HostRng(3))
    mesh = PM.make_mesh(4)
    with PM.use_mesh(mesh):
        c1, _ = HyraxPC.commit(ck, [poly], HostRng(3))
    assert c0[0].commitment.row_coms == c1[0].commitment.row_coms


def test_ligero_encode_under_mesh_bit_identical(rng):
    """Ligero RS-encode shards the matrix rows under use_mesh; the encoded
    matrix (and hence the Merkle root) must equal single-chip."""
    import jax.numpy as jnp

    from poly_commit_tpu.pcs.linear_codes.ligero import (
        LigeroPCParams,
        _rs_encode_rows,
    )

    spec = FP.FR_BLS12_381
    ck = LigeroPCParams(spec=spec, sec_param=128, rho_inv=4,
                        check_well_formedness=True)
    mat = F.from_ints(
        spec, [int(x) for x in rng.integers(0, 1 << 60, size=16)]
    ).reshape(4, 4, spec.n_limbs)
    single = _rs_encode_rows(mat, ck)
    mesh = PM.make_mesh(4)
    with PM.use_mesh(mesh):
        sharded = _rs_encode_rows(mat, ck)
    assert np.array_equal(np.asarray(single), np.asarray(sharded))


def test_ntt_sharded_matches_single(rng):
    spec = FP.FR_BLS12_381
    mesh = PM.make_mesh(8)
    n = 64
    ints = [int(x) for x in rng.integers(0, 1 << 60, size=n)]
    a = F.from_ints(spec, ints)
    single = NTT.ntt(spec, a)
    sharded = PM.ntt_sharded(spec, PM.shard_batch(a, mesh), mesh)
    assert np.array_equal(np.asarray(single), np.asarray(sharded))
    back = PM.ntt_sharded(spec, sharded, mesh, inverse=True)
    assert np.array_equal(np.asarray(a), np.asarray(back))


@pytest.mark.slow  # the driver runs __graft_entry__.dryrun_multichip separately every round
def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as GE

    GE.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as GE

    fn, args = GE.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_row_mul_sharded_bit_identical(rng):
    """linear-code v^T M with sharded rows == local kernel, bit for bit."""
    from poly_commit_tpu.core.field_params import FR_BLS12_381
    from poly_commit_tpu.pcs.linear_codes.engine import _row_mul

    spec = FR_BLS12_381
    mesh = PM.make_mesh(4)
    n, cols = 16, 8
    p = spec.modulus
    vec = F.from_ints(spec, [int(x) % p for x in rng.integers(1, 1 << 62, n)])
    mat = F.from_ints(
        spec, [int(x) % p for x in rng.integers(1, 1 << 62, n * cols)]
    ).reshape(n, cols, spec.n_limbs)
    local = _row_mul(spec, vec, mat)
    sharded = PM.row_mul_sharded(spec, vec, mat, mesh)
    assert np.array_equal(np.asarray(local), np.asarray(sharded))
    # and through the engine's active-mesh dispatch
    with PM.use_mesh(mesh):
        dispatched = _row_mul(spec, vec, mat)
    assert np.array_equal(np.asarray(local), np.asarray(dispatched))


def test_ipa_fold_key_sharded_bit_identical(rng):
    """IPA key fold sharded over points == the local fold, bit for bit."""
    from poly_commit_tpu.core import curve as CC
    from poly_commit_tpu.pcs import ipa_pc

    G = ipa_pc.GROUP
    mesh = PM.make_mesh(4)
    n = 8
    gen = G.generator()
    pts = [CC.scalar_mul_int(G, gen, k + 2) for k in range(2 * n)]
    aff = G.to_affine(
        jax.tree_util.tree_map(lambda *cs: jnp.stack(cs, 0), *pts)
    )
    k_l = tuple(a[:n] for a in aff)
    k_r = tuple(a[n:] for a in aff)
    bits = CC.scalar_bits(123456789, 256)
    kr_mul = G.scalar_mul(G.from_affine(*k_r), bits)
    expected = G.to_affine(G.add(G.from_affine(*k_l), kr_mul))
    got = PM.fold_key_sharded(G, k_l, k_r, bits, mesh)
    for e, g in zip(expected, got):
        assert np.array_equal(np.asarray(e), np.asarray(g))


def test_pst13_commit_under_mesh_bit_identical():
    """PST13's commit MSM routed through the mesh == single-chip."""
    from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial
    from poly_commit_tpu.pcs.pst13 import MarlinPST13 as PC, MVPoly

    mesh = PM.make_mesh(4)
    rng = HostRng(21)
    pp = PC.setup(2, num_vars=2, rng=rng)
    ck, vk = PC.trim(pp, 2, 1)
    poly = LabeledPolynomial(
        "p", MVPoly.rand(HostRng(22), 2, 2, num_terms=6), num_vars=2
    )
    single, _ = PC.commit(ck, [poly], HostRng(23))
    with PM.use_mesh(mesh):
        sharded, _ = PC.commit(ck, [poly], HostRng(23))
    assert single[0].commitment == sharded[0].commitment


def test_brakedown_encode_sharded_bit_identical(rng):
    """Brakedown expander encode with the row batch sharded == local."""
    from poly_commit_tpu.pcs.data_structures import HostRng
    from poly_commit_tpu.pcs.linear_codes import MultilinearBrakedown

    code = MultilinearBrakedown.code
    spec = MultilinearBrakedown.spec
    pp = code.setup(0, 4, HostRng(31))
    mesh = PM.make_mesh(4)
    rows = 4
    p = spec.modulus
    mat = F.from_ints(
        spec, [int(x) % p for x in rng.integers(1, 1 << 62, rows * pp.m)]
    ).reshape(rows, pp.m, spec.n_limbs)
    local = code.encode_rows(mat, pp)
    with PM.use_mesh(mesh):
        sharded = code.encode_rows(mat, pp)
    assert np.array_equal(np.asarray(local), np.asarray(sharded))
