"""Limbs-first fast path (core/ff, core/ec_lf, core/msm_tpu): CPU checks of
the pure-JAX fallback of the same kernels the TPU runs via Pallas."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from poly_commit_tpu.core import ec_lf, ff
from poly_commit_tpu.core import field_params as FP
from tests.ref_ec import Fp, RefWeierstrass

SPEC = FP.FQ_BLS12_381
REF = RefWeierstrass(Fp(FP.BLS12_381_Q), FP.BLS12_381_B)
GEN = (FP.BLS12_381_G1_X, FP.BLS12_381_G1_Y)
Q = FP.BLS12_381_Q


def _to_host(out):
    xs = ff.to_ints(SPEC, out[0])
    ys = ff.to_ints(SPEC, out[1])
    zs = ff.to_ints(SPEC, out[2])
    res = []
    for x, y, z in zip(xs, ys, zs):
        if z % Q == 0:
            res.append(None)
        else:
            zi = pow(z, -1, Q)
            res.append((x * zi * zi % Q, y * zi * zi * zi % Q))
    return res


def test_ff_roundtrip_and_ops(rng):
    ints_a = [int.from_bytes(rng.bytes(48), "little") % Q for _ in range(32)]
    ints_b = [int.from_bytes(rng.bytes(48), "little") % Q for _ in range(32)]
    A = ff.from_ints(SPEC, ints_a)
    B = ff.from_ints(SPEC, ints_b)
    assert ff.to_ints(SPEC, ff.mont_mul(SPEC, A, B)) == [
        a * b % Q for a, b in zip(ints_a, ints_b)
    ]
    assert ff.to_ints(SPEC, ff.add(SPEC, A, B)) == [
        (a + b) % Q for a, b in zip(ints_a, ints_b)
    ]
    assert ff.to_ints(SPEC, ff.sub(SPEC, A, B)) == [
        (a - b) % Q for a, b in zip(ints_a, ints_b)
    ]
    # chained ops stay in range and correct
    x = ff.mont_mul(SPEC, A, B)
    host = [a * b % Q for a, b in zip(ints_a, ints_b)]
    for _ in range(3):
        x = ff.mont_mul(SPEC, ff.add(SPEC, x, A), ff.sub(SPEC, x, B))
        host = [
            ((h + a) * (h - b)) % Q for h, a, b in zip(host, ints_a, ints_b)
        ]
    assert ff.to_ints(SPEC, x) == host


def test_ec_lf_ops(rng):
    n = 32
    ks = [int(rng.integers(1, 1 << 30)) for _ in range(n)]
    pts = [REF.mul(GEN, k) for k in ks]
    qts = [REF.mul(GEN, k + 5) for k in ks]
    pts[3] = qts[3]  # doubling edge
    pts[4] = (qts[4][0], (Q - qts[4][1]) % Q)  # negation edge
    X1 = ff.from_ints(SPEC, [p[0] for p in pts])
    Y1 = ff.from_ints(SPEC, [p[1] for p in pts])
    X2 = ff.from_ints(SPEC, [q[0] for q in qts])
    Y2 = ff.from_ints(SPEC, [q[1] for q in qts])
    P = ec_lf.from_affine(SPEC, X1, Y1)
    assert _to_host(ec_lf.madd(SPEC, P, X2, Y2)) == [
        REF.add(p, q) for p, q in zip(pts, qts)
    ]
    assert _to_host(ec_lf.double(SPEC, P)) == [REF.double(p) for p in pts]
    infmask = np.zeros(n, bool)
    infmask[5] = True
    Pinf = ec_lf.select(jnp.asarray(infmask), ec_lf.infinity(SPEC, n), P)
    Q2 = ec_lf.from_affine(SPEC, X2, Y2)
    assert _to_host(ec_lf.add(SPEC, Pinf, Q2)) == [
        REF.add(None if infmask[i] else pts[i], qts[i]) for i in range(n)
    ]


@pytest.mark.slow  # CPU-eager kernel fallback: minutes of dispatch storm
def test_fast_msm_matches_reference(rng):
    from poly_commit_tpu.core import msm_tpu

    n = 150
    ks = [int(rng.integers(1, 1 << 30)) for _ in range(n)]
    pts = [REF.mul(GEN, k) for k in ks]
    scal = [int.from_bytes(rng.bytes(40), "little") % FP.BLS12_381_R for _ in range(n)]
    scal[0] = 0
    pts[1] = pts[2]
    scal[1] = scal[2]
    X = ff.from_ints(SPEC, [p[0] for p in pts])
    Y = ff.from_ints(SPEC, [p[1] for p in pts])
    sc = np.zeros((n, 16), np.uint32)
    for i, v in enumerate(scal):
        for j in range(16):
            sc[i, j] = (v >> (16 * j)) & 0xFFFF
    inf = np.zeros((n,), bool)
    inf[7] = True
    out = msm_tpu.msm(SPEC, jnp.asarray(sc), X, Y, jnp.asarray(inf))
    got = _to_host(out)[0]
    exp = None
    for i, (s, p) in enumerate(zip(scal, pts)):
        if not inf[i]:
            exp = REF.add(exp, REF.mul(p, s))
    assert got == exp


@pytest.mark.slow  # CPU-eager kernel fallback: minutes of dispatch storm
def test_fast_msm_assume_distinct(rng):
    """assume_distinct path (branch-reduced madd) on DL-independent bases."""
    from poly_commit_tpu.core import msm_tpu

    n = 130
    ks = [int(rng.integers(1, 1 << 30)) for _ in range(n)]
    pts = [REF.mul(GEN, k) for k in ks]
    scal = [
        int.from_bytes(rng.bytes(40), "little") % FP.BLS12_381_R
        for _ in range(n)
    ]
    scal[0] = 0
    X = ff.from_ints(SPEC, [p[0] for p in pts])
    Y = ff.from_ints(SPEC, [p[1] for p in pts])
    sc = np.zeros((n, 16), np.uint32)
    for i, v in enumerate(scal):
        for j in range(16):
            sc[i, j] = (v >> (16 * j)) & 0xFFFF
    inf = np.zeros((n,), bool)
    out = msm_tpu.msm(
        SPEC, jnp.asarray(sc), X, Y, jnp.asarray(inf), assume_distinct=True
    )
    got = _to_host(out)[0]
    exp = None
    for s, p in zip(scal, pts):
        exp = REF.add(exp, REF.mul(p, s))
    assert got == exp


def test_fast_fixed_base_matches_reference(rng):
    """fixed_base_mul fast-path dispatch (host fallback on CPU; the
    windowed-table device path runs on TPU) vs reference double-and-add."""
    from poly_commit_tpu.core import curve as C
    from poly_commit_tpu.core import msm as M

    G1 = C.BLS12_381_G1
    n = 20
    scal = [
        int.from_bytes(rng.bytes(40), "little") % FP.BLS12_381_R
        for _ in range(n)
    ]
    scal[0] = 0
    scal[1] = 1
    scal[2] = 256  # digit boundary
    sc = np.zeros((n, 16), np.uint32)
    for i, v in enumerate(scal):
        for j in range(16):
            sc[i, j] = (v >> (16 * j)) & 0xFFFF
    x, y, inf = G1.to_affine(M.fixed_base_mul(G1, G1.generator(), jnp.asarray(sc)))
    from poly_commit_tpu.core import field as F

    got = [
        None if bool(i_) else (xv, yv)
        for xv, yv, i_ in zip(F.to_ints(SPEC, x), F.to_ints(SPEC, y), np.asarray(inf))
    ]
    exp = [REF.mul(GEN, s) for s in scal]
    assert got == exp


def test_fast_fixed_base_host_path(rng, monkeypatch):
    """_fixed_base_host (the fast-path CPU fallback) directly: with
    POLY_COMMIT_FAST_MSM=1 on the CPU backend, fixed_base_mul dispatches to
    the host windowed mul rather than the portable scan."""
    from poly_commit_tpu.core import curve as C
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core import msm as M

    monkeypatch.setenv("POLY_COMMIT_FAST_MSM", "1")
    G1 = C.BLS12_381_G1
    scal = [0, 1, 257, int.from_bytes(rng.bytes(40), "little") % FP.BLS12_381_R]
    n = len(scal)
    sc = np.zeros((n, 16), np.uint32)
    for i, v in enumerate(scal):
        for j in range(16):
            sc[i, j] = (v >> (16 * j)) & 0xFFFF
    x, y, inf = G1.to_affine(M.fixed_base_mul(G1, G1.generator(), jnp.asarray(sc)))
    got = [
        None if bool(i_) else (xv, yv)
        for xv, yv, i_ in zip(F.to_ints(SPEC, x), F.to_ints(SPEC, y), np.asarray(inf))
    ]
    assert got == [REF.mul(GEN, s) for s in scal]


@pytest.mark.slow  # CPU-eager kernel fallback: minutes of dispatch storm
def test_fast_fixed_base_device_kernel(rng):
    """msm_tpu.fixed_base called directly (its CPU-eager branch mirrors the
    TPU table path) vs reference double-and-add — covers the windowed-table
    implementation that TPU runs."""
    from poly_commit_tpu.core import msm_tpu

    scal = [0, 1, 255, 256, int.from_bytes(rng.bytes(40), "little") % FP.BLS12_381_R]
    n = len(scal)
    sc = np.zeros((n, 16), np.uint32)
    for i, v in enumerate(scal):
        for j in range(16):
            sc[i, j] = (v >> (16 * j)) & 0xFFFF
    gx = ff.from_ints(SPEC, [GEN[0]])
    gy = ff.from_ints(SPEC, [GEN[1]])
    out = msm_tpu.fixed_base(SPEC, gx, gy, jnp.asarray(sc))
    got = _to_host(out)
    assert got == [REF.mul(GEN, s) for s in scal]


@pytest.mark.slow  # CPU-eager kernel fallback: minutes of dispatch storm
def test_fast_msm_edwards_jubjub(rng, monkeypatch):
    """The limbs-first extended-Edwards path (JubJub over Fr-381): complete
    unified adds, 4-coordinate pipeline — the IPA hot-loop curve
    (ipa_pc/mod.rs:664-711). Eager CPU fallback of the same TPU kernels."""
    from poly_commit_tpu.core import field_params as FP
    from poly_commit_tpu.core import hostec, msm_tpu

    monkeypatch.setenv("POLY_COMMIT_FAST_MSM", "1")
    spec = FP.FR_BLS12_381
    hg = hostec.HostEdwards(FP.BLS12_381_R, FP.JUBJUB_D, FP.JUBJUB_R)
    gen = (FP.JUBJUB_G_X, FP.JUBJUB_G_Y)
    n = 40
    ks = [int(rng.integers(1, 1 << 30)) for _ in range(n)]
    pts = [hg.mul(gen, k) for k in ks]
    scal = [
        int.from_bytes(rng.bytes(33), "little") % FP.JUBJUB_R for _ in range(n)
    ]
    scal[0] = 0
    X = ff.from_ints(spec, [p[0] for p in pts])
    Y = ff.from_ints(spec, [p[1] for p in pts])
    sc = np.zeros((n, 16), np.uint32)
    for i, v in enumerate(scal):
        for j in range(16):
            sc[i, j] = (v >> (16 * j)) & 0xFFFF
    inf = np.zeros((n,), bool)
    inf[3] = True
    out = msm_tpu.msm(
        spec, jnp.asarray(sc), X, Y, jnp.asarray(inf), False,
        msm_tpu.EDWARDS_OPS,
    )
    p = spec.modulus
    x, y, z = (ff.to_ints(spec, out[0])[0], ff.to_ints(spec, out[1])[0],
               ff.to_ints(spec, out[2])[0])
    zi = pow(z % p, -1, p)
    got = (x * zi % p, y * zi % p)
    exp = (0, 1)
    for i, (s, pt) in enumerate(zip(scal, pts)):
        if not inf[i]:
            exp = hg.add(exp, hg.mul(pt, s))
    assert got == exp


# ---- G2 (Fq2) fast tier -----------------------------------------------------

from tests.ref_ec import Fp2  # noqa: E402

REF2 = RefWeierstrass(Fp2(FP.BLS12_381_Q, -1), (4, 4))
GEN2 = (FP.BLS12_381_G2_X, FP.BLS12_381_G2_Y)


def _g2_dev(pts):
    """host affine Fq2 pairs -> (2L, N) c0||c1 coordinate stacks."""
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    xd = jnp.concatenate(
        [ff.from_ints(SPEC, [c[0] for c in xs]),
         ff.from_ints(SPEC, [c[1] for c in xs])], axis=0)
    yd = jnp.concatenate(
        [ff.from_ints(SPEC, [c[0] for c in ys]),
         ff.from_ints(SPEC, [c[1] for c in ys])], axis=0)
    return xd, yd


def _g2_to_host(out):
    L = SPEC.n_limbs
    xs = list(zip(ff.to_ints(SPEC, out[0][:L]), ff.to_ints(SPEC, out[0][L:])))
    ys = list(zip(ff.to_ints(SPEC, out[1][:L]), ff.to_ints(SPEC, out[1][L:])))
    zs = list(zip(ff.to_ints(SPEC, out[2][:L]), ff.to_ints(SPEC, out[2][L:])))
    f = Fp2(FP.BLS12_381_Q, -1)
    res = []
    for x, y, z in zip(xs, ys, zs):
        if f.is_zero(z):
            res.append(None)
            continue
        zi = f.inv(z)
        zi2 = f.mul(zi, zi)
        res.append((f.mul(x, zi2), f.mul(y, f.mul(zi2, zi))))
    return res


def test_g2_lf_ops(rng):
    n = 4
    ps = [REF2.mul(GEN2, k + 2) for k in range(n)]
    qs = [REF2.mul(GEN2, 100 + k) for k in range(n)]
    px, py = _g2_dev(ps)
    qx, qy = _g2_dev(qs)
    P = (px, py, jnp.concatenate(
        [ff.one_mont(SPEC, n), ff.zeros(SPEC, n)], axis=0))
    got = _g2_to_host(ec_lf.g2_madd(SPEC, P, qx, qy))
    exp = [REF2.add(a, b) for a, b in zip(ps, qs)]
    assert got == exp
    got_d = _g2_to_host(ec_lf.g2_double(SPEC, P))
    assert got_d == [REF2.add(a, a) for a in ps]
    # packed-input variant (the MSM scan path)
    pq = jnp.concatenate([qx[0::2] | (qx[1::2] << 16),
                          qy[0::2] | (qy[1::2] << 16)], axis=0)
    got_p = _g2_to_host(ec_lf.g2_madd_distinct_packed(SPEC, P, pq))
    assert got_p == exp


@pytest.mark.slow  # CPU-eager kernel fallback: minutes of dispatch storm
def test_g2_fast_msm_matches_host(rng, monkeypatch):
    """Full G2 Pippenger through msm_tpu.G2Ops (the MultilinearPC hot
    path, multilinear_pc/mod.rs:158-163) vs the host big-int group."""
    monkeypatch.setenv("POLY_COMMIT_FAST_MSM", "1")
    monkeypatch.setenv("POLY_COMMIT_HOST_EC", "0")
    from poly_commit_tpu.core import curve as C
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core import hostec
    from poly_commit_tpu.core import msm as M

    G2 = C.BLS12_381_G2
    hg = hostec.host_group(G2)
    gen = (FP.BLS12_381_G2_X, FP.BLS12_381_G2_Y)
    n = 8
    pts = [hg.mul_fast(gen, k + 3) for k in range(n)]
    xs = jnp.stack([
        jnp.stack([F.from_ints(SPEC, p[0][0]), F.from_ints(SPEC, p[0][1])])
        for p in pts])
    ys = jnp.stack([
        jnp.stack([F.from_ints(SPEC, p[1][0]), F.from_ints(SPEC, p[1][1])])
        for p in pts])
    inf = jnp.zeros((n,), bool)
    sc_ints = [int(rng.integers(1, 1 << 60)) for _ in range(n)]
    sc = M.scalars_from_ints(SPEC, sc_ints)
    out = M.msm(G2, sc, (xs, ys, inf))
    total = None
    for s, p in zip(sc_ints, pts):
        q = hg.mul_fast(p, s)
        total = q if total is None else hg.add(total, q)
    got = G2.to_affine(out)

    def c2(a):
        from poly_commit_tpu.core import field as F

        v = F.to_ints(SPEC, a)
        return tuple(v) if isinstance(v, list) else v

    assert not bool(np.asarray(got[2]))
    assert (c2(got[0][0]), c2(got[0][1])) == tuple(total[0])
    assert (c2(got[1][0]), c2(got[1][1])) == tuple(total[1])
