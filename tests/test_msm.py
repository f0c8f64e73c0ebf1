"""MSM vs exact Python reference, across groups, sizes, and edge cases."""

import numpy as np
import pytest

from poly_commit_tpu.core import curve as C
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core import msm as M
from tests.ref_ec import Fp, RefEdwards, RefWeierstrass


def rand_mod(rng, mod, n):
    return [int.from_bytes(rng.bytes(40), "little") % mod for _ in range(n)]


def make_points(g, ref, rng, n):
    """Random multiples of the generator (ints + device affine arrays)."""
    gen = (g.gen_x, g.gen_y)
    ks = [int(rng.integers(1, 1 << 30)) for _ in range(n)]
    pts_int = [ref.mul(gen, k) for k in ks]
    xs = g.fops.spec  # base field spec only valid for prime-field groups
    from poly_commit_tpu.core import field as F

    x = F.from_ints(xs, [p[0] for p in pts_int])
    y = F.from_ints(xs, [p[1] for p in pts_int])
    inf = np.zeros((n,), bool)
    return pts_int, (x, y, inf)


def run_case(g, ref, rng, n, c, lanes, zero_frac=0.0, dup=False, with_inf=False):
    from poly_commit_tpu.core import field as F

    pts_int, pts = make_points(g, ref, rng, n)
    scalars = rand_mod(rng, g.scalar_spec.modulus, n)
    if zero_frac:
        for i in range(0, n, max(1, int(1 / zero_frac))):
            scalars[i] = 0
    if dup and n >= 4:  # duplicate points / equal digits stress the add paths
        pts_int[1] = pts_int[0]
        x, y, inf = pts
        x = x.at[1].set(x[0])
        y = y.at[1].set(y[0])
        pts = (x, y, inf)
        scalars[1] = scalars[0]
    if with_inf and n >= 3:
        x, y, inf = pts
        inf = inf.copy()
        inf[2] = True
        pts = (x, y, inf)
        pts_int[2] = None

    sc = M.scalars_from_ints(g.scalar_spec, scalars)
    out = M.msm(g, sc, pts, c, lanes)
    x, y, isinf = g.to_affine(out)

    expect = None
    for s, p in zip(scalars, pts_int):
        if p is not None:
            expect = ref.add(expect, ref.mul(p, s))
    if expect is None:
        assert bool(np.asarray(isinf))
    else:
        assert not bool(np.asarray(isinf))
        assert (g.fops.to_int(x), g.fops.to_int(y)) == expect


G1 = C.BLS12_381_G1
REF_G1 = RefWeierstrass(Fp(FP.BLS12_381_Q), FP.BLS12_381_B)


@pytest.mark.parametrize("n,c,lanes", [(7, 4, 4), (32, 4, 4), (33, 4, 4), (64, 8, 4)])
def test_msm_small(rng, n, c, lanes):
    run_case(G1, REF_G1, rng, n, c, lanes)


def test_msm_zero_scalars_and_inf(rng):
    run_case(G1, REF_G1, rng, 24, 4, 4, zero_frac=0.25, with_inf=True)


def test_msm_duplicates(rng):
    run_case(G1, REF_G1, rng, 16, 4, 4, dup=True)


def test_msm_all_same_bucket(rng):
    # every scalar equal -> maximal segment lengths crossing many lanes
    from poly_commit_tpu.core import field as F

    n = 32
    pts_int, pts = make_points(G1, REF_G1, rng, n)
    scalars = [12345] * n
    sc = M.scalars_from_ints(G1.scalar_spec, scalars)
    out = M.msm(G1, sc, pts, 4, 4)
    x, y, isinf = G1.to_affine(out)
    expect = None
    for p in pts_int:
        expect = REF_G1.add(expect, p)
    expect = REF_G1.mul(expect, 12345)
    assert (G1.fops.to_int(x), G1.fops.to_int(y)) == expect


def test_msm_single_point(rng):
    run_case(G1, REF_G1, rng, 1, 4, 4)


def test_msm_auto_params(rng):
    run_case(G1, REF_G1, rng, 50, None, None)


def test_msm_jubjub(rng):
    g = C.JUBJUB
    ref = RefEdwards(FP.BLS12_381_R, FP.JUBJUB_D)
    from poly_commit_tpu.core import field as F

    gen = (FP.JUBJUB_G_X, FP.JUBJUB_G_Y)
    n = 20
    ks = [int(rng.integers(1, 1 << 30)) for _ in range(n)]
    pts_int = [ref.mul(gen, k) for k in ks]
    x = F.from_ints(g.fops.spec, [p[0] for p in pts_int])
    y = F.from_ints(g.fops.spec, [p[1] for p in pts_int])
    inf = np.zeros((n,), bool)
    scalars = rand_mod(rng, g.scalar_spec.modulus, n)
    sc = M.scalars_from_ints(g.scalar_spec, scalars)
    out = M.msm(g, sc, (x, y, inf), 4, 4)
    ax, ay, _ = g.to_affine(out)
    expect = ref.msm(scalars, pts_int)
    assert (g.fops.to_int(ax), g.fops.to_int(ay)) == expect


@pytest.mark.slow  # unrolled Fq2 portable-kernel compile: ~2 min XLA:CPU
def test_msm_g2(rng):
    from poly_commit_tpu.core import field as F
    from tests.ref_ec import Fp2

    g = C.BLS12_381_G2
    ref = RefWeierstrass(Fp2(FP.BLS12_381_Q, -1), (4, 4))
    gen = (g.gen_x, g.gen_y)
    n = 8
    ks = [int(rng.integers(1, 1 << 20)) for _ in range(n)]
    pts_int = [ref.mul(gen, k) for k in ks]
    spec = g.fops.spec
    import jax.numpy as jnp

    x = jnp.stack(
        [
            jnp.stack([F.from_ints(spec, p[0][0]), F.from_ints(spec, p[0][1])])
            for p in pts_int
        ]
    )
    y = jnp.stack(
        [
            jnp.stack([F.from_ints(spec, p[1][0]), F.from_ints(spec, p[1][1])])
            for p in pts_int
        ]
    )
    inf = np.zeros((n,), bool)
    scalars = rand_mod(rng, g.scalar_spec.modulus, n)
    sc = M.scalars_from_ints(g.scalar_spec, scalars)
    out = M.msm(g, sc, (x, y, inf), 4, 2)
    ax, ay, _ = g.to_affine(out)
    expect = ref.msm(scalars, pts_int)
    assert (g.fops.to_int(ax), g.fops.to_int(ay)) == expect
