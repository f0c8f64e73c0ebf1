"""Limbs-first Weierstrass (Jacobian) group ops as fused Pallas kernels.

Each EC operation (mixed add, full add, double) is ONE Pallas kernel over
(L, N) coordinate blocks: the entire ~30-field-op formula stays in
VMEM/vregs, so HBM traffic per point is just the input/output coordinates
(~0.9KB) instead of ~30 round trips. CPU fallback jits the same formula
graph. Formulas are the same EFD ones as core/curve.py (dbl-2009-l,
add-2007-bl, madd-2007-bl) with complete edge handling via selects.

Points: pytrees (x, y, z) of (L, N) uint32 limb arrays (Jacobian, z==0 at
infinity). Only prime-field curves with R >= 4p (BLS12-381/377 G1, BN254 G1)
are supported — this is the MSM hot path (core/msm_tpu.py); other curves
stay on core/curve.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ff
from .field_params import FieldSpec

_TILE = 512


def _fx_base(spec):
    """Base-prime-field row ops (the default field of every formula)."""
    return dict(
        mul=lambda a, b: ff._mont_mul_rows(spec, a, b),
        sqr=lambda a: ff._mont_sqr_rows(spec, a),
        add=lambda a, b: ff._add_rows(spec, a, b),
        sub=lambda a, b: ff._sub_rows(spec, a, b),
        is_zero=lambda a: ff_is_zero_rows(spec, a),
        one=lambda shape: ff_one_rows(spec, shape),
    )


# Fq2 = Fq[u]/(u^2 - nr) per curve family (ark-ff Fp2Config NONRESIDUE)
_QUAD_NR = {
    "fq_bls12_381": -1,
    "fq_bls12_377": -5,
    "fq_bn254": -1,
}


def _fx_quad(spec):
    """Quadratic-extension row ops: values are 2L-row lists (c0 || c1).

    Karatsuba multiply (3 base muls), componentwise add/sub (carry ripples
    MUST NOT cross the component boundary — never treat the 2L rows as one
    integer), small-negative nonresidue folded into an addition chain.
    Powers the G2 fast-path MSM (multilinear_pc's per-round G2 MSMs,
    /root/reference/poly-commit/src/multilinear_pc/mod.rs:158-163)."""
    L = spec.n_limbs
    b = _fx_base(spec)
    k = (-_QUAD_NR[spec.name]) % spec.modulus  # nr = -k, k small
    assert 0 < k < 32, spec.name

    def small(t, kk):
        res, cur = None, t
        while kk:
            if kk & 1:
                res = cur if res is None else b["add"](res, cur)
            kk >>= 1
            if kk:
                cur = b["add"](cur, cur)
        return res

    def mul(a, c):
        a0, a1, c0, c1 = a[:L], a[L:], c[:L], c[L:]
        t0 = b["mul"](a0, c0)
        t1 = b["mul"](a1, c1)
        s = b["mul"](b["add"](a0, a1), b["add"](c0, c1))
        r0 = b["sub"](t0, small(t1, k))
        r1 = b["sub"](b["sub"](s, t0), t1)
        return r0 + r1

    def sqr(a):
        a0, a1 = a[:L], a[L:]
        if k == 1:
            r0 = b["mul"](b["add"](a0, a1), b["sub"](a0, a1))
        else:
            r0 = b["sub"](b["sqr"](a0), small(b["sqr"](a1), k))
        t = b["mul"](a0, a1)
        return r0 + b["add"](t, t)

    def add(a, c):
        return b["add"](a[:L], c[:L]) + b["add"](a[L:], c[L:])

    def sub(a, c):
        return b["sub"](a[:L], c[:L]) + b["sub"](a[L:], c[L:])

    def is_zero(a):
        return b["is_zero"](a[:L]) & b["is_zero"](a[L:])

    def one(shape):
        return b["one"](shape) + [
            jnp.zeros(shape, jnp.uint32) for _ in range(L)
        ]

    return dict(mul=mul, sqr=sqr, add=add, sub=sub, is_zero=is_zero, one=one)


def _formula_madd(spec, rows_in, fx=None):
    """madd-2007-bl with edge selects. rows_in: 5 coord row-lists."""
    fx = fx or _fx_base(spec)
    x1, y1, z1, x2, y2 = rows_in[:5]
    mul = fx["mul"]
    sqr = fx["sqr"]
    add = fx["add"]
    sub = fx["sub"]

    z1z1 = sqr(z1)
    u2 = mul(x2, z1z1)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub(u2, x1)
    hh = sqr(h)
    i = add(add(hh, hh), add(hh, hh))
    j = mul(h, i)
    r0 = sub(s2, y1)
    r = add(r0, r0)
    v = mul(x1, i)
    r2 = sqr(r)
    x3 = sub(sub(r2, j), add(v, v))
    y1j = mul(y1, j)
    y3 = sub(mul(r, sub(v, x3)), add(y1j, y1j))
    z1h = add(z1, h)
    z3 = sub(sub(sqr(z1h), z1z1), hh)

    # -- doubling branch (dbl-2009-l on (x1, y1, z1)) --
    a = sqr(x1)
    b = sqr(y1)
    c = sqr(b)
    xb = add(x1, b)
    d0 = sub(sub(sqr(xb), a), c)
    d = add(d0, d0)
    e = add(add(a, a), a)
    f = sqr(e)
    dx = sub(f, add(d, d))
    c2 = add(c, c)
    c4 = add(c2, c2)
    c8 = add(c4, c4)
    dy = sub(mul(e, sub(d, dx)), c8)
    dz0 = mul(y1, z1)
    dz = add(dz0, dz0)

    h_zero = fx["is_zero"](h)
    r_zero = fx["is_zero"](r0)
    p_inf = fx["is_zero"](z1)

    both = h_zero & r_zero
    neg = h_zero & ~r_zero

    def pick(dbl_v, main_v, fresh_v, zero_v):
        out = [jnp.where(both, dv, mv) for dv, mv in zip(dbl_v, main_v)]
        out = [jnp.where(neg, zv, ov) for zv, ov in zip(zero_v, out)]
        return [jnp.where(p_inf, fv, ov) for fv, ov in zip(fresh_v, out)]

    zero_rows = [jnp.zeros_like(r) for r in x1]
    one_rows = fx["one"](x1[0].shape)

    x_out = pick(dx, x3, x2, zero_rows)
    y_out = pick(dy, y3, y2, one_rows)
    z_out = pick(dz, z3, one_rows, zero_rows)
    return x_out + y_out + z_out  # concatenated row lists


def _formula_madd_distinct(spec, rows_in, fx=None):
    """madd-2007-bl WITHOUT the doubling/negation branches: 7M+4S.

    Precondition: the affine point is never equal to ±accumulator (for
    pairwise DL-independent bases — every SRS — an accumulator/point
    collision implies a discrete-log relation; probability ~ N^2/r).
    Only the accumulator-at-infinity case is handled (every Pippenger
    lane starts at infinity). ~35% fewer field ops than _formula_madd.
    """
    fx = fx or _fx_base(spec)
    x1, y1, z1, x2, y2 = rows_in[:5]
    mul = fx["mul"]
    sqr = fx["sqr"]
    add = fx["add"]
    sub = fx["sub"]

    z1z1 = sqr(z1)
    u2 = mul(x2, z1z1)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub(u2, x1)
    hh = sqr(h)
    i = add(add(hh, hh), add(hh, hh))
    j = mul(h, i)
    r0 = sub(s2, y1)
    r = add(r0, r0)
    v = mul(x1, i)
    r2 = sqr(r)
    x3 = sub(sub(r2, j), add(v, v))
    y1j = mul(y1, j)
    y3 = sub(mul(r, sub(v, x3)), add(y1j, y1j))
    z1h = add(z1, h)
    z3 = sub(sub(sqr(z1h), z1z1), hh)

    p_inf = fx["is_zero"](z1)
    one_rows = fx["one"](x1[0].shape)
    x_out = [jnp.where(p_inf, fv, ov) for fv, ov in zip(x2, x3)]
    y_out = [jnp.where(p_inf, fv, ov) for fv, ov in zip(y2, y3)]
    z_out = [jnp.where(p_inf, fv, ov) for fv, ov in zip(one_rows, z3)]
    return x_out + y_out + z_out


def _formula_add(spec, rows_in, fx=None):
    """add-2007-bl (Jacobian + Jacobian) with edge selects."""
    fx = fx or _fx_base(spec)
    x1, y1, z1, x2, y2, z2 = rows_in
    mul = fx["mul"]
    add = fx["add"]
    sub = fx["sub"]
    sqr = fx["sqr"]
    z1z1 = sqr(z1)
    z2z2 = sqr(z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(mul(y1, z2), z2z2)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub(u2, u1)
    h2 = add(h, h)
    i = sqr(h2)
    j = mul(h, i)
    r0 = sub(s2, s1)
    r = add(r0, r0)
    v = mul(u1, i)
    r2 = sqr(r)
    x3 = sub(sub(r2, j), add(v, v))
    s1j = mul(s1, j)
    y3 = sub(mul(r, sub(v, x3)), add(s1j, s1j))
    z12 = add(z1, z2)
    z3 = mul(sub(sub(sqr(z12), z1z1), z2z2), h)

    # doubling branch on (x1, y1, z1)
    a = sqr(x1)
    b = sqr(y1)
    c = sqr(b)
    xb = add(x1, b)
    d0 = sub(sub(sqr(xb), a), c)
    d = add(d0, d0)
    e = add(add(a, a), a)
    f = sqr(e)
    dx = sub(f, add(d, d))
    c2 = add(c, c)
    c8 = add(add(c2, c2), add(c2, c2))
    dy = sub(mul(e, sub(d, dx)), c8)
    dz0 = mul(y1, z1)
    dz = add(dz0, dz0)

    h_zero = fx["is_zero"](h)
    r_zero = fx["is_zero"](r0)
    p_inf = fx["is_zero"](z1)
    q_inf = fx["is_zero"](z2)
    both = h_zero & r_zero & ~p_inf & ~q_inf
    neg = h_zero & ~r_zero & ~p_inf & ~q_inf

    zero_rows = [jnp.zeros_like(r) for r in x1]
    one_rows = fx["one"](x1[0].shape)

    def pick(main_v, dbl_v, a_v, b_v, zero_v):
        out = [jnp.where(both, dv, mv) for dv, mv in zip(dbl_v, main_v)]
        out = [jnp.where(neg, zv, ov) for zv, ov in zip(zero_v, out)]
        out = [jnp.where(q_inf, av, ov) for av, ov in zip(a_v, out)]
        return [jnp.where(p_inf, bv, ov) for bv, ov in zip(b_v, out)]

    x_out = pick(x3, dx, x1, x2, zero_rows)
    y_out = pick(y3, dy, y1, y2, one_rows)
    z_out = pick(z3, dz, z1, z2, zero_rows)
    return x_out + y_out + z_out


def _formula_double(spec, rows_in, fx=None):
    fx = fx or _fx_base(spec)
    x1, y1, z1 = rows_in
    mul = fx["mul"]
    sqr = fx["sqr"]
    add = fx["add"]
    sub = fx["sub"]
    a = sqr(x1)
    b = sqr(y1)
    c = sqr(b)
    xb = add(x1, b)
    d0 = sub(sub(sqr(xb), a), c)
    d = add(d0, d0)
    e = add(add(a, a), a)
    f = sqr(e)
    dx = sub(f, add(d, d))
    c2 = add(c, c)
    c8 = add(add(c2, c2), add(c2, c2))
    dy = sub(mul(e, sub(d, dx)), c8)
    dz0 = mul(y1, z1)
    dz = add(dz0, dz0)
    return dx + dy + dz


def ff_is_zero_rows(spec, rows):
    """rows (< 2p, canonical limbs) represent 0 iff == 0 or == p."""
    p_l, _, _, _ = ff.consts(spec)
    z = None
    ep = None
    for i, r in enumerate(rows):
        zi = r == 0
        ei = r == np.uint32(p_l[i])
        z = zi if z is None else (z & zi)
        ep = ei if ep is None else (ep & ei)
    return z | ep


def ff_one_rows(spec, shape):
    _, _, _, r_l = ff.consts(spec)
    return [jnp.full(shape, int(v), jnp.uint32) for v in r_l]


def _ed_k2d_rows(spec, shape):
    """2d (Montgomery) broadcast rows for the a=-1 JubJub formulas."""
    from . import field_params as FP

    k2d = (2 * FP.JUBJUB_D) % spec.modulus * spec.R % spec.modulus
    limbs = FP.int_to_limbs(k2d, spec.n_limbs)
    return [jnp.full(shape, int(v), jnp.uint32) for v in limbs]


def _formula_ed_madd(spec, rows_in):
    """Extended twisted Edwards a=-1 mixed add (add-2008-hwcd-3, Z2=1):
    COMPLETE on the prime-order subgroup — no branches, identity included.
    Inputs: x1, y1, z1, t1, x2, y2 (t2 = x2*y2 in-kernel). ~9M."""
    x1, y1, z1, t1, x2, y2 = rows_in
    mul = lambda a, b: ff._mont_mul_rows(spec, a, b)
    add = lambda a, b: ff._add_rows(spec, a, b)
    sub = lambda a, b: ff._sub_rows(spec, a, b)

    t2 = mul(x2, y2)
    a = mul(sub(y1, x1), sub(y2, x2))
    b = mul(add(y1, x1), add(y2, x2))
    c = mul(mul(t1, _ed_k2d_rows(spec, x1[0].shape)), t2)
    d = add(z1, z1)
    e = sub(b, a)
    f = sub(d, c)
    g = add(d, c)
    h = add(b, a)
    return mul(e, f) + mul(g, h) + mul(f, g) + mul(e, h)  # X3 Y3 Z3 T3


def _formula_ed_add(spec, rows_in):
    """Extended twisted Edwards a=-1 full add (add-2008-hwcd-3). ~10M."""
    x1, y1, z1, t1, x2, y2, z2, t2 = rows_in
    mul = lambda a, b: ff._mont_mul_rows(spec, a, b)
    add = lambda a, b: ff._add_rows(spec, a, b)
    sub = lambda a, b: ff._sub_rows(spec, a, b)

    a = mul(sub(y1, x1), sub(y2, x2))
    b = mul(add(y1, x1), add(y2, x2))
    c = mul(mul(t1, _ed_k2d_rows(spec, x1[0].shape)), t2)
    zz = mul(z1, z2)
    d = add(zz, zz)
    e = sub(b, a)
    f = sub(d, c)
    g = add(d, c)
    h = add(b, a)
    return mul(e, f) + mul(g, h) + mul(f, g) + mul(e, h)


def _formula_ed_double(spec, rows_in):
    return _formula_ed_add(spec, rows_in + rows_in)


def _unpack_rows(pq):
    """L rows of 32-bit-packed limb pairs -> two L-row 16-bit lists.

    Row i of each half packs limbs (2i | 2i+1 << 16); unpacking INSIDE the
    kernel is register-level (the (L, m)-interleave that an XLA-level
    unpack would relayout through sublanes is just list ordering here).
    """
    mask = np.uint32(0xFFFF)
    h = len(pq) // 2
    a_rows, b_rows = [], []
    for i in range(h):
        a_rows += [pq[i] & mask, pq[i] >> 16]
        b_rows += [pq[h + i] & mask, pq[h + i] >> 16]
    return a_rows, b_rows


def _formula_madd_packed(spec, rows_in):
    x1, y1, z1, pq = rows_in
    x2, y2 = _unpack_rows(pq)
    return _formula_madd(spec, [x1, y1, z1, x2, y2])


def _formula_madd_distinct_packed(spec, rows_in):
    x1, y1, z1, pq = rows_in
    x2, y2 = _unpack_rows(pq)
    return _formula_madd_distinct(spec, [x1, y1, z1, x2, y2])


def _formula_ed_madd_packed(spec, rows_in):
    x1, y1, z1, t1, pq = rows_in
    x2, y2 = _unpack_rows(pq)
    return _formula_ed_madd(spec, [x1, y1, z1, t1, x2, y2])


def _g2(builder):
    """Bind a Weierstrass formula builder to the quadratic-extension field
    (the formulas are field-generic; only the row ops change)."""

    def wrapped(spec, rows_in):
        return builder(spec, rows_in, fx=_fx_quad(spec))

    return wrapped


def _formula_g2_madd_packed(spec, rows_in):
    x1, y1, z1, pq = rows_in
    x2, y2 = _unpack_rows(pq)
    return _formula_madd(spec, [x1, y1, z1, x2, y2], fx=_fx_quad(spec))


def _formula_g2_madd_distinct_packed(spec, rows_in):
    x1, y1, z1, pq = rows_in
    x2, y2 = _unpack_rows(pq)
    return _formula_madd_distinct(
        spec, [x1, y1, z1, x2, y2], fx=_fx_quad(spec)
    )


_FORMULAS = {
    # name: (builder, n_in_coords, n_out_coords, limb_rows_multiplier)
    "madd": (_formula_madd, 5, 3, 1),
    "madd_distinct": (_formula_madd_distinct, 5, 3, 1),
    "add": (_formula_add, 6, 3, 1),
    "double": (_formula_double, 3, 3, 1),
    "ed_madd": (_formula_ed_madd, 6, 4, 1),
    "ed_add": (_formula_ed_add, 8, 4, 1),
    "ed_double": (_formula_ed_double, 4, 4, 1),
    "madd_packed": (_formula_madd_packed, 4, 3, 1),
    "madd_distinct_packed": (_formula_madd_distinct_packed, 4, 3, 1),
    "ed_madd_packed": (_formula_ed_madd_packed, 5, 4, 1),
    # G2: same Jacobian formulas over Fq2 (2L-row c0||c1 coordinates)
    "g2_madd": (_g2(_formula_madd), 5, 3, 2),
    "g2_madd_distinct": (_g2(_formula_madd_distinct), 5, 3, 2),
    "g2_add": (_g2(_formula_add), 6, 3, 2),
    "g2_double": (_g2(_formula_double), 3, 3, 2),
    "g2_madd_packed": (_formula_g2_madd_packed, 4, 3, 2),
    "g2_madd_distinct_packed": (_formula_g2_madd_distinct_packed, 4, 3, 2),
}


@functools.lru_cache(maxsize=64)
def _ec_fn(spec: FieldSpec, which: str, n: int, use_pallas: bool):
    builder, n_in, n_out, rows_mult = _FORMULAS[which]
    L = spec.n_limbs * rows_mult

    def graph(*coords):
        rows_in = [ff._rows(c) for c in coords]
        out_rows = builder(spec, rows_in)
        outs = []
        for k in range(n_out):
            outs.append(jnp.stack(out_rows[k * L : (k + 1) * L], 0))
        return tuple(outs)

    if not use_pallas:
        # Eager on purpose: jitting inlines the whole unrolled limb
        # formula (~70k HLOs) and XLA:CPU takes ~30min/shape to compile
        # it. Eager dispatch of the ~2k small ops costs ~tens of ms per
        # call — the right trade for the CPU test fallback.
        return graph

    from jax.experimental import pallas as pl

    tile = min(_TILE, n & -n)

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        res = graph(*[r[:, :] for r in ins])
        for o_ref, val in zip(outs, res):
            o_ref[:, :] = val

    def run(*coords):
        grid = n // tile
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, n), jnp.uint32) for _ in range(n_out)
            ),
            grid=(grid,),
            in_specs=[pl.BlockSpec((L, tile), lambda i: (0, i))] * n_in,
            out_specs=tuple(pl.BlockSpec((L, tile), lambda i: (0, i)) for _ in range(n_out)),
        )(*coords)

    return jax.jit(run)


def _dispatch(spec, which, *coords):
    n = coords[0].shape[1]
    use_pallas = ff._use_pallas()
    if use_pallas and (n % 128 or n < 128):
        # pad lanes to a multiple of 128 so every size hits the Pallas path
        padn = (-n) % 128 if n >= 128 else 128 - n
        coords = tuple(jnp.pad(c, ((0, 0), (0, padn))) for c in coords)
        out = _ec_fn(spec, which, n + padn, True)(*coords)
        return tuple(o[:, :n] for o in out)
    return _ec_fn(spec, which, n, use_pallas)(*coords)


# -- public API: points are (x, y, z) tuples of (L, N) arrays ---------------


def madd(spec, p, xq, yq):
    """Jacobian p + affine (xq, yq); complete (handles inf/dbl/neg)."""
    return _dispatch(spec, "madd", p[0], p[1], p[2], xq, yq)


def madd_distinct(spec, p, xq, yq):
    """Jacobian p + affine (xq, yq), assuming q != ±p (see
    _formula_madd_distinct). Handles p at infinity only."""
    return _dispatch(spec, "madd_distinct", p[0], p[1], p[2], xq, yq)


def madd_packed(spec, p, pq):
    """Jacobian p + affine point packed as (L, N) 32-bit limb pairs
    (rows 0..L/2-1: x limbs 2i|2i+1<<16; rows L/2..: y). Complete."""
    return _dispatch(spec, "madd_packed", p[0], p[1], p[2], pq)


def madd_distinct_packed(spec, p, pq):
    """Packed-input variant of madd_distinct (same precondition)."""
    return _dispatch(spec, "madd_distinct_packed", p[0], p[1], p[2], pq)


def add(spec, p, q):
    return _dispatch(spec, "add", p[0], p[1], p[2], q[0], q[1], q[2])


def double(spec, p):
    return _dispatch(spec, "double", p[0], p[1], p[2])


def select(mask, p, q):
    return tuple(ff.select(mask, a, b) for a, b in zip(p, q))


def infinity(spec, n: int):
    return (ff.zeros(spec, n), ff.one_mont(spec, n), ff.zeros(spec, n))


def from_affine(spec, x, y, inf_mask=None):
    n = x.shape[1]
    z = ff.one_mont(spec, n)
    if inf_mask is not None:
        z = ff.select(inf_mask, ff.zeros(spec, n), z)
    return (x, y, z)


def is_infinity(spec, p):
    import numpy as _np

    return ff_is_zero_rows(spec, ff._rows(p[2]))


def neg(spec, p):
    """-(x, y, z): negate y (valid for values < 2p via 2p - y)."""
    x, y, z = p
    return (x, ff.sub(spec, jnp.zeros_like(y), y), z)


# -- G2: Weierstrass over Fq2; coordinates are (2L, N) c0||c1 limb stacks ----


def g2_madd(spec, p, xq, yq):
    return _dispatch(spec, "g2_madd", p[0], p[1], p[2], xq, yq)


def g2_madd_distinct(spec, p, xq, yq):
    return _dispatch(spec, "g2_madd_distinct", p[0], p[1], p[2], xq, yq)


def g2_madd_packed(spec, p, pq):
    return _dispatch(spec, "g2_madd_packed", p[0], p[1], p[2], pq)


def g2_madd_distinct_packed(spec, p, pq):
    return _dispatch(spec, "g2_madd_distinct_packed", p[0], p[1], p[2], pq)


def g2_add(spec, p, q):
    return _dispatch(spec, "g2_add", p[0], p[1], p[2], q[0], q[1], q[2])


def g2_double(spec, p):
    return _dispatch(spec, "g2_double", p[0], p[1], p[2])


def g2_infinity(spec, n: int):
    L = spec.n_limbs
    one2 = jnp.concatenate([ff.one_mont(spec, n), ff.zeros(spec, n)], axis=0)
    return (
        jnp.zeros((2 * L, n), jnp.uint32),
        one2,
        jnp.zeros((2 * L, n), jnp.uint32),
    )


def g2_neg(spec, p):
    x, y, z = p
    L = spec.n_limbs
    zero = jnp.zeros((L, y.shape[1]), jnp.uint32)
    ny = jnp.concatenate(
        [ff.sub(spec, zero, y[:L]), ff.sub(spec, zero, y[L:])], axis=0
    )
    return (x, ny, z)


# -- extended twisted Edwards a=-1 (JubJub over Fr-381) ----------------------
# points are (x, y, z, t) tuples of (L, N) limbs; identity (0, 1, 1, 0);
# the unified addition is COMPLETE on the prime-order subgroup (no branch
# selects at all — cheaper per op than the Weierstrass kernels).


def ed_madd(spec, p, xq, yq):
    return _dispatch(spec, "ed_madd", p[0], p[1], p[2], p[3], xq, yq)


def ed_madd_packed(spec, p, pq):
    """Packed-affine-input variant of ed_madd (complete, unified)."""
    return _dispatch(spec, "ed_madd_packed", p[0], p[1], p[2], p[3], pq)


def ed_add(spec, p, q):
    return _dispatch(
        spec, "ed_add", p[0], p[1], p[2], p[3], q[0], q[1], q[2], q[3]
    )


def ed_double(spec, p):
    return _dispatch(spec, "ed_double", p[0], p[1], p[2], p[3])


def ed_infinity(spec, n: int):
    return (
        ff.zeros(spec, n),
        ff.one_mont(spec, n),
        ff.one_mont(spec, n),
        ff.zeros(spec, n),
    )


def ed_from_affine(spec, x, y, inf_mask=None):
    n = x.shape[1]
    t = ff.mont_mul(spec, x, y)
    z = ff.one_mont(spec, n)
    if inf_mask is not None:
        x = ff.select(inf_mask, ff.zeros(spec, n), x)
        y = ff.select(inf_mask, ff.one_mont(spec, n), y)
        t = ff.select(inf_mask, ff.zeros(spec, n), t)
    return (x, y, z, t)


def ed_neg(spec, p):
    x, y, z, t = p
    zero = jnp.zeros_like(x)
    return (ff.sub(spec, zero, x), y, z, ff.sub(spec, zero, t))
