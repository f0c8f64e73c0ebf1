"""Dense univariate and multilinear polynomial kernels.

Replaces ark-poly's DensePolynomial / DenseMultilinearExtension operations as
used by the reference (KZG witness division kzg10/mod.rs:217-240, synthetic
division streaming_kzg/time.rs:109-117, multilinear folds
multilinear_pc/mod.rs:131-168, tensors linear_codes/utils.rs:240-258).

Conventions: coefficient arrays are (..., D+1, L) uint32 Montgomery limbs,
ascending degree. Multilinear evaluation tables are (..., 2^n, L) with
variable 1 in the least-significant index bit (arkworks order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import ntt as NTT
from .field_params import FieldSpec

_jit_spec = functools.partial(jax.jit, static_argnums=0)


@_jit_spec
def evaluate(spec: FieldSpec, coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Horner evaluation. coeffs (D, L); x (..., L) -> (..., L)."""
    rev = jnp.flip(coeffs, axis=0)
    acc = F.zeros(spec, x.shape[:-1])

    def body(acc, c):
        acc = F.mont_mul(spec, acc, x)
        return F.add(spec, acc, jnp.broadcast_to(c, acc.shape)), None

    acc, _ = jax.lax.scan(body, acc, rev)
    return acc


@_jit_spec
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Add coefficient arrays (pads the shorter one)."""
    da, db = a.shape[-2], b.shape[-2]
    if da < db:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, db - da), (0, 0)])
    elif db < da:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 2) + [(0, da - db), (0, 0)])
    return F.add(spec, a, b)


def scale(spec: FieldSpec, a: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """k * a with k a single field element (..., L)."""
    return F.mont_mul(spec, a, jnp.broadcast_to(k, a.shape))


def shift(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by X^k (prepend k zero coefficients)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(k, 0), (0, 0)])


@_jit_spec
def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Polynomial product via NTT (exact degree da+db-1 output)."""
    da, db = a.shape[-2], b.shape[-2]
    out_len = da + db - 1
    n = 1 << max(1, (out_len - 1).bit_length())
    ap = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, n - da), (0, 0)])
    bp = jnp.pad(b, [(0, 0)] * (b.ndim - 2) + [(0, n - db), (0, 0)])
    ea = NTT.ntt(spec, ap)
    eb = NTT.ntt(spec, bp)
    prod = NTT.intt(spec, F.mont_mul(spec, ea, eb))
    return prod[..., :out_len, :]


@_jit_spec
def divide_by_linear(spec: FieldSpec, coeffs: jnp.ndarray, z: jnp.ndarray):
    """Synthetic (Ruffini) division by (X - z).

    coeffs (D, L) unbatched -> (quotient (D-1, L), remainder (L,)). The KZG
    witness polynomial (kzg10/mod.rs:217-240) and streaming-KZG open
    (time.rs:109-117) both reduce to this scan.
    """
    assert coeffs.ndim == 2, "divide_by_linear expects (D, L); vmap to batch"
    rev = jnp.flip(coeffs, axis=0)

    def body(acc, c):
        out = acc
        acc = F.add(spec, F.mont_mul(spec, acc, z), c)
        return acc, out

    top = rev[0]
    acc, qs = jax.lax.scan(body, top, rev[1:])
    # qs = quotient coeffs highest-to-lowest; acc is the remainder
    return jnp.flip(qs, axis=0), acc


def divide_by_linear_int(spec: FieldSpec, coeffs: jnp.ndarray, z_int: int):
    """divide_by_linear with a HOST-int point: log-depth formulation.

    The Ruffini scan above runs D sequential device steps — ~80 us each on
    TPU, i.e. ~20 s for a 2^18-degree KZG witness (measured: the whole
    commit+open bench was division-bound). With z known on host:
        w_i = z^{-(i+1)} * S_{i+1},  S_i = sum_{k>=i} c_k z^k,  rem = S_0
    — two log-depth power tables, one elementwise product, one suffix
    cumulative sum (associative_scan), one elementwise product. z = 0
    degenerates to a coefficient shift.
    """
    assert coeffs.ndim == 2
    n = coeffs.shape[0]
    p = spec.modulus
    z_int = int(z_int) % p
    if n <= 1:
        return coeffs[:0], (coeffs[0] if n else F.zeros(spec))
    if z_int == 0:
        return coeffs[1:], coeffs[0]
    z = F.from_ints(spec, z_int)
    zinv = F.from_ints(spec, pow(z_int, -1, p))
    zpows = powers(spec, z, n)  # (n, L): z^k
    t = F.mont_mul(spec, coeffs, zpows)
    suffix = jnp.flip(
        jax.lax.associative_scan(
            lambda a, b: F.add(spec, a, b), jnp.flip(t, axis=0), axis=0
        ),
        axis=0,
    )  # S_i = sum_{k>=i} c_k z^k
    zipows = powers(spec, zinv, n)  # zinv^k
    # w_i = S_{i+1} * zinv^{i+1}, i = 0..n-2
    w = F.mont_mul(spec, suffix[1:], zipows[1:])
    return w, suffix[0]


@_jit_spec
def long_divide(spec: FieldSpec, num: jnp.ndarray, den: jnp.ndarray):
    """Dense long division: num = q*den + r, deg(r) < deg(den).

    num (Dn, L), den (Dd, L) with den's top coefficient nonzero.
    Returns (q (Dn-Dd+1, L), r (Dd-1, L)). Static shapes.
    """
    dn, dd = num.shape[-2], den.shape[-2]
    assert dn >= dd
    lead_inv = F.inv(spec, den[..., -1, :])
    steps = dn - dd + 1
    rem = num

    def body(rem, i):
        # eliminate coefficient at position dn-1-i
        idx = dn - 1 - i
        c = F.mont_mul(spec, jnp.take(rem, idx, axis=-2), lead_inv)
        # rem -= c * den shifted by (idx - dd + 1)
        sh = idx - (dd - 1)
        seg = F.mont_mul(spec, den, jnp.broadcast_to(c, den.shape))
        # build full-length subtrahend via dynamic slice update of zeros
        zeros = jnp.zeros_like(rem)
        sub = jax.lax.dynamic_update_slice_in_dim(zeros, seg, sh, axis=-2)
        rem = F.sub(spec, rem, sub)
        return rem, c

    rem, qs_rev = jax.lax.scan(body, rem, jnp.arange(steps))
    q = jnp.flip(qs_rev, axis=0)
    r = rem[..., : dd - 1, :] if dd > 1 else rem[..., :0, :]
    return q, r


def vanishing_poly(spec: FieldSpec, points: jnp.ndarray) -> jnp.ndarray:
    """prod_i (X - z_i); points (m, L) -> coeffs (m+1, L)."""
    m = points.shape[0]
    coeffs = jnp.zeros((m + 1, spec.n_limbs), jnp.uint32)
    coeffs = coeffs.at[0].set(F.one_mont(spec))

    def body(coeffs, z):
        # top entry is always zero before the shift, so roll is a safe X*
        shifted = jnp.roll(coeffs, 1, axis=0)
        scaled = F.mont_mul(spec, coeffs, jnp.broadcast_to(z, coeffs.shape))
        return F.sub(spec, shifted, scaled), None

    coeffs, _ = jax.lax.scan(body, coeffs, points)
    return coeffs


def lagrange_interpolate(spec: FieldSpec, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Interpolate through (xs, ys); xs (m, L), ys (m, L) -> coeffs (m, L).

    O(m^2); used only for small multi-point opens (streaming KZG verify,
    cf. streaming_kzg/mod.rs:197-261).
    """
    m = xs.shape[0]
    van = vanishing_poly(spec, xs)  # (m+1, L)
    out = jnp.zeros((m, spec.n_limbs), jnp.uint32)

    def body(out, i):
        xi = jnp.take(xs, i, axis=0)
        yi = jnp.take(ys, i, axis=0)
        qi, _ = divide_by_linear(spec, van, xi)  # (m, L): prod_{j!=i}(X - x_j)
        denom = evaluate(spec, qi, xi)
        w = F.mont_mul(spec, yi, F.inv(spec, denom))
        out = F.add(spec, out, F.mont_mul(spec, qi, jnp.broadcast_to(w, qi.shape)))
        return out, None

    out, _ = jax.lax.scan(body, out, jnp.arange(m))
    return out


# ---------------------------------------------------------------------------
# multilinear
# ---------------------------------------------------------------------------


@_jit_spec
def mle_fold(spec: FieldSpec, table: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Fix the lowest-index variable to z: out[b] = (1-z) t[2b] + z t[2b+1]."""
    n = table.shape[-2]
    t = table.reshape(table.shape[:-2] + (n // 2, 2, table.shape[-1]))
    even = t[..., 0, :]
    odd = t[..., 1, :]
    diff = F.sub(spec, odd, even)
    return F.add(spec, even, F.mont_mul(spec, diff, jnp.broadcast_to(z, diff.shape)))


@_jit_spec
def mle_evaluate(spec: FieldSpec, table: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a multilinear extension at point (nv, L); table (2^nv, L)."""
    nv = point.shape[0]
    for i in range(nv):
        table = mle_fold(spec, table, point[i])
    return table[..., 0, :]


def eq_table(spec: FieldSpec, point: jnp.ndarray) -> jnp.ndarray:
    """eq(point, x) over the boolean hypercube: out[b] = prod_i ((1-z_i)(1-b_i) + z_i b_i).

    Variable i occupies index bit i (LSB-first, arkworks order). (nv, L) -> (2^nv, L).
    """
    nv = point.shape[0]
    one = F.one_mont(spec)
    t = jnp.expand_dims(one, 0)  # (1, L)
    for i in range(nv):
        z = point[i]
        nz = F.sub(spec, one, z)
        lo = F.mont_mul(spec, t, jnp.broadcast_to(nz, t.shape))
        hi = F.mont_mul(spec, t, jnp.broadcast_to(z, t.shape))
        # variable i's bit is the most-significant index bit built so far
        t = jnp.concatenate([lo, hi], axis=0)
    return t


def tensor_lsb(spec: FieldSpec, point: jnp.ndarray) -> jnp.ndarray:
    """(1-z_i, z_i) tensor with variable i at index bit i (= eq_table)."""
    return eq_table(spec, point)


def powers(spec: FieldSpec, x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(1, x, x^2, ..., x^{n-1}) as (n, L) via log-depth doubling."""
    one = F.one_mont(spec)
    out = jnp.expand_dims(one, 0)
    cur = x  # x^(2^k)
    k = 1
    while k < n:
        take = min(k, n - k)
        nxt = F.mont_mul(spec, out[:take], jnp.broadcast_to(cur, (take,) + x.shape))
        out = jnp.concatenate([out, nxt], axis=0)
        cur = F.mont_sqr(spec, cur)
        k *= 2
    return out[:n]
