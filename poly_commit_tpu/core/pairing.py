"""BLS12-381 pairing in JAX (verifier-side; correctness-critical, O(1)/check).

Replaces arkworks' ``E::pairing`` / ``E::multi_pairing`` (used by every
pairing-based scheme verifier, e.g. kzg10/mod.rs:326-329, sonic_pc:128,
marlin_pst13_pc:542-554, multilinear_pc:179-198).

Representation: Fq12 flattened as Fq2[w]/(w^6 - xi), xi = u+1 — elements are
(..., 6, 2, L) limb arrays. The Miller loop is the affine variant with lines
scaled by xi (an Fq2 constant, annihilated by the final exponentiation), G2
untwisted via (x, y) -> (x w^-2, y w^-3). Final exponentiation is the plain
(q^12-1)/r power as a bit scan — ~4300 Fq12 squarings vectorize fine for the
handful of pairings a verifier computes; a cyclotomic fast path is a later
optimization. Structure mirrors tests/ref_pairing.py (the exact Python-int
model validated for bilinearity) so the two implementations cross-check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import field_params as FP
from .curve import BLS12_381_G1, BLS12_381_G2
from .extfield import Fq2Ops, PrimeFieldOps

FQ = PrimeFieldOps(FP.FQ_BLS12_381)
F2 = Fq2Ops(FQ, FP.BLS12_381_Q - 1)

_XI_INT = (1, 1)
FINAL_EXP = (FP.BLS12_381_Q ** 12 - 1) // FP.BLS12_381_R
_X_BITS = np.array(
    [int(b) for b in bin(abs(FP.BLS12_381_X_PARAM))[2:]][1:], dtype=np.int32
)
_FE_BITS = np.array(
    [(FINAL_EXP >> i) & 1 for i in reversed(range(FINAL_EXP.bit_length()))],
    dtype=np.int32,
)


def _xi(shape=()):
    return F2.from_int(_XI_INT, shape)


# ---------------------------------------------------------------------------
# Fq12 (flattened) ops; elements (..., 6, 2, L)
# ---------------------------------------------------------------------------


def f12_zero(shape=()):
    return F.zeros(FP.FQ_BLS12_381, tuple(shape) + (6, 2))


def f12_one(shape=()):
    z = f12_zero(shape)
    one = F2.one(shape)
    return z.at[..., 0, :, :].set(one)


def f12_from_c(coeffs):
    """Stack 6 Fq2 elements (..., 2, L) -> (..., 6, 2, L)."""
    return jnp.stack(coeffs, axis=-3)


def f12_mul(a, b):
    n6 = [None] * 11
    for i in range(6):
        for j in range(6):
            p = F2.mul(a[..., i, :, :], b[..., j, :, :])
            k = i + j
            n6[k] = p if n6[k] is None else F2.add(n6[k], p)
    xi = _xi(a.shape[:-3])
    out = []
    for k in range(6):
        c = n6[k]
        if k + 6 <= 10 and n6[k + 6] is not None:
            c = F2.add(c, F2.mul(n6[k + 6], xi))
        out.append(c)
    return f12_from_c(out)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_conj(a):
    """w -> -w (the q^6 Frobenius): negate odd coefficients."""
    out = [
        a[..., i, :, :] if i % 2 == 0 else F2.neg(a[..., i, :, :]) for i in range(6)
    ]
    return f12_from_c(out)


def f12_select(mask, a, b):
    return jnp.where(mask[..., None, None, None], a, b)


def f12_eq(a, b):
    return jnp.all(a == b, axis=(-1, -2, -3))


def f12_is_one(a):
    return f12_eq(a, jnp.broadcast_to(f12_one(a.shape[:-3]), a.shape))


def f12_pow_bits(a, bits):
    out = f12_one(a.shape[:-3])

    def body(out, bit):
        out = f12_sqr(out)
        return f12_select(bit.astype(bool), f12_mul(out, a), out), None

    out, _ = jax.lax.scan(body, out, jnp.asarray(bits, jnp.uint32))
    return out


# ---------------------------------------------------------------------------
# Miller loop (affine, batched)
# ---------------------------------------------------------------------------


def _line(t, q, p_xy, tangent: bool):
    """Line through T (tangent or chord to Q) at P, times xi.

    Returns (sparse f12 line, lambda). All Fq2 math; p_xy = (xp, yp) in Fq.
    """
    xt, yt = t
    if tangent:
        num = F2.mul_small(F2.sqr(xt), 3)
        den = F2.dbl(yt)
    else:
        xq, yq = q
        num = F2.sub(yq, yt)
        den = F2.sub(xq, xt)
    lam = F2.mul(num, F2.inv(den))
    xp, yp = p_xy
    shape = xp.shape[: xp.ndim - 1]
    z = F2.zeros(shape)
    c0 = F2.mul(_xi(shape), F2.pack(yp, F.zeros(FP.FQ_BLS12_381, shape)))
    c3 = F2.sub(F2.mul(lam, xt), yt)
    c5 = F2.neg(F2.mul_base(lam, xp))
    line = f12_from_c([c0, z, z, c3, z, c5])
    return line, lam


def _g2_dbl(t, lam):
    xt, yt = t
    x3 = F2.sub(F2.sqr(lam), F2.dbl(xt))
    y3 = F2.sub(F2.mul(lam, F2.sub(xt, x3)), yt)
    return (x3, y3)


def _g2_add(t, q, lam):
    xt, yt = t
    xq, _ = q
    x3 = F2.sub(F2.sub(F2.sqr(lam), xt), xq)
    y3 = F2.sub(F2.mul(lam, F2.sub(xt, x3)), yt)
    return (x3, y3)


@jax.jit
def miller_loop(p_aff, q_aff):
    """Batched Miller loop f_{|x|,Q}(P) (conjugated for x<0).

    p_aff: (x, y, inf) G1 affine, x/y (..., L). q_aff: same over Fq2.
    Infinite inputs produce f = 1.
    """
    xp, yp, p_inf = p_aff
    xq, yq, q_inf = q_aff
    shape = xp.shape[:-1]
    f = f12_one(shape)
    t = (xq, yq)

    def body(carry, bit):
        f, t = carry
        l_dbl, lam = _line(t, None, (xp, yp), tangent=True)
        f = f12_mul(f12_sqr(f), l_dbl)
        t = _g2_dbl(t, lam)
        l_add, lam2 = _line(t, (xq, yq), (xp, yp), tangent=False)
        f_added = f12_mul(f, l_add)
        t_added = _g2_add(t, (xq, yq), lam2)
        take = bit.astype(bool)
        f = f12_select(jnp.broadcast_to(take, shape), f_added, f)
        t = tuple(
            F2.select(jnp.broadcast_to(take, shape), a, b)
            for a, b in zip(t_added, t)
        )
        return (f, t), None

    (f, t), _ = jax.lax.scan(body, (f, t), jnp.asarray(_X_BITS, jnp.uint32))
    if FP.BLS12_381_X_PARAM < 0:
        f = f12_conj(f)
    f = f12_select(p_inf | q_inf, f12_one(shape), f)
    return f


@jax.jit
def final_exponentiation(f):
    return f12_pow_bits(f, _FE_BITS)


def pairing(p_aff, q_aff):
    """e(P, Q) for single or batched affine inputs."""
    return final_exponentiation(miller_loop(p_aff, q_aff))


@jax.jit
def multi_pairing(p_aff, q_aff):
    """prod_i e(P_i, Q_i): batched Miller, one product, one final exp.

    Inputs batched along axis 0. Mirrors arkworks E::multi_pairing.
    """
    ms = miller_loop(p_aff, q_aff)  # (n, 6, 2, L)
    n = ms.shape[0]

    def body(acc, m):
        return f12_mul(acc, m), None

    acc, _ = jax.lax.scan(body, f12_one(), ms)
    return final_exponentiation(acc)


def pairing_check(p_aff, q_aff) -> jnp.ndarray:
    """prod e(P_i, Q_i) == 1 (the shape of every KZG-style verification)."""
    return f12_is_one(multi_pairing(p_aff, q_aff))


def f12_to_ints(elem):
    """-> [(c0, c1)] * 6 python ints (flattened w-basis), for tests."""
    return [F2.to_int(elem[..., i, :, :]) for i in range(6)]
