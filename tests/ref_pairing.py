"""Exact Python-int BLS12-381 pairing reference (slow, transparent).

Tower: Fq2 = Fq[u]/(u^2+1); Fq12 flattened as Fq2[w]/(w^6 - xi), xi = u+1.
G2 untwists into E(Fq12) via (x, y) -> (x w^-2, y w^-3). Miller loop uses
affine lines scaled by xi (an Fq2 constant, killed by the final exponent).
Final exponentiation is the full (q^12-1)/r power — no shortcuts to audit.
"""

from poly_commit_tpu.core import field_params as FP

P = FP.BLS12_381_Q
R = FP.BLS12_381_R
X_PARAM = FP.BLS12_381_X_PARAM  # negative


# ---- Fq2 ----
def f2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def f2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def f2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def f2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def f2_inv(a):
    n = (a[0] * a[0] + a[1] * a[1]) % P
    ni = pow(n, -1, P)
    return ((a[0] * ni) % P, (-a[1] * ni) % P)


F2_ZERO = (0, 0)
F2_ONE = (1, 0)
XI = (1, 1)  # u + 1


# ---- Fq12 as 6 Fq2 coefficients in w, w^6 = XI ----
def f12_zero():
    return [F2_ZERO] * 6


def f12_one():
    return [F2_ONE] + [F2_ZERO] * 5


def f12_add(a, b):
    return [f2_add(x, y) for x, y in zip(a, b)]


def f12_mul(a, b):
    tmp = [F2_ZERO] * 11
    for i in range(6):
        if a[i] == F2_ZERO:
            continue
        for j in range(6):
            if b[j] == F2_ZERO:
                continue
            tmp[i + j] = f2_add(tmp[i + j], f2_mul(a[i], b[j]))
    out = tmp[:6]
    for k in range(6, 11):
        out[k - 6] = f2_add(out[k - 6], f2_mul(tmp[k], XI))
    return out


def f12_conj(a):
    # w -> -w (the q^6 Frobenius): negate odd coefficients
    return [a[i] if i % 2 == 0 else f2_neg(a[i]) for i in range(6)]


def f12_pow(a, e):
    out = f12_one()
    base = a
    while e:
        if e & 1:
            out = f12_mul(out, base)
        base = f12_mul(base, base)
        e >>= 1
    return out


def f12_inv(a):
    # via norm to Fq6? keep it simple: a^(q^12 - 2) is too slow; use the
    # conjugate tower trick over Fq6 = even coefficients structure. Simpler:
    # extended Euclid is messy; use a * abar / N with abar = prod of
    # conjugates — instead do Fermat within the (small) multiplicative use.
    return f12_pow(a, P**12 - 2)


def f12_eq(a, b):
    return all(x == y for x, y in zip(a, b))


# ---- pairing ----
def _line(t, q_or_none, p_aff):
    """Line through untwisted T (and Q or tangent) evaluated at P, times XI.

    t, q: affine G2 points over Fq2 ((x, y) tuples). p: affine G1 (ints).
    Returns the sparse Fq12 element: yP*XI + (lam xT - yT) w^3 - lam xP w^5.
    """
    xt, yt = t
    if q_or_none is None:
        lam = f2_mul(f2_mul((3, 0), f2_mul(xt, xt)), f2_inv(f2_add(yt, yt)))
    else:
        xq, yq = q_or_none
        lam = f2_mul(f2_sub(yq, yt), f2_inv(f2_sub(xq, xt)))
    xp, yp = p_aff
    out = f12_zero()
    out[0] = f2_mul((yp, 0), XI)
    out[3] = f2_sub(f2_mul(lam, xt), yt)
    out[5] = f2_neg(f2_mul(lam, (xp, 0)))
    return out, lam


def _g2_dbl(t, lam):
    xt, yt = t
    x3 = f2_sub(f2_mul(lam, lam), f2_add(xt, xt))
    y3 = f2_sub(f2_mul(lam, f2_sub(xt, x3)), yt)
    return (x3, y3)


def _g2_add(t, q, lam):
    xt, yt = t
    xq, _ = q
    x3 = f2_sub(f2_sub(f2_mul(lam, lam), xt), xq)
    y3 = f2_sub(f2_mul(lam, f2_sub(xt, x3)), yt)
    return (x3, y3)


def miller_loop(p_aff, q_aff):
    """f_{|x|, Q}(P), conjugated for x < 0. Affine inputs, no infinities."""
    bits = bin(abs(X_PARAM))[2:]
    f = f12_one()
    t = q_aff
    for bit in bits[1:]:
        l, lam = _line(t, None, p_aff)
        f = f12_mul(f12_mul(f, f), l)
        t = _g2_dbl(t, lam)
        if bit == "1":
            l, lam = _line(t, q_aff, p_aff)
            f = f12_mul(f, l)
            t = _g2_add(t, q_aff, lam)
    if X_PARAM < 0:
        f = f12_conj(f)
    return f


FINAL_EXP = (P**12 - 1) // R


def pairing(p_aff, q_aff):
    return f12_pow(miller_loop(p_aff, q_aff), FINAL_EXP)
