"""Canonical serialization codec (framework-defined, deterministic).

Plays the role of arkworks' CanonicalSerialize (used to hash commitments
into transcripts — e.g. ipa_pc/mod.rs:139-160 hashes serialized points — and
to persist keys/proofs, the reference's "checkpoint" analogue, SURVEY §5.4).

Format v1 (little-endian throughout):
  field element   -> ceil(num_bits/8) LE bytes of the canonical integer
  G1/G2 affine    -> x coords (Fq or Fq2 as c0||c1) + 1 flag byte
                     (bit0: infinity, bit1: y is the lexicographically
                     larger root)  [compressed]
  uncompressed    -> x || y || flag byte
"""

from __future__ import annotations

import numpy as np

from . import field as F
from .field_params import FieldSpec


def field_to_bytes(spec: FieldSpec, value: int) -> bytes:
    return (int(value) % spec.modulus).to_bytes(spec.serialized_size(), "little")


def field_from_bytes(spec: FieldSpec, data: bytes) -> int:
    v = int.from_bytes(data, "little")
    assert v < spec.modulus
    return v


def fields_to_bytes(spec: FieldSpec, values) -> bytes:
    return b"".join(field_to_bytes(spec, v) for v in values)


def _x_ints(group, x):
    spec = group.fops.spec
    if group.fops.elem_ndim == 1:
        return [x]
    return list(x)


def point_to_bytes(group, affine_int_point) -> bytes:
    """affine_int_point: (x, y, inf) with python-int coords (tuples for Fq2)."""
    spec = group.fops.spec
    x, y, inf = affine_int_point
    if inf:
        return bytes(spec.serialized_size() * group.fops.elem_ndim) + b"\x01"
    xs = [x] if group.fops.elem_ndim == 1 else list(x)
    ys = [y] if group.fops.elem_ndim == 1 else list(y)
    flag = 2 if _y_is_larger(spec, ys) else 0
    return fields_to_bytes(spec, xs) + bytes([flag])


def _y_is_larger(spec, ys) -> bool:
    # lexicographic from the last coordinate (matches negation flipping)
    neg = [(spec.modulus - y) % spec.modulus for y in ys]
    return ys[::-1] > neg[::-1]


def point_to_bytes_uncompressed(group, affine_int_point) -> bytes:
    spec = group.fops.spec
    x, y, inf = affine_int_point
    if inf:
        return bytes(2 * spec.serialized_size() * group.fops.elem_ndim) + b"\x01"
    xs = [x] if group.fops.elem_ndim == 1 else list(x)
    ys = [y] if group.fops.elem_ndim == 1 else list(y)
    return fields_to_bytes(spec, xs) + fields_to_bytes(spec, ys) + b"\x00"


def point_size(group, compressed=True) -> int:
    per = group.fops.spec.serialized_size() * group.fops.elem_ndim
    return (per if compressed else 2 * per) + 1


# ---------------------------------------------------------------------------
# arkworks-compatible CanonicalSerialize format
# (ark-serialize SWFlags + LE field bytes; the reference's on-disk/transcript
# codec, e.g. kzg10/data_structures.rs:57-112)
# ---------------------------------------------------------------------------
#
# Short-Weierstrass point, compressed: serialize x as LE bytes of the
# canonical integer, then OR flag bits into the TOP bits of the LAST byte:
#   bit 7 (0x80): y is "negative"  (y > p - y, i.e. the larger root)
#   bit 6 (0x40): point at infinity (x serialized as 0)
# Fq2 coordinates serialize as c0 || c1 with the flags on c1's last byte.
# Uncompressed: x || y with the infinity flag on the last byte of y.

ARK_SW_Y_IS_NEGATIVE = 0x80
ARK_SW_INFINITY = 0x40


def _ark_y_is_negative(spec, ys) -> bool:
    """arkworks Fp/Fp2 ordering: compare against -y, most significant
    coordinate (c1) first, by canonical integer value."""
    neg = [(spec.modulus - y) % spec.modulus for y in ys]
    return ys[::-1] > neg[::-1]


def ark_point_to_bytes(group, affine_int_point, compressed: bool = True) -> bytes:
    """(x, y, inf) host ints -> arkworks CanonicalSerialize bytes."""
    spec = group.fops.spec
    x, y, inf = affine_int_point
    nd = group.fops.elem_ndim
    per = spec.serialized_size()
    if inf:
        if compressed:
            out = bytearray(per * nd)
            out[-1] |= ARK_SW_INFINITY
            return bytes(out)
        out = bytearray(2 * per * nd)
        out[-1] |= ARK_SW_INFINITY
        return bytes(out)
    xs = [x] if nd == 1 else list(x)
    ys = [y] if nd == 1 else list(y)
    if compressed:
        out = bytearray(fields_to_bytes(spec, xs))
        if _ark_y_is_negative(spec, ys):
            out[-1] |= ARK_SW_Y_IS_NEGATIVE
        return bytes(out)
    return fields_to_bytes(spec, xs) + fields_to_bytes(spec, ys)


def ark_point_from_bytes(group, data: bytes, compressed: bool = True):
    """arkworks bytes -> (x, y, inf) host ints (validates curve membership
    through the y-recovery square root for compressed points)."""
    spec = group.fops.spec
    nd = group.fops.elem_ndim
    per = spec.serialized_size()
    buf = bytearray(data)
    flags = buf[-1] & 0xC0
    buf[-1] &= 0x3F
    if flags & ARK_SW_INFINITY:
        return (0, 0, True) if nd == 1 else (((0, 0), (0, 0), True))
    if compressed:
        xs = [
            field_from_bytes(spec, bytes(buf[i * per : (i + 1) * per]))
            for i in range(nd)
        ]
        ys = _recover_y(group, xs)
        if _ark_y_is_negative(spec, ys) != bool(flags & ARK_SW_Y_IS_NEGATIVE):
            ys = [(spec.modulus - y) % spec.modulus for y in ys]
        x = xs[0] if nd == 1 else tuple(xs)
        y = ys[0] if nd == 1 else tuple(ys)
        return (x, y, False)
    xs = [
        field_from_bytes(spec, bytes(buf[i * per : (i + 1) * per]))
        for i in range(nd)
    ]
    ys = [
        field_from_bytes(spec, bytes(buf[(nd + i) * per : (nd + i + 1) * per]))
        for i in range(nd)
    ]
    x = xs[0] if nd == 1 else tuple(xs)
    y = ys[0] if nd == 1 else tuple(ys)
    return (x, y, False)


def _recover_y(group, xs):
    """y with y^2 = x^3 + a x + b (Fq or Fq2); returns the smaller root."""
    spec = group.fops.spec
    p = spec.modulus
    a_c = getattr(group, "a_int", 0)
    b_c = group.b_int
    if group.fops.elem_ndim == 1:
        x = xs[0]
        rhs = (pow(x, 3, p) + a_c * x + b_c) % p
        y = _sqrt_fp(rhs, p)
        return [min(y, p - y)]
    # Fq2 arithmetic on (c0, c1)
    x0, x1 = xs
    nr = group.fops.non_residue  # Fq2 = Fq[u]/(u^2 - nr)
    def mul2(a, b):
        return (
            (a[0] * b[0] + nr * a[1] * b[1]) % p,
            (a[0] * b[1] + a[1] * b[0]) % p,
        )
    x2 = mul2((x0, x1), (x0, x1))
    x3 = mul2(x2, (x0, x1))
    b2 = group.b_int  # (b0, b1) tuple for Fq2 curves
    rhs = ((x3[0] + b2[0]) % p, (x3[1] + b2[1]) % p)
    y = _sqrt_fp2(rhs, p, nr)
    yneg = ((p - y[0]) % p, (p - y[1]) % p)
    return list(min(y[::-1], yneg[::-1])[::-1])


def _sqrt_fp(a, p):
    """Tonelli-Shanks (works for any odd p)."""
    if a == 0:
        return 0
    assert pow(a, (p - 1) // 2, p) == 1, "not a quadratic residue"
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general Tonelli-Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def _sqrt_fp2(a, p, nr):
    """Square root in Fq2 = Fq[u]/(u^2 - nr) via norm/trace decomposition."""
    a0, a1 = a
    if a1 == 0:
        if pow(a0, (p - 1) // 2, p) == 1:
            return (_sqrt_fp(a0, p), 0)
        # sqrt lies along u: (0, y1) with nr*y1^2 = a0
        y1 = _sqrt_fp(a0 * pow(nr, -1, p) % p, p)
        return (0, y1)
    # norm = a0^2 - nr a1^2 must be a QR in Fq
    norm = (a0 * a0 - nr * a1 * a1) % p
    n = _sqrt_fp(norm, p)
    inv2 = pow(2, -1, p)
    for sign in (1, -1):
        alpha = (a0 + sign * n) % p * inv2 % p
        if pow(alpha, (p - 1) // 2, p) == 1:
            y0 = _sqrt_fp(alpha, p)
            if y0 == 0:
                continue
            y1 = a1 * pow(2 * y0, -1, p) % p
            # verify
            if ((y0 * y0 + nr * y1 * y1) % p, (2 * y0 * y1) % p) == (a0 % p, a1 % p):
                return (y0, y1)
    raise ValueError("no square root in Fq2")


# ---------------------------------------------------------------------------
# zcash/IETF-format BLS12-381 serialization (big-endian, flag bits in the
# FIRST byte: 0x80 compressed, 0x40 infinity, 0x20 larger-y) — the ecosystem
# interchange format; its generator encodings are public test vectors that
# externally validate our curve constants + sign logic.
# ---------------------------------------------------------------------------


def zcash_g1_to_bytes(point, q: int) -> bytes:
    """(x, y, inf) ints -> 48-byte zcash-compressed BLS12-381 G1."""
    x, y, inf = point
    if inf:
        out = bytearray(48)
        out[0] = 0x80 | 0x40
        return bytes(out)
    out = bytearray(int(x).to_bytes(48, "big"))
    out[0] |= 0x80
    if y > q - y:
        out[0] |= 0x20
    return bytes(out)


def zcash_g2_to_bytes(point, q: int) -> bytes:
    """((x0,x1), (y0,y1), inf) -> 96-byte zcash-compressed G2 (c1 || c0)."""
    x, y, inf = point
    if inf:
        out = bytearray(96)
        out[0] = 0x80 | 0x40
        return bytes(out)
    out = bytearray(
        int(x[1]).to_bytes(48, "big") + int(x[0]).to_bytes(48, "big")
    )
    out[0] |= 0x80
    if list(y[::-1]) > [(q - c) % q for c in y[::-1]]:
        out[0] |= 0x20
    return bytes(out)


def device_point_to_ints(group, pt_proj):
    """Projective device point -> (x, y, inf) python ints (host transfer)."""
    x, y, inf = group.to_affine(pt_proj)
    xi = group.fops.to_int(x)
    yi = group.fops.to_int(y)
    return (xi, yi, bool(np.asarray(inf)))


def device_points_to_ints(group, pts_proj):
    """Batched projective points -> list of (x, y, inf) int triples."""
    x, y, inf = group.to_affine(pts_proj)
    xi = group.fops.to_int(x)
    yi = group.fops.to_int(y)
    infs = np.asarray(inf).tolist()
    if group.fops.elem_ndim == 2:
        xi = list(zip(xi[0], xi[1]))
        yi = list(zip(yi[0], yi[1]))
    return list(zip(xi, yi, infs))
