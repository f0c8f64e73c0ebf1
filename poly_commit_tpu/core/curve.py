"""Elliptic-curve group ops: short Weierstrass (Jacobian) and twisted Edwards.

Batch-vectorized, branch-free (complete via selects) point arithmetic over the
limb fields — the substrate that replaces arkworks' ark-ec group backend
(cf. SURVEY.md §2.3: "curve group ops: add/double, normalize_batch").

Points are pytrees of limb arrays:
  Weierstrass Jacobian: (X, Y, Z), infinity encoded as Z == 0.
  Affine inputs: (x, y, inf_mask).
  Twisted Edwards extended: (X, Y, Z, T); identity (0, 1, 1, 0) — complete
  formulas for a = -1, so no masks are needed anywhere (TPU-friendly).

All formulas are the standard EFD ones (dbl-2009-l, add-2007-bl, madd-2007-bl,
and the unified extended-Edwards add).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from . import field_params as FP
from .extfield import Fq2Ops, PrimeFieldOps

# ---------------------------------------------------------------------------
# Short Weierstrass  y^2 = x^3 + b  (a = 0 for all our pairing curves)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WeierstrassGroup:
    name: str
    fops: Any  # PrimeFieldOps | Fq2Ops
    scalar_spec: FP.FieldSpec
    b_int: Any  # int or (int, int) for Fq2
    gen_x: Any
    gen_y: Any

    # -- representation helpers --
    def infinity(self, shape=()):
        f = self.fops
        return (f.zeros(shape), f.one(shape), f.zeros(shape))

    def is_infinity(self, p):
        return self.fops.is_zero(p[2])

    def from_affine(self, x, y, inf=None):
        f = self.fops
        shape = x.shape[: x.ndim - f.elem_ndim]
        z = f.one(shape)
        if inf is not None:
            z = f.select(inf, f.zeros(shape), z)
        return (x, y, z)

    def generator(self, shape=()):
        f = self.fops
        return self.from_affine(
            f.from_int(self.gen_x, shape), f.from_int(self.gen_y, shape)
        )

    def select(self, mask, p, q):
        f = self.fops
        return tuple(f.select(mask, a, b) for a, b in zip(p, q))

    def neg(self, p):
        return (p[0], self.fops.neg(p[1]), p[2])

    # -- arithmetic --
    def double(self, p):
        f = self.fops
        x, y, z = p
        a = f.sqr(x)
        b = f.sqr(y)
        c = f.sqr(b)
        d = f.dbl(f.sub(f.sub(f.sqr(f.add(x, b)), a), c))
        e = f.add(f.dbl(a), a)
        ff = f.sqr(e)
        x3 = f.sub(ff, f.dbl(d))
        c8 = f.dbl(f.dbl(f.dbl(c)))
        y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
        z3 = f.dbl(f.mul(y, z))
        return (x3, y3, z3)

    def add(self, p, q):
        """Complete Jacobian + Jacobian addition (selects for edge cases)."""
        f = self.fops
        x1, y1, z1 = p
        x2, y2, z2 = q
        z1z1 = f.sqr(z1)
        z2z2 = f.sqr(z2)
        u1 = f.mul(x1, z2z2)
        u2 = f.mul(x2, z1z1)
        s1 = f.mul(f.mul(y1, z2), z2z2)
        s2 = f.mul(f.mul(y2, z1), z1z1)
        h = f.sub(u2, u1)
        i = f.sqr(f.dbl(h))
        j = f.mul(h, i)
        r = f.dbl(f.sub(s2, s1))
        v = f.mul(u1, i)
        x3 = f.sub(f.sub(f.sqr(r), j), f.dbl(v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.dbl(f.mul(s1, j)))
        z3 = f.mul(f.sub(f.sub(f.sqr(f.add(z1, z2)), z1z1), z2z2), h)
        out = (x3, y3, z3)

        h_zero = f.is_zero(h)
        r_zero = f.is_zero(f.sub(s2, s1))
        # p == q -> double; p == -q -> infinity
        out = self.select(h_zero & r_zero, self.double(p), out)
        out = self.select(
            h_zero & ~r_zero, self.infinity(self._batch_shape(x3)), out
        )
        out = self.select(self.is_infinity(q), p, out)
        out = self.select(self.is_infinity(p), q, out)
        return out

    def madd(self, p, xq, yq, q_inf=None):
        """Mixed add: Jacobian p + affine (xq, yq); cheaper inner-loop op."""
        f = self.fops
        x1, y1, z1 = p
        z1z1 = f.sqr(z1)
        u2 = f.mul(xq, z1z1)
        s2 = f.mul(f.mul(yq, z1), z1z1)
        h = f.sub(u2, x1)
        hh = f.sqr(h)
        i = f.dbl(f.dbl(hh))
        j = f.mul(h, i)
        r = f.dbl(f.sub(s2, y1))
        v = f.mul(x1, i)
        x3 = f.sub(f.sub(f.sqr(r), j), f.dbl(v))
        y3 = f.sub(f.mul(r, f.sub(v, x3)), f.dbl(f.mul(y1, j)))
        z3 = f.sub(f.sub(f.sqr(f.add(z1, h)), z1z1), hh)
        out = (x3, y3, z3)

        h_zero = f.is_zero(h)
        r_zero = f.is_zero(f.sub(s2, y1))
        out = self.select(h_zero & r_zero, self.double(p), out)
        out = self.select(
            h_zero & ~r_zero, self.infinity(self._batch_shape(x3)), out
        )
        q_jac = self.from_affine(xq, yq)
        out = self.select(self.is_infinity(p), q_jac, out)
        if q_inf is not None:
            out = self.select(q_inf, p, out)
        return out

    def eq(self, p, q):
        f = self.fops
        x1, y1, z1 = p
        x2, y2, z2 = q
        z1z1, z2z2 = f.sqr(z1), f.sqr(z2)
        ex = f.eq(f.mul(x1, z2z2), f.mul(x2, z1z1))
        ey = f.eq(f.mul(f.mul(y1, z2), z2z2), f.mul(f.mul(y2, z1), z1z1))
        i1, i2 = self.is_infinity(p), self.is_infinity(q)
        return (i1 & i2) | (~i1 & ~i2 & ex & ey)

    def to_affine(self, p):
        """Batch normalize via Montgomery-trick inversion (axis 0 batches)."""
        f = self.fops
        x, y, z = p
        batched = z.ndim > f.elem_ndim
        zinv = f.batch_inv(z) if batched else f.inv(z)
        zinv2 = f.sqr(zinv)
        zinv3 = f.mul(zinv2, zinv)
        return (f.mul(x, zinv2), f.mul(y, zinv3), self.is_infinity(p))

    def on_curve(self, x, y, inf=None):
        f = self.fops
        shape = x.shape[: x.ndim - f.elem_ndim]
        b = f.from_int(self.b_int, shape)
        ok = f.eq(f.sqr(y), f.add(f.mul(f.sqr(x), x), b))
        if inf is not None:
            ok = ok | inf
        return ok

    def scalar_mul(self, p, scalar_bits):
        """p * k with k given as a bit array (MSB first, static length).

        scalar_bits: (nbits,) or (nbits, batch) uint32 of 0/1.
        """
        import jax

        shape = self._batch_shape(p[0])
        acc = self.infinity(shape)

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            return self.select(bit.astype(bool), added, acc), None

        acc, _ = jax.lax.scan(body, acc, jnp.asarray(scalar_bits, jnp.uint32))
        return acc

    def _batch_shape(self, elem):
        return elem.shape[: elem.ndim - self.fops.elem_ndim]


# ---------------------------------------------------------------------------
# Twisted Edwards  a x^2 + y^2 = 1 + d x^2 y^2  with a = -1 (JubJub)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EdwardsGroup:
    """Extended coordinates; unified complete addition (no masks needed)."""

    name: str
    fops: PrimeFieldOps
    scalar_spec: FP.FieldSpec
    d_int: int
    gen_x: int
    gen_y: int

    def infinity(self, shape=()):  # the identity
        f = self.fops
        return (f.zeros(shape), f.one(shape), f.one(shape), f.zeros(shape))

    def is_infinity(self, p):
        f = self.fops
        return f.is_zero(p[0]) & f.eq(p[1], p[2])

    def from_affine(self, x, y, inf=None):
        f = self.fops
        shape = x.shape[: x.ndim - f.elem_ndim]
        one = f.one(shape)
        t = f.mul(x, y)
        if inf is not None:
            x = f.select(inf, f.zeros(shape), x)
            y = f.select(inf, one, y)
            t = f.select(inf, f.zeros(shape), t)
        return (x, y, one, t)

    def generator(self, shape=()):
        f = self.fops
        return self.from_affine(
            f.from_int(self.gen_x, shape), f.from_int(self.gen_y, shape)
        )

    def select(self, mask, p, q):
        f = self.fops
        return tuple(f.select(mask, a, b) for a, b in zip(p, q))

    def neg(self, p):
        f = self.fops
        return (f.neg(p[0]), p[1], p[2], f.neg(p[3]))

    def add(self, p, q):
        f = self.fops
        x1, y1, z1, t1 = p
        x2, y2, z2, t2 = q
        a = f.mul(f.sub(y1, x1), f.sub(y2, x2))
        b = f.mul(f.add(y1, x1), f.add(y2, x2))
        shape = x1.shape[: x1.ndim - f.elem_ndim]
        k2d = f.from_int((2 * self.d_int) % f.spec.modulus, shape)
        c = f.mul(f.mul(t1, t2), k2d)
        d = f.dbl(f.mul(z1, z2))
        e = f.sub(b, a)
        ff = f.sub(d, c)
        g = f.add(d, c)
        h = f.add(b, a)
        return (f.mul(e, ff), f.mul(g, h), f.mul(ff, g), f.mul(e, h))

    def madd(self, p, xq, yq, q_inf=None):
        q = self.from_affine(xq, yq, q_inf)
        return self.add(p, q)

    def double(self, p):
        return self.add(p, p)

    def eq(self, p, q):
        f = self.fops
        x1, y1, z1, _ = p
        x2, y2, z2, _ = q
        return f.eq(f.mul(x1, z2), f.mul(x2, z1)) & f.eq(
            f.mul(y1, z2), f.mul(y2, z1)
        )

    def to_affine(self, p):
        f = self.fops
        x, y, z, _ = p
        batched = z.ndim > f.elem_ndim
        zinv = f.batch_inv(z) if batched else f.inv(z)
        ax, ay = f.mul(x, zinv), f.mul(y, zinv)
        return (ax, ay, self.is_infinity(p))

    def on_curve(self, x, y, inf=None):
        f = self.fops
        shape = x.shape[: x.ndim - f.elem_ndim]
        d = f.from_int(self.d_int, shape)
        x2, y2 = f.sqr(x), f.sqr(y)
        lhs = f.sub(y2, x2)  # a = -1
        rhs = f.add(f.one(shape), f.mul(f.mul(d, x2), y2))
        ok = f.eq(lhs, rhs)
        if inf is not None:
            ok = ok | inf
        return ok

    def scalar_mul(self, p, scalar_bits):
        import jax

        shape = p[0].shape[: p[0].ndim - self.fops.elem_ndim]
        acc = self.infinity(shape)

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            return self.select(bit.astype(bool), added, acc), None

        acc, _ = jax.lax.scan(body, acc, jnp.asarray(scalar_bits, jnp.uint32))
        return acc

    def _batch_shape(self, elem):
        return elem.shape[: elem.ndim - self.fops.elem_ndim]


# ---------------------------------------------------------------------------
# host <-> device helpers
# ---------------------------------------------------------------------------


def affine_from_ints(group, triples):
    """[(x, y, inf)] python-int affine points -> device (x, y, inf) arrays."""
    import numpy as np

    from . import field as F

    f = group.fops
    spec = f.spec
    xs = [t[0] for t in triples]
    ys = [t[1] for t in triples]
    infs = np.asarray([bool(t[2]) for t in triples])
    if f.elem_ndim == 1:
        x = F.from_ints(spec, xs)
        y = F.from_ints(spec, ys)
    else:
        x = jnp.stack(
            [jnp.stack([F.from_ints(spec, c0), F.from_ints(spec, c1)]) for c0, c1 in xs]
        )
        y = jnp.stack(
            [jnp.stack([F.from_ints(spec, c0), F.from_ints(spec, c1)]) for c0, c1 in ys]
        )
    return (x, y, jnp.asarray(infs))


def scalar_bits(k: int, nbits: int | None = None):
    """MSB-first bit array of k (numpy, static)."""
    import numpy as np

    nbits = nbits or max(1, int(k).bit_length())
    return np.array([(k >> i) & 1 for i in reversed(range(nbits))], np.uint32)


def scalar_mul_int(group, p, k: int):
    """p * k for a python-int scalar (single point).

    On CPU hosts with concrete inputs this runs on python big-ints (see
    core/msm.py::_host_ec_enabled — XLA:CPU compiles of the 256-step scan
    take minutes); on TPU/under traces it is a 256-bit scan so every call
    shares one compiled program.
    """
    k = int(k) % group.scalar_spec.modulus
    from .msm import _any_tracer, _host_ec_enabled

    if _host_ec_enabled() and not _any_tracer(*p):
        from . import hostec

        hg = hostec.host_group(group)
        hp = hostec.device_proj_to_host(group, p)
        ed = hostec._is_edwards(group)
        if hp is None or (ed and tuple(hp) == (0, 1)):
            res = hp
        else:
            res = hg.mul_fast(hp, k)
        return hostec.host_point_to_device(group, res)
    return group.scalar_mul(p, scalar_bits(k, 256))


# ---------------------------------------------------------------------------
# Instances
# ---------------------------------------------------------------------------

_FQ381 = PrimeFieldOps(FP.FQ_BLS12_381)
_FQ381_2 = Fq2Ops(_FQ381, FP.BLS12_381_Q - 1)  # u^2 = -1
_FQ377 = PrimeFieldOps(FP.FQ_BLS12_377)
_FQ377_2 = Fq2Ops(_FQ377, FP.BLS12_377_Q - 5)  # u^2 = -5
_FQBN = PrimeFieldOps(FP.FQ_BN254)
_FRJJ = PrimeFieldOps(FP.FR_BLS12_381)

BLS12_381_G1 = WeierstrassGroup(
    name="bls12_381_g1",
    fops=_FQ381,
    scalar_spec=FP.FR_BLS12_381,
    b_int=FP.BLS12_381_B,
    gen_x=FP.BLS12_381_G1_X,
    gen_y=FP.BLS12_381_G1_Y,
)

BLS12_381_G2 = WeierstrassGroup(
    name="bls12_381_g2",
    fops=_FQ381_2,
    scalar_spec=FP.FR_BLS12_381,
    b_int=(4, 4),  # b' = 4 (1 + u)
    gen_x=FP.BLS12_381_G2_X,
    gen_y=FP.BLS12_381_G2_Y,
)

BN254_G1 = WeierstrassGroup(
    name="bn254_g1",
    fops=_FQBN,
    scalar_spec=FP.FR_BN254,
    b_int=FP.BN254_B,
    gen_x=FP.BN254_G1_X,
    gen_y=FP.BN254_G1_Y,
)

BLS12_377_G1 = WeierstrassGroup(
    name="bls12_377_g1",
    fops=_FQ377,
    scalar_spec=FP.FR_BLS12_377,
    b_int=FP.BLS12_377_B,
    gen_x=FP.BLS12_377_G1_X,
    gen_y=FP.BLS12_377_G1_Y,
)

BLS12_377_G2 = WeierstrassGroup(
    name="bls12_377_g2",
    fops=_FQ377_2,
    scalar_spec=FP.FR_BLS12_377,
    b_int=FP.BLS12_377_G2_B,  # D-twist: b' = b/xi = -u/5
    gen_x=FP.BLS12_377_G2_X,
    gen_y=FP.BLS12_377_G2_Y,
)

JUBJUB = EdwardsGroup(
    name="jubjub",
    fops=_FRJJ,
    scalar_spec=FP.FR_JUBJUB,
    d_int=FP.JUBJUB_D,
    gen_x=FP.JUBJUB_G_X,
    gen_y=FP.JUBJUB_G_Y,
)
