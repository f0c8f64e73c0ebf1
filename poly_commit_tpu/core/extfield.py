"""Field-ops abstraction: prime fields and quadratic extensions (Fq2).

Curve/pairing code is written against this small ops protocol so G1 (over Fq)
and G2 (over Fq2) share one implementation. Elements are jnp uint32 limb
arrays: prime fields (..., L); Fq2 (..., 2, L) with c0/c1 stacked.

Replaces ark-ff's field tower used by the reference via arkworks curves
(cf. SURVEY.md §2.3 rows 1 and 6).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from . import field as F
from .field_params import FieldSpec


@dataclasses.dataclass(frozen=True)
class PrimeFieldOps:
    """Ops over a prime field; elements (..., L) uint32 in Montgomery form."""

    spec: FieldSpec
    elem_ndim: int = 1

    def add(self, a, b):
        return F.add(self.spec, a, b)

    def sub(self, a, b):
        return F.sub(self.spec, a, b)

    def neg(self, a):
        return F.neg(self.spec, a)

    def mul(self, a, b):
        return F.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return F.mont_sqr(self.spec, a)

    def inv(self, a):
        return F.inv(self.spec, a)

    def batch_inv(self, a):
        return F.batch_inv(self.spec, a)

    def dbl(self, a):
        return F.add(self.spec, a, a)

    def zeros(self, shape=()):
        return F.zeros(self.spec, shape)

    def one(self, shape=()):
        return F.one_mont(self.spec, shape)

    def is_zero(self, a):
        return F.is_zero(a)

    def eq(self, a, b):
        return F.eq(a, b)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None], a, b)

    def from_int(self, x, shape=()):
        e = F.from_ints(self.spec, x)
        if shape:
            e = jnp.broadcast_to(e, tuple(shape) + e.shape)
        return e

    def to_int(self, a):
        return F.to_ints(self.spec, a)

    def mul_small(self, a, k: int):
        """a * k for tiny static k via additions."""
        out = self.zeros(a.shape[: -self.elem_ndim])
        out = jnp.broadcast_to(out, a.shape)
        acc = a
        kk = k
        while kk:
            if kk & 1:
                out = self.add(out, acc)
            kk >>= 1
            if kk:
                acc = self.dbl(acc)
        return out


@dataclasses.dataclass(frozen=True)
class Fq2Ops:
    """Quadratic extension Fq[u]/(u^2 - non_residue); elements (..., 2, L)."""

    base: PrimeFieldOps
    non_residue: int  # integer representative of the non-residue in Fq
    elem_ndim: int = 2

    @property
    def spec(self):
        return self.base.spec

    def _nr_mul(self, a):
        """Multiply a base-field element by the non-residue (static int)."""
        nr = self.non_residue % self.spec.modulus
        if nr == self.spec.modulus - 1:  # -1 fast path (BLS12-381 / BN254)
            return self.base.neg(a)
        small = nr if nr < 32 else None
        if small is not None:
            return self.base.mul_small(a, small)
        return self.base.mul(a, self.base.from_int(nr, a.shape[:-1]))

    def c0(self, a):
        return a[..., 0, :]

    def c1(self, a):
        return a[..., 1, :]

    def pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def add(self, a, b):
        return self.pack(
            self.base.add(self.c0(a), self.c0(b)), self.base.add(self.c1(a), self.c1(b))
        )

    def sub(self, a, b):
        return self.pack(
            self.base.sub(self.c0(a), self.c0(b)), self.base.sub(self.c1(a), self.c1(b))
        )

    def neg(self, a):
        return self.pack(self.base.neg(self.c0(a)), self.base.neg(self.c1(a)))

    def dbl(self, a):
        return self.pack(self.base.dbl(self.c0(a)), self.base.dbl(self.c1(a)))

    def mul(self, a, b):
        # Karatsuba: (a0+a1 u)(b0+b1 u) = a0b0 + nr a1b1 + ((a0+a1)(b0+b1)-a0b0-a1b1) u
        a0, a1, b0, b1 = self.c0(a), self.c1(a), self.c0(b), self.c1(b)
        v0 = self.base.mul(a0, b0)
        v1 = self.base.mul(a1, b1)
        s = self.base.mul(self.base.add(a0, a1), self.base.add(b0, b1))
        c0 = self.base.add(v0, self._nr_mul(v1))
        c1 = self.base.sub(self.base.sub(s, v0), v1)
        return self.pack(c0, c1)

    def sqr(self, a):
        # complex squaring for nr = -1 style: generic Karatsuba square
        a0, a1 = self.c0(a), self.c1(a)
        v0 = self.base.sqr(a0)
        v1 = self.base.sqr(a1)
        # c1 = 2 a0 a1 ; c0 = v0 + nr v1
        m = self.base.mul(a0, a1)
        return self.pack(self.base.add(v0, self._nr_mul(v1)), self.base.dbl(m))

    def inv(self, a):
        # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 - nr a1^2)
        a0, a1 = self.c0(a), self.c1(a)
        norm = self.base.sub(self.base.sqr(a0), self._nr_mul(self.base.sqr(a1)))
        ninv = self.base.inv(norm)
        return self.pack(self.base.mul(a0, ninv), self.base.neg(self.base.mul(a1, ninv)))

    def batch_inv(self, a):
        a0, a1 = self.c0(a), self.c1(a)
        norm = self.base.sub(self.base.sqr(a0), self._nr_mul(self.base.sqr(a1)))
        ninv = self.base.batch_inv(norm)
        return self.pack(self.base.mul(a0, ninv), self.base.neg(self.base.mul(a1, ninv)))

    def conj(self, a):
        return self.pack(self.c0(a), self.base.neg(self.c1(a)))

    def zeros(self, shape=()):
        return F.zeros(self.spec, tuple(shape) + (2,))

    def one(self, shape=()):
        return self.pack(self.base.one(shape), self.base.zeros(shape))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def from_int(self, x, shape=()):
        """x: (c0, c1) int pair or plain int (c1 = 0)."""
        if isinstance(x, tuple):
            c0, c1 = x
        else:
            c0, c1 = x, 0
        e = self.pack(self.base.from_int(c0), self.base.from_int(c1))
        if shape:
            e = jnp.broadcast_to(e, tuple(shape) + e.shape)
        return e

    def to_int(self, a):
        return (self.base.to_int(self.c0(a)), self.base.to_int(self.c1(a)))

    def mul_small(self, a, k: int):
        return self.pack(
            self.base.mul_small(self.c0(a), k), self.base.mul_small(self.c1(a), k)
        )

    def mul_base(self, a, b_elem):
        """Multiply Fq2 element by a base-field element (b broadcast)."""
        return self.pack(
            self.base.mul(self.c0(a), b_elem), self.base.mul(self.c1(a), b_elem)
        )
