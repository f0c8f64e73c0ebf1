"""Host-side (python-int) elliptic-curve ops for verifier-scale math.

Verifier-side commitment combining touches a handful of points with big-int
scalars — latency-bound, not throughput-bound — so it runs on host ints
(mirroring the reference, whose verifier is equally CPU-serial). Bulk prover
math stays on device (core/msm.py).

Points are (x, y) tuples (ints, or int-pairs for Fq2) with None = infinity —
the same convention as the independent test model in tests/ref_ec.py.
"""

from __future__ import annotations

from . import field_params as FP


class _Fp:
    def __init__(self, p):
        self.p = p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return (a * b) % self.p

    def inv(self, a):
        return pow(a, -1, self.p)

    def neg(self, a):
        return (-a) % self.p

    def is_zero(self, a):
        return a == 0


class _Fp2:
    def __init__(self, p, nr):
        self.p = p
        self.nr = nr % p

    def add(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def mul(self, a, b):
        return (
            (a[0] * b[0] + self.nr * a[1] * b[1]) % self.p,
            (a[0] * b[1] + a[1] * b[0]) % self.p,
        )

    def inv(self, a):
        norm = (a[0] * a[0] - self.nr * a[1] * a[1]) % self.p
        ni = pow(norm, -1, self.p)
        return ((a[0] * ni) % self.p, (-a[1] * ni) % self.p)

    def neg(self, a):
        return ((-a[0]) % self.p, (-a[1]) % self.p)

    def is_zero(self, a):
        return a[0] == 0 and a[1] == 0


class HostWeierstrass:
    """y^2 = x^3 + b (a = 0); affine python-int points, None = infinity."""

    def __init__(self, field, order):
        self.f = field
        self.order = order

    def add(self, P, Q):
        f = self.f
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if y1 == f.neg(y2):
                return None
            return self.double(P)
        lam = f.mul(f.sub(y2, y1), f.inv(f.sub(x2, x1)))
        x3 = f.sub(f.sub(f.mul(lam, lam), x1), x2)
        return (x3, f.sub(f.mul(lam, f.sub(x1, x3)), y1))

    def double(self, P):
        f = self.f
        if P is None:
            return None
        x, y = P
        if f.is_zero(y):
            return None
        x2 = f.mul(x, x)
        lam = f.mul(f.add(f.add(x2, x2), x2), f.inv(f.add(y, y)))
        x3 = f.sub(f.mul(lam, lam), f.add(x, x))
        return (x3, f.sub(f.mul(lam, f.sub(x, x3)), y))

    def neg(self, P):
        if P is None:
            return None
        return (P[0], self.f.neg(P[1]))

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

    def mul(self, P, k):
        k = int(k) % self.order
        acc, a = None, P
        while k:
            if k & 1:
                acc = self.add(acc, a)
            a = self.double(a)
            k >>= 1
        return acc

    def msm(self, scalars, points):
        acc = None
        for s, P in zip(scalars, points):
            acc = self.add(acc, self.mul(P, s))
        return acc


class HostEdwards:
    """a=-1 twisted Edwards; identity (0, 1)."""

    def __init__(self, p, d, order):
        self.p = p
        self.d = d % p
        self.order = order

    def add(self, P, Q):
        p, d = self.p, self.d
        x1, y1 = P
        x2, y2 = Q
        dd = d * x1 * x2 * y1 * y2 % p
        x3 = (x1 * y2 + y1 * x2) * pow(1 + dd, -1, p) % p
        y3 = (y1 * y2 + x1 * x2) * pow(1 - dd, -1, p) % p
        return (x3, y3)

    def neg(self, P):
        return ((-P[0]) % self.p, P[1])

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

    def mul(self, P, k):
        k = int(k) % self.order
        acc, a = (0, 1), P
        while k:
            if k & 1:
                acc = self.add(acc, a)
            a = self.add(a, a)
            k >>= 1
        return acc

    def msm(self, scalars, points):
        acc = (0, 1)
        for s, P in zip(scalars, points):
            acc = self.add(acc, self.mul(P, s))
        return acc

    def identity(self):
        return (0, 1)


def host_group(group):
    """Build the host mirror for a device group instance (by name)."""
    n = group.name
    if n == "bls12_381_g1":
        return HostWeierstrass(_Fp(FP.BLS12_381_Q), FP.BLS12_381_R)
    if n == "bls12_381_g2":
        return HostWeierstrass(_Fp2(FP.BLS12_381_Q, -1), FP.BLS12_381_R)
    if n == "bn254_g1":
        return HostWeierstrass(_Fp(FP.BN254_Q), FP.BN254_R)
    if n == "bls12_377_g1":
        return HostWeierstrass(_Fp(FP.BLS12_377_Q), FP.BLS12_377_R)
    if n == "bls12_377_g2":
        return HostWeierstrass(_Fp2(FP.BLS12_377_Q, -5), FP.BLS12_377_R)
    if n == "jubjub":
        return HostEdwards(FP.BLS12_381_R, FP.JUBJUB_D, FP.JUBJUB_R)
    raise ValueError(n)


def triple_to_host(t):
    """(x, y, inf) -> host point (None for infinity)."""
    x, y, inf = t
    return None if inf else (x, y)


def host_to_triple(P, fq2=False):
    if P is None:
        zero = (0, 0) if fq2 else 0
        one = (1, 0) if fq2 else 1
        return (zero, one, True)
    return (P[0], P[1], False)
