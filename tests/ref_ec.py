"""Exact Python-int elliptic-curve reference model for cross-checking JAX ops.

Weierstrass (a=0, affine, None = infinity) over prime fields and Fq2, plus
twisted Edwards (a=-1). Slow but exact; used only in tests.
"""


class Fp:
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

    def zero(self):
        return 0

    def one(self):
        return 1

    def is_zero(self, a):
        return a == 0


class Fp2:
    """Fq[u]/(u^2 - nr); elements are (c0, c1) tuples."""

    def __init__(self, p, nr):
        self.p = p
        self.nr = nr % p

    def add(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def mul(self, a, b):
        c0 = (a[0] * b[0] + self.nr * a[1] * b[1]) % self.p
        c1 = (a[0] * b[1] + a[1] * b[0]) % self.p
        return (c0, c1)

    def inv(self, a):
        norm = (a[0] * a[0] - self.nr * a[1] * a[1]) % self.p
        ninv = pow(norm, -1, self.p)
        return ((a[0] * ninv) % self.p, (-a[1] * ninv) % self.p)

    def neg(self, a):
        return ((-a[0]) % self.p, (-a[1]) % self.p)

    def zero(self):
        return (0, 0)

    def one(self):
        return (1, 0)

    def is_zero(self, a):
        return a == (0, 0)


class RefWeierstrass:
    """y^2 = x^3 + b over a field object; points affine (x, y), None = O."""

    def __init__(self, field, b):
        self.f = field
        self.b = b

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
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def double(self, P):
        f = self.f
        if P is None:
            return None
        x, y = P
        if f.is_zero(y):
            return None
        three_x2 = f.mul(f.add(f.add(f.mul(x, x), f.mul(x, x)), f.mul(x, x)), f.one())
        lam = f.mul(three_x2, f.inv(f.add(y, y)))
        x3 = f.sub(f.mul(lam, lam), f.add(x, x))
        y3 = f.sub(f.mul(lam, f.sub(x, x3)), y)
        return (x3, y3)

    def neg(self, P):
        if P is None:
            return None
        return (P[0], self.f.neg(P[1]))

    def mul(self, P, k):
        acc = None
        add = P
        while k:
            if k & 1:
                acc = self.add(acc, add)
            add = self.double(add)
            k >>= 1
        return acc

    def on_curve(self, P):
        if P is None:
            return True
        f = self.f
        x, y = P
        return f.mul(y, y) == f.add(f.mul(f.mul(x, x), x), self.b)

    def msm(self, scalars, points):
        acc = None
        for s, P in zip(scalars, points):
            acc = self.add(acc, self.mul(P, s))
        return acc


class RefEdwards:
    """-x^2 + y^2 = 1 + d x^2 y^2 over Fp; identity (0, 1)."""

    def __init__(self, p, d):
        self.p = p
        self.d = d % p

    def add(self, P, Q):
        p, d = self.p, self.d
        x1, y1 = P
        x2, y2 = Q
        dd = d * x1 * x2 * y1 * y2 % p
        x3 = (x1 * y2 + y1 * x2) * pow(1 + dd, -1, p) % p
        y3 = (y1 * y2 + x1 * x2) * pow(1 - dd, -1, p) % p
        return (x3, y3)

    def identity(self):
        return (0, 1)

    def neg(self, P):
        return ((-P[0]) % self.p, P[1])

    def mul(self, P, k):
        acc = self.identity()
        add = P
        while k:
            if k & 1:
                acc = self.add(acc, add)
            add = self.add(add, add)
            k >>= 1
        return acc

    def on_curve(self, P):
        p, d = self.p, self.d
        x, y = P
        return (-x * x + y * y) % p == (1 + d * x * x * y * y) % p

    def msm(self, scalars, points):
        acc = self.identity()
        for s, P in zip(scalars, points):
            acc = self.add(acc, self.mul(P, s))
        return acc
