"""Brakedown (multilinear): linear-time expander code in the same engine.

Re-design of /root/reference/poly-commit/src/linear_codes/brakedown.rs
(params + Fig.2 constants :103-143, cn/dn :226-259, mat_size :260-288,
codeword_len :292-299, Fisher-Yates sparse matrix generation :305-333) and
multilinear_brakedown/mod.rs (recursive encode :56-84, naive base-case RS
:111-122).

TPU mapping: each sparse matrix is stored column-padded — (m, K) row indices
plus (m, K, L) values with K = max nnz per column — so v^T A is one
gather + batched field-mul + log-depth sum kernel (the reference fixes d nnz
per ROW, brakedown.rs:305-333, which keeps K small). The base-case naive RS
is a Vandermonde-matrix batched multiply. The whole encode is batched over
matrix rows.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ...core import field as F
from ...core import poly as P
from ...utils.merkle import MerkleConfig
from .. import errors
from .engine import LinearCodePCS
from .utils import calculate_t, ceil_div, ceil_mul, ent, tensor_vec


# ---------------------------------------------------------------------------
# sparse matrices (column-padded gather format)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SparseMat:
    """v^T M for an n x m sparse matrix with fixed nnz per row."""

    n: int
    m: int
    row_idx: jnp.ndarray  # (m, K) int32, padded with 0
    val: jnp.ndarray  # (m, K, L) Montgomery, padded with 0

    def row_mul(self, spec, v: jnp.ndarray) -> jnp.ndarray:
        """v: (..., n, L) -> (..., m, L)."""
        g = jnp.take(v, self.row_idx, axis=-2)  # (..., m, K, L)
        prod = F.mont_mul(spec, g, jnp.broadcast_to(self.val, g.shape))
        k = prod.shape[-2]
        while k > 1:
            half = k // 2
            head = F.add(spec, prod[..., :half, :], prod[..., half : 2 * half, :])
            prod = (
                head
                if k % 2 == 0
                else jnp.concatenate([head, prod[..., k - 1 :, :]], axis=-2)
            )
            k = (k + 1) // 2
        return prod[..., 0, :]


def make_mat(spec, n: int, m: int, d: int, rng) -> SparseMat:
    """Fisher-Yates: d distinct nonzero entries per row (brakedown.rs:305-333).

    Degenerate shapes (m == 0 columns or d == 0 nnz/row) are valid: the
    dims recursion can emit an all-zero / zero-column B level (the
    reference's SprsMat::new_from_columns accepts them, utils.rs:24-107),
    and row_mul then yields an all-zero / empty output segment.
    """
    if m == 0 or d == 0:
        return SparseMat(
            n=n,
            m=m,
            row_idx=jnp.zeros((m, 1), jnp.int32),
            val=jnp.zeros((m, 1, spec.n_limbs), jnp.uint32),
        )
    cols: List[List[tuple]] = [[] for _ in range(m)]
    tmp = list(range(m))
    for i in range(n):
        for j in range(d):
            r = rng.u64() % (m - j)
            tmp[r], tmp[m - 1 - j] = tmp[m - 1 - j], tmp[r]
            col = tmp[m - 1 - j]
            v = 0
            while v == 0:
                v = rng.field_int(spec)
            cols[col].append((i, v))
    k = max(1, max(len(c) for c in cols))
    row_idx = np.zeros((m, k), np.int32)
    vals = [[0] * k for _ in range(m)]
    for j, entries in enumerate(cols):
        for t, (i, v) in enumerate(entries):
            row_idx[j, t] = i
            vals[j][t] = v
    val = F.from_ints(spec, vals)  # (m, K, L); zeros stay zero
    return SparseMat(n=n, m=m, row_idx=jnp.asarray(row_idx), val=val)


# ---------------------------------------------------------------------------
# parameters (brakedown.rs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BrakedownPCParams:
    spec: object
    sec_param: int
    alpha: tuple
    beta: tuple
    rho_inv: tuple
    base_len: int
    n: int
    m: int
    m_ext: int
    a_dims: list  # [(rows, cols, d)]
    b_dims: list
    start: list
    end: list
    a_mats: list  # [SparseMat]
    b_mats: list
    check_well_formedness: bool = True

    def distance(self):
        """(beta*rho_inv) as a fraction (brakedown.rs:69-71)."""
        return (self.rho_inv[1] * self.beta[0], self.rho_inv[0] * self.beta[1])

    def max_degree_supported(self):
        return 1 << 62

    def compute_dimensions(self, _poly_len):
        return (self.n, self.m)

    def merkle_config(self):
        return MerkleConfig()


def _div(a):
    return a[0] / a[1]


def _mu(a, r):
    return (r[0] * (a[1] - a[0]) - r[1] * a[1]) / (r[1] * a[1])


def _nu(a, b):
    c = (3, 100)
    return (b[0] * (a[1] + a[0]) * c[1] + c[0] * b[1] * a[1]) / (b[1] * a[1] * c[1])


def _cn_const(a, b):
    af, bf = _div(a), _div(b)
    arg = 1.28 * bf / af
    return (ent(bf) + af * ent(arg), -bf * math.log2(arg))


def _dn_const(a, b, r):
    m = _mu(a, r)
    n = _nu(a, b)
    af, bf, rf = _div(a), _div(b), _div(r)
    nm = n / m
    return (rf * af * ent(bf / rf) + m * ent(nm), -af * bf * math.log2(nm))


def _cn(n, a, b, c):
    return min(
        max(ceil_mul(n, (32 * b[0], 25 * b[1])), 4 + ceil_mul(n, b)),
        math.ceil((110.0 / n + c[0]) / c[1]),
    )


def _dn(spec, n, b, r, d):
    return min(
        ceil_mul(n, (2 * b[0], b[1]))
        + math.ceil((ceil_mul(n, r) - n + 110) / spec.num_bits),
        math.ceil((110.0 / n + d[0]) / d[1]),
    )


def _mat_size(spec, m, base_len, a, b, r):
    c = _cn_const(a, b)
    d = _dn_const(a, b, r)
    a_dims = []
    n = m
    while n >= base_len:
        cols = ceil_mul(n, a)
        cn = min(_cn(n, a, b, c), cols)
        a_dims.append((n, cols, cn))
        n = cols
    b_dims = []
    for (an, am, _) in a_dims:
        rows = ceil_mul(am, r)
        cols = max(0, ceil_mul(an, r) - an - rows)
        dn = min(_dn(spec, rows, b, r, d), cols)
        b_dims.append((rows, cols, dn))
    return a_dims, b_dims


def _codeword_len(a_dims, b_dims):
    return (
        sum(col for (_, col, _) in b_dims)
        + sum(row for (row, _, _) in a_dims)
        + b_dims[-1][0]
    )


def default_params(spec, rng, poly_len: int, check_well_formedness: bool = True,
                   base_len: int = 30) -> BrakedownPCParams:
    """Fig.2 defaults (brakedown.rs:103-143)."""
    sec_param = 128
    a = (178, 1000)
    b = (61, 1000)
    r = (1521, 1000)
    t = calculate_t(spec, sec_param, (b[0] * r[1], b[1] * r[0]), poly_len)
    base = math.ceil(math.sqrt(ceil_div(2 * poly_len, t)))
    n = 1 << max(0, (base - 1).bit_length())
    m = ceil_div(poly_len, n)
    a_dims, b_dims = _mat_size(spec, m, base_len, a, b, r)
    a_mats = [make_mat(spec, rn, rm, rd, rng) for (rn, rm, rd) in a_dims]
    b_mats = [make_mat(spec, rn, rm, rd, rng) for (rn, rm, rd) in b_dims]
    m_ext = ceil_mul(m, r) if not a_dims else _codeword_len(a_dims, b_dims)
    start, acc = [], 0
    for (row, _, _) in a_dims:
        acc += row
        start.append(acc)
    end, acc = [], m_ext
    for (_, col, _) in b_dims:
        acc -= col
        end.append(acc)
    return BrakedownPCParams(
        spec=spec,
        sec_param=sec_param,
        alpha=a,
        beta=b,
        rho_inv=r,
        base_len=base_len,
        n=n,
        m=m,
        m_ext=m_ext,
        a_dims=a_dims,
        b_dims=b_dims,
        start=start,
        end=end,
        a_mats=a_mats,
        b_mats=b_mats,
        check_well_formedness=check_well_formedness,
    )


# ---------------------------------------------------------------------------
# the code (multilinear_brakedown/mod.rs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _VandermondeKey:
    npoints: int
    ncoeffs: int


_VANDER_CACHE: dict = {}


def _vandermonde(spec, npoints: int, ncoeffs: int) -> jnp.ndarray:
    """(npoints, ncoeffs, L) Montgomery matrix V[p, k] = (p+1)^k."""
    key = (spec.name, npoints, ncoeffs)
    if key not in _VANDER_CACHE:
        pmod = spec.modulus
        rows = []
        for pt in range(1, npoints + 1):
            row, x = [], 1
            for _ in range(ncoeffs):
                row.append(x)
                x = x * pt % pmod
            rows.append(row)
        _VANDER_CACHE[key] = F.from_ints(spec, rows)
    return _VANDER_CACHE[key]


def _naive_rs(spec, coeffs: jnp.ndarray, npoints: int) -> jnp.ndarray:
    """Evaluate coeff rows at points 1..npoints
    (multilinear_brakedown/mod.rs:111-122). coeffs (..., D, L)."""
    v = _vandermonde(spec, npoints, coeffs.shape[-2])  # (P, D, L)
    prod = F.mont_mul(
        spec, coeffs[..., None, :, :], jnp.broadcast_to(
            v, coeffs.shape[:-2] + v.shape
        )
    )  # (..., P, D, L)
    d = prod.shape[-2]
    while d > 1:
        half = d // 2
        head = F.add(spec, prod[..., :half, :], prod[..., half : 2 * half, :])
        prod = (
            head if d % 2 == 0
            else jnp.concatenate([head, prod[..., d - 1 :, :]], axis=-2)
        )
        d = (d + 1) // 2
    return prod[..., 0, :]


class MultilinearBrakedownCode:
    def __init__(self, spec):
        self.spec = spec

    def setup(self, max_degree, num_vars, rng, base_len: int = 30):
        if num_vars is None:
            raise errors.InvalidNumberOfVariables()
        return default_params(self.spec, rng, 1 << num_vars, True, base_len)

    def poly_to_vec(self, lp):
        return lp.poly

    def point_to_vec(self, point):
        return [int(z) % self.spec.modulus for z in point]

    def tensor(self, point, n_cols, n_rows):
        split = (n_cols - 1).bit_length()
        pt = F.from_ints(self.spec, self.point_to_vec(point))
        return tensor_vec(self.spec, pt[:split]), tensor_vec(self.spec, pt[split:])

    def evaluate_poly(self, lp, point):
        pt = F.from_ints(self.spec, self.point_to_vec(point))
        return int(F.to_ints(self.spec, P.mle_evaluate(self.spec, lp.poly, pt)))

    def encode_rows(self, mat: jnp.ndarray, pp: BrakedownPCParams) -> jnp.ndarray:
        """Recursive expander encode, batched over rows
        (multilinear_brakedown/mod.rs:56-84).

        Under an active mesh the ROW batch is sharded (pure data parallel,
        no collectives — the reference's rayon row loop); bit-identical
        since every row's encode is elementwise-independent."""
        from ...parallel import mesh as PM

        active = PM.active_mesh()
        if active is not None and mat.ndim == 3:
            mesh, axis = active
            n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
            if n_dev > 1 and mat.shape[0] % n_dev == 0:
                fn = PM.shard_map(
                    lambda m: self._encode_body(m, pp),
                    mesh=mesh,
                    in_specs=PM.PSpec(axis),
                    out_specs=PM.PSpec(axis),
                    check_rep=False,
                )
                return fn(mat)
        return self._encode_body(mat, pp)

    def _encode_body(self, mat: jnp.ndarray, pp: BrakedownPCParams) -> jnp.ndarray:
        spec = self.spec
        if mat.shape[-2] != pp.m:
            raise errors.PCError("encoding input has wrong length")
        segments = [mat]  # device arrays along the codeword axis
        # forward A-multiplications
        for i, s in enumerate(pp.start):
            src_lo = s - pp.a_dims[i][0]
            cw = jnp.concatenate(segments, axis=-2)
            seg = pp.a_mats[i].row_mul(spec, cw[..., src_lo:s, :])
            segments.append(seg)
        cw = jnp.concatenate(segments, axis=-2)
        # base-case naive RS over [rss, rsie) -> [rss, rsoe)
        rss = pp.start[-1] if pp.start else 0
        rsie = rss + (pp.a_dims[-1][1] if pp.a_dims else pp.m)
        rsoe = pp.end[-1] if pp.end else pp.m_ext
        base_in = cw[..., rss:rsie, :]
        base_out = _naive_rs(spec, base_in, rsoe - rss)
        # zero-pad to full codeword length (the reference resizes before the
        # RS step, mod.rs:72; every B input beyond rsoe reads those zeros)
        zpad = jnp.zeros(cw.shape[:-2] + (pp.m_ext - rsoe, spec.n_limbs), jnp.uint32)
        cw = jnp.concatenate([cw[..., :rss, :], base_out, zpad], axis=-2)
        # B-multiplications: B_i reads [start_i, end_i), writes [end_i, end_i + cols_i)
        for i in range(len(pp.b_dims)):
            s, e = pp.start[i], pp.end[i]
            seg = pp.b_mats[i].row_mul(spec, cw[..., s:e, :])
            cw = jnp.concatenate(
                [cw[..., :e, :], seg, cw[..., e + pp.b_dims[i][1] :, :]], axis=-2
            )
        assert cw.shape[-2] == pp.m_ext, (cw.shape, pp.m_ext)
        return cw


def make_multilinear_brakedown(spec):
    code = MultilinearBrakedownCode(spec)

    class MultilinearBrakedown(LinearCodePCS):
        pass

    MultilinearBrakedown.spec = spec
    MultilinearBrakedown.code = code
    MultilinearBrakedown.__name__ = f"MultilinearBrakedown_{spec.name}"
    return MultilinearBrakedown
