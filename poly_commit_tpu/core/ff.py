"""Limbs-first fast field arithmetic (TPU hot path).

Layout: field elements are (L, N) uint32 arrays — L 16-bit limbs on the
sublane axis, N batch elements on the 128-lane axis. This is the
TPU-efficient dual of core/field.py's (..., L) convention: with limbs last,
the lane dimension is only L=16..24 wide (<=19% lane utilization) and XLA
materializes (N, L, L) intermediates through HBM; limbs-first keeps lanes
full and lets one Pallas kernel hold the entire schoolbook + Montgomery
pipeline in VMEM/vregs.

Range invariant: every element value is < 2p. Montgomery reduction with
R = 2^(16L) >= 4p maps inputs < 2p to outputs < 2p; add/sub reduce once
against 2p to restore the invariant. All carry/borrow ripples are unrolled
(static L steps of fused vector ops — no lax.scan).

Replaces the same arkworks ark-ff backend as core/field.py (SURVEY.md §2.3)
as the performance path under core/msm_tpu.py; Pallas kernels on TPU with a
pure-JAX fallback elsewhere (POLY_COMMIT_PALLAS=0/1 overrides).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field_params import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs

MASK = np.uint32(LIMB_MASK)
ONE = np.uint32(1)
B16 = np.uint32(1 << LIMB_BITS)


@functools.lru_cache(maxsize=16)
def consts(spec: FieldSpec):
    """(p, 2p, -p^-1 mod R, R mod p) limb arrays as numpy (L,) uint32."""
    L = spec.n_limbs
    assert 2 * spec.modulus < spec.R, "range invariant needs R > 2p"
    npi = (-pow(spec.modulus, -1, spec.R)) % spec.R
    return (
        np.asarray(spec.p_limbs, np.uint32),
        int_to_limbs(2 * spec.modulus, L).astype(np.uint32),
        int_to_limbs(npi, L).astype(np.uint32),
        np.asarray(spec.r_limbs, np.uint32),
    )


def needs_post_reduce(spec: FieldSpec) -> bool:
    """R >= 4p keeps Montgomery closed over [0, 2p) for free; tighter fields
    (R > 2p only, e.g. the 255-bit scalar fields at 16 limbs) reduce once
    after each multiply: t < (4p/R + 1)p < 3p -> minus 2p when >= 2p -> < 2p."""
    return 4 * spec.modulus > spec.R


# ---------------------------------------------------------------------------
# building blocks on lists of (N,) rows / (L, N) blocks (shared by the
# Pallas kernel bodies and the pure-JAX fallback)
# ---------------------------------------------------------------------------


def _carry_rows(cols, n_out):
    """cols: list of (N,) values < 2^32-2^16 -> n_out 16-bit rows + carry."""
    out = []
    c = None
    for i in range(n_out):
        s = cols[i] if i < len(cols) and cols[i] is not None else None
        if c is not None:
            s = c if s is None else s + c
        if s is None:
            out.append(None)
            c = None
            continue
        out.append(s & MASK)
        c = s >> LIMB_BITS
    return out, c


def _pad0(x, lead):
    """Pad only the leading (limb) axis; rows may be 1-D or n-D blocks."""
    return jnp.pad(x, [lead] + [(0, 0)] * (x.ndim - 1))


def _mul_cols_low(a_rows, b_rows, n_out):
    """Low n_out columns only (mod 2^(16*n_out)): per a-limb i, multiply just
    b[: n_out - i] — roughly halves the work of a full product."""
    la = len(a_rows)
    b = jnp.stack(b_rows, 0)
    acc = None
    for i in range(min(la, n_out)):
        width = n_out - i
        p = a_rows[i][None] * b[:width]
        lo = p & MASK
        hi = p >> LIMB_BITS
        blk = _pad0(lo, (i, 0))
        hi_w = min(width, n_out - i - 1)
        if hi_w > 0:
            blk = blk + _pad0(hi[:hi_w], (i + 1, 0))
        if blk.shape[0] < n_out:
            blk = _pad0(blk, (0, n_out - blk.shape[0]))
        acc = blk if acc is None else acc + blk
    return [acc[k] for k in range(n_out)]


def _mul_cols(a_rows, b_rows):
    """Column sums of (sum_i a_i 2^16i)(sum_j b_j 2^16j).

    Block formulation: per a-limb, ONE (lb, N) multiply with lo/hi split,
    padded into a (la+lb, N) accumulator — la iterations of a handful of
    wide sublane ops instead of la*lb lane-thin row ops. Accumulators are
    bounded by 2*min(la, lb)*2^16 < 2^22.
    """
    la, lb = len(a_rows), len(b_rows)
    b = jnp.stack(b_rows, 0)  # (lb, N)
    acc = None
    for i in range(la):
        p = a_rows[i][None] * b  # (lb, N) exact u32 (inputs < 2^16)
        lo = p & MASK
        hi = p >> LIMB_BITS
        blk = _pad0(lo, (i, la - i)) + _pad0(hi, (i + 1, la - i - 1))
        acc = blk if acc is None else acc + blk
    return [acc[k] for k in range(la + lb)]


def _sqr_cols(a_rows):
    """Column sums of (sum a_i 2^16i)^2: per limb i ONE multiply against the
    tail a[i:], with cross terms (j > i) doubled -- ~45% fewer multiplies
    than the general product."""
    la = len(a_rows)
    a = jnp.stack(a_rows, 0)
    acc = None
    for i in range(la):
        tail = a[i:]  # (la - i, N)
        p = a_rows[i][None] * tail  # exact u32
        lo = p & MASK
        hi = p >> LIMB_BITS
        # double the cross terms (rows 1..) but not the square (row 0)
        if p.shape[0] > 1:
            dbl = jnp.concatenate([lo[:1], lo[1:] * 2], axis=0)
            dblh = jnp.concatenate([hi[:1], hi[1:] * 2], axis=0)
        else:
            dbl, dblh = lo, hi
        blk = _pad0(dbl, (2 * i, la - i)) + _pad0(dblh, (2 * i + 1, la - i - 1))
        acc = blk if acc is None else acc + blk
    return [acc[k] for k in range(2 * la)]


def _mont_sqr_rows(spec: FieldSpec, a_rows):
    """Montgomery square (reuses the low-half m-product reduction)."""
    L = spec.n_limbs
    p_l, _, np_l, _ = consts(spec)
    shape = a_rows[0].shape
    np_rows = [jnp.full(shape, int(v), jnp.uint32) for v in np_l]
    p_rows = [jnp.full(shape, int(v), jnp.uint32) for v in p_l]
    t_cols = _sqr_cols(a_rows)
    t, _ = _carry_rows(t_cols, 2 * L)
    m_cols = _mul_cols_low(t[:L], np_rows, L)
    m, _ = _carry_rows(m_cols, L)
    mp_cols = _mul_cols(m, p_rows)
    s_cols = [
        (t[k] if t[k] is not None else None)
        if (k >= len(mp_cols) or mp_cols[k] is None)
        else (mp_cols[k] if t[k] is None else t[k] + mp_cols[k])
        for k in range(2 * L)
    ]
    s, carry = _carry_rows(s_cols, 2 * L)
    hi = s[L:]
    if needs_post_reduce(spec):
        hi = _reduce_once_rows(spec, hi, carry)
    return hi


def _add_ripple(a_rows, b_rows):
    """Row lists -> (rows, carry); inputs canonical 16-bit."""
    cols = []
    for i in range(max(len(a_rows), len(b_rows))):
        x = a_rows[i] if i < len(a_rows) else None
        y = b_rows[i] if i < len(b_rows) else None
        cols.append(y if x is None else (x if y is None else x + y))
    return _carry_rows(cols, len(cols))


def _sub_ripple(a_rows, b_rows):
    """a - b with borrow chain; returns (rows, borrow in {0,1})."""
    out = []
    borrow = None
    for i in range(len(a_rows)):
        bi = b_rows[i] if i < len(b_rows) and b_rows[i] is not None else None
        s = a_rows[i] + B16
        if bi is not None:
            s = s - bi
        if borrow is not None:
            s = s - borrow
        out.append(s & MASK)
        borrow = ONE - (s >> LIMB_BITS)
    return out, borrow


def _rows(a):
    return [a[i] for i in range(a.shape[0])]


def _reduce_once_rows(spec, rows, carry=None):
    """true value = rows + carry*R < 4p -> subtract 2p if >= 2p -> < 2p.

    carry is the optional overflow bit out of the top limb (0/1); with it
    set the subtraction is always taken (R > 2p)."""
    _, twop, _, _ = consts(spec)
    t_rows = [jnp.full(rows[0].shape, int(v), jnp.uint32) for v in twop]
    sub_rows, borrow = _sub_ripple(rows, t_rows)
    keep = borrow.astype(bool)  # borrow => limb value < 2p
    if carry is not None:
        keep = keep & (carry == 0)
    return [jnp.where(keep, r, s) for r, s in zip(rows, sub_rows)]


def _mont_mul_rows(spec: FieldSpec, a_rows, b_rows):
    """Montgomery product; inputs < 2p (canonical limbs) -> output < 2p."""
    L = spec.n_limbs
    p_l, _, np_l, _ = consts(spec)
    shape = a_rows[0].shape
    np_rows = [jnp.full(shape, int(v), jnp.uint32) for v in np_l]
    p_rows = [jnp.full(shape, int(v), jnp.uint32) for v in p_l]

    t_cols = _mul_cols(a_rows, b_rows)  # 2L columns
    t, _ = _carry_rows(t_cols, 2 * L)
    m_cols = _mul_cols_low(t[:L], np_rows, L)
    m, _ = _carry_rows(m_cols, L)
    mp_cols = _mul_cols(m, p_rows)  # 2L columns
    s_cols = [
        (t[k] if t[k] is not None else None)
        if (k >= len(mp_cols) or mp_cols[k] is None)
        else (mp_cols[k] if t[k] is None else t[k] + mp_cols[k])
        for k in range(2 * L)
    ]
    s, carry = _carry_rows(s_cols, 2 * L)
    hi = s[L:]
    if needs_post_reduce(spec):
        # true hi + carry*R < (4p/R + 1)p < 3p; one subtract restores < 2p
        hi = _reduce_once_rows(spec, hi, carry)
    return hi  # < 2p


def _add_rows(spec, a_rows, b_rows):
    s, c = _add_ripple(a_rows, b_rows)  # true value < 4p (may carry past R)
    return _reduce_once_rows(spec, s, c)


def _sub_rows(spec, a_rows, b_rows):
    """a - b mod 2p-ish: a + 2p - b, reduced once -> < 2p."""
    _, twop, _, _ = consts(spec)
    shape = a_rows[0].shape
    t_rows = [jnp.full(shape, int(v), jnp.uint32) for v in twop]
    s, c = _add_ripple(a_rows, t_rows)  # true value < 4p, may carry past R
    d, borrow = _sub_ripple(s, b_rows)  # true value >= 0 (b < 2p <= a + 2p)
    c2 = c - borrow  # borrow=1 with c=0 impossible (value nonnegative)
    return _reduce_once_rows(spec, d, c2)


# ---------------------------------------------------------------------------
# public ops on (L, N) arrays
# ---------------------------------------------------------------------------

_TILE = 1024


def _use_pallas() -> bool:
    import os

    env = os.environ.get("POLY_COMMIT_PALLAS")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() == "tpu"


def _block_op(body):
    """Wrap a rows->rows builder into an (L, N) block function."""

    def fn(spec, a, b):
        out = body(spec, _rows(a), _rows(b))
        return jnp.stack(out, 0)

    return fn


_mont_block = _block_op(_mont_mul_rows)
_add_block = _block_op(_add_rows)
_sub_block = _block_op(_sub_rows)


@functools.lru_cache(maxsize=128)
def _pallas_fn(spec: FieldSpec, which: str, n: int, l_out: int):
    from jax.experimental import pallas as pl

    body = {"mul": _mont_block, "add": _add_block, "sub": _sub_block}[which]
    L = spec.n_limbs
    tile = min(_TILE, n & -n)  # largest pow2 divisor of n, capped

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = body(spec, a_ref[:, :], b_ref[:, :])

    def run(a, b):
        grid = n // tile
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((l_out, n), jnp.uint32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((L, tile), lambda i: (0, i)),
                pl.BlockSpec((L, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((l_out, tile), lambda i: (0, i)),
        )(a, b)

    return jax.jit(run)


@functools.lru_cache(maxsize=128)
def _jax_fn(spec: FieldSpec, which: str):
    body = {"mul": _mont_block, "add": _add_block, "sub": _sub_block}[which]
    return jax.jit(functools.partial(body, spec))


def _dispatch(spec, which, a, b):
    n = a.shape[1]
    if _use_pallas() and (n & -n) >= 128:
        return _pallas_fn(spec, which, n, spec.n_limbs)(a, b)
    return _jax_fn(spec, which)(a, b)


def mont_mul(spec: FieldSpec, a, b):
    return _dispatch(spec, "mul", a, b)


def add(spec: FieldSpec, a, b):
    return _dispatch(spec, "add", a, b)


def sub(spec: FieldSpec, a, b):
    return _dispatch(spec, "sub", a, b)


@functools.partial(jax.jit, static_argnums=0)
def canonicalize(spec: FieldSpec, a):
    """values < 2p -> canonical < p (one conditional subtract)."""
    p_l, _, _, _ = consts(spec)
    rows = _rows(a)
    p_rows = [jnp.full(rows[0].shape, int(v), jnp.uint32) for v in p_l]
    d, borrow = _sub_ripple(rows, p_rows)
    keep = borrow.astype(bool)
    return jnp.stack([jnp.where(keep, r, s) for r, s in zip(rows, d)], 0)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def dbl(spec: FieldSpec, a):
    return add(spec, a, a)


def select(mask, a, b):
    """mask: (N,) bool -> where(mask, a, b) over (L, N)."""
    return jnp.where(mask[None, :], a, b)


def zeros(spec: FieldSpec, n: int):
    return jnp.zeros((spec.n_limbs, n), jnp.uint32)


def one_mont(spec: FieldSpec, n: int):
    _, _, _, r = consts(spec)
    return jnp.broadcast_to(jnp.asarray(r)[:, None], (spec.n_limbs, n))


@functools.partial(jax.jit, static_argnums=0)
def is_zero(spec: FieldSpec, a):
    """value ≡ 0 mod p for values < 2p: equals 0 or equals p exactly.

    a's limbs are canonical 16-bit (every public op returns them so), hence
    integer comparison per limb is exact.
    """
    p_l, _, _, _ = consts(spec)
    z = jnp.all(a == 0, axis=0)
    pp = jnp.asarray(p_l)[:, None]
    ep = jnp.all(a == pp, axis=0)
    return z | ep


def eq(spec: FieldSpec, a, b):
    """a ≡ b mod p (both < 2p)."""
    d = sub(spec, a, b)
    return is_zero(spec, d)


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------


def from_ints(spec: FieldSpec, ints, mont: bool = True):
    """python ints -> (L, N) canonical Montgomery limbs."""
    vals = []
    for v in ints:
        v = int(v) % spec.modulus
        if mont:
            v = v * spec.R % spec.modulus
        vals.append(int_to_limbs(v, spec.n_limbs))
    return jnp.asarray(np.stack(vals, axis=1), jnp.uint32)


def to_ints(spec: FieldSpec, a, mont: bool = True) -> list:
    """(L, N) limbs (< 2p) -> canonical python ints."""
    arr = np.asarray(a, np.uint64)
    out = []
    rinv = pow(spec.R, -1, spec.modulus) if mont else 1
    for i in range(arr.shape[1]):
        v = 0
        for j in reversed(range(arr.shape[0])):
            v = (v << LIMB_BITS) + int(arr[j, i])
        out.append(v * rinv % spec.modulus)
    return out


def from_field_last(arr):
    """core/field.py layout (..., L) -> (L, N) flat (same Montgomery form)."""
    L = arr.shape[-1]
    return jnp.moveaxis(arr.reshape(-1, L), -1, 0)


def to_field_last(arr, batch_shape):
    """(L, N) -> (batch..., L) core/field.py layout. Caller must ensure the
    values are < p (canonical) if downstream code assumes it."""
    return jnp.moveaxis(arr, 0, -1).reshape(tuple(batch_shape) + (arr.shape[0],))
