"""Vectorized prime-field arithmetic on 16-bit limbs (JAX, TPU-first).

Design (cf. SURVEY.md §7 step 1): field elements are little-endian arrays of
``spec.n_limbs`` 16-bit limbs stored as uint32, shape ``(..., L)``. All ops are
batch-vectorized pure functions — the batch axis is where the VPU lanes /
sharding live. Elements are kept in Montgomery form (R = 2**(16*L)) between
operations; conversion happens only at the API boundary.

Multiplication is schoolbook with immediate 16-bit hi/lo splitting so every
intermediate fits uint32 (column sums are bounded by 2*L*2^16 <= 2^22), then a
single carry propagation; Montgomery reduction is the separated form
(m = T*N' mod R; t = (T + m*N)/R) which costs ~3 L^2 vector multiplies and
carries — the shape XLA vectorizes and Pallas kernels later fuse.

This replaces the reference's ark-ff Montgomery backend (used from e.g.
/root/reference/poly-commit/src/kzg10/mod.rs:463-470).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field_params import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs, limbs_to_int

MASK = jnp.uint32(LIMB_MASK)

# FieldSpec is a frozen (hashable) dataclass -> usable as a static jit arg.
_jit_spec = functools.partial(jax.jit, static_argnums=0)


def _np_prime_limbs(spec: FieldSpec) -> np.ndarray:
    """N' = -p^{-1} mod R as limbs (separated Montgomery reduction constant)."""
    npi = (-pow(spec.modulus, -1, spec.R)) % spec.R
    return int_to_limbs(npi, spec.n_limbs)


# cache per spec (numpy constants embedded into traces)
_NP_LIMBS_CACHE: dict[str, np.ndarray] = {}


def np_limbs(spec: FieldSpec) -> np.ndarray:
    arr = _NP_LIMBS_CACHE.get(spec.name)
    if arr is None:
        arr = _np_prime_limbs(spec)
        _NP_LIMBS_CACHE[spec.name] = arr
    return arr


# ---------------------------------------------------------------------------
# carry / borrow chains
# ---------------------------------------------------------------------------


def carry_chain(cols: jnp.ndarray, n_out: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Propagate carries over the last axis.

    ``cols``: (..., K) uint32, each < 2^32. Returns ``(limbs, carry)`` with
    ``limbs`` (..., n_out) 16-bit limbs and ``carry`` the final carry-out.
    lax.scan over the limb axis (tiny trace; vectorized over the batch).
    """
    k = cols.shape[-1]
    if k < n_out:
        pad = [(0, 0)] * (cols.ndim - 1) + [(0, n_out - k)]
        cols = jnp.pad(cols, pad)
    x = jnp.moveaxis(cols[..., :n_out], -1, 0)

    def body(c, col):
        s = col + c
        return s >> LIMB_BITS, s & MASK

    c, outs = jax.lax.scan(body, jnp.zeros(cols.shape[:-1], jnp.uint32), x)
    return jnp.moveaxis(outs, 0, -1), c


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a + b) with carry-out; both (..., L) 16-bit limbs."""
    return carry_chain(a + b, a.shape[-1])


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) with borrow-out (1 if a < b); both (..., L) limbs."""
    a, b = jnp.broadcast_arrays(a, b)
    av = jnp.moveaxis(a, -1, 0)
    bv = jnp.moveaxis(b, -1, 0)

    def body(borrow, ab):
        ai, bi = ab
        # uint32 bias trick: s = a_i + 2^16 - b_i - borrow; top bit = no-borrow
        s = ai + (MASK + jnp.uint32(1)) - bi - borrow
        return jnp.uint32(1) - (s >> LIMB_BITS), s & MASK

    borrow, outs = jax.lax.scan(
        body, jnp.zeros(a.shape[:-1], jnp.uint32), (av, bv)
    )
    return jnp.moveaxis(outs, 0, -1), borrow


def _cond_sub_p(spec: FieldSpec, x: jnp.ndarray, extra: jnp.ndarray) -> jnp.ndarray:
    """Reduce x (< 2p, possibly with a carry bit ``extra``) mod p."""
    p = jnp.asarray(spec.p_limbs)
    sub, borrow = _sub_limbs(x, jnp.broadcast_to(p, x.shape))
    # value >= p  iff  extra == 1 or borrow == 0
    take_sub = (extra | (jnp.uint32(1) - borrow)).astype(bool)
    return jnp.where(take_sub[..., None], sub, x)


# ---------------------------------------------------------------------------
# wide multiplication
# ---------------------------------------------------------------------------


def _skew_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Anti-diagonal sums of (..., L, L): out[k] = sum_{i+j=k} x[i, j], (..., 2L).

    Uses the pad/reshape skew trick (row i shifted right by i) — pure data
    movement plus one reduction, no scatters: compiles fast, runs on VPU.
    """
    n = x.shape[-1]
    batch = x.shape[:-2]
    s = 2 * n + 1
    xp = jnp.pad(x, [(0, 0)] * len(batch) + [(0, 0), (0, s - n)])
    f = xp.reshape(batch + (n * s,))
    f = f[..., : n * (s - 1)].reshape(batch + (n, s - 1))
    return f[..., : 2 * n].sum(axis=-2, dtype=jnp.uint32)


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Uncarried column sums of the full product (each < 2*L*2^16 <= 2^22)."""
    n = a.shape[-1]
    prod = a[..., :, None] * b[..., None, :]  # (..., L, L) exact in uint32
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    cols_lo = _skew_sum(lo)
    cols_hi = _skew_sum(hi)
    # hi contributes one limb up
    cols = cols_lo.at[..., 1:].add(cols_hi[..., : 2 * n - 1])
    return cols


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 2L-limb product of two L-limb numbers (carry-propagated)."""
    n = a.shape[-1]
    a, b = jnp.broadcast_arrays(a, b)
    limbs, _ = carry_chain(_mul_cols(a, b), 2 * n)
    return limbs


def mul_low(a: jnp.ndarray, b: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Low ``n_out`` limbs of a*b (i.e. product mod 2^(16*n_out))."""
    a, b = jnp.broadcast_arrays(a, b)
    cols = _mul_cols(a, b)
    limbs, _ = carry_chain(cols[..., :n_out], n_out)
    return limbs


# ---------------------------------------------------------------------------
# Montgomery arithmetic
# ---------------------------------------------------------------------------


@_jit_spec
def mont_reduce(spec: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction: t (..., 2L) -> t * R^{-1} mod p, (..., L)."""
    n = spec.n_limbs
    m = mul_low(t[..., :n], jnp.asarray(np_limbs(spec)), n)
    mp = mul_wide(m, jnp.broadcast_to(jnp.asarray(spec.p_limbs), m.shape))
    s, carry = _add_limbs(t, mp)  # low n limbs are zero by construction
    hi = s[..., n:]
    return _cond_sub_p(spec, hi, carry)


@_jit_spec
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b * R^{-1}) mod p — the product in Montgomery form."""
    return mont_reduce(spec, mul_wide(a, b))


@_jit_spec
def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


@_jit_spec
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, carry = _add_limbs(a, b)
    return _cond_sub_p(spec, s, carry)


@_jit_spec
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sub_limbs(a, b)
    dp, _ = _add_limbs(d, jnp.broadcast_to(jnp.asarray(spec.p_limbs), d.shape))
    return jnp.where(borrow.astype(bool)[..., None], dp, d)


@_jit_spec
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    pm, _ = _sub_limbs(jnp.broadcast_to(jnp.asarray(spec.p_limbs), a.shape), a)
    return jnp.where(is_zero(a)[..., None], a, pm)


@_jit_spec
def dbl(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def zeros(spec: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (spec.n_limbs,), dtype=jnp.uint32)


def one_mont(spec: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(
        jnp.asarray(spec.r_limbs), tuple(shape) + (spec.n_limbs,)
    ).astype(jnp.uint32)


@_jit_spec
def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, jnp.asarray(spec.r2_limbs))


@_jit_spec
def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    n = spec.n_limbs
    t = jnp.concatenate([a, jnp.zeros_like(a)], axis=-1)
    return mont_reduce(spec, t)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(mask, a, b) with mask broadcast over the limb axis."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------


def pow_bits(spec: FieldSpec, a: jnp.ndarray, bits: np.ndarray) -> jnp.ndarray:
    """a^e with e given MSB-first as a static 0/1 numpy array (a in Mont form)."""
    res = one_mont(spec, a.shape[:-1])

    def body(res, bit):
        res = mont_sqr(spec, res)
        res = select(bit.astype(bool), mont_mul(spec, res, a), res)
        return res, None

    res, _ = jax.lax.scan(body, res, jnp.asarray(bits, dtype=jnp.uint32))
    return res


def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    if e == 0:
        return one_mont(spec, a.shape[:-1])
    bits = np.array([(e >> i) & 1 for i in reversed(range(e.bit_length()))], np.int32)
    return pow_bits(spec, a, bits)


@_jit_spec
def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^(p-2); inv(0) = 0 (matching arkworks' None -> we zero)."""
    return pow_bits(spec, a, spec.inv_exp_bits)


@_jit_spec
def batch_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-trick batch inversion along axis 0; zeros map to zero.

    TPU shape: two associative scans (log-depth) + one Fermat inversion,
    replacing arkworks' sequential ``batch_inversion``.
    """
    z = is_zero(a)
    a1 = select(z, one_mont(spec, a.shape[:-1]), a)
    prefix = jax.lax.associative_scan(lambda x, y: mont_mul(spec, x, y), a1, axis=0)
    total_inv = inv(spec, prefix[-1])
    # suffix scan of inverses: inv(prefix[i]) = total_inv * prod_{j>i} a1[j]
    rev = jnp.flip(a1, axis=0)
    suffix = jax.lax.associative_scan(lambda x, y: mont_mul(spec, x, y), rev, axis=0)
    # prod_{j>i} a1[j] = suffix_rev[i+1]; build shifted suffix products
    suf = jnp.flip(suffix, axis=0)  # suf[i] = prod_{j>=i} a1[j]
    suf_next = jnp.concatenate([suf[1:], one_mont(spec, (1,) + a.shape[1:-1])], axis=0)
    pre_prev = jnp.concatenate(
        [one_mont(spec, (1,) + a.shape[1:-1]), prefix[:-1]], axis=0
    )
    out = mont_mul(spec, mont_mul(spec, total_inv, suf_next), pre_prev)
    return select(z, zeros(spec, a.shape[:-1]), out)


# ---------------------------------------------------------------------------
# host-side conversions (tests / serialization / transcripts)
# ---------------------------------------------------------------------------


def from_ints_np(spec: FieldSpec, xs, mont: bool = True) -> np.ndarray:
    """Python ints -> numpy limb array (host-side Montgomery conversion)."""

    def conv(x):
        v = int(x) % spec.modulus
        if mont:
            v = v * spec.R % spec.modulus
        return int_to_limbs(v, spec.n_limbs)

    if isinstance(xs, (int, np.integer)):
        return conv(xs)
    return np.asarray(
        [conv(x) for x in np.ravel(np.asarray(xs, dtype=object))], dtype=np.uint32
    ).reshape(np.shape(xs) + (spec.n_limbs,))


def from_ints(spec: FieldSpec, xs, mont: bool = True) -> jnp.ndarray:
    """Python ints -> device limb array (Montgomery form by default)."""
    return jnp.asarray(from_ints_np(spec, xs, mont), dtype=jnp.uint32)


def to_ints(spec: FieldSpec, a: jnp.ndarray, mont: bool = True):
    """Limb array -> python ints (list-structured like the batch shape)."""
    if mont:
        a = from_mont(spec, a)
    arr = np.asarray(a)
    flat = arr.reshape(-1, spec.n_limbs)
    vals = [limbs_to_int(row) for row in flat]
    if arr.ndim == 1:
        return vals[0]
    out = np.empty(arr.shape[:-1], dtype=object)
    out.reshape(-1)[:] = vals
    return out.tolist() if out.ndim else vals[0]
