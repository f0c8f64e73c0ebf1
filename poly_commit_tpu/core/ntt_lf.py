"""Limbs-first radix-2 NTT — the TPU performance tier of core/ntt.py.

Replaces ark-poly's GeneralEvaluationDomain::fft on the hot path (the
reference's RS encoder, linear_codes/utils.rs:112-127; BASELINE.md targets a
2^22 transform). Layout is the (L, N) limbs-first convention of core/ff.py:
lanes stay full (N on the 128-lane axis) and each butterfly stage runs as
ONE fused Pallas kernel (twiddle mul + add + sub in VMEM) instead of three
separate HBM round trips.

Conventions match core/ntt.py: in-order input, in-order output, DIT over a
bit-reversed permutation, per-stage twiddle tables in Montgomery form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ff
from . import ntt as NTT
from .field_params import FieldSpec

_TILE = 2048


@functools.lru_cache(maxsize=64)
def _twiddles_lf(spec: FieldSpec, log_n: int, inverse: bool):
    """Per-stage DISTINCT twiddles as device arrays (L, 2^s), s = 0..S-1.

    Stage s repeats its 2^s twiddles across every butterfly block, so only
    the distinct prefix ships to the device (total n*L*4 bytes instead of
    (n log n)*L*4) — and they are passed as TRACED jit arguments, never
    embedded as constants: at 2^22 the embedded tables were 4.4 GB of
    constants, exploding XLA compile time and overflowing the axon
    remote-compile request (HTTP 413)."""
    tw = NTT._twiddle_tables(spec, log_n, inverse)  # (S, n/2, L) numpy
    full = np.ascontiguousarray(np.moveaxis(tw, 2, 1))  # (S, L, n/2)
    return tuple(
        jnp.asarray(np.ascontiguousarray(full[s][:, : 1 << s]))
        for s in range(max(1, log_n))
    )


@functools.lru_cache(maxsize=16)
def _butterfly_fn(spec: FieldSpec, n_half: int, use_pallas: bool):
    """(u, w, tw) (L, n/2) each -> (u + w*tw, u - w*tw) fused."""
    L = spec.n_limbs

    def graph(u, w, tw):
        ur = ff._rows(u)
        v = ff._mont_mul_rows(spec, ff._rows(w), ff._rows(tw))
        lo = ff._add_rows(spec, ur, v)
        hi = ff._sub_rows(spec, ur, v)
        return jnp.stack(lo, 0), jnp.stack(hi, 0)

    if not use_pallas:
        return jax.jit(graph)

    from jax.experimental import pallas as pl

    tile = min(_TILE, n_half & -n_half)

    def kernel(u_ref, w_ref, t_ref, lo_ref, hi_ref):
        lo, hi = graph(u_ref[:, :], w_ref[:, :], t_ref[:, :])
        lo_ref[:, :] = lo
        hi_ref[:, :] = hi

    def run(u, w, tw):
        grid = n_half // tile
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((L, n_half), jnp.uint32),
                jax.ShapeDtypeStruct((L, n_half), jnp.uint32),
            ),
            grid=(grid,),
            in_specs=[pl.BlockSpec((L, tile), lambda i: (0, i))] * 3,
            out_specs=(
                pl.BlockSpec((L, tile), lambda i: (0, i)),
                pl.BlockSpec((L, tile), lambda i: (0, i)),
            ),
        )(u, w, tw)

    return jax.jit(run)


def _bitrev_apply(a: jnp.ndarray, rows: int, log_n: int) -> jnp.ndarray:
    """Bit-reverse each length-2^log_n block of (L, rows*n) WITHOUT a
    minor-axis gather (XLA's generic gather runs at ~scalar-core speed on
    TPU). Decomposition: with i = i1*n2 + i2, rev(i) = rev(i2)*n1 + rev(i1),
    so bitrev = row-permute (major axis, contiguous slabs) + transpose +
    row-permute — all bandwidth-bound ops."""
    L, total = a.shape
    n = total // rows
    if n <= 2:
        return a
    k1 = log_n // 2
    k2 = log_n - k1
    n1, n2 = 1 << k1, 1 << k2
    r1 = jnp.asarray(NTT._bitrev_perm(k1)) if k1 else jnp.zeros(1, jnp.int32)
    r2 = jnp.asarray(NTT._bitrev_perm(k2))
    x = a.reshape(L, rows, n1, n2)
    x = jnp.take(x, r1, axis=2)  # rows of n2 contiguous elements
    x = jnp.swapaxes(x, 2, 3)  # (L, rows, n2, n1)
    x = jnp.take(x, r2, axis=2)
    return x.reshape(L, total)


def _ntt_lf_body(spec: FieldSpec, a: jnp.ndarray, tws, inverse: bool,
                 rows: int = 1) -> jnp.ndarray:
    """a: (L, rows*n) Montgomery limbs-first — ``rows`` independent
    contiguous length-n transforms batched in one kernel sweep (the
    butterfly structure is block-periodic, so each stage is still ONE fused
    launch over the full lane axis). In-order -> in-order per block."""
    L, total = a.shape
    assert total % rows == 0
    n = total // rows
    log_n = int(np.log2(n))
    assert 1 << log_n == n
    a = _bitrev_apply(a, rows, log_n)
    use_pallas = ff._use_pallas() and (total // 2) % 128 == 0

    for s in range(log_n):
        half = 1 << s
        m = total // (2 * half)
        x = a.reshape(L, m, 2, half)
        u = x[:, :, 0, :].reshape(L, total // 2)
        w = x[:, :, 1, :].reshape(L, total // 2)
        t = jnp.tile(tws[s], (1, m))  # distinct (L, half) -> (L, m*half)
        lo, hi = _butterfly_fn(spec, total // 2, use_pallas)(u, w, t)
        a = jnp.stack(
            [lo.reshape(L, m, half), hi.reshape(L, m, half)], axis=2
        ).reshape(L, total)

    if inverse:
        d = NTT.domain(spec, log_n)
        ninv = ff.from_ints(spec, [d["n_inv"]])
        a = ff.mont_mul(spec, a, jnp.broadcast_to(ninv, a.shape))
    return a


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _ntt_lf_jit(spec: FieldSpec, a, tws, inverse: bool, rows: int = 1):
    return _ntt_lf_body(spec, a, tws, inverse, rows)


def _log_n(a, rows):
    n = a.shape[1] // rows
    log_n = int(np.log2(n))
    assert 1 << log_n == n
    return log_n


def ntt(spec: FieldSpec, a: jnp.ndarray, rows: int = 1) -> jnp.ndarray:
    """Forward NTT on (L, rows*n) limbs-first Montgomery coefficients
    (``rows`` independent contiguous transforms — the RS-encode batch)."""
    tws = _twiddles_lf(spec, _log_n(a, rows), False)
    return _ntt_lf_jit(spec, a, tws, False, rows)


def intt(spec: FieldSpec, a: jnp.ndarray, rows: int = 1) -> jnp.ndarray:
    tws = _twiddles_lf(spec, _log_n(a, rows), True)
    return _ntt_lf_jit(spec, a, tws, True, rows)
