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
    """Per-stage twiddles as (S, L, n/2) numpy uint32 (limbs-first)."""
    tw = NTT._twiddle_tables(spec, log_n, inverse)  # (S, n/2, L) numpy
    return np.ascontiguousarray(np.moveaxis(tw, 2, 1))


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


def _ntt_lf_body(spec: FieldSpec, a: jnp.ndarray, inverse: bool,
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
    tw = _twiddles_lf(spec, log_n, inverse)
    rev = NTT._bitrev_perm(log_n)
    if rows > 1:
        rev = (
            np.arange(rows)[:, None] * n + np.asarray(rev)[None, :]
        ).reshape(-1)
    a = jnp.take(a, jnp.asarray(rev), axis=1)
    use_pallas = ff._use_pallas() and (total // 2) % 128 == 0

    for s in range(log_n):
        half = 1 << s
        m = total // (2 * half)
        x = a.reshape(L, m, 2, half)
        u = x[:, :, 0, :].reshape(L, total // 2)
        w = x[:, :, 1, :].reshape(L, total // 2)
        t = jnp.asarray(tw[s])
        if rows > 1:
            t = jnp.tile(t, (1, rows))
        lo, hi = _butterfly_fn(spec, total // 2, use_pallas)(u, w, t)
        a = jnp.stack(
            [lo.reshape(L, m, half), hi.reshape(L, m, half)], axis=2
        ).reshape(L, total)

    if inverse:
        d = NTT.domain(spec, log_n)
        ninv = ff.from_ints(spec, [d["n_inv"]])
        a = ff.mont_mul(spec, a, jnp.broadcast_to(ninv, a.shape))
    return a


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _ntt_lf_jit(spec: FieldSpec, a, inverse: bool, rows: int = 1):
    return _ntt_lf_body(spec, a, inverse, rows)


def ntt(spec: FieldSpec, a: jnp.ndarray, rows: int = 1) -> jnp.ndarray:
    """Forward NTT on (L, rows*n) limbs-first Montgomery coefficients
    (``rows`` independent contiguous transforms — the RS-encode batch)."""
    return _ntt_lf_jit(spec, a, False, rows)


def intt(spec: FieldSpec, a: jnp.ndarray, rows: int = 1) -> jnp.ndarray:
    return _ntt_lf_jit(spec, a, True, rows)
