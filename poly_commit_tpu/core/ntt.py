"""Radix-2 NTT / iNTT and evaluation domains over 2-adic prime fields.

Replaces ark-poly's ``GeneralEvaluationDomain::fft`` (used by the reference's
Reed-Solomon encoder, /root/reference/poly-commit/src/linear_codes/utils.rs:112-127)
and powers fast polynomial division.

TPU shape: the classic iterative Cooley-Tukey with a *stage scan* — the
butterfly pairing at each stage is expressed as reshape/swap on static shapes
(via a per-stage gather index precomputed on host), all field math batched
over the full domain. Twiddles are precomputed per domain (host ints ->
Montgomery limb constants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from .field_params import FieldSpec


@functools.lru_cache(maxsize=64)
def domain(spec: FieldSpec, log_n: int):
    """Evaluation domain of size 2^log_n; precomputed host-side constants."""
    assert log_n <= spec.two_adicity, (log_n, spec.two_adicity)
    n = 1 << log_n
    p = spec.modulus
    w = pow(spec.two_adic_root, 1 << (spec.two_adicity - log_n), p)
    winv = pow(w, -1, p)
    ninv = pow(n, -1, p)
    pows = np.empty((n,), dtype=object)
    ipows = np.empty((n,), dtype=object)
    x = 1
    for i in range(n):
        pows[i] = x
        x = x * w % p
    x = 1
    for i in range(n):
        ipows[i] = x
        x = x * winv % p
    return {
        "n": n,
        "log_n": log_n,
        "omega": w,
        "omega_inv": winv,
        "n_inv": ninv,
        "pows": pows,  # host ints, w^i
        "ipows": ipows,
    }


@functools.lru_cache(maxsize=64)
def _twiddle_tables(spec: FieldSpec, log_n: int, inverse: bool):
    """Per-stage twiddle limb arrays (stages, n/2) in Montgomery form.

    Stage s (s = 0 .. log_n-1) of the DIT NTT on bit-reversed input uses
    blocks of size 2^(s+1); butterfly j within a block uses w_{2^(s+1)}^j.
    We materialize the full (n/2,) twiddle vector per stage so the stage
    scan is one vectorized field mul.
    """
    d = domain(spec, log_n)
    n = d["n"]
    pows = d["ipows"] if inverse else d["pows"]
    stages = []
    for s in range(log_n):
        block = 1 << (s + 1)
        # twiddle for global pair index k (0..n/2): j = k mod block/2
        j = np.arange(n // 2) % (block // 2)
        exps = j * (n // block)
        stages.append([int(pows[e]) for e in exps])
    arr = np.stack([F.from_ints_np(spec, st, mont=True) for st in stages])
    return arr  # numpy (log_n, n/2, L): a trace-safe constant


@functools.lru_cache(maxsize=64)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(0, 2))
def _ntt_impl(spec: FieldSpec, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """In-order -> in-order NTT. a: (..., n, L) Montgomery coefficients."""
    n = a.shape[-2]
    log_n = int(np.log2(n))
    assert 1 << log_n == n
    tw = _twiddle_tables(spec, log_n, inverse)  # (S, n/2, L)
    rev = jnp.asarray(_bitrev_perm(log_n))
    a = jnp.take(a, rev, axis=-2)

    batch = a.shape[:-2]
    L = a.shape[-1]

    # each stage is pure reshape + one vector mul + add/sub (no gathers)
    for s in range(log_n):
        half = 1 << s
        m = n // (2 * half)
        x = a.reshape(batch + (m, 2, half, L))
        u = x[..., 0, :, :]
        w = x[..., 1, :, :]
        t = jnp.asarray(tw[s]).reshape(m, half, L)
        v = F.mont_mul(spec, w, t)
        lo = F.add(spec, u, v)
        hi = F.sub(spec, u, v)
        a = jnp.stack([lo, hi], axis=-3).reshape(batch + (n, L))

    if inverse:
        ninv = jnp.asarray(F.from_ints_np(spec, domain(spec, log_n)["n_inv"]))
        a = F.mont_mul(spec, a, jnp.broadcast_to(ninv, a.shape))
    return a


def ntt(spec: FieldSpec, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations over the 2^k domain."""
    return _ntt_impl(spec, coeffs, False)


def intt(spec: FieldSpec, evals: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: evaluations -> coefficients."""
    return _ntt_impl(spec, evals, True)
