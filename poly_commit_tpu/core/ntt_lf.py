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


_FUSE_BLOCK = 1 << 13  # elements per VMEM block for the fused-stage kernel


def _fused_stages_fn(spec: FieldSpec, n_stages: int, total: int, block: int):
    """One Pallas kernel running butterfly stages 0..n_stages-1 in VMEM.

    After bit-reversal, stage s pairs element i with i XOR 2^s inside
    blocks of 2^(s+1); for 2^(s+1) <= block the whole stage is local to a
    VMEM block, so the first log2(block) stages run as ONE kernel with
    pltpu.roll XOR exchanges (same trick as core/sort_tpu.py) instead of
    log2(block) XLA passes whose small-stride slicing forces lane-crossing
    relayouts (the round-4 NTT was ~50x off the HBM roofline for exactly
    this reason). Twiddles arrive pre-tiled per stage as (L, block) inputs
    with a constant index map (fetched once, reused across the grid).

    The all-lanes formulation does one redundant mont_mul on the u-side
    lanes (vector width is paid regardless), trading 2x multiply work for
    zero compaction relayouts.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    R = block // 128
    nblk = total // block

    def xor_partner_dyn(x, d):
        """value at i XOR d for TRACED power-of-two d on (R, 128); exactly
        one of (sublane, lane) components of d is nonzero, so two
        unconditional dynamic rolls compose to the right rotation."""
        qs = d // 128  # sublane component (d >= 128)
        cs = jnp.where(qs > 0, 0, d)  # lane component (d < 128)
        fwd = pltpu.roll(pltpu.roll(x, (R - qs) % R, 0), (128 - cs) % 128, 1)
        bwd = pltpu.roll(pltpu.roll(x, qs, 0), cs, 1)
        q = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        flat = q * 128 + c
        return jnp.where((flat & d) == 0, fwd, bwd)

    def kernel(x_ref, t_ref, o_ref):
        # t_ref: (n_stages, L, R, 128) per-stage tiled twiddles.
        # A fori_loop over stages with DYNAMIC roll distances keeps the
        # Mosaic program one stage long — the fully unrolled variant
        # compiled ~35 s/stage (353 s at 10 stages).
        x = x_ref[...]  # (L, R, 128)
        q = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        flat = q * 128 + cidx

        def body(s, x):
            d = jnp.int32(1) << s
            bit = (flat & d) != 0
            tw = t_ref[s]
            tw_rows = [tw[l] for l in range(L)]
            rows = [x[l] for l in range(L)]
            partner = [xor_partner_dyn(r, d) for r in rows]
            wv = [jnp.where(bit, r, p) for r, p in zip(rows, partner)]
            uv = [jnp.where(bit, p, r) for r, p in zip(rows, partner)]
            t = ff._mont_mul_rows(spec, wv, tw_rows)
            lo = ff._add_rows(spec, uv, t)
            hi = ff._sub_rows(spec, uv, t)
            return jnp.stack(
                [jnp.where(bit, h, lw) for h, lw in zip(hi, lo)], 0
            )

        o_ref[...] = jax.lax.fori_loop(0, n_stages, body, x)

    xspec = pl.BlockSpec((L, R, 128), lambda b: (0, b, 0))
    tspec = pl.BlockSpec((n_stages, L, R, 128), lambda b: (0, 0, 0, 0))

    def run(x, *tws_tiled):
        x3 = x.reshape(L, total // 128, 128)
        t4 = jnp.stack([t.reshape(L, R, 128) for t in tws_tiled], 0)
        out = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[xspec, tspec],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((L, total // 128, 128), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(x3, t4)
        return out.reshape(L, total)

    return run


@functools.lru_cache(maxsize=128)
def _big_stage_fn(spec: FieldSpec, total: int, s: int, block: int):
    """One large-stride butterfly stage (half = 2^s >= block) as a single
    Pallas pass: the grid delivers each u-block, its partner w-block
    (half elements ahead) and the matching twiddle slice directly via
    index maps, so the mont_mul runs on HALF the lanes (the algorithmic
    count) and the slice/stack relayout passes of the jnp formulation
    disappear."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = spec.n_limbs
    R = block // 128
    half = 1 << s
    hb = half // block  # blocks per half-run
    npairs = total // (2 * block)

    def kernel(u_ref, w_ref, t_ref, lo_ref, hi_ref):
        u = u_ref[...]
        w = w_ref[...]
        t = t_ref[...]
        ur = [u[l] for l in range(L)]
        wr = [w[l] for l in range(L)]
        tr = [t[l] for l in range(L)]
        v = ff._mont_mul_rows(spec, wr, tr)
        lo = ff._add_rows(spec, ur, v)
        hi = ff._sub_rows(spec, ur, v)
        lo_ref[...] = jnp.stack(lo, 0)
        hi_ref[...] = jnp.stack(hi, 0)

    ublk = lambda g: (0, (g // hb) * 2 * hb + (g % hb), 0)
    wblk = lambda g: (0, (g // hb) * 2 * hb + (g % hb) + hb, 0)
    tblk = lambda g: (0, g % hb, 0)
    bs = (L, R, 128)

    def run(x, tw):
        # x (L, total); tw (L, half) stage twiddles (distinct prefix)
        x3 = x.reshape(L, total // 128, 128)
        t3 = tw.reshape(L, half // 128, 128)
        lo, hi = pl.pallas_call(
            kernel,
            grid=(npairs,),
            in_specs=[
                pl.BlockSpec(bs, ublk),
                pl.BlockSpec(bs, wblk),
                pl.BlockSpec(bs, tblk),
            ],
            out_specs=(pl.BlockSpec(bs, ublk), pl.BlockSpec(bs, wblk)),
            out_shape=(
                jax.ShapeDtypeStruct((L, total // 128, 128), jnp.uint32),
                jax.ShapeDtypeStruct((L, total // 128, 128), jnp.uint32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(x3, x3, t3)
        # lo carries valid u-position blocks, hi valid w-position blocks;
        # re-interleave them at half-run granularity (contiguous >= block
        # sized chunks — no lane-crossing)
        m2 = total // (2 * half)
        lo4 = lo.reshape(L, m2, 2, half)[:, :, 0]
        hi4 = hi.reshape(L, m2, 2, half)[:, :, 1]
        return jnp.stack([lo4, hi4], axis=2).reshape(L, total)

    return run


def _tile_stage_twiddles(tws, n_stages: int, block: int):
    """Stage-s distinct twiddles (L, 2^s) -> elementwise (L, block) tables
    T_s[i] = tws[s][i mod 2^s] (valid for any transform length >= 2^(s+1)
    because the pattern period divides the block)."""
    out = []
    for s in range(n_stages):
        t = tws[s]
        out.append(jnp.tile(t, (1, block // t.shape[1])))
    return out


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
                 rows: int = 1, fuse: bool = True) -> jnp.ndarray:
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

    s0 = 0
    block = min(_FUSE_BLOCK, total)
    if (
        fuse
        and use_pallas
        and jax.default_backend() == "tpu"
        and block >= 1024
        and total % block == 0
    ):
        s0 = min(log_n, block.bit_length() - 1)
        tiled = _tile_stage_twiddles(tws, s0, block)
        a = _fused_stages_fn(spec, s0, total, block)(a, *tiled)

    for s in range(s0, log_n):
        half = 1 << s
        if s0 > 0 and half >= block:
            # fused-tier path: grid-split u/w blocks, algorithmic mult
            # count, no slice/stack relayout passes
            a = _big_stage_fn(spec, total, s, block)(a, tws[s])
            continue
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


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _ntt_lf_jit(spec: FieldSpec, a, tws, inverse: bool, rows: int = 1,
                fuse: bool = True):
    return _ntt_lf_body(spec, a, tws, inverse, rows, fuse)


def _fuse_env() -> bool:
    import os

    return os.environ.get("POLY_COMMIT_NTT_FUSE", "1") not in ("0", "false")


def _log_n(a, rows):
    n = a.shape[1] // rows
    log_n = int(np.log2(n))
    assert 1 << log_n == n
    return log_n


def ntt(spec: FieldSpec, a: jnp.ndarray, rows: int = 1) -> jnp.ndarray:
    """Forward NTT on (L, rows*n) limbs-first Montgomery coefficients
    (``rows`` independent contiguous transforms — the RS-encode batch)."""
    tws = _twiddles_lf(spec, _log_n(a, rows), False)
    return _ntt_lf_jit(spec, a, tws, False, rows, _fuse_env())


def intt(spec: FieldSpec, a: jnp.ndarray, rows: int = 1) -> jnp.ndarray:
    tws = _twiddles_lf(spec, _log_n(a, rows), True)
    return _ntt_lf_jit(spec, a, tws, True, rows, _fuse_env())
