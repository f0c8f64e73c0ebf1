"""Limbs-first Pippenger MSM for TPU (the performance path of core/msm.py).

Scatter-free formulation built on the fused Pallas EC kernels
(core/ec_lf.py), replacing arkworks' VariableBaseMSM (SURVEY.md §2.3):

  1. Per 16-bit window, points are sorted by digit (one batched argsort).
  2. ONE `lax.scan` of pure masked fused madds computes within-lane
     prefix sums over the sorted points (T fixed lanes per window; the
     prefix after every step is emitted as the scan output).
  3. Cross-lane exclusive prefixes per window via a Blelloch tree
     (work-efficient: ~2*lanes EC adds in 2*log2(T) fused launches).
  4. Every bucket's sum is the DIFFERENCE of the global sorted prefix at
     its tail position and at the previous bucket's tail -- pure gathers.
     (The earlier scatter-into-table formulation cost ~20ms/step in XLA
     lane scatters; this one never scatters.)
  5. Bucket weighting sum_j j*B_j via the tiled descending running-sum
     identity (2*W*bsz adds in ~l3 medium launches), then the window fold
     (on host when concrete -- a handful of point ops).

Kernel shapes are size-invariant (T fixed per backend), so one set of
Mosaic compiles serves every MSM in the process; only scan lengths vary.
Only curves whose base field satisfies R >= 4p run here (BLS12-381/377 G1,
BN254 G1); core/msm.py::msm dispatches, everything else stays portable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ec_lf as EC
from . import ff
from .field_params import FieldSpec

SCALAR_BITS = 256
MASK16 = np.uint32(0xFFFF)


class JACOBIAN_OPS:
    """Weierstrass group law (Jacobian, 3 coords) — the SRS/G1 path."""

    n_coords = 3

    @staticmethod
    def rows(spec):
        return spec.n_limbs

    @staticmethod
    def madd(spec, p, px, py, distinct: bool):
        return (EC.madd_distinct if distinct else EC.madd)(spec, p, px, py)

    @staticmethod
    def madd_packed(spec, p, pq, distinct: bool):
        return (EC.madd_distinct_packed if distinct else EC.madd_packed)(
            spec, p, pq
        )

    add = staticmethod(EC.add)
    double = staticmethod(EC.double)
    infinity = staticmethod(EC.infinity)
    select = staticmethod(EC.select)

    @staticmethod
    def to_host(spec, coords):
        return _to_host_pts(spec, coords)

    @staticmethod
    def host_group(spec):
        return _host_group_for(spec)

    neg = staticmethod(EC.neg)
    host_identity = None

    @staticmethod
    def from_host(spec, pt):
        if pt is None:
            return (ff.zeros(spec, 1), ff.one_mont(spec, 1), ff.zeros(spec, 1))
        return (
            ff.from_ints(spec, [pt[0]]),
            ff.from_ints(spec, [pt[1]]),
            ff.one_mont(spec, 1),
        )


class EDWARDS_OPS:
    """Extended twisted Edwards a=-1 (JubJub, 4 coords). The unified add
    is COMPLETE, so madd ignores assume_distinct and needs no selects —
    the per-op kernel is ~9M with zero branch overhead."""

    n_coords = 4

    @staticmethod
    def rows(spec):
        return spec.n_limbs

    @staticmethod
    def madd(spec, p, px, py, distinct: bool):
        return EC.ed_madd(spec, p, px, py)

    @staticmethod
    def madd_packed(spec, p, pq, distinct: bool):
        return EC.ed_madd_packed(spec, p, pq)

    add = staticmethod(EC.ed_add)
    double = staticmethod(EC.ed_double)
    infinity = staticmethod(EC.ed_infinity)
    select = staticmethod(EC.select)

    @staticmethod
    def to_host(spec, coords):
        p = spec.modulus
        xs = ff.to_ints(spec, coords[0])
        ys = ff.to_ints(spec, coords[1])
        zs = ff.to_ints(spec, coords[2])
        pts = []
        for xm, ym, zm in zip(xs, ys, zs):
            zi = pow(zm % p, -1, p)
            pts.append((xm * zi % p, ym * zi % p))
        return pts

    @staticmethod
    def host_group(spec):
        from . import field_params as FP
        from .hostec import HostEdwards

        return HostEdwards(FP.BLS12_381_R, FP.JUBJUB_D, FP.JUBJUB_R)

    neg = staticmethod(EC.ed_neg)
    host_identity = (0, 1)

    @staticmethod
    def from_host(spec, pt):
        if pt is None:
            pt = (0, 1)
        x = ff.from_ints(spec, [pt[0]])
        y = ff.from_ints(spec, [pt[1]])
        return (x, y, ff.one_mont(spec, 1), ff.mont_mul(spec, x, y))


class G2Ops:
    """Weierstrass over Fq2 (Jacobian, 3 coords of (2L, N) c0||c1 limb
    stacks) — the G2 fast path. Covers the reference's group-generic
    msm_bigint where it runs on G2 (MultilinearPC's per-variable G2 MSMs,
    multilinear_pc/mod.rs:158-163). Instances are per-curve (the host
    group for the fold lives on the curve object); get one via g2_ops()."""

    n_coords = 3
    host_identity = None

    def __init__(self, group):
        self.group = group

    @staticmethod
    def rows(spec):
        return 2 * spec.n_limbs

    @staticmethod
    def madd(spec, p, px, py, distinct: bool):
        return (EC.g2_madd_distinct if distinct else EC.g2_madd)(
            spec, p, px, py
        )

    @staticmethod
    def madd_packed(spec, p, pq, distinct: bool):
        return (
            EC.g2_madd_distinct_packed if distinct else EC.g2_madd_packed
        )(spec, p, pq)

    add = staticmethod(EC.g2_add)
    double = staticmethod(EC.g2_double)
    select = staticmethod(EC.select)
    neg = staticmethod(EC.g2_neg)

    @staticmethod
    def infinity(spec, n: int):
        return EC.g2_infinity(spec, n)

    def host_group(self, spec):
        from . import hostec

        return hostec.host_group(self.group)

    def to_host(self, spec, coords):
        from . import hostec

        L = spec.n_limbs

        def ints2(cc):
            c0 = ff.to_ints(spec, cc[:L])
            c1 = ff.to_ints(spec, cc[L:])
            return list(zip(c0, c1))

        xs, ys, zs = (ints2(cc) for cc in coords)
        hg = hostec.host_group(self.group)
        pts = []
        for x, y, z in zip(xs, ys, zs):
            if z == (0, 0):
                pts.append(None)
            else:
                pts.append(hg._jto_affine((x, y, z)))
        return pts

    def from_host(self, spec, pt):
        L = spec.n_limbs
        one2 = jnp.concatenate(
            [ff.one_mont(spec, 1), ff.zeros(spec, 1)], axis=0
        )
        if pt is None:
            z2 = jnp.zeros((2 * L, 1), jnp.uint32)
            return (jnp.zeros((2 * L, 1), jnp.uint32), one2, z2)

        def dev2(e):
            return jnp.concatenate(
                [ff.from_ints(spec, [e[0]]), ff.from_ints(spec, [e[1]])],
                axis=0,
            )

        return (dev2(pt[0]), dev2(pt[1]), one2)


@functools.lru_cache(maxsize=8)
def g2_ops(group):
    return G2Ops(group)


def C_BITS() -> int:
    """Window bits (SCALAR_BITS/C windows; 16 % C == 0). 16 on TPU; 8 on
    the pure-JAX CPU fallback, where the 2^16-bucket tree-sum would inline
    into one enormous (OOM-grade) XLA:CPU graph."""
    return 16 if jax.default_backend() == "tpu" else 8


def _digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, 16) plain 16-bit limbs -> (W, N) c-bit window digits."""
    w_count = SCALAR_BITS // c
    per_limb = 16 // c
    mask = np.uint32((1 << c) - 1)
    outs = []
    for w in range(w_count):
        limb = w // per_limb
        shift = (w % per_limb) * c
        outs.append((scalars[:, limb] >> shift) & mask)
    return jnp.stack(outs, axis=0)


def _bitonic_argsort(keys: jnp.ndarray):
    """(W, N) u32 keys (N a power of two) -> (order, sorted_keys) via a
    jnp-level bitonic network.

    XLA:TPU's sort primitive runs ~30x off the HBM roofline (measured
    1.9 s for 16 x 2^20 u32); the bitonic network is log^2(N)/2 stages of
    pure fused elementwise compare-exchanges (~6 vector ops each), which
    XLA executes at bandwidth. Not stable — Pippenger needs bucket
    GROUPING, not ordering, so equal-digit order is irrelevant.
    """
    w, n = keys.shape
    logn = n.bit_length() - 1
    assert 1 << logn == n
    idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (w, n)
    )
    k = keys
    for kk in range(1, logn + 1):
        for j in range(kk - 1, -1, -1):
            stride = 1 << j
            m = n // (2 * stride)
            # direction per compare-block: position p = outer*2*stride + ...;
            # run direction flips with bit kk of p (both partners agree)
            if kk == logn:
                desc = None  # final merge: all ascending
            else:
                outer = np.arange(m, dtype=np.int64) * (2 * stride)
                desc = jnp.asarray(
                    ((outer >> kk) & 1).astype(np.bool_)
                ).reshape(1, m, 1)
            ks = k.reshape(w, m, 2, stride)
            ix = idx.reshape(w, m, 2, stride)
            ka, kb = ks[:, :, 0], ks[:, :, 1]
            ia, ib = ix[:, :, 0], ix[:, :, 1]
            swap = ka > kb
            if desc is not None:
                swap = swap ^ desc
            new_ka = jnp.where(swap, kb, ka)
            new_kb = jnp.where(swap, ka, kb)
            new_ia = jnp.where(swap, ib, ia)
            new_ib = jnp.where(swap, ia, ib)
            k = jnp.stack([new_ka, new_kb], axis=2).reshape(w, n)
            idx = jnp.stack([new_ia, new_ib], axis=2).reshape(w, n)
    return idx, k


def _sort_by_digit(digs: jnp.ndarray):
    """Sort of each window's 16-bit digits; returns (order, sorted).

    Default on TPU: the in-VMEM Pallas bitonic (core/sort_tpu.py) —
    0.097 s at 2^20x16 vs 1.9 s for XLA's comparator sort (the round-4
    bottleneck; BASELINE.md). POLY_COMMIT_PALLAS_SORT=0 falls back to
    XLA sort. Older measured alternatives stay opt-in for reproduction:
    POLY_COMMIT_BITONIC=1 (jnp-level network, 3.1 s — small-stride
    phases force lane-crossing relayouts) and POLY_COMMIT_RADIX_SORT=1
    (counting sort, ~2x slower — TPU scatters don't batch).
    """
    import os

    from . import sort_tpu

    w_count, n = digs.shape
    if (
        jax.default_backend() == "tpu"
        and sort_tpu.supported(n)
        and os.environ.get("POLY_COMMIT_PALLAS_SORT", "1") not in ("0", "false")
        and os.environ.get("POLY_COMMIT_BITONIC", "0") in ("0", "false")
        and os.environ.get("POLY_COMMIT_RADIX_SORT", "0") in ("0", "false")
    ):
        return sort_tpu.bitonic_argsort(digs)
    if jax.default_backend() == "tpu" and (n & (n - 1)) == 0 and (
        os.environ.get("POLY_COMMIT_BITONIC", "0") not in ("0", "false")
    ) and os.environ.get("POLY_COMMIT_RADIX_SORT", "0") in ("0", "false"):
        return _bitonic_argsort(digs)
    if (
        jax.default_backend() != "tpu"
        or os.environ.get("POLY_COMMIT_RADIX_SORT", "0") in ("0", "false")
    ):
        # XLA's comparator sort (CPU fallback / opt-out path).
        order = jnp.argsort(digs, axis=1)
        return order, jnp.take_along_axis(digs, order, axis=1)

    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    orders = []
    for w in range(w_count):
        d = digs[w]
        idx = iota
        cur = d
        # digits span 17 bits: the infinity/padding sentinel is 2^16 and
        # must sort after every real digit -> a final 2-bucket pass
        for shift, nb in ((0, 256), (8, 256), (16, 2)):
            b = ((cur >> shift) & jnp.uint32(nb - 1)).astype(jnp.int32)
            oh = (
                b[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
            ).astype(jnp.int32)
            csum = jnp.cumsum(oh, axis=0)  # inclusive counts
            rank = jnp.take_along_axis(csum, b[:, None], axis=1)[:, 0] - 1
            totals = csum[-1]
            offs = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1]]
            )
            pos = offs[b] + rank
            inv = jnp.zeros((n,), jnp.int32).at[pos].set(iota, unique_indices=True)
            idx = jnp.take(idx, inv)
            cur = jnp.take(d, idx)
        orders.append(idx)
    order = jnp.stack(orders, axis=0)
    return order, jnp.take_along_axis(digs, order, axis=1)


def _tails_hist(sd: jnp.ndarray, c: int) -> jnp.ndarray:
    """Bucket tails via an MXU histogram instead of searchsorted.

    searchsorted(2^20 keys, 2^16 queries) x 16 windows is 20 rounds of
    1M-element binary-search gathers — measured 0.60 s at 2^20, the #2
    MSM stage after the madd scan. But tails[b] = #{i: d_i <= b} - 1 and
    the count is a histogram: one-hot the hi/lo BYTES of each digit and
    contract over elements — hist2d[h, l] = sum_i A[i,h] * B[i,l] — a
    (256, M) @ (M, 256) bf16 matmul that the MXU does in microseconds
    (counts <= 2^20 stay exact in the f32 accumulator). The padding
    sentinel 2^16 one-hots to all-zero rows (hi byte 256 is out of
    range), which drops it from every count exactly as searchsorted's
    [-1, n_real-1] convention requires. Chunked over elements so the
    one-hot operands stay ~64 MB per step."""
    w_count, n = sd.shape
    bsz = 1 << c
    hi = (sd >> 8).astype(jnp.int32)  # [0, 256]; 256 = sentinel
    lo = (sd & np.uint32(0xFF)).astype(jnp.int32)
    chunk = min(n, 1 << 16)
    steps = n // chunk
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
    hi_s = jnp.moveaxis(hi.reshape(w_count, steps, chunk), 1, 0)
    lo_s = jnp.moveaxis(lo.reshape(w_count, steps, chunk), 1, 0)

    def body(acc, inp):
        h, l = inp  # (W, chunk)
        a = (h[:, :, None] == iota).astype(jnp.bfloat16)
        b = (l[:, :, None] == iota).astype(jnp.bfloat16)
        acc = acc + jnp.einsum(
            "wjh,wjl->whl", a, b, preferred_element_type=jnp.float32
        )
        return acc, None

    hist, _ = jax.lax.scan(
        body, jnp.zeros((w_count, 256, 256), jnp.float32), (hi_s, lo_s)
    )
    cum = jnp.cumsum(hist.reshape(w_count, bsz), axis=1)
    return cum.astype(jnp.int32) - 1


def _t_lanes() -> int:
    """Fixed lane count per window: n pads up to it, shapes never vary.
    Small on CPU where the pure-JAX fallback compiles unrolled graphs."""
    return 4096 if jax.default_backend() == "tpu" else 128


def _flat(pts, L, m):
    return tuple(cc.reshape(L, m) for cc in pts)


def _msm_impl(spec: FieldSpec, scalars: jnp.ndarray, x, y, inf,
              assume_distinct: bool = False, ops=JACOBIAN_OPS):
    """scalars (N, 16) plain; x/y (L, N) affine limbs; inf (N,) bool.
    Returns per-window sums S_w with coords (L, W).

    On TPU the whole pipeline compiles as one program (fused Pallas EC
    kernels keep the graph small). The pure-JAX CPU fallback runs it
    EAGERLY instead: one monolithic XLA:CPU graph inlines every unrolled
    limb product (millions of HLOs, >100GB compile RSS); eager mode
    dispatches each EC op through its own small cached jit."""
    if jax.default_backend() == "tpu":
        return _msm_impl_jit(spec, scalars, x, y, inf, assume_distinct, ops)
    return _msm_body(spec, scalars, x, y, inf, assume_distinct, ops)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _msm_impl_jit(spec: FieldSpec, scalars: jnp.ndarray, x, y, inf,
                  assume_distinct: bool = False, ops=JACOBIAN_OPS):
    return _msm_body(spec, scalars, x, y, inf, assume_distinct, ops)


def _msm_body(spec: FieldSpec, scalars: jnp.ndarray, x, y, inf,
              assume_distinct: bool = False, ops=JACOBIAN_OPS):
    c = C_BITS()
    n = scalars.shape[0]
    L = ops.rows(spec)  # limb rows per coordinate (2L for Fq2 groups)
    bsz = 1 << c
    dump = np.uint32(bsz)
    w_count = SCALAR_BITS // c
    t_lanes = _t_lanes()
    l_steps = -(-n // t_lanes)
    padn = l_steps * t_lanes - n

    digs = _digits(scalars, c)  # (W, N)
    digs = jnp.where(inf[None, :], dump, digs)
    if padn:
        digs = jnp.pad(digs, ((0, 0), (0, padn)), constant_values=np.uint32(bsz))
        x = jnp.pad(x, ((0, 0), (0, padn)))
        y = jnp.pad(y, ((0, 0), (0, padn)))
    order, sd = _sort_by_digit(digs)  # (W, N') ascending digits, stable

    # lane t covers sorted slice [t*l_steps, (t+1)*l_steps); points are
    # gathered INSIDE the scan (no (L, W, N') sorted copies materialized)
    idx_l = jnp.moveaxis(
        order.reshape(w_count, t_lanes, l_steps), 2, 0
    ).reshape(l_steps, w_count * t_lanes)
    skip_l = jnp.moveaxis(
        (sd == dump).reshape(w_count, t_lanes, l_steps), 2, 0
    ).reshape(l_steps, w_count * t_lanes)

    m = w_count * t_lanes

    # The in-scan gather cost scales with the ROW count of the gathered
    # table (measured: 48 u32 rows 0.90 s, 24 rows 0.52 s, 12 rows 0.40 s
    # for 256x65536 at 2^20), so the 16-bit limb rows of x and y are
    # packed pairwise into full 32-bit words — ONE (L, N') table instead
    # of two (L, N') half-empty ones — and unpacked in-register after the
    # gather (~48 cheap vector ops per step). POLY_COMMIT_PACK_GATHER=0
    # restores the unpacked layouts (with POLY_COMMIT_GATHER_MAJOR as the
    # round-4 limbs-last A/B).
    import os

    gather_major = os.environ.get("POLY_COMMIT_GATHER_MAJOR", "0") not in (
        "0", "false"
    )
    pack_gather = L % 2 == 0 and os.environ.get(
        "POLY_COMMIT_PACK_GATHER", "1"
    ) not in ("0", "false")
    if pack_gather:
        packed = jnp.concatenate(
            [x[0::2] | (x[1::2] << 16), y[0::2] | (y[1::2] << 16)], axis=0
        )  # (L, N'): rows 0..L/2-1 pack x limb pairs, L/2.. pack y
    x_last = x.T  # (N', L)
    y_last = y.T

    def main_body(accum, inp):
        idx, skip = inp
        if pack_gather:
            g = jnp.take(packed, idx, axis=1)  # (L, m)
            added = ops.madd_packed(spec, accum, g, assume_distinct)
            accum = ops.select(skip, accum, added)
            emit = tuple(cc.T for cc in accum) if gather_major else accum
            return accum, emit
        if gather_major:
            px = jnp.take(x_last, idx, axis=0).T  # (m, L) gather -> (L, m)
            py = jnp.take(y_last, idx, axis=0).T
        else:
            px = jnp.take(x, idx, axis=1)
            py = jnp.take(y, idx, axis=1)
        added = ops.madd(spec, accum, px, py, assume_distinct)
        accum = ops.select(skip, accum, added)
        # emit the inclusive within-lane prefix (limbs-last when the major
        # layout is on, so the tail gather downstream reads contiguous rows)
        emit = tuple(cc.T for cc in accum) if gather_major else accum
        return accum, emit

    if jax.default_backend() == "tpu":
        lane_sums, prefixes = jax.lax.scan(
            main_body, ops.infinity(spec, m), (idx_l, skip_l)
        )
    else:
        # CPU fallback: a Python loop keeps each madd an eager call
        # (lax.scan would compile the unrolled formula body — ~30min on
        # XLA:CPU). l_steps is small on CPU (t_lanes covers test sizes).
        accum = ops.infinity(spec, m)
        prefs = []
        for si in range(l_steps):
            accum, out = main_body(accum, (idx_l[si], skip_l[si]))
            prefs.append(out)
        lane_sums = accum
        prefixes = tuple(
            jnp.stack([p[k] for p in prefs], 0) for k in range(ops.n_coords)
        )
    # prefixes: tuple of 3 coord arrays (S, m, L); lane_sums: coords (L, m)

    # ---- exclusive cross-lane prefix per window (Blelloch) ----
    levels = t_lanes.bit_length() - 1
    sums = tuple(cc.reshape(L, w_count, t_lanes) for cc in lane_sums)
    stack = []
    width = t_lanes
    for _ in range(levels):
        even = tuple(cc[:, :, 0::2] for cc in sums)
        odd = tuple(cc[:, :, 1::2] for cc in sums)
        stack.append(even)
        width //= 2
        s = ops.add(
            spec, _flat(even, L, w_count * width), _flat(odd, L, w_count * width)
        )
        sums = tuple(cc.reshape(L, w_count, width) for cc in s)
    pref = tuple(cc.reshape(L, w_count, 1) for cc in ops.infinity(spec, w_count))
    width = 1
    for lv in reversed(range(levels)):
        even_val = stack[lv]  # (L, W, width)
        odd = ops.add(
            spec,
            _flat(pref, L, w_count * width),
            _flat(even_val, L, w_count * width),
        )
        odd = tuple(cc.reshape(L, w_count, width) for cc in odd)
        pref = tuple(
            jnp.stack([pe, po], axis=3).reshape(L, w_count, 2 * width)
            for pe, po in zip(pref, odd)
        )
        width *= 2
    lane_pref = _flat(pref, L, m)  # exclusive per-window lane prefixes

    # ---- bucket tails ----
    if jax.default_backend() == "tpu" and c == 16:
        tails = _tails_hist(sd, c)  # (W, bsz) in [-1, N'-1]
    else:
        qs = jnp.arange(bsz, dtype=jnp.uint32)

        def tails_one(sd_w):
            return (
                jnp.searchsorted(sd_w, qs, side="right").astype(jnp.int32) - 1
            )

        tails = jax.vmap(tails_one)(sd)  # (W, bsz) in [-1, N'-1]

    # ---- G at tail positions: lane_pref[lane] + prefixes[step][lane] ----
    pos = jnp.clip(tails, 0)
    lane = pos // l_steps  # (W, bsz)
    step = pos % l_steps
    lane_flat = (
        lane + (jnp.arange(w_count, dtype=jnp.int32) * t_lanes)[:, None]
    ).reshape(-1)
    step_flat = step.reshape(-1)
    empty = (tails < 0).reshape(-1)

    # (A packed-limb variant of these tail gathers was measured slower —
    # the post-gather sublane interleave unpack costs more than the halved
    # gather saves; unlike the in-scan point gather there is no Pallas
    # kernel downstream to absorb the unpack for free.)
    if gather_major:
        within = tuple(
            cc[step_flat, lane_flat, :].T for cc in prefixes
        )  # (S, m, L) rows contiguous per (step, lane) -> (L, W*bsz)
        lp_at = tuple(cc.T[lane_flat, :].T for cc in lane_pref)
    else:
        within = tuple(
            cc[step_flat, :, lane_flat].swapaxes(0, 1) for cc in prefixes
        )  # (L, W*bsz)
        lp_at = tuple(cc[:, lane_flat] for cc in lane_pref)
    g = ops.add(spec, within, lp_at)  # inclusive global prefix at tails
    g = ops.select(empty, ops.infinity(spec, g[0].shape[1]), g)

    # ---- Abel summation: S_w = B*G_B - sum_{b=0}^{B-1} G_b, B = bsz-1 ----
    # (sum_j j*(G_j - G_{j-1}) telescopes; no weighted bucket reduction)
    g3 = tuple(cc.reshape(L, w_count, bsz) for cc in g)
    g_last = tuple(cc[:, :, bsz - 1] for cc in g3)  # (L, W): window totals
    # tree-sum of G_0..G_{bsz-2} per window, padded to bsz lanes with one
    # infinity column so every level halves cleanly (no odd-width concats)
    inf_col = tuple(
        cc.reshape(L, w_count, 1) for cc in ops.infinity(spec, w_count)
    )
    cur = tuple(
        jnp.concatenate([cc[:, :, : bsz - 1], ic], axis=2)
        for cc, ic in zip(g3, inf_col)
    )
    mlen = bsz
    while mlen > 1:
        half = mlen // 2
        a = tuple(cc[:, :, :half] for cc in cur)
        b = tuple(cc[:, :, half : 2 * half] for cc in cur)
        s = ops.add(
            spec, _flat(a, L, w_count * half), _flat(b, L, w_count * half)
        )
        cur = tuple(cc.reshape(L, w_count, half) for cc in s)
        mlen = half
    sum_g = tuple(cc[:, :, 0] for cc in cur)  # (L, W)
    return g_last + sum_g  # 6 coord arrays: (x,y,z of G_B, x,y,z of sumG)


def _combine_sw_device(spec: FieldSpec, parts, ops=JACOBIAN_OPS):
    """S_w = B*G_B - sumG on device (B = bsz-1), then the window fold."""
    bsz = 1 << C_BITS()
    nc = ops.n_coords
    g_last = parts[:nc]
    sum_g = parts[nc:]
    # scalar-mul by (bsz - 1) via double-and-add over its bits
    bits = bin(bsz - 1)[2:]
    acc = ops.infinity(spec, g_last[0].shape[1])
    for bit in bits:
        acc = ops.double(spec, acc)
        if bit == "1":
            acc = ops.add(spec, acc, g_last)
    return ops.add(spec, acc, ops.neg(spec, sum_g))  # (L, W)


def _fold_device(spec: FieldSpec, s_w, ops=JACOBIAN_OPS):
    """sum_w 2^(c*w) S_w on device (used under traces, e.g. shard_map)."""
    c = C_BITS()
    cur = s_w
    wlen = cur[0].shape[1]
    while wlen > 1:
        half = wlen // 2
        hi = tuple(cc[:, half:wlen] for cc in cur)
        for _ in range(c * half):
            hi = ops.double(spec, hi)
        lo = tuple(cc[:, :half] for cc in cur)
        cur = ops.add(spec, lo, hi)
        wlen = half
    return tuple(cc[:, :1] for cc in cur)


def _to_host_pts(spec, coords):
    q = spec.modulus
    xs = ff.to_ints(spec, coords[0])
    ys = ff.to_ints(spec, coords[1])
    zs = ff.to_ints(spec, coords[2])
    pts = []
    for xm, ym, zm in zip(xs, ys, zs):
        z = zm % q
        if z == 0:
            pts.append(None)
            continue
        zi = pow(z, -1, q)
        pts.append(((xm * zi * zi) % q, (ym * zi * zi * zi) % q))
    return pts


def _fold_host(spec: FieldSpec, parts, ops=JACOBIAN_OPS):
    """S_w = B*G_B - sumG per window, then the Horner window fold — all on
    host ints (W points; a handful of EC ops, no tiny device launches)."""
    bsz = 1 << C_BITS()
    nc = ops.n_coords
    grp = ops.host_group(spec)
    g_last = ops.to_host(spec, parts[:nc])
    sum_g = ops.to_host(spec, parts[nc:])
    pts = [
        grp.sub(grp.mul(gl, bsz - 1), sg) for gl, sg in zip(g_last, sum_g)
    ]
    def dbl(p):
        if p is None:
            return None
        return grp.double(p) if hasattr(grp, "double") else grp.add(p, p)

    acc = ops.host_identity
    for pt in reversed(pts):
        for _ in range(C_BITS()):
            acc = dbl(acc)
        acc = grp.add(acc, pt)
    return ops.from_host(spec, acc)


def _host_group_for(spec: FieldSpec):
    from . import field_params as FP
    from .hostec import HostWeierstrass, _Fp

    by_name = {
        FP.FQ_BLS12_381.name: (FP.BLS12_381_Q, FP.BLS12_381_R),
        FP.FQ_BLS12_377.name: (FP.BLS12_377_Q, FP.BLS12_377_R),
        FP.FQ_BN254.name: (FP.BN254_Q, FP.BN254_R),
    }
    q, order = by_name[spec.name]
    return HostWeierstrass(_Fp(q), order)


def msm(spec: FieldSpec, scalars: jnp.ndarray, x, y, inf,
        assume_distinct: bool = False, ops=JACOBIAN_OPS):
    """Pad N to a power of two (>= T) and run; returns the group's native
    projective coords (L, 1) tuples (Jacobian or extended Edwards).

    assume_distinct: the bases are pairwise DL-independent (true for every
    SRS), enabling the branch-free madd without the doubling path — ~35%
    fewer field ops in the main scan. NOT safe for adversarial inputs with
    repeated points.

    The final window fold runs on host when inputs are concrete, on device
    under traces (e.g. inside shard_map)."""
    n = scalars.shape[0]
    # sorted copies + emitted prefixes cost ~16 bytes/point/window; chunk so
    # one call stays inside a single chip's HBM
    chunk = 1 << 20
    if n > chunk:
        parts = [
            msm(spec, scalars[s : s + chunk], x[:, s : s + chunk],
                y[:, s : s + chunk], inf[s : s + chunk], assume_distinct,
                ops)
            for s in range(0, n, chunk)
        ]
        acc = parts[0]
        for pt in parts[1:]:
            acc = ops.add(spec, acc, pt)
        return acc
    n2 = 1 << max(_t_lanes().bit_length() - 1, (n - 1).bit_length())
    if n2 != n:
        scalars = jnp.pad(scalars, ((0, n2 - n), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, n2 - n)))
        y = jnp.pad(y, ((0, 0), (0, n2 - n)))
        inf = jnp.pad(inf, (0, n2 - n), constant_values=True)
    parts = _msm_impl(spec, scalars, x, y, inf, assume_distinct, ops)
    import jax.core

    if isinstance(parts[0], jax.core.Tracer):
        return _fold_device(spec, _combine_sw_device(spec, parts, ops), ops)
    return _fold_host(spec, parts, ops)


# ---------------------------------------------------------------------------
# fixed-base batch multiplication (arkworks batch_mul / BatchMulPreprocessing,
# kzg10/mod.rs:76-104 — every scheme's SRS setup)
# ---------------------------------------------------------------------------

FB_C = 8  # window bits for the table


def _fb_windows():
    return SCALAR_BITS // FB_C


def _fixed_base_body(spec: FieldSpec, gx, gy, scalars: jnp.ndarray):
    """gx/gy: (L, 1) affine limbs of the base; scalars (N, 16) plain.
    Returns Jacobian coords (L, N). Structure mirrors _msm_body: scans/fused
    kernels on TPU, eager Python loops on the CPU fallback."""
    W = _fb_windows()
    bsz = 1 << FB_C
    n = scalars.shape[0]
    on_tpu = jax.default_backend() == "tpu"

    # stride points S_w = 2^(FB_C*w) * g for w = 0..W-1: 256 sequential
    # doubles of g, keeping every FB_C-th
    def dbl_body(p, _):
        p2 = EC.double(spec, p)
        return p2, p

    g0 = EC.from_affine(spec, gx, gy)
    if on_tpu:
        _, emitted = jax.lax.scan(dbl_body, g0, None, length=SCALAR_BITS)
        strides = tuple(cc[:: FB_C, :, 0].T for cc in emitted)  # (L, W)
    else:
        outs = []
        p = g0
        for _ in range(W):
            outs.append(p)
            for _ in range(FB_C):
                p = EC.double(spec, p)
        strides = tuple(
            jnp.concatenate([o[k] for o in outs], axis=1) for k in range(3)
        )

    # walk the tables: T[w][d] = T[w][d-1] + S_w, T[w][1] = S_w; d=0 is
    # handled by skip masks at application time. Strides are Jacobian, so
    # normalize to affine first (batch inversion over W lanes).
    sx, sy = _jacobian_to_affine(spec, strides)

    def walk_body(acc, _):
        nxt = EC.add(spec, acc, EC.from_affine(spec, sx, sy))
        return nxt, acc

    start = EC.from_affine(spec, sx, sy)
    if on_tpu:
        _, table = jax.lax.scan(walk_body, start, None, length=bsz - 1)
        # table[d] = (d+1) * S_w, coords (bsz-1, L, W)
    else:
        rows = []
        p = start
        for _ in range(bsz - 1):
            rows.append(p)
            p = EC.add(spec, p, EC.from_affine(spec, sx, sy))
        table = tuple(
            jnp.stack([r[k] for r in rows], axis=0) for k in range(3)
        )

    digs = _digits(scalars, FB_C)  # (W, N)

    # accumulate: acc += T[w][d-1] when d > 0
    table_t = tuple(jnp.moveaxis(cc, 2, 0) for cc in table)  # (W, bsz-1, L)

    def apply_body(acc, inp):
        d, tx, ty, tz = inp  # d (N,); t* (bsz-1, L)
        idx = jnp.clip(d.astype(jnp.int32) - 1, 0)
        tw = (tx[idx].T, ty[idx].T, tz[idx].T)  # (L, N)
        added = EC.add(spec, acc, tw)
        return EC.select(d == 0, acc, added), None

    if on_tpu:
        acc, _ = jax.lax.scan(
            apply_body, EC.infinity(spec, n), (digs,) + table_t
        )
    else:
        acc = EC.infinity(spec, n)
        for w in range(W):
            acc, _ = apply_body(
                acc, (digs[w],) + tuple(t[w] for t in table_t)
            )
    return acc


def _jacobian_to_affine(spec: FieldSpec, p):
    """(x, y, z) (L, M) -> affine (x, y) via per-lane Fermat inversion of z
    (M is tiny — the W stride points — so a plain pow chain is fine)."""
    x, y, z = p
    zi = _ff_inv(spec, z)
    zi2 = ff.mont_mul(spec, zi, zi)
    return (
        ff.mont_mul(spec, x, zi2),
        ff.mont_mul(spec, y, ff.mont_mul(spec, zi2, zi)),
    )


def _ff_inv(spec: FieldSpec, a):
    """Fermat inverse on (L, M) limbs-first arrays: one lax.scan over the
    bits of p-2 (square-and-multiply) so the compiled program holds a
    single squaring/multiply kernel instead of ~770 unrolled ones."""
    e = spec.modulus - 2
    bits = jnp.asarray([int(b) for b in bin(e)[2:]], jnp.uint32)

    def body(acc, bit):
        acc = ff.mont_mul(spec, acc, acc)
        with_mul = ff.mont_mul(spec, acc, a)
        return jnp.where(bit.astype(bool), with_mul, acc), None

    acc, _ = jax.lax.scan(body, ff.one_mont(spec, a.shape[1]), bits)
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def _fixed_base_jit(spec: FieldSpec, gx, gy, scalars):
    return _fixed_base_body(spec, gx, gy, scalars)


def fixed_base(spec: FieldSpec, gx, gy, scalars: jnp.ndarray):
    """Fast-path fixed-base batch mul; see core/msm.py::fixed_base_mul."""
    if jax.default_backend() == "tpu":
        return _fixed_base_jit(spec, gx, gy, scalars)
    return _fixed_base_body(spec, gx, gy, scalars)
