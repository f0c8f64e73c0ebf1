"""Limbs-first Pippenger MSM for TPU (the performance path of core/msm.py).

Same sort-based, scatter-light algorithm as core/msm.py (see its module
docstring and SURVEY.md §2.3), re-laid-out for the TPU memory system and
built on the fused Pallas EC kernels (core/ec_lf.py):

  * coordinates are (L, N) limbs-first blocks — full 128-lane utilization;
  * every EC operation in the main scan is ONE fused Pallas kernel over all
    windows x lanes;
  * the lane-boundary "pool" merge and the bucket reduction use log-depth
    segmented/prefix sums of fused EC adds instead of element-count-length
    scans (the sequential tail was the old kernel's wall-clock floor);
  * windows fold with a log-depth weighted tree instead of serial Horner.

Only curves whose base field satisfies R >= 4p run here (BLS12-381/377 G1,
BN254 G1); core/msm.py::msm dispatches, everything else stays on the
portable path.
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
C_BITS = 8  # window size; 16 % C_BITS == 0


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


def _pick_lanes(n: int) -> int:
    # sequential depth = n / T main-scan steps; keep T*W lanes >= ~32k
    t = 1 << min(12, max(2, (n.bit_length() // 2) + 2))
    return min(t, n)


def _seg_scan_add(spec, pts, keys):
    """Segmented inclusive prefix-sum of EC points along the last axis.

    pts: (x, y, z) with coords (L, M); keys: (M,). Entries with equal keys
    form contiguous segments; output position i holds the EC sum of its
    segment's prefix up to i. log2(M) fused EC adds.
    """
    m = keys.shape[0]
    levels = max(1, (m - 1).bit_length())
    x, y, z = pts
    inf = EC.infinity(spec, m)
    for lv in range(levels):
        sh = 1 << lv
        # shifted-by-sh neighbor (from the left); out of range -> infinity
        def shift(a, fill):
            return jnp.concatenate([fill[:, :sh], a[:, :-sh]], axis=1)

        nx = shift(x, inf[0])
        ny = shift(y, inf[1])
        nz = shift(z, inf[2])
        nkeys = jnp.concatenate(
            [jnp.full((sh,), np.uint32(0xFFFFFFFF), jnp.uint32), keys[:-sh]], 0
        )
        same = nkeys == keys
        ax, ay, az = EC.add(spec, (x, y, z), (nx, ny, nz))
        x = ff.select(same, ax, x)
        y = ff.select(same, ay, y)
        z = ff.select(same, az, z)
    return (x, y, z)


def _tree_sum(spec, pts, axis_len):
    """EC sum over the last axis by halving; coords (L, M)."""
    x, y, z = pts
    m = axis_len
    while m > 1:
        half = m // 2
        a = (x[:, :half], y[:, :half], z[:, :half])
        b = (x[:, half : 2 * half], y[:, half : 2 * half], z[:, half : 2 * half])
        s = EC.add(spec, a, b)
        if m % 2:
            x = jnp.concatenate([s[0], x[:, m - 1 : m]], axis=1)
            y = jnp.concatenate([s[1], y[:, m - 1 : m]], axis=1)
            z = jnp.concatenate([s[2], z[:, m - 1 : m]], axis=1)
            m = half + 1
        else:
            x, y, z = s
            m = half
    return (x, y, z)


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_impl(spec: FieldSpec, scalars: jnp.ndarray, x, y, inf):
    """scalars (N, 16) plain; x/y (L, N) affine limbs; inf (N,) bool.

    Returns a Jacobian point with coords (L, 1).
    """
    c = C_BITS
    n = scalars.shape[0]
    L = spec.n_limbs
    bsz = 1 << c
    dump = np.uint32(bsz)
    w_count = SCALAR_BITS // c
    t_lanes = _pick_lanes(n)
    l_steps = -(-n // t_lanes)
    padn = l_steps * t_lanes - n

    digs = _digits(scalars, c)  # (W, N)
    digs = jnp.where(inf[None, :], dump, digs)
    if padn:
        digs = jnp.pad(digs, ((0, 0), (0, padn)), constant_values=np.uint32(bsz))
        x = jnp.pad(x, ((0, 0), (0, padn)))
        y = jnp.pad(y, ((0, 0), (0, padn)))
    order = jnp.argsort(digs, axis=1)  # (W, N')
    sd = jnp.take_along_axis(digs, order, axis=1)  # (W, N')
    sx = jnp.take(x, order, axis=1)  # (L, W, N')
    sy = jnp.take(y, order, axis=1)

    # steps layout: lane t covers sorted slice [t*l_steps, (t+1)*l_steps)
    def to_slwt(a):  # (L, W, N') -> (S, L, W*T)
        a = a.reshape(L, w_count, t_lanes, l_steps)
        return jnp.moveaxis(a, 3, 0).reshape(l_steps, L, w_count * t_lanes)

    sd_l = jnp.moveaxis(
        sd.reshape(w_count, t_lanes, l_steps), 2, 0
    ).reshape(l_steps, w_count * t_lanes)
    sx_l = to_slwt(sx)
    sy_l = to_slwt(sy)
    lead_keys = sd.reshape(w_count, t_lanes, l_steps)[:, :, 0]  # (W, T)

    m = w_count * t_lanes
    slots = w_count * (bsz + 2)
    table = EC.infinity(spec, slots)
    accum = EC.infinity(spec, m)
    inf_m = EC.infinity(spec, m)

    w_off_flat = jnp.asarray(np.repeat(np.arange(w_count, dtype=np.uint32) * (bsz + 2), t_lanes))

    def scatter(table, keys_flat, pt):
        return tuple(tc.at[:, keys_flat].set(pc) for tc, pc in zip(table, pt))

    def main_body(state, inp):
        table, accum, cur_key, have_init, init_pt = state
        key, px, py = inp
        same = key == cur_key
        complete = ~same
        emit_mask = complete & have_init
        # non-emitting lanes write into their window's dump slot (never read)
        out_key = jnp.where(emit_mask, cur_key + w_off_flat, w_off_flat + np.uint32(bsz))
        out_pt = EC.select(emit_mask, accum, inf_m)
        table = scatter(table, out_key, out_pt)
        is_init = complete & ~have_init
        init_pt = EC.select(is_init, accum, init_pt)
        have_init = have_init | complete
        fresh = EC.from_affine(spec, px, py)
        added = EC.madd(spec, accum, px, py)
        accum = EC.select(same, added, fresh)
        return (table, accum, key, have_init, init_pt), None

    state0 = (
        table,
        accum,
        lead_keys.reshape(-1),
        jnp.zeros((m,), bool),
        inf_m,
    )
    (table, accum, cur_key, have_init, init_pt), _ = jax.lax.scan(
        main_body, state0, (sd_l, sx_l, sy_l)
    )

    # ---- pool: per-lane leading segment + trailing partial ----
    lead_pt = EC.select(have_init, init_pt, inf_m)  # (L, W*T)
    lead_key_flat = lead_keys.reshape(-1) + w_off_flat
    trail_key_flat = cur_key + w_off_flat

    def interleave_pts(a, b):
        # (L, M) x (L, M) -> (L, 2M) interleaved per lane
        st = jnp.stack([a, b], axis=2)  # (L, M, 2)
        return st.reshape(a.shape[0], 2 * a.shape[1])

    pool_x = interleave_pts(lead_pt[0], accum[0])
    pool_y = interleave_pts(lead_pt[1], accum[1])
    pool_z = interleave_pts(lead_pt[2], accum[2])
    pool_keys = jnp.stack([lead_key_flat, trail_key_flat], axis=1).reshape(-1)
    # BUT: interleaving is per-lane within a window; lanes of one window are
    # contiguous in the flat (W*T) layout, so same-bucket runs stay adjacent.
    psum = _seg_scan_add(spec, (pool_x, pool_y, pool_z), pool_keys)
    # segment tails: last entry of each run writes the total
    nxt = jnp.concatenate([pool_keys[1:], jnp.full((1,), np.uint32(0xFFFFFFFF), jnp.uint32)], 0)
    is_tail = nxt != pool_keys
    tail_keys = jnp.where(
        is_tail, pool_keys, (pool_keys // (bsz + 2)) * (bsz + 2) + np.uint32(bsz)
    )
    # merge pool totals with whatever the main scan already wrote for the
    # same bucket (main scan never writes a bucket that continues across a
    # lane boundary twice, but it may have written interior buckets;
    # interior buckets never appear in the pool, so a plain write is safe)
    table = scatter(table, tail_keys, psum)

    # ---- bucket reduction: S_w = sum_{j>=1} j * B_j ----
    # gather buckets descending j = bsz-1 .. 1 per window: (L, W, bsz-1)
    idx = (
        np.arange(w_count, dtype=np.int64)[:, None] * (bsz + 2)
        + np.arange(bsz - 1, 0, -1, dtype=np.int64)[None, :]
    ).reshape(-1)
    bx = jnp.take(table[0], jnp.asarray(idx), axis=1)
    by = jnp.take(table[1], jnp.asarray(idx), axis=1)
    bz = jnp.take(table[2], jnp.asarray(idx), axis=1)
    seg = np.repeat(np.arange(w_count, dtype=np.uint32), bsz - 1)
    running = _seg_scan_add(spec, (bx, by, bz), jnp.asarray(seg))
    # S_w = sum over the window's running prefixes: segmented total of
    # running -> use tree-sum per window via reshape (windows equal length)
    rx = running[0].reshape(L, w_count, bsz - 1)
    ry = running[1].reshape(L, w_count, bsz - 1)
    rz = running[2].reshape(L, w_count, bsz - 1)

    def wtree(px, py, pz, mlen):
        while mlen > 1:
            half = mlen // 2
            a = (
                px[:, :, :half].reshape(L, -1),
                py[:, :, :half].reshape(L, -1),
                pz[:, :, :half].reshape(L, -1),
            )
            b = (
                px[:, :, half : 2 * half].reshape(L, -1),
                py[:, :, half : 2 * half].reshape(L, -1),
                pz[:, :, half : 2 * half].reshape(L, -1),
            )
            s = EC.add(spec, a, b)
            sx_ = s[0].reshape(L, w_count, half)
            sy_ = s[1].reshape(L, w_count, half)
            sz_ = s[2].reshape(L, w_count, half)
            if mlen % 2:
                px = jnp.concatenate([sx_, px[:, :, mlen - 1 :]], axis=2)
                py = jnp.concatenate([sy_, py[:, :, mlen - 1 :]], axis=2)
                pz = jnp.concatenate([sz_, pz[:, :, mlen - 1 :]], axis=2)
                mlen = half + 1
            else:
                px, py, pz = sx_, sy_, sz_
                mlen = half
        return (px[:, :, 0], py[:, :, 0], pz[:, :, 0])  # (L, W)

    s_w = wtree(rx, ry, rz, bsz - 1)

    # ---- window fold: sum_w 2^(c*w) S_w, log-depth pairing ----
    wx, wy, wz = s_w
    wlen = w_count
    while wlen > 1:
        half = wlen // 2
        hi = (wx[:, half:wlen], wy[:, half:wlen], wz[:, half:wlen])
        # hi scaled by 2^(c*half): c*half doublings, vectorized over half
        for _ in range(c * half):
            hi = EC.double(spec, hi)
        lo = (wx[:, :half], wy[:, :half], wz[:, :half])
        s = EC.add(spec, lo, hi)
        wx, wy, wz = s
        wlen = half
    return (wx[:, :1], wy[:, :1], wz[:, :1])


def msm(spec: FieldSpec, scalars: jnp.ndarray, x, y, inf):
    """Pad N to a power of two and run; returns Jacobian coords (L, 1)."""
    n = scalars.shape[0]
    n2 = 1 << max(7, (n - 1).bit_length())  # at least 128 lanes
    if n2 != n:
        scalars = jnp.pad(scalars, ((0, n2 - n), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, n2 - n)))
        y = jnp.pad(y, ((0, 0), (0, n2 - n)))
        inf = jnp.pad(inf, (0, n2 - n), constant_values=True)
    return _msm_impl(spec, scalars, x, y, inf)
