"""Multi-scalar multiplication (Pippenger) reformulated for TPU/XLA.

Replaces arkworks' ``VariableBaseMSM::msm_bigint`` (used from every scheme,
e.g. /root/reference/poly-commit/src/kzg10/mod.rs:175) with a sort-based,
scatter-light formulation in which every elliptic-curve operation lives inside
a trace-once ``lax.scan`` body:

  1. Window digits (c bits) are extracted from plain scalar limbs; per window
     the points are sorted by digit (one batched argsort).
  2. Bucket accumulation: the sorted array is laid out as (lanes T) x (steps L)
     and scanned sequentially over L with one *mixed add* per step vectorized
     over all windows x lanes. Completed segments (= finished buckets) are
     scattered into a dense bucket table carried as scan state (in-place XLA
     update). Each lane's leading segment and trailing partial go to a small
     "pool", which a second scan merges (buckets crossing lane boundaries),
     so every bucket is written to the table exactly once.
  3. Bucket reduction sum_j j*B_j uses the descending running-sum identity,
     tiled as (T3 x L3) with two EC adds per step, then a tile-combine scan.
  4. Window results fold via Horner: acc = 2^c * acc + S_w.

Total EC work ~= W*(N + 3*2^c) mixed/general adds — Pippenger-grade — with
sequential depth ~L + 2T + L3 + T3 steps; all vector ops batch over
windows*lanes, which is where the VPU and (sharded) multi-chip parallelism
live. See parallel/mesh.py for the cross-chip psum layer.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F

SCALAR_BITS = 256  # all supported scalar fields fit 16 x 16-bit limbs


def _pick_params(n: int, c: int | None, lanes: int | None):
    if c is None:
        c = 16 if n >= (1 << 16) else (8 if n >= (1 << 7) else 4)
    assert 16 % c == 0 and c <= 16
    if lanes is None:
        # ~sqrt(N)*4 lanes balances sequential depth (N/T) vs pool size (2T)
        lanes = 1 << min(11, max(0, (n.bit_length() // 2) + 2))
        lanes = min(lanes, 1 << max(0, n.bit_length() - 1))
    return c, max(1, lanes)


def _digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, 16) plain limbs -> (W, N) window digits of c bits."""
    w_count = SCALAR_BITS // c
    per_limb = 16 // c
    mask = jnp.uint32((1 << c) - 1)
    outs = []
    for w in range(w_count):
        limb = w // per_limb
        shift = (w % per_limb) * c
        outs.append((scalars[:, limb] >> shift) & mask)
    return jnp.stack(outs, axis=0)


def _interleave(a, b, axis):
    """Interleave two equal arrays along ``axis`` (a0, b0, a1, b1, ...)."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _tree(fn, *trees):
    return jax.tree_util.tree_map(fn, *trees)


def _double_n(group, p, n: int):
    def body(p, _):
        return group.double(p), None

    p, _ = jax.lax.scan(body, p, None, length=n)
    return p


def _fast_path_ok(group) -> bool:
    """Limbs-first Pallas path: prime-field Weierstrass curves with R >= 4p
    (BLS12-381/377 G1, BN254 G1) and the JubJub Edwards curve (complete
    extended-coordinate kernels; its Fr-381 base field uses the ff tier's
    post-reduce since R < 4p), on TPU (or when POLY_COMMIT_FAST_MSM=1
    forces the pure-JAX fallback of the same kernels, e.g. for CPU tests)."""
    import os

    def env_or_tpu():
        env = os.environ.get("POLY_COMMIT_FAST_MSM")
        if env is not None:
            return env not in ("0", "false")
        return jax.default_backend() == "tpu"

    if group.__class__.__name__ == "EdwardsGroup":
        return group.name == "jubjub" and env_or_tpu()
    if group.__class__.__name__ != "WeierstrassGroup":
        return False
    if getattr(group.fops, "elem_ndim", 0) not in (1, 2):
        return False  # Fq2 groups route through msm_tpu.G2Ops
    spec = group.fops.spec
    if 4 * spec.modulus > spec.R:
        return False  # ff supports these with post-reduce, but the MSM path
        # only targets the pairing-curve base fields today
    return env_or_tpu()


def _host_ec_enabled() -> bool:
    """Small *concrete* EC workloads on CPU hosts run on python big-ints:
    exact math at microseconds/op versus multi-minute XLA:CPU compiles of
    unrolled limb formulas. Mirrors the reference, whose verifier-side math
    is equally CPU-serial. Never applies on TPU or under a trace.
    POLY_COMMIT_HOST_EC=0 forces the device kernels (kernel tests)."""
    import os

    if jax.default_backend() == "tpu":
        return False
    env = os.environ.get("POLY_COMMIT_HOST_EC")
    if env is not None:
        return env not in ("0", "false")
    return True


def _host_msm_max() -> int:
    import os

    return int(os.environ.get("POLY_COMMIT_HOST_MSM_MAX", "1024"))


def _any_tracer(*arrs) -> bool:
    import jax.core

    return any(isinstance(a, jax.core.Tracer) for a in arrs)


def _msm_host(group, scalars: jnp.ndarray, points):
    """Host big-int MSM (shared-doubling, Jacobian/extended adds)."""
    from . import hostec

    arr = np.asarray(scalars, np.uint64)
    ints = [
        sum(int(v) << (16 * j) for j, v in enumerate(row)) for row in arr
    ]
    host_pts = hostec.device_affine_to_host(group, points)
    hg = hostec.host_group(group)
    res = hg.msm_fast(ints, host_pts)
    return hostec.host_point_to_device(group, res)


def _naive_max() -> int:
    import os

    return int(os.environ.get("POLY_COMMIT_NAIVE_MSM_MAX", "32"))


@functools.partial(jax.jit, static_argnums=0)
def _msm_naive_impl(group, scalars: jnp.ndarray, points):
    """Vectorized double-and-add MSM for tiny N (the right algorithm when
    Pippenger's window/bucket machinery is pure overhead — and a ~10x
    smaller XLA graph: one double+madd scan body plus one add body, which
    matters on the multi-minute XLA:CPU compiles of unrolled limb math).

    scalars (N, 16) plain limbs; points affine (x, y, inf). Returns the
    group's native projective point, batch ()."""
    x, y, inf = points
    n = scalars.shape[0]
    # MSB-first bit planes (256, N)
    t = np.arange(SCALAR_BITS)
    limb_idx = jnp.asarray((SCALAR_BITS - 1 - t) // 16, jnp.int32)
    shifts = jnp.asarray(((SCALAR_BITS - 1 - t) % 16).astype(np.uint32))
    bits = ((scalars[:, limb_idx] >> shifts[None, :]) & 1).T.astype(bool)

    def bit_body(acc, bit):
        acc = group.double(acc)
        added = group.madd(acc, x, y, inf)
        return group.select(bit & ~inf, added, acc), None

    prods, _ = jax.lax.scan(bit_body, group.infinity((n,)), bits)

    def red_body(acc, pt):
        return group.add(acc, pt), None

    acc, _ = jax.lax.scan(red_body, group.infinity(()), prods)
    return acc


def msm(group, scalars: jnp.ndarray, points, c: int | None = None, lanes: int | None = None,
        assume_distinct: bool = False):
    """MSM: sum_i scalars[i] * points[i].

    group:   WeierstrassGroup / EdwardsGroup (static).
    scalars: (N, 16) uint32 plain (non-Montgomery) little-endian 16-bit limbs.
    points:  affine (x, y, inf_mask) with leading batch axis N.
    Returns a projective point (group's native representation, batch ()).

    N is padded up to a power of two (infinity points, zero scalars) so the
    whole framework shares ONE compiled program per (group, log2 N, c, lanes)
    instead of one per exact size.

    On TPU, supported curves dispatch to the limbs-first fused-Pallas path
    (core/msm_tpu.py); explicit c/lanes pins the portable kernel (tests).
    assume_distinct: precondition that the bases are pairwise
    DL-independent (true for every SRS) — enables the fast path's
    branch-reduced madd. NOT safe for repeated or adversarial points
    (P+P would silently yield infinity); ignored by the portable kernel
    (complete formulas).
    """
    if (
        c is None
        and lanes is None
        and _host_ec_enabled()
        and scalars.shape[0] <= _host_msm_max()
        and not _any_tracer(scalars, *points)
    ):
        return _msm_host(group, scalars, points)
    if c is None and lanes is None and _fast_path_ok(group):
        from . import ff
        from . import msm_tpu

        spec = group.fops.spec
        ops = (
            msm_tpu.EDWARDS_OPS
            if group.__class__.__name__ == "EdwardsGroup"
            else msm_tpu.JACOBIAN_OPS
        )
        x, y, inf = points
        if getattr(group.fops, "elem_ndim", 0) == 2:
            # Fq2 coords (N, 2, L) -> (2L, N) c0||c1 limb stacks
            L = spec.n_limbs
            ops = msm_tpu.g2_ops(group)
            conv = lambda a: a.transpose(1, 2, 0).reshape(2 * L, -1)
            out = msm_tpu.msm(
                spec, scalars, conv(x), conv(y), inf, assume_distinct, ops
            )
            return tuple(
                jnp.stack(
                    [
                        ff.canonicalize(spec, cc[:L])[:, 0],
                        ff.canonicalize(spec, cc[L:])[:, 0],
                    ],
                    axis=0,
                )
                for cc in out
            )
        out = msm_tpu.msm(
            spec,
            scalars,
            ff.from_field_last(x),
            ff.from_field_last(y),
            inf,
            assume_distinct,
            ops,
        )
        # ff keeps values in [0, 2p); downstream field.py assumes < p
        return tuple(ff.canonicalize(spec, cc)[:, 0] for cc in out)
    n0 = scalars.shape[0]
    n_pow2 = 1 << max(0, (n0 - 1).bit_length())
    if n_pow2 != n0:
        x, y, inf = points
        scalars = jnp.pad(scalars, ((0, n_pow2 - n0), (0, 0)))
        zpad = [(0, n_pow2 - n0)] + [(0, 0)] * (x.ndim - 1)
        points = (
            jnp.pad(x, zpad),
            jnp.pad(y, zpad),
            jnp.pad(inf, [(0, n_pow2 - n0)], constant_values=True),
        )
    if c is None and lanes is None and n_pow2 <= _naive_max():
        return _msm_naive_impl(group, scalars, points)
    return _msm_impl(group, scalars, points, c, lanes)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_impl(group, scalars: jnp.ndarray, points, c: int | None = None, lanes: int | None = None):
    x, y, inf = points
    n = scalars.shape[0]
    c, t_lanes = _pick_params(n, c, lanes)
    bsz = 1 << c
    dump = jnp.uint32(bsz)
    w_count = SCALAR_BITS // c

    # ---- digits, padding, per-window sort ----
    digs = _digits(scalars, c)  # (W, N)
    digs = jnp.where(inf[None, :], dump, digs)
    l_steps = -(-n // t_lanes)
    padn = l_steps * t_lanes - n
    if padn:
        digs = jnp.pad(digs, ((0, 0), (0, padn)), constant_values=np.uint32(bsz))
        zpad = [(0, padn)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, zpad)
        y = jnp.pad(y, zpad)
    order = jnp.argsort(digs, axis=1)  # (W, N')
    sd = jnp.take_along_axis(digs, order, axis=1)
    sx = jnp.take(x, order, axis=0)  # (W, N', ...)
    sy = jnp.take(y, order, axis=0)

    # lay out as (L, W, T): lane t covers sorted slice [t*L, (t+1)*L)
    def to_lwt(a):
        a = a.reshape((w_count, t_lanes, l_steps) + a.shape[2:])
        return jnp.moveaxis(a, 2, 0)

    sd_l = to_lwt(sd)
    sx_l = to_lwt(sx)
    sy_l = to_lwt(sy)
    lead_keys = sd.reshape(w_count, t_lanes, l_steps)[:, :, 0]  # (W, T)

    fshape = (w_count, t_lanes)
    inf_pt = group.infinity(fshape)
    table_slots = w_count * (bsz + 2)
    table = group.infinity((table_slots,))

    def scatter(table, keys_flat, pt):
        """keys_flat: (M,) already offset by window; pt coords (M, ...)."""
        return tuple(
            tc.at[keys_flat].set(pc) for tc, pc in zip(table, pt)
        )

    w_off = (jnp.arange(w_count, dtype=jnp.uint32) * (bsz + 2))[:, None]  # (W,1)

    def flat_keys(keys):  # (W, T) -> (W*T,)
        return (keys + w_off).reshape(-1)

    def main_body(state, inp):
        table, accum, cur_key, have_init, init_pt = state
        key, px, py = inp
        same = key == cur_key
        complete = ~same
        emit_mask = complete & have_init
        out_key = jnp.where(emit_mask, cur_key, dump)
        out_pt = _tree(lambda a: a.reshape((w_count * t_lanes,) + a.shape[2:]),
                       group.select(emit_mask, accum, inf_pt))
        table = scatter(table, flat_keys(out_key), out_pt)
        is_init = complete & ~have_init
        init_pt = group.select(is_init, accum, init_pt)
        have_init = have_init | complete
        fresh = group.from_affine(px, py)
        added = group.madd(accum, px, py)
        accum = group.select(same, added, fresh)
        return (table, accum, key, have_init, init_pt), None

    # cur_key starts at each lane's first key so step 0 is a plain
    # accumulation, not a spurious "segment completed" transition.
    state0 = (
        table,
        inf_pt,
        lead_keys,
        jnp.zeros(fshape, bool),
        inf_pt,
    )
    (table, accum, cur_key, have_init, init_pt), _ = jax.lax.scan(
        main_body, state0, (sd_l, sx_l, sy_l)
    )

    # ---- pool: per-lane lead (first segment) and trail (last partial) ----
    lead_pt = group.select(have_init, init_pt, inf_pt)
    pool_keys = _interleave(lead_keys, cur_key, axis=1)  # (W, 2T)
    pool_pts = _tree(lambda a, b: _interleave(a, b, axis=1), lead_pt, accum)

    pool_inputs = (
        jnp.moveaxis(pool_keys, 1, 0),  # (2T, W)
        _tree(lambda a: jnp.moveaxis(a, 1, 0), pool_pts),
    )
    winf = group.infinity((w_count,))
    w_off1 = jnp.arange(w_count, dtype=jnp.uint32) * (bsz + 2)

    def pool_body(state, inp):
        table, acc, key2 = state
        key, pt = inp
        same = key == key2
        emit = ~same
        out_key = jnp.where(emit, key2, dump)
        out_pt = group.select(emit, acc, winf)
        table = scatter(table, out_key + w_off1, out_pt)
        acc = group.select(same, group.add(acc, pt), pt)
        return (table, acc, key), None

    (table, acc2, key2), _ = jax.lax.scan(
        pool_body, (table, winf, jnp.full((w_count,), bsz, jnp.uint32)), pool_inputs
    )
    table = scatter(table, key2 + w_off1, acc2)

    # ---- bucket reduction: S_w = sum_{j>=1} j * table[w, j] ----
    l3 = min(256, 1 << max(0, (bsz - 1).bit_length() - 1))
    t3 = -(-(bsz - 1) // l3)
    # descending bucket indices padded at the FRONT with the dump slot
    idx_desc = np.concatenate(
        [np.full(t3 * l3 - (bsz - 1), bsz + 1, np.int64), np.arange(bsz - 1, 0, -1)]
    )  # front-padded with the never-written (infinity) slot bsz+1
    flat_idx = (
        np.arange(w_count)[:, None] * (bsz + 2) + idx_desc[None, :]
    )  # (W, T3*L3)
    flat_idx = jnp.asarray(flat_idx.reshape(w_count, t3, l3))
    d_pts = _tree(lambda a: jnp.moveaxis(jnp.take(a, flat_idx, axis=0), 2, 0), table)

    tinf = group.infinity((w_count, t3))

    def bucket_body(state, d):
        running, total = state
        running = group.add(running, d)
        total = group.add(total, running)
        return (running, total), None

    (running, total), _ = jax.lax.scan(bucket_body, (tinf, tinf), d_pts)

    # combine tiles: S = sum_t V_t + L3 * sum_t PrefixR_t
    def tile_body(state, inp):
        prefix, bsum, vsum = state
        r_t, v_t = inp
        bsum = group.add(bsum, prefix)
        prefix = group.add(prefix, r_t)
        vsum = group.add(vsum, v_t)
        return (prefix, bsum, vsum), None

    tile_inputs = _tree(lambda a: jnp.moveaxis(a, 1, 0), (running, total))
    (_, bsum, vsum), _ = jax.lax.scan(tile_body, (winf, winf, winf), tile_inputs)
    s_w = group.add(vsum, _double_n(group, bsum, int(math.log2(l3))))  # (W,)

    # ---- Horner over windows: acc = 2^c acc + S_w, w = W-1 .. 0 ----
    s_rev = _tree(lambda a: jnp.flip(a, axis=0), s_w)
    acc0 = group.infinity(())

    def horner_body(acc, s):
        acc = _double_n(group, acc, c)
        return group.add(acc, s), None

    acc, _ = jax.lax.scan(horner_body, acc0, s_rev)
    return acc


def fixed_base_mul(group, base, scalars: jnp.ndarray):
    """Power-of-two-padded wrapper (one compiled program per log2 N).

    Fast-path-eligible curves (see _fast_path_ok) use the limbs-first
    windowed-table path (core/msm_tpu.py::fixed_base) — the portable scan
    below compiles enormous XLA:CPU graphs when the backend lowers it to
    the host."""
    if _host_ec_enabled() and not _any_tracer(scalars, *base):
        return _fixed_base_host(group, base, scalars)
    if _fast_path_ok(group) and group.__class__.__name__ == "WeierstrassGroup":
        if jax.default_backend() == "tpu":
            from . import ff
            from . import msm_tpu

            spec = group.fops.spec
            bx, by, binf = group.to_affine(base)
            n = scalars.shape[0]
            # pad N to a power of two so one compiled program serves every
            # log2 N (the wrapper's contract), and honor a base at infinity
            # (all outputs are then infinity) instead of producing garbage
            n_pow2 = 1 << max(0, (n - 1).bit_length())
            if n_pow2 != n:
                scalars = jnp.pad(scalars, ((0, n_pow2 - n), (0, 0)))
            L = spec.n_limbs
            out = msm_tpu.fixed_base(
                spec,
                ff.from_field_last(bx.reshape(1, L)),
                ff.from_field_last(by.reshape(1, L)),
                scalars,
            )
            out = tuple(cc[:, :n] for cc in out)
            # base at infinity: zero the z coordinate (Jacobian infinity)
            out = (
                out[0],
                out[1],
                jnp.where(jnp.asarray(binf).reshape(()), jnp.zeros_like(out[2]), out[2]),
            )
            return tuple(
                ff.to_field_last(ff.canonicalize(spec, cc), (n,)) for cc in out
            )
        return _fixed_base_host(group, base, scalars)
    n0 = scalars.shape[0]
    n_pow2 = 1 << max(0, (n0 - 1).bit_length())
    if n_pow2 != n0:
        scalars = jnp.pad(scalars, ((0, n_pow2 - n0), (0, 0)))
    out = _fixed_base_mul_impl(group, base, scalars)
    if n_pow2 != n0:
        out = jax.tree_util.tree_map(lambda a: a[:n0], out)
    return out


def _fixed_base_host(group, base, scalars: jnp.ndarray):
    """CPU fallback (any curve): base^s per scalar on host ints with a
    shared window table (setup-only code; device work would be either an
    eager dispatch storm or an enormous XLA:CPU compile)."""
    from . import hostec

    hg = hostec.host_group(group)
    bpt = hostec.device_proj_to_host(group, base)
    ed = hostec._is_edwards(group)
    arr = np.asarray(scalars, np.uint64)
    ints = [
        sum(int(v) << (16 * j) for j, v in enumerate(row)) for row in arr
    ]
    outs = []
    if bpt is None or (ed and tuple(bpt) == (0, 1)):
        outs = [None] * len(ints)
    else:
        # shared 4-bit window table: 14 adds once + 64 adds/point
        tbl = _host_window_table(hg, bpt, ed)
        for s in ints:
            outs.append(_host_windowed_mul(hg, tbl, s % hg.order, ed))
    x, y, inf = hostec.host_points_to_device_affine(group, outs)
    return group.from_affine(x, y, inf)


def _host_window_table(hg, bpt, ed: bool, c: int = 4):
    """[k * base for k in 0..2^c-1] as AFFINE host points."""
    if ed:
        base = hg._eto_ext(bpt)
        cur = (0, 1, 1, 0)
        tbl = [(0, 1)]
        for _ in range((1 << c) - 1):
            cur = hg._eadd(cur, base)
            tbl.append(hg._eto_affine(cur))
        return tbl
    cur = None
    tbl = [None]
    for _ in range((1 << c) - 1):
        cur = hg._jmadd(cur, bpt)
        tbl.append(hg._jto_affine(cur))
    return tbl


def _host_windowed_mul(hg, tbl, s: int, ed: bool, c: int = 4):
    digits = []
    while s:
        digits.append(s & ((1 << c) - 1))
        s >>= c
    if not digits:
        return (0, 1) if ed else None
    if ed:
        acc = (0, 1, 1, 0)
        for d in reversed(digits):
            for _ in range(c):
                acc = hg._eadd(acc, acc)
            if d:
                acc = hg._eadd(acc, hg._eto_ext(tbl[d]))
        return hg._eto_affine(acc)
    acc = None
    for d in reversed(digits):
        for _ in range(c):
            acc = hg._jdouble(acc)
        if d:
            acc = hg._jmadd(acc, tbl[d])
    return hg._jto_affine(acc)


@functools.partial(jax.jit, static_argnums=0)
def _fixed_base_mul_impl(group, base, scalars: jnp.ndarray):
    """Batch fixed-base multiplication: [s_0 * G, s_1 * G, ...].

    Replaces arkworks' ``batch_mul`` / ``BatchMulPreprocessing``
    (kzg10/mod.rs:76-104, SRS generation). Windowed c=8 table built with two
    trace-once scans; application is 32 batched gather+add steps over N.

    base: projective single point. scalars: (N, 16) plain limbs.
    Returns projective points with batch (N,).
    """
    c = 8
    w_count = SCALAR_BITS // c
    n = scalars.shape[0]

    # window digits (N,) per window
    digs = _digits(scalars, c)  # (W, N)

    d_range = jnp.arange(1 << c, dtype=jnp.uint32)
    ent_inf = group.infinity(((1 << c),))

    def build_body(b_w, _):
        m = b_w
        acc = ent_inf
        for b in range(c):
            bit = ((d_range >> b) & 1).astype(bool)
            m_b = _tree(lambda a: jnp.broadcast_to(a, ((1 << c),) + a.shape), m)
            acc = group.select(bit, group.add(acc, m_b), acc)
            m = group.double(m)
        return m, acc  # carry 2^c * b_w; emit the 256-entry row

    _, table = jax.lax.scan(build_body, base, None, length=w_count)
    # table coords: (W, 256, ...)

    acc0 = group.infinity((n,))

    def apply_body(acc, inp):
        row, dig = inp
        g = _tree(lambda a: jnp.take(a, dig, axis=0), row)
        return group.add(acc, g), None

    acc, _ = jax.lax.scan(apply_body, acc0, (table, digs))
    return acc


def msm_mont(group, scalars_mont: jnp.ndarray, points, **kw):
    """MSM with scalars given in Montgomery form of ``group.scalar_spec``."""
    plain = F.from_mont(group.scalar_spec, scalars_mont)
    return msm(group, plain, points, **kw)


def scalars_from_ints(spec, ints) -> jnp.ndarray:
    """Python ints -> plain (N, L) limb array for msm()."""
    return F.from_ints(spec, list(ints), mont=False)
