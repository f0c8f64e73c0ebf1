"""Stage-level profile of the fast-path MSM (core/msm_tpu) on TPU.

Times, at BENCH_MSM_LOG_N (default 20): digit extraction + sort, the main
madd scan, the cross-lane Blelloch, the tail gathers, and the bucket
tree-sum — each as its own jitted piece over the same inputs — plus the
full fused kernel. Stage sums won't exactly match the fused time (XLA
fuses/overlaps across stages) but ranks where the time goes.

Usage: python benches/profile_msm.py  (runs on the default backend: TPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from poly_commit_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from poly_commit_tpu.core import ec_lf as EC
from poly_commit_tpu.core import ff
from poly_commit_tpu.core import field_params as FP
from poly_commit_tpu.core import msm_tpu as MT

SPEC = FP.FQ_BLS12_381
LOG_N = int(os.environ.get("BENCH_MSM_LOG_N", "20"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))


def _sync(o):
    jax.block_until_ready(o)
    return np.asarray(jax.tree_util.tree_leaves(o)[0])[..., :1]


def _best(fn, *args):
    _sync(fn(*args))  # compile
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = 1 << LOG_N
    rng = np.random.default_rng(1)
    # synthetic but shape-correct inputs: broadcast generator, random scalars
    gx = ff.from_ints(SPEC, [FP.BLS12_381_G1_X])
    gy = ff.from_ints(SPEC, [FP.BLS12_381_G1_Y])
    x = jnp.broadcast_to(gx, (SPEC.n_limbs, n))
    y = jnp.broadcast_to(gy, (SPEC.n_limbs, n))
    inf = jnp.zeros((n,), bool)
    sc = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.int64), jnp.uint32
    )

    c = MT.C_BITS()
    t_lanes = MT._t_lanes()
    l_steps = -(-n // t_lanes)
    m = (256 // c) * t_lanes
    w_count = 256 // c

    # ---- stage: digits + sort ----
    def stage_sort(scalars, infm):
        digs = MT._digits(scalars, c)
        digs = jnp.where(infm[None, :], np.uint32(1 << c), digs)
        order, sd = MT._sort_by_digit(digs)
        return order, sd

    t_sort = _best(jax.jit(stage_sort), sc, inf)

    order, sd = jax.jit(stage_sort)(sc, inf)
    idx_l = jnp.moveaxis(
        order.reshape(w_count, t_lanes, l_steps), 2, 0
    ).reshape(l_steps, m)
    skip_l = jnp.moveaxis(
        (sd == np.uint32(1 << c)).reshape(w_count, t_lanes, l_steps), 2, 0
    ).reshape(l_steps, m)

    # ---- stage: main scan (gather + madd + emit) ----
    def stage_scan(xx, yy, idx, skip):
        x_last = xx.T
        y_last = yy.T

        def body(acc, inp):
            ix, sk = inp
            px = jnp.take(x_last, ix, axis=0).T
            py = jnp.take(y_last, ix, axis=0).T
            added = EC.madd_distinct(SPEC, acc, px, py)
            acc = EC.select(sk, acc, added)
            return acc, tuple(cc.T for cc in acc)

        return jax.lax.scan(body, EC.infinity(SPEC, m), (idx, skip))

    t_scan = _best(jax.jit(stage_scan), x, y, idx_l, skip_l)

    # ---- stage: scan WITHOUT prefix emission (isolates emission cost) ----
    def stage_scan_noemit(xx, yy, idx, skip):
        x_last = xx.T
        y_last = yy.T

        def body(acc, inp):
            ix, sk = inp
            px = jnp.take(x_last, ix, axis=0).T
            py = jnp.take(y_last, ix, axis=0).T
            added = EC.madd_distinct(SPEC, acc, px, py)
            return EC.select(sk, acc, added), None

        return jax.lax.scan(body, EC.infinity(SPEC, m), (idx, skip))

    t_scan_ne = _best(jax.jit(stage_scan_noemit), x, y, idx_l, skip_l)

    # ---- stage: scan with madd but NO gather (broadcast point) ----
    def stage_scan_nogather(xx, yy, skip):
        px = jnp.broadcast_to(xx[:, :1], (SPEC.n_limbs, m))
        py = jnp.broadcast_to(yy[:, :1], (SPEC.n_limbs, m))

        def body(acc, sk):
            added = EC.madd_distinct(SPEC, acc, px, py)
            return EC.select(sk, acc, added), None

        return jax.lax.scan(body, EC.infinity(SPEC, m), skip)

    t_scan_ng = _best(jax.jit(stage_scan_nogather), x, y, skip_l)

    # ---- full MSM ----
    def full(scalars, xx, yy, infm):
        return MT.msm(SPEC, scalars, xx, yy, infm, assume_distinct=True)

    t_full = _best(jax.jit(full), sc, x, y, inf)

    print(f"n=2^{LOG_N}  t_lanes={t_lanes}  l_steps={l_steps}")
    print(f"sort            {t_sort*1e3:9.1f} ms")
    print(f"scan (emit)     {t_scan*1e3:9.1f} ms")
    print(f"scan (no emit)  {t_scan_ne*1e3:9.1f} ms")
    print(f"scan (no gthr)  {t_scan_ng*1e3:9.1f} ms")
    print(f"FULL msm        {t_full*1e3:9.1f} ms   -> {n/t_full:,.0f} points/s")


if __name__ == "__main__":
    main()
