"""Headline benchmark: variable-base G1 MSM throughput (BLS12-381).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The MSM is the reference's universal hot kernel (arkworks
``VariableBaseMSM::msm_bigint``, called from every scheme — SURVEY.md §2.3).
``vs_baseline`` compares against the arkworks CPU figure recorded in
BASELINE.md (ARKWORKS_CPU_MSM_OPS_PER_S below): multi-threaded Pippenger on
the reference's stack, ~1.2e6 points/s at 2^20 on a modern 16-core CPU.

Env knobs: BENCH_MSM_LOG_N (default 16), BENCH_ITERS (default 3).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ARKWORKS_CPU_MSM_OPS_PER_S = 1.2e6  # see BASELINE.md "CPU comparison point"


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp

    from poly_commit_tpu.core import curve as C
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core import msm as M
    from poly_commit_tpu.core.field_params import FR_BLS12_381

    log_n = int(os.environ.get("BENCH_MSM_LOG_N", "20"))
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    n = 1 << log_n
    G1 = C.BLS12_381_G1

    rng = np.random.default_rng(42)
    # DISTINCT points {1..n}*G (matching arkworks' bench inputs, distinct
    # SRS-like bases) built in O(sqrt n) host work: a two-level split
    # (j*K + k)*G = A_j + B_k with host walks for A and B, one batched
    # device madd for the outer sum, one batch-normalization.
    from poly_commit_tpu.core import ec_lf, ff, hostec

    K = 1 << ((log_n + 1) // 2)
    J = n // K
    hg = hostec.host_group(G1)
    gen = (G1.gen_x, G1.gen_y)
    b_pts, acc = [], gen
    for _ in range(K):  # B_k = (k+1)*G, k = 0..K-1
        b_pts.append(acc)
        acc = hg.add(acc, gen)
    stride = hg.mul(gen, K)
    a_pts, acc = [None], stride  # A_j = (j*K)*G, j = 0..J-1 (A_0 = inf)
    for _ in range(J - 1):
        a_pts.append(acc)
        acc = hg.add(acc, stride)
    fq = G1.fops.spec
    ax = ff.from_ints(fq, [p[0] if p else 0 for p in a_pts])
    ay = ff.from_ints(fq, [p[1] if p else 1 for p in a_pts])
    az = ff.select(
        jnp.asarray(np.asarray([p is None for p in a_pts])),
        ff.zeros(fq, J),
        ff.one_mont(fq, J),
    )
    bx = ff.from_ints(fq, [p[0] for p in b_pts])
    by = ff.from_ints(fq, [p[1] for p in b_pts])
    rep = lambda a: jnp.repeat(a, K, axis=1)  # A index varies slowly
    til = lambda a: jnp.tile(a, (1, J))
    pj = jax.jit(
        lambda AX, AY, AZ, BX, BY: ec_lf.madd(fq, (rep(AX), rep(AY), rep(AZ)), til(BX), til(BY)),
        static_argnums=(),
    )(ax, ay, az, bx, by)
    # -> portable limbs-last layout, batch-normalized affine
    proj = tuple(ff.to_field_last(ff.canonicalize(fq, cc), (n,)) for cc in pj)
    px, py, pinf = G1.to_affine(proj)
    pts = (px, py, pinf)
    pts = jax.tree_util.tree_map(jax.block_until_ready, pts)

    # random full-width scalars
    sc = np.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.int64), np.uint32
    )
    sc = jnp.asarray(sc)

    run = jax.jit(lambda s, p: M.msm(G1, s, p, assume_distinct=True))

    def sync(o):
        # block_until_ready does not synchronize through the axon TPU
        # tunnel; a host fetch of the (tiny) output coordinates does.
        jax.block_until_ready(o)
        return np.asarray(jax.tree_util.tree_leaves(o)[0])

    out0 = run(sc, pts)  # compile + first run
    jax.block_until_ready(out0)
    # self-check: with P_i = (i+1)*G the expected sum is (sum s_i*(i+1))*G
    sc_ints = [
        sum(int(v) << (16 * j) for j, v in enumerate(row)) for row in np.asarray(sc)
    ]
    order = hg.order
    total = sum(s * (i + 1) for i, s in enumerate(sc_ints)) % order
    exp = hg.mul(gen, total)
    got_x, got_y, got_inf = G1.to_affine(out0)
    got = (F.to_ints(fq, got_x), F.to_ints(fq, got_y))
    assert not bool(np.asarray(got_inf)) and got == exp, "MSM self-check failed"

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(run(sc, pts))
        times.append(time.perf_counter() - t0)
    best = min(times)
    ops = n / best
    print(
        json.dumps(
            {
                "metric": f"msm_g1_bls12_381_2^{log_n}",
                "value": round(ops, 1),
                "unit": "points/s",
                "vs_baseline": round(ops / ARKWORKS_CPU_MSM_OPS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
