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
    # random-looking points: a small pool of host-computed generator
    # multiples, tiled out to n by random gather. MSM cost is data-
    # independent (same sort/scan/bucket work for any inputs), so a pool
    # keeps the *measured* kernel identical while making setup O(pool)
    # instead of an O(256)-step fixed-base scan over all n points.
    from poly_commit_tpu.core import hostec

    pool = 512
    hg = hostec.host_group(G1)
    gen = (G1.gen_x, G1.gen_y)
    hpts, acc = [], gen
    for _ in range(pool):
        hpts.append(acc)
        acc = hg.double(acc)
        acc = hg.add(acc, gen)
    fq = G1.fops.spec
    px = F.from_ints(fq, [p[0] for p in hpts])
    py = F.from_ints(fq, [p[1] for p in hpts])
    sel = jnp.asarray(rng.integers(0, pool, size=n, dtype=np.int64))
    pts = (px[sel], py[sel], jnp.zeros((n,), bool))
    pts = jax.tree_util.tree_map(jax.block_until_ready, pts)

    # random full-width scalars
    sc = np.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.int64), np.uint32
    )
    sc = jnp.asarray(sc)

    run = jax.jit(lambda s, p: M.msm(G1, s, p))

    def sync(o):
        # block_until_ready does not synchronize through the axon TPU
        # tunnel; a host fetch of the (tiny) output coordinates does.
        jax.block_until_ready(o)
        return np.asarray(jax.tree_util.tree_leaves(o)[0])

    sync(run(sc, pts))  # compile + first run

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
