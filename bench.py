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
    # random-looking distinct points: fixed-base multiples of the generator
    ks = rng.integers(1, 1 << 62, size=n, dtype=np.int64)
    ksc = np.zeros((n, 16), np.uint32)
    for i in range(4):
        ksc[:, i] = (ks >> (16 * i)) & 0xFFFF
    pts = G1.to_affine(M.fixed_base_mul(G1, G1.generator(), jnp.asarray(ksc)))
    pts = jax.tree_util.tree_map(jax.block_until_ready, pts)

    # random full-width scalars
    sc = np.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.int64), np.uint32
    )
    sc = jnp.asarray(sc)

    run = jax.jit(lambda s, p: M.msm(G1, s, p))
    out = run(sc, pts)  # compile + first run
    jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(sc, pts)
        jax.block_until_ready(out)
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
