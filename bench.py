"""Headline benchmark: variable-base G1 MSM throughput (BLS12-381).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The MSM is the reference's universal hot kernel (arkworks
``VariableBaseMSM::msm_bigint``, called from every scheme — SURVEY.md §2.3).
``vs_baseline`` compares against the arkworks CPU figure recorded in
BASELINE.md (ARKWORKS_CPU_MSM_OPS_PER_S below): multi-threaded Pippenger on
the reference's stack, ~1.2e6 points/s at 2^20 on a modern 16-core CPU.

Env knobs:
  BENCH_METRIC    msm (default) | ntt | kzg
  BENCH_MSM_LOG_N log2 problem size (default 20; domain size for ntt,
                  degree for kzg)
  BENCH_ITERS     timing iterations (default 2)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

ARKWORKS_CPU_MSM_OPS_PER_S = 1.2e6  # see BASELINE.md "CPU comparison point"

# Analytic CPU expectations for the metrics arkworks publishes no numbers
# for and this box cannot run (no Rust toolchain — BASELINE.md "Published
# numbers"). Derivations, recorded in BASELINE.md §baselines:
#   NTT 2^22 (Fr-255): (n/2)*log2(n) butterflies; ~80 ns/butterfly
#   single-core (1 Montgomery mul + 2 adds on 4x64-bit limbs), rayon x16
#   cores at ~80% scaling -> ~46M butterflies / (12.8 ops/ns) ~ 0.38 s
#   ~ 11M elements/s. Rounded conservatively to 10M el/s.
ARKWORKS_CPU_NTT_EL_PER_S = 10e6


def arkworks_cpu_kzg_s(degree: int) -> float:
    """KZG commit+open wall-clock expectation on the reference's stack:
    two degree-n G1 MSMs at the 1.2M points/s multicore figure plus a
    single-pass synthetic division (~5 ns/coeff, memory-bound)."""
    return 2 * degree / ARKWORKS_CPU_MSM_OPS_PER_S + degree * 5e-9


def _setup_jax():
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    from poly_commit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    return jax


def _sync(jax, o):
    # block_until_ready does not synchronize through the axon TPU tunnel;
    # a host fetch does. Fetch only a SLIVER of the first leaf: the device
    # buffer must be complete before any element ships, and pulling a full
    # 2^22-point NTT output (400 MB) through the tunnel costs ~8 s — an
    # order of magnitude more than the compute being timed.
    jax.block_until_ready(o)
    leaf = jax.tree_util.tree_leaves(o)[0]
    return np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def _time_best(jax, fn, iters):
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(jax, fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def _distinct_points(jax, G1, n, log_n, rng):
    """n DISTINCT pseudorandom-exponent points e_i*G in O(sqrt n) host work.

    Two-level split P_{jK+k} = A_j + B_k where both walks are
    shift-and-add (X_{t} = 2^16 X_{t-1} + r_t*G with small random r_t), so
    exponents mix over the full 255-bit range after a few steps — like a
    real SRS (powers of a secret beta), and unlike small sequential
    multiples, Pippenger partial sums cannot collide with later bases
    (that broke the distinct-bases madd at 2^16). Exponents are tracked on
    host mod r, so callers can self-check the MSM result in closed form.
    Returns (points, exponents, host_group, generator, field_spec)."""
    import jax.numpy as jnp

    from poly_commit_tpu.core import ec_lf, ff, hostec

    K = 1 << ((log_n + 1) // 2)
    J = n // K
    hg = hostec.host_group(G1)
    gen = (G1.gen_x, G1.gen_y)
    r_ord = hg.order

    def walk(count, seed_exp):
        pts, exps = [], []
        p = hg.mul(gen, seed_exp)
        e = seed_exp % r_ord
        for _ in range(count):
            pts.append(p)
            exps.append(e)
            for _ in range(16):
                p = hg.double(p)
            r_t = int(rng.integers(1, 1 << 30))
            p = hg.add(p, hg.mul(gen, r_t))
            e = ((e << 16) + r_t) % r_ord
        return pts, exps

    b_pts, b_exps = walk(K, int(rng.integers(1, 1 << 62)))
    a_pts, a_exps = walk(J, int(rng.integers(1, 1 << 62)))
    fq = G1.fops.spec
    ax = ff.from_ints(fq, [p[0] for p in a_pts])
    ay = ff.from_ints(fq, [p[1] for p in a_pts])
    az = ff.one_mont(fq, J)
    bx = ff.from_ints(fq, [p[0] for p in b_pts])
    by = ff.from_ints(fq, [p[1] for p in b_pts])
    rep = lambda a: jnp.repeat(a, K, axis=1)  # A index varies slowly
    til = lambda a: jnp.tile(a, (1, J))
    pj = jax.jit(
        lambda AX, AY, AZ, BX, BY: ec_lf.madd(
            fq, (rep(AX), rep(AY), rep(AZ)), til(BX), til(BY)
        )
    )(ax, ay, az, bx, by)
    # -> portable limbs-last layout, batch-normalized affine. Chunked:
    # batch_inv's associative-scan intermediates are ~5.6 GB per 2^20
    # points (OOMs HBM at 2^22 done whole).
    chunk = 1 << 20
    parts = []
    for s in range(0, n, chunk):
        w = min(chunk, n - s)
        proj = tuple(
            ff.to_field_last(ff.canonicalize(fq, cc[:, s : s + w]), (w,))
            for cc in pj
        )
        aff = G1.to_affine(proj)
        parts.append(jax.tree_util.tree_map(jax.block_until_ready, aff))
    pts = jax.tree_util.tree_map(
        lambda *cs: jnp.concatenate(cs, axis=0), *parts
    )
    exps = [
        (a_exps[i // K] + b_exps[i % K]) % r_ord for i in range(n)
    ]
    pts = jax.tree_util.tree_map(jax.block_until_ready, pts)
    return pts, exps, hg, gen, fq


def bench_msm(jax, log_n, iters):
    import jax.numpy as jnp

    from poly_commit_tpu.core import curve as C
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core import msm as M

    n = 1 << log_n
    G1 = C.BLS12_381_G1
    rng = np.random.default_rng(42)
    pts, exps, hg, gen, fq = _distinct_points(jax, G1, n, log_n, rng)

    sc = np.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.int64), np.uint32
    )
    sc = jnp.asarray(sc)
    run = jax.jit(lambda s, p: M.msm(G1, s, p, assume_distinct=True))

    out0 = run(sc, pts)  # compile + first run
    jax.block_until_ready(out0)
    # self-check: with P_i = e_i*G the expected sum is (sum s_i*e_i)*G
    sc_ints = [
        sum(int(v) << (16 * j) for j, v in enumerate(row))
        for row in np.asarray(sc)
    ]
    total = sum(s * e for s, e in zip(sc_ints, exps)) % hg.order
    exp = hg.mul(gen, total)
    got_x, got_y, got_inf = G1.to_affine(out0)
    got = (F.to_ints(fq, got_x), F.to_ints(fq, got_y))
    assert not bool(np.asarray(got_inf)) and got == exp, "MSM self-check failed"

    best = _time_best(jax, lambda: run(sc, pts), iters)
    ops = n / best
    return {
        "metric": f"msm_g1_bls12_381_2^{log_n}",
        "value": round(ops, 1),
        "unit": "points/s",
        "vs_baseline": round(ops / ARKWORKS_CPU_MSM_OPS_PER_S, 4),
    }


def bench_ntt(jax, log_n, iters):
    """Radix-2 NTT over Fr(BLS12-381); BASELINE.md targets 2^22. Uses the
    limbs-first fused tier (core/ntt_lf); self-checks against the portable
    kernel at a subsampled size first."""
    from poly_commit_tpu.core import ff
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core import ntt as NTT
    from poly_commit_tpu.core import ntt_lf
    from poly_commit_tpu.core.field_params import FR_BLS12_381

    spec = FR_BLS12_381
    n = 1 << log_n
    rng = np.random.default_rng(7)
    ints = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(256)]
    # self-check the fused tier vs the portable kernel at a small size
    small = ff.to_ints(spec, ntt_lf.ntt(spec, ff.from_ints(spec, ints)))
    exp = F.to_ints(spec, NTT.ntt(spec, F.from_ints(spec, ints)))
    assert small == exp, "ntt_lf self-check failed"
    coeffs = ff.from_ints(spec, ints * (n // 256))
    # NOTE: call ntt directly (it jits internally, passing twiddles as
    # traced args); an outer jax.jit would re-embed them as constants and
    # overflow the axon remote-compile request at 2^22 (HTTP 413)
    run = lambda a: ntt_lf.ntt(spec, a)
    _sync(jax, run(coeffs))
    best = _time_best(jax, lambda: run(coeffs), iters)
    # ~ (n/2) log2(n) butterflies; report elements/s for scale-independence
    return {
        "metric": f"ntt_fr_bls12_381_2^{log_n}",
        "value": round(n / best, 1),
        "unit": "elements/s",
        # vs the analytic multicore-CPU expectation (no published arkworks
        # figure exists; see ARKWORKS_CPU_NTT_EL_PER_S derivation)
        "vs_baseline": round(n / best / ARKWORKS_CPU_NTT_EL_PER_S, 4),
    }


def bench_kzg(jax, log_n, iters):
    """KZG commit+open wall-clock at degree 2^log_n (BASELINE.md target).

    Default: a REAL powers-of-beta SRS via kzg10.setup (the device
    fixed-base walk, kzg10/mod.rs:53-124). The round-4 axon "kernel
    fault" in that walk no longer reproduces (round 5 re-validated it at
    2^12..2^20); BENCH_KZG_STANDIN=1 restores the O(sqrt N)
    distinct-point stand-in for quick runs — MSM cost is independent of
    the base VALUES, so timings match. Only commit/open are timed,
    matching bench-templates/src/lib.rs:69-138."""
    import jax.numpy as jnp

    from poly_commit_tpu.core import curve as C
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core.field_params import FR_BLS12_381
    from poly_commit_tpu.pcs import kzg10
    from poly_commit_tpu.pcs.data_structures import HostRng

    spec = FR_BLS12_381
    degree = 1 << log_n
    rng = HostRng(3)
    if os.environ.get("BENCH_KZG_STANDIN", "0") not in ("0", "false"):
        nrng0 = np.random.default_rng(11)
        K = 1 << ((log_n + 1) // 2)
        n_gen = -(-(degree + 2) // K) * K  # _distinct_points needs K | n
        pts, _, _, _, _ = _distinct_points(
            jax, C.BLS12_381_G1, n_gen, log_n, nrng0
        )
        take = lambda t, k: tuple(a[:k] for a in t)
        powers = kzg10.Powers(
            powers_of_g=take(pts, degree + 1),
            powers_of_gamma_g=take(pts, degree + 2),
        )
    else:
        pp = kzg10.setup(degree, rng=HostRng(41))
        powers = kzg10.trim_powers(pp, degree)
    nrng = np.random.default_rng(5)
    ints = [
        int.from_bytes(nrng.bytes(32), "little") % spec.modulus
        for _ in range(256)
    ]
    coeffs = F.from_ints(spec, ints * (degree // 256) + ints[:1])
    point = rng.field_int(spec)

    def run():
        comm = kzg10.commit(powers, coeffs)
        proof = kzg10.open(powers, coeffs, point, comm[1])
        return comm, proof

    run()  # compile
    # commit/open return host-materialized structures; time plainly
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "metric": f"kzg_commit_open_2^{log_n}",
        "value": round(best, 4),
        "unit": "s",
        # time ratio: analytic CPU expectation / measured (>1 = faster
        # than the reference's multicore-CPU stack; see arkworks_cpu_kzg_s)
        "vs_baseline": round(arkworks_cpu_kzg_s(degree) / best, 4),
    }


def main():
    jax = _setup_jax()
    metric = os.environ.get("BENCH_METRIC", "msm")
    log_n = int(os.environ.get("BENCH_MSM_LOG_N", "20"))
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    fn = {"msm": bench_msm, "ntt": bench_ntt, "kzg": bench_kzg}[metric]
    print(json.dumps(fn(jax, log_n, iters)))


if __name__ == "__main__":
    main()
