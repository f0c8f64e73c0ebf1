#!/bin/bash
# Round-5 TPU recording session: waits for the axon tunnel, then runs the
# verify drive, the G2 MSM bench, the kernel-metric matrix, and the
# per-scheme sweeps. Everything appends to benches/*_r05.jsonl; safe to
# re-run (record_matrix skips already-recorded tags).
cd /root/repo
probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a: a*2)(jnp.ones((8,))).block_until_ready()" >/dev/null 2>&1
}
echo "[record_r05] waiting for tunnel..."
until probe; do sleep 120; done
echo "[record_r05] tunnel up: $(date -u)"

echo "[record_r05] verify drive"
timeout 1200 python examples/demo_all_schemes.py 2>&1 | grep -E "^(OK|all)"

echo "[record_r05] g2 msm bench"
RECORD=1 timeout 2400 python benches/profile_g2.py 2>&1 | grep -vE "WARN|INFO|cpu_aot" | tail -4

echo "[record_r05] kernel metric matrix"
timeout 14000 python benches/record_matrix.py 220 2>&1 | tail -20

echo "[record_r05] per-scheme sweeps"
for cfg in "marlin 10 16" "ipa 10 14" "hyrax 12 16" "ligero_ml 12 16" "brakedown_ml 12 14"; do
  set -- $cfg
  echo "[record_r05] sweep $1 ($2..$3)"
  PCS_BENCH_SCHEMES=$1 PCS_BENCH_MIN=$2 PCS_BENCH_MAX=$3 PCS_BENCH_ITERS=1 \
    timeout 7000 python benches/pcs_bench.py >> benches/pcs_results_r05.jsonl 2>/tmp/pcs_$1.err
  tail -2 /tmp/pcs_$1.err
done
echo "[record_r05] DONE $(date -u)"
