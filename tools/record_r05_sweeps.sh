#!/bin/bash
# Round-5 sweep recorder: waits for pid $1, runs the kernel-metric matrix,
# then the per-scheme sweeps. Appends to benches/*_r05.jsonl.
cd /root/repo
if [ -n "$1" ]; then
  echo "[sweeps] waiting on pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
echo "[sweeps] kernel metric matrix $(date -u +%H:%M:%S)"
timeout 3000 python benches/record_matrix.py 45 2>&1 | tail -30
echo "[sweeps] per-scheme sweeps"
for cfg in "marlin 10 16" "ipa 10 14" "hyrax 12 16" "ligero_ml 12 16" "brakedown_ml 12 14"; do
  set -- $cfg
  echo "[sweeps] sweep $1 ($2..$3) $(date -u +%H:%M:%S)"
  PCS_BENCH_SCHEMES=$1 PCS_BENCH_MIN=$2 PCS_BENCH_MAX=$3 PCS_BENCH_ITERS=1 \
    timeout 2400 python benches/pcs_bench.py >> benches/pcs_results_r05.jsonl 2>/tmp/pcs_$1.err
  tail -2 /tmp/pcs_$1.err
done
echo "[sweeps] DONE $(date -u +%H:%M:%S)"
