#!/bin/bash
# Round-5 tail recorder: waits for record_matrix.py (pid $1) to exit, then
# records the G2 MSM bench and the per-scheme sweeps. Appends to
# benches/*_r05.jsonl. Safe to re-run; each stage has its own timeout.
cd /root/repo
if [ -n "$1" ]; then
  echo "[rest] waiting on pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
echo "[rest] g2 msm bench $(date -u +%H:%M:%S)"
RECORD=1 timeout 1800 python benches/profile_g2.py 2>&1 | grep -vE "WARNING|INFO" | tail -4
echo "[rest] per-scheme sweeps"
for cfg in "marlin 10 16" "ipa 10 14" "hyrax 12 16" "ligero_ml 12 16" "brakedown_ml 12 14"; do
  set -- $cfg
  echo "[rest] sweep $1 ($2..$3) $(date -u +%H:%M:%S)"
  PCS_BENCH_SCHEMES=$1 PCS_BENCH_MIN=$2 PCS_BENCH_MAX=$3 PCS_BENCH_ITERS=1 \
    timeout 2400 python benches/pcs_bench.py >> benches/pcs_results_r05.jsonl 2>/tmp/pcs_$1.err
  tail -2 /tmp/pcs_$1.err
done
echo "[rest] DONE $(date -u +%H:%M:%S)"
