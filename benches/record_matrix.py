"""Resilient TPU bench recorder: probes the axon tunnel, runs each metric
as a subprocess with its own timeout, retries failures, and appends every
successful JSON line to benches/results_r04.jsonl.

The tunnel hangs for long stretches (see docs/ROADMAP.md ops notes), so
this loops until every metric has landed or --max-minutes elapses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benches", "results_r05.jsonl")

METRICS = [
    ("msm20", {"BENCH_METRIC": "msm", "BENCH_MSM_LOG_N": "20", "BENCH_ITERS": "3"}, 1200),
    ("msm22", {"BENCH_METRIC": "msm", "BENCH_MSM_LOG_N": "22", "BENCH_ITERS": "2"}, 1700),
    ("ntt20", {"BENCH_METRIC": "ntt", "BENCH_MSM_LOG_N": "20", "BENCH_ITERS": "3"}, 1200),
    ("ntt22", {"BENCH_METRIC": "ntt", "BENCH_MSM_LOG_N": "22", "BENCH_ITERS": "3"}, 1200),
    ("kzg18", {"BENCH_METRIC": "kzg", "BENCH_MSM_LOG_N": "18", "BENCH_ITERS": "2"}, 1400),
    ("kzg20", {"BENCH_METRIC": "kzg", "BENCH_MSM_LOG_N": "20", "BENCH_ITERS": "2"}, 1700),
]


def tunnel_alive(timeout: int = 240) -> bool:
    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jax.jit(lambda a:(a*a).sum())(jnp.arange(64.0))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout,
            capture_output=True, cwd=REPO,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def have(metric_names) -> set:
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["_tag"])
                except Exception:
                    pass
    return done


def main():
    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 180
    t_end = time.time() + max_minutes * 60
    fails = {}
    while time.time() < t_end:
        done = have(METRICS)
        todo = [m for m in METRICS if m[0] not in done]
        if not todo:
            print("all metrics recorded", flush=True)
            return
        todo.sort(key=lambda m: fails.get(m[0], 0))
        if not tunnel_alive():
            print(f"[{time.strftime('%H:%M:%S')}] tunnel down; sleeping 1 min",
                  flush=True)
            time.sleep(60)
            continue
        tag, env, tmo = todo[0]
        print(f"[{time.strftime('%H:%M:%S')}] running {tag}", flush=True)
        full_env = dict(os.environ, **env)
        try:
            r = subprocess.run(
                [sys.executable, "bench.py"], env=full_env, cwd=REPO,
                timeout=tmo, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"  {tag} timed out after {tmo}s", flush=True)
            fails[tag] = fails.get(tag, 0) + 1
            continue
        line = None
        for ln in (r.stdout or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                line = ln
        if r.returncode == 0 and line:
            rec = json.loads(line)
            rec["_tag"] = tag
            rec["_ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"  {tag}: {line}", flush=True)
        else:
            tail = (r.stderr or "").strip().splitlines()[-3:]
            print(f"  {tag} failed rc={r.returncode}: {tail}", flush=True)
            fails[tag] = fails.get(tag, 0) + 1
            time.sleep(60)
    print("time budget exhausted", flush=True)


if __name__ == "__main__":
    main()
