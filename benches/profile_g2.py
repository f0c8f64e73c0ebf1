"""G2 fast-path MSM bench on TPU: 2^16 distinct exponent-tracked bases,
closed-form self-check (the MultilinearPC per-round MSM shape,
multilinear_pc/mod.rs:158-163). Appends one JSON line to
benches/results_r05.jsonl when RECORD=1."""
import json, os, time, random, sys
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from poly_commit_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from poly_commit_tpu.core import curve as C, field as F, field_params as FP, msm as M, hostec
G2 = C.BLS12_381_G2
hg = hostec.host_group(G2)
gen = (FP.BLS12_381_G2_X, FP.BLS12_381_G2_Y)
SPEC = FP.FQ_BLS12_381
logn = 16; n = 1 << logn
K = 1 << (logn // 2); J = n // K
def walk(count, seed):
    pts, exps = [], []
    p = hg.mul_fast(gen, seed); e = seed
    r_ord = FP.BLS12_381_R
    for _ in range(count):
        pts.append(p); exps.append(e % r_ord)
        for _ in range(16):
            p = hg.double(p)
        rt = random.randrange(1, 1 << 30)
        p = hg.add(p, hg.mul_fast(gen, rt))
        e = ((e << 16) + rt) % r_ord
    return pts, exps
random.seed(1)
t0 = time.time()
b_pts, b_exps = walk(K, 12345)
a_pts, a_exps = walk(J, 67890)
pts, exps = [], []
for j in range(J):
    for k in range(K):
        pts.append(hg.add(a_pts[j], b_pts[k]))
        exps.append((a_exps[j] + b_exps[k]) % FP.BLS12_381_R)
print('host gen', round(time.time()-t0,1), flush=True)
t0 = time.time()
xs = jnp.stack([F.from_ints(SPEC, [p[0][0] for p in pts]),
                F.from_ints(SPEC, [p[0][1] for p in pts])], axis=1)
ys = jnp.stack([F.from_ints(SPEC, [p[1][0] for p in pts]),
                F.from_ints(SPEC, [p[1][1] for p in pts])], axis=1)
print('stack', round(time.time()-t0,1), xs.shape, flush=True)
inf = jnp.zeros((n,), bool)
rng = np.random.default_rng(2)
sc_arr = np.asarray(rng.integers(0, 1<<16, size=(n,16), dtype=np.int64), np.uint32)
sc = jnp.asarray(sc_arr)
run = jax.jit(lambda s, x, y, i: M.msm(G2, s, (x, y, i), assume_distinct=True))
def sync(o):
    jax.block_until_ready(o)
    l = jax.tree_util.tree_leaves(o)[0]
    return np.asarray(l[(slice(0,1),)*l.ndim])
t0=time.time(); out = run(sc, xs, ys, inf); sync(out); print('compile+run', round(time.time()-t0,1), flush=True)
ts=[]
for _ in range(3):
    t0=time.time(); o2 = run(sc, xs, ys, inf); sync(o2); ts.append(time.time()-t0)
print('G2 MSM 2^16 best', round(min(ts),3), 's ->', round(n/min(ts)/1e3,1), 'k points/s', flush=True)
sc_ints = [sum(int(v) << (16*j) for j, v in enumerate(row)) for row in sc_arr]
total_e = sum(s*e for s, e in zip(sc_ints, exps)) % FP.BLS12_381_R
expp = hg.mul_fast(gen, total_e)
got = G2.to_affine(out)
def c2(a):
    v = F.to_ints(SPEC, a)
    return tuple(v) if isinstance(v, list) else v
ok = (not bool(np.asarray(got[2]))) and (c2(got[0][0]), c2(got[0][1])) == tuple(expp[0]) and (c2(got[1][0]), c2(got[1][1])) == tuple(expp[1])
print('self-check:', ok, flush=True)
assert ok
if os.environ.get('RECORD', '0') not in ('0', 'false'):
    # analytic CPU comparator: G2 field ops are ~3x G1 (Fq2 Karatsuba),
    # so ~1.2e6/3 = 4e5 points/s on the reference's 16-core stack
    line = {"_tag": "g2msm16", "metric": "msm_g2_bls12_381_2^16",
            "value": round(n / min(ts), 1), "unit": "points/s",
            "vs_baseline": round(n / min(ts) / 4.0e5, 4)}
    with open('/root/repo/benches/results_r05.jsonl', 'a') as f:
        f.write(json.dumps(line) + "\n")
