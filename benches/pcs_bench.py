"""Per-scheme commit/open/verify sweeps + commitment/proof sizes.

The analogue of the reference's criterion bench crate + size binary
(/root/reference/bench-templates/src/lib.rs:29-219,
 /root/reference/poly-commit/benches/{ipa,hyrax,ligero_ml,brakedown_ml}_times.rs,
 /root/reference/poly-commit/benches/size.rs:26-44).

Prints one JSON line per (scheme, size, phase):
  {"scheme", "size", "phase", "value", "unit"}
phases: commit/open/check (seconds), commitment_bytes/proof_bytes (bytes,
compressed + uncompressed reported separately).

Env knobs:
  PCS_BENCH_SCHEMES   comma list (default: marlin,ipa,hyrax,ligero_ml,brakedown_ml)
  PCS_BENCH_MIN/MAX   log2 size range (degree for univariate, nv for ML);
                      defaults chosen per backend (tiny on CPU, the
                      reference's 2^10..2^20 / nv 12..22 on TPU)
  PCS_BENCH_ITERS     timing iterations (default 1)

Run on TPU hardware for the recorded numbers; on the 1-core CPU test box
use PCS_BENCH_MIN/MAX=3/5 to smoke-test the harness in minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _setup_jax():
    import jax

    from poly_commit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    return jax


def _emit(scheme, size, phase, value, unit):
    print(
        json.dumps(
            {"scheme": scheme, "size": size, "phase": phase,
             "value": round(value, 6) if unit == "s" else int(value),
             "unit": unit}
        ),
        flush=True,
    )


def _time(fn, iters):
    best = None
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


# -- size accounting (serialized_size analogue; benches/size.rs:26-44) ------


def _g1_size(compressed):  # BLS12-381 G1 ark encoding
    return 48 if compressed else 96


def _fr_size():
    return 32


def _marlin_proof_bytes(proofs, compressed):
    # kzg10::Proof = one G1 + optional Fr (kzg10/data_structures.rs:489-495)
    total = 0
    for p in proofs:
        total += _g1_size(compressed)
        if p.random_v is not None:
            total += _fr_size()
    return total


def _marlin_comm_bytes(comms, compressed):
    total = 0
    for lc in comms:
        c = lc.commitment
        total += _g1_size(compressed)
        if getattr(c, "shifted_comm", None) is not None:
            total += _g1_size(compressed)
    return total


def _ipa_group_size(compressed):
    # JubJub (ed-on-bls12-381) affine: 32 bytes compressed, 64 + flag byte
    return 32 if compressed else 64


def _ipa_proof_bytes(proofs, compressed):
    total = 0
    for p in proofs:
        total += (len(p.l_vec) + len(p.r_vec) + 1) * _ipa_group_size(compressed)
        total += _fr_size()  # c
        if p.hiding_comm is not None:
            total += _ipa_group_size(compressed)
        if p.rand is not None:
            total += _fr_size()
    return total


def _hyrax_proof_bytes(proofs, compressed):
    # HyraxProof: com_eval, com_d, com_b points + z (row-len Frs) + z_d, z_b
    total = 0
    for group in proofs:
        for hp in group:
            total += 3 * _g1_size(compressed)  # BN254-style G1 = 32/64; keep 48 for BLS
            total += (len(hp.z) + 2) * _fr_size()
    return total


def _lc_proof_bytes(proofs, compressed):
    # LinearCodePCS proof: v row (m Frs), t columns (n Frs each) + Merkle
    # paths (log leaves 32-byte digests each)
    total = 0
    for group in proofs:
        for pr in group:
            op = pr.opening if hasattr(pr, "opening") else pr
            total += len(op.v) * _fr_size()
            for col in op.columns:
                total += len(col) * _fr_size()
            for path in op.paths:
                total += (len(path.siblings) + 1) * 32
    return total


# -- drivers ----------------------------------------------------------------


def bench_univariate(PC, name, log_degree, iters, proof_bytes_fn, comm_bytes_fn):
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core.transcript import PoseidonSponge
    from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial

    degree = 1 << log_degree
    rng = HostRng(1000 + log_degree)
    pp = PC.setup(degree, rng=rng)
    ck, vk = PC.trim(pp, degree)
    lp = LabeledPolynomial(
        "p", F.from_ints(PC.spec, rng.field_ints(PC.spec, degree + 1))
    )
    t, (comms, states) = _time(lambda: PC.commit(ck, [lp], rng), iters)
    _emit(name, log_degree, "commit", t, "s")
    point = rng.field_int(PC.spec)
    qs = {("p", ("pt", point))}

    def do_open():
        return PC.batch_open(
            ck, [lp], comms, qs, PoseidonSponge(PC.spec), states, rng
        )

    t, (proofs, values) = _time(do_open, iters)
    _emit(name, log_degree, "open", t, "s")
    t, ok = _time(
        lambda: PC.batch_check(vk, comms, qs, values, proofs, PoseidonSponge(PC.spec)),
        iters,
    )
    assert ok, f"{name} verification failed at 2^{log_degree}"
    _emit(name, log_degree, "check", t, "s")
    _emit(name, log_degree, "commitment_bytes", comm_bytes_fn(comms, True), "bytes")
    _emit(name, log_degree, "commitment_bytes_uncompressed", comm_bytes_fn(comms, False), "bytes")
    _emit(name, log_degree, "proof_bytes", proof_bytes_fn(proofs, True), "bytes")
    _emit(name, log_degree, "proof_bytes_uncompressed", proof_bytes_fn(proofs, False), "bytes")


def bench_multilinear(PC, name, nv, iters, proof_bytes_fn, comm_bytes_fn,
                      hiding=False):
    from poly_commit_tpu.core import field as F
    from poly_commit_tpu.core.transcript import PoseidonSponge
    from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial

    rng = HostRng(2000 + nv)
    pp = PC.setup(0, num_vars=nv, rng=rng)
    ck, vk = PC.trim(pp, 0, 0, None)
    lp = LabeledPolynomial(
        "p", F.from_ints(PC.spec, rng.field_ints(PC.spec, 1 << nv)),
        num_vars=nv, hiding_bound=1 if hiding else None,
    )
    t, (comms, states) = _time(lambda: PC.commit(ck, [lp], rng), iters)
    _emit(name, nv, "commit", t, "s")
    point = tuple(rng.field_int(PC.spec) for _ in range(nv))
    qs = {("p", ("pt", point))}

    def do_open():
        return PC.batch_open(
            ck, [lp], comms, qs, PoseidonSponge(PC.spec), states, rng
        )

    t, (proofs, values) = _time(do_open, iters)
    _emit(name, nv, "open", t, "s")
    t, ok = _time(
        lambda: PC.batch_check(vk, comms, qs, values, proofs, PoseidonSponge(PC.spec)),
        iters,
    )
    assert ok, f"{name} verification failed at nv={nv}"
    _emit(name, nv, "check", t, "s")
    _emit(name, nv, "commitment_bytes", comm_bytes_fn(comms, True), "bytes")
    _emit(name, nv, "proof_bytes", proof_bytes_fn(proofs, True), "bytes")


def _hyrax_comm_bytes(comms, compressed):
    total = 0
    for lc in comms:
        total += len(lc.commitment.row_coms) * _g1_size(compressed)
    return total


def _lc_comm_bytes(comms, compressed):
    return 32 * len(comms)  # one Merkle root each


def main():
    _setup_jax()
    import jax

    on_tpu = jax.default_backend() == "tpu"
    schemes = os.environ.get(
        "PCS_BENCH_SCHEMES", "marlin,ipa,hyrax,ligero_ml,brakedown_ml"
    ).split(",")
    iters = int(os.environ.get("PCS_BENCH_ITERS", "1"))

    uni_lo = int(os.environ.get("PCS_BENCH_MIN", "10" if on_tpu else "3"))
    uni_hi = int(os.environ.get("PCS_BENCH_MAX", "20" if on_tpu else "5"))
    ml_lo = int(os.environ.get("PCS_BENCH_MIN", "12" if on_tpu else "3"))
    ml_hi = int(os.environ.get("PCS_BENCH_MAX", "22" if on_tpu else "5"))

    if "marlin" in schemes:
        from poly_commit_tpu.pcs.marlin_pc import MarlinKZG10

        for lg in range(uni_lo, uni_hi + 1, 2):
            bench_univariate(MarlinKZG10, "marlin_kzg10", lg, iters,
                             _marlin_proof_bytes, _marlin_comm_bytes)
    if "ipa" in schemes:
        from poly_commit_tpu.pcs.ipa_pc import InnerProductArgPC as IpaPC

        for lg in range(uni_lo, uni_hi + 1, 2):
            bench_univariate(IpaPC, "ipa_pc", lg, iters,
                             _ipa_proof_bytes,
                             lambda comms, comp: len(comms) * _ipa_group_size(comp))
    if "hyrax" in schemes:
        from poly_commit_tpu.pcs.hyrax import HyraxPC as Hyrax

        for nv in range(ml_lo if ml_lo % 2 == 0 else ml_lo + 1, ml_hi + 1, 2):
            bench_multilinear(Hyrax, "hyrax", nv, iters,
                              _hyrax_proof_bytes, _hyrax_comm_bytes, hiding=True)
    if "ligero_ml" in schemes:
        from poly_commit_tpu.pcs.linear_codes import MultilinearLigero

        for nv in range(ml_lo, ml_hi + 1, 2):
            bench_multilinear(MultilinearLigero, "ligero_ml", nv, iters,
                              _lc_proof_bytes, _lc_comm_bytes)
    if "brakedown_ml" in schemes:
        from poly_commit_tpu.pcs.linear_codes import MultilinearBrakedown

        for nv in range(ml_lo, ml_hi + 1, 2):
            bench_multilinear(MultilinearBrakedown, "brakedown_ml", nv, iters,
                              _lc_proof_bytes, _lc_comm_bytes)


if __name__ == "__main__":
    main()
