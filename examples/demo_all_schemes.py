"""End-to-end drive of every scheme through the public API.

Usage: python examples/demo_all_schemes.py [name-filter ...]

For each scheme: setup -> trim -> commit -> open -> check on one small
polynomial, plus one tamper probe (corrupted value or proof must be
rejected). Prints `OK <scheme>` per passing scheme and exits nonzero on any
failure. This is the canonical runtime verification drive (see
.claude/skills/verify/SKILL.md).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

# machine-keyed CPU cache dir; see poly_commit_tpu/utils/cache.py
from poly_commit_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=True)

from poly_commit_tpu.core import field as F  # noqa: E402
from poly_commit_tpu.core.transcript import PoseidonSponge  # noqa: E402
from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial  # noqa: E402

FAILED = []


def report(name, ok, probe_ok):
    if ok and probe_ok:
        print(f"OK {name}")
    else:
        print(f"FAIL {name} (check={ok}, tamper-rejected={probe_ok})")
        FAILED.append(name)


def drive_univariate(PC, name, degree=8, max_degree=16, hiding=True,
                     enforced=None, bound=None):
    rng = HostRng(42)
    pp = PC.setup(max_degree, rng=rng)
    ck, vk = PC.trim(pp, degree, 2 if hiding else 0, enforced)
    poly_degree = bound if bound is not None else degree
    lp = LabeledPolynomial(
        "p", F.from_ints(PC.spec, rng.field_ints(PC.spec, poly_degree + 1)),
        degree_bound=bound, hiding_bound=2 if hiding else None,
    )
    comms, states = PC.commit(ck, [lp], rng)
    point = rng.field_int(PC.spec)
    qs = {("p", ("pt", point))}
    sponge = PoseidonSponge(PC.spec)
    proofs, values = PC.batch_open(ck, [lp], comms, qs, sponge, states, rng)
    ok = PC.batch_check(vk, comms, qs, values, proofs, PoseidonSponge(PC.spec))
    bad = {k: (v + 1) % PC.spec.modulus for k, v in values.items()}
    try:
        probe = not PC.batch_check(vk, comms, qs, bad, proofs, PoseidonSponge(PC.spec))
    except Exception:
        probe = True  # rejection-by-error also counts
    report(name, bool(ok), probe)


def drive_multilinear(PC, name, nv=4):
    rng = HostRng(43)
    pp = PC.setup(0, num_vars=nv, rng=rng)
    ck, vk = PC.trim(pp, 0, 0, None)
    lp = LabeledPolynomial(
        "p", F.from_ints(PC.spec, rng.field_ints(PC.spec, 1 << nv)), num_vars=nv,
        hiding_bound=1 if name == "hyrax" else None,
    )
    comms, states = PC.commit(ck, [lp], rng)
    point = tuple(rng.field_int(PC.spec) for _ in range(nv))
    qs = {("p", ("pt", point))}
    sponge = PoseidonSponge(PC.spec)
    proofs, values = PC.batch_open(ck, [lp], comms, qs, sponge, states, rng)
    ok = PC.batch_check(vk, comms, qs, values, proofs, PoseidonSponge(PC.spec))
    if name == "hyrax":
        # hyrax binds the eval inside the proof; tamper with z instead
        proofs[0][0].z[0] = (proofs[0][0].z[0] + 1) % PC.spec.modulus
        try:
            probe = not PC.batch_check(vk, comms, qs, values, proofs,
                                       PoseidonSponge(PC.spec))
        except Exception:
            probe = True
    else:
        bad = {k: (v + 1) % PC.spec.modulus for k, v in values.items()}
        try:
            probe = not PC.batch_check(vk, comms, qs, bad, proofs,
                                       PoseidonSponge(PC.spec))
        except Exception:
            probe = True
    report(name, bool(ok), probe)


def drive_multilinear_pc():
    from poly_commit_tpu.core import poly as P
    from poly_commit_tpu.pcs import multilinear_pc as ML

    SPEC = ML.SPEC
    rng = HostRng(44)
    nv = 3
    pp = ML.setup(nv, rng)
    ck, vk = ML.trim(pp, nv)
    table = F.from_ints(SPEC, rng.field_ints(SPEC, 1 << nv))
    point = [rng.field_int(SPEC) for _ in range(nv)]
    comm = ML.commit(ck, table)
    proof = ML.open(ck, table, point)
    pt = F.from_ints(SPEC, [z % SPEC.modulus for z in point])
    value = int(F.to_ints(SPEC, P.mle_evaluate(SPEC, table, pt)))
    ok = ML.check(vk, comm, point, value, proof)
    probe = not ML.check(vk, comm, point, (value + 1) % SPEC.modulus, proof)
    report("multilinear_pc", ok, probe)


def drive_pst13():
    from poly_commit_tpu.pcs.pst13 import MarlinPST13, MVPoly

    PC = MarlinPST13
    rng = HostRng(45)
    nv, deg = 2, 2
    pp = PC.setup(deg, num_vars=nv, rng=rng)
    ck, vk = PC.trim(pp, deg, 1)
    lp = LabeledPolynomial("p", MVPoly.rand(rng, nv, deg, 6), hiding_bound=1,
                           num_vars=nv)
    comms, states = PC.commit(ck, [lp], rng)
    point = tuple(rng.field_int(PC.spec) for _ in range(nv))
    qs = {("p", ("pt", point))}
    sponge = PoseidonSponge(PC.spec)
    proofs, values = PC.batch_open(ck, [lp], comms, qs, sponge, states, rng)
    ok = PC.batch_check(vk, comms, qs, values, proofs, PoseidonSponge(PC.spec))
    bad = {k: (v + 1) % PC.spec.modulus for k, v in values.items()}
    probe = not PC.batch_check(vk, comms, qs, bad, proofs, PoseidonSponge(PC.spec))
    report("pst13", bool(ok), probe)


def drive_streaming_kzg():
    from poly_commit_tpu.core import poly as P
    from poly_commit_tpu.pcs import streaming_kzg as SK

    SPEC = SK.SPEC
    rng = HostRng(46)
    ck = SK.CommitterKey.new(7, 2, rng)
    vk = ck.verifier_key()
    f = F.from_ints(SPEC, rng.field_ints(SPEC, 8))
    comm = ck.commit(f)
    chunked = ck.commit_chunked(f, 4)
    z = rng.field_int(SPEC)
    ev, proof = ck.open(f, z)
    ok = SK.verify(vk, comm, z, ev, proof) and comm.point == chunked.point
    probe = not SK.verify(vk, comm, z, (ev + 1) % SPEC.modulus, proof)
    report("streaming_kzg", bool(ok), probe)


def main():
    filters = [a.lower() for a in sys.argv[1:]]

    def want(name):
        return not filters or any(f in name for f in filters)

    if want("marlin"):
        from poly_commit_tpu.pcs.marlin_pc import MarlinKZG10

        drive_univariate(MarlinKZG10, "marlin_kzg10", enforced=[6], bound=6)
    if want("sonic"):
        from poly_commit_tpu.pcs.sonic_pc import SonicKZG10

        drive_univariate(SonicKZG10, "sonic_kzg10", enforced=[6], bound=6)
    if want("ipa"):
        from poly_commit_tpu.pcs.ipa_pc import InnerProductArgPC

        drive_univariate(InnerProductArgPC, "ipa_pc", degree=7, max_degree=7)
    if want("ligero_uni") or want("univariate_ligero"):
        from poly_commit_tpu.pcs.linear_codes import UnivariateLigero

        drive_univariate(UnivariateLigero, "univariate_ligero", degree=15,
                         max_degree=15, hiding=False)
    if want("ligero_ml") or want("multilinear_ligero"):
        from poly_commit_tpu.pcs.linear_codes import MultilinearLigero

        drive_multilinear(MultilinearLigero, "multilinear_ligero")
    if want("brakedown"):
        from poly_commit_tpu.pcs.linear_codes import MultilinearBrakedown

        drive_multilinear(MultilinearBrakedown, "brakedown")
    if want("hyrax"):
        from poly_commit_tpu.pcs.hyrax import HyraxPC

        drive_multilinear(HyraxPC, "hyrax")
    if want("multilinear_pc") or want("xzzpd"):
        drive_multilinear_pc()
    if want("pst13"):
        drive_pst13()
    if want("streaming"):
        drive_streaming_kzg()

    if FAILED:
        print("FAILED:", FAILED)
        sys.exit(1)
    print("all driven schemes OK")


if __name__ == "__main__":
    main()
