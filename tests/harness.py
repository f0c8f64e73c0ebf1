"""Scheme-generic property-test harness.

Mirrors the reference's generic templates (lib.rs:643-1417): random polys
(with optional degree bounds and hiding), random multi-point query sets,
batch_open -> batch_check round trips, equation (linear-combination) tests,
and the negative bad-degree-bound test. Sizes are fixed (not random) so each
scheme compiles a handful of XLA programs once.
"""

import numpy as np

from poly_commit_tpu.core import field as F
from poly_commit_tpu.pcs.data_structures import (
    HostRng,
    LabeledPolynomial,
    LinearCombination,
)
from poly_commit_tpu.core.transcript import PoseidonSponge


def rand_poly(PC, rng: HostRng, degree: int):
    ints = rng.field_ints(PC.spec, degree + 1)
    if ints[-1] == 0:
        ints[-1] = 1
    return F.from_ints(PC.spec, ints)


def run_template(
    PC,
    *,
    max_degree=16,
    supported_degree=8,
    num_polys=2,
    degree_bounds=None,  # list of per-poly bounds (None entries = unbounded)
    num_points=2,
    hiding=True,
    seed=7,
    corrupt_value=False,
):
    """setup -> trim -> commit -> batch_open -> batch_check round trip."""
    rng = HostRng(seed)
    pp = PC.setup(max_degree, rng=rng)
    enforced = sorted({b for b in (degree_bounds or []) if b is not None}) or None
    hb = num_points if hiding else 0
    ck, vk = PC.trim(pp, supported_degree, hb, enforced)

    polys = []
    for i in range(num_polys):
        bound = (degree_bounds or [None] * num_polys)[i]
        degree = bound if bound is not None else supported_degree
        polys.append(
            LabeledPolynomial(
                label=f"poly_{i}",
                poly=rand_poly(PC, rng, degree),
                degree_bound=bound,
                hiding_bound=hb if hiding else None,
            )
        )
    comms, states = PC.commit(ck, polys, rng)

    query_set = set()
    points = [rng.field_int(PC.spec) for _ in range(num_points)]
    for pi, point in enumerate(points):
        for lp in polys:
            query_set.add((lp.label, (f"pt_{pi}", point)))

    sponge = PoseidonSponge(PC.spec)
    proofs, values = PC.batch_open(ck, polys, comms, query_set, sponge, states, rng)

    if corrupt_value:
        k = sorted(values)[0]
        values = dict(values)
        values[k] = (values[k] + 1) % PC.spec.modulus

    sponge2 = PoseidonSponge(PC.spec)
    ok = PC.batch_check(vk, comms, query_set, values, proofs, sponge2)
    return bool(ok)


def run_equation_template(
    PC,
    *,
    max_degree=16,
    supported_degree=8,
    num_polys=3,
    num_equations=2,
    degree_bounds=None,
    num_points=1,
    hiding=True,
    seed=11,
):
    """open_combinations -> check_combinations round trip (lib.rs:902-1081)."""
    rng = HostRng(seed)
    pp = PC.setup(max_degree, rng=rng)
    enforced = sorted({b for b in (degree_bounds or []) if b is not None}) or None
    hb = num_points + 1 if hiding else 0
    ck, vk = PC.trim(pp, supported_degree, hb, enforced)

    polys = []
    for i in range(num_polys):
        bound = (degree_bounds or [None] * num_polys)[i]
        degree = bound if bound is not None else supported_degree
        polys.append(
            LabeledPolynomial(
                label=f"poly_{i}",
                poly=rand_poly(PC, rng, degree),
                degree_bound=bound,
                hiding_bound=hb if hiding else None,
            )
        )
    comms, states = PC.commit(ck, polys, rng)

    p = PC.spec.modulus
    lcs = []
    for e in range(num_equations):
        terms = []
        # degree-bounded polys may only appear alone with coeff 1
        i = e % num_polys
        if polys[i].degree_bound is not None:
            terms = [(1, polys[i].label)]
        else:
            terms.append((rng.field_int(PC.spec), polys[i].label))
            j = (e + 1) % num_polys
            if polys[j].degree_bound is None and j != i:
                terms.append((rng.field_int(PC.spec), polys[j].label))
            terms.append((rng.field_int(PC.spec), "one"))
        lcs.append(LinearCombination(label=f"lc_{e}", terms=terms))

    query_set = set()
    points = [rng.field_int(PC.spec) for _ in range(num_points)]
    for pi, point in enumerate(points):
        for lc in lcs:
            query_set.add((lc.label, (f"pt_{pi}", point)))

    # evaluate the linear combinations directly
    def eval_poly(lp, point):
        return PC.evaluate_poly(lp, point)

    by_label = {lp.label: lp for lp in polys}
    eqn_evals = {}
    for (lc_label, (_, point)) in query_set:
        lc = next(l for l in lcs if l.label == lc_label)
        acc = 0
        for coeff, term in lc.terms:
            if term == "one":
                acc = (acc + coeff) % p
            else:
                acc = (acc + coeff * eval_poly(by_label[term], point)) % p
        eqn_evals[(lc_label, point)] = acc

    sponge = PoseidonSponge(PC.spec)
    proof_and_evals = PC.open_combinations(
        ck, lcs, polys, comms, query_set, sponge, states, rng
    )
    sponge2 = PoseidonSponge(PC.spec)
    ok = PC.check_combinations(
        vk, lcs, comms, query_set, eqn_evals, proof_and_evals, sponge2
    )
    return bool(ok)


def rand_ml_poly(PC, rng: HostRng, num_vars: int):
    """Random multilinear evaluation table (2^nv, L) in Montgomery form."""
    return F.from_ints(PC.spec, rng.field_ints(PC.spec, 1 << num_vars))


def run_ml_template(
    PC,
    *,
    num_vars=4,
    num_polys=2,
    num_points=2,
    hiding=True,
    seed=7,
    corrupt_value=False,
    setup_kw=None,
):
    """Multilinear analogue of run_template: points are nv-tuples."""
    rng = HostRng(seed)
    pp = PC.setup(0, num_vars=num_vars, rng=rng)
    ck, vk = PC.trim(pp, 0, num_points if hiding else 0, None)

    polys = [
        LabeledPolynomial(
            label=f"poly_{i}",
            poly=rand_ml_poly(PC, rng, num_vars),
            hiding_bound=num_points if hiding else None,
            num_vars=num_vars,
        )
        for i in range(num_polys)
    ]
    comms, states = PC.commit(ck, polys, rng)

    query_set = set()
    points = [
        tuple(rng.field_int(PC.spec) for _ in range(num_vars))
        for _ in range(num_points)
    ]
    for pi, point in enumerate(points):
        for lp in polys:
            query_set.add((lp.label, (f"pt_{pi}", point)))

    sponge = PoseidonSponge(PC.spec)
    proofs, values = PC.batch_open(ck, polys, comms, query_set, sponge, states, rng)

    if corrupt_value:
        k = sorted(values)[0]
        values = dict(values)
        values[k] = (values[k] + 1) % PC.spec.modulus

    sponge2 = PoseidonSponge(PC.spec)
    ok = PC.batch_check(vk, comms, query_set, values, proofs, sponge2)
    return bool(ok)
