"""MultilinearPC (XZZPD19) end-to-end (mirrors multilinear_pc/mod.rs:236-313)."""

import pytest

from poly_commit_tpu.core import field as F
from poly_commit_tpu.core import poly as P
from poly_commit_tpu.core.field_params import FR_BLS12_381
from poly_commit_tpu.pcs import multilinear_pc as ML
from poly_commit_tpu.pcs.data_structures import HostRng

SPEC = FR_BLS12_381


def _rand_table(rng, nv):
    return F.from_ints(SPEC, rng.field_ints(SPEC, 1 << nv))


def _eval(table, point):
    pt = F.from_ints(SPEC, [int(z) % SPEC.modulus for z in point])
    return int(F.to_ints(SPEC, P.mle_evaluate(SPEC, table, pt)))


def test_commit_open_verify():
    rng = HostRng(21)
    nv = 3
    pp = ML.setup(nv, rng)
    ck, vk = ML.trim(pp, nv)
    table = _rand_table(rng, nv)
    point = [rng.field_int(SPEC) for _ in range(nv)]
    comm = ML.commit(ck, table)
    proof = ML.open(ck, table, point)
    value = _eval(table, point)
    assert ML.check(vk, comm, point, value, proof)


def test_trimmed_keys():
    rng = HostRng(22)
    pp = ML.setup(4, rng)
    ck, vk = ML.trim(pp, 2)
    table = _rand_table(rng, 2)
    point = [rng.field_int(SPEC) for _ in range(2)]
    comm = ML.commit(ck, table)
    proof = ML.open(ck, table, point)
    assert ML.check(vk, comm, point, _eval(table, point), proof)


def test_wrong_value_rejected():
    rng = HostRng(23)
    nv = 3
    pp = ML.setup(nv, rng)
    ck, vk = ML.trim(pp, nv)
    table = _rand_table(rng, nv)
    point = [rng.field_int(SPEC) for _ in range(nv)]
    comm = ML.commit(ck, table)
    proof = ML.open(ck, table, point)
    bad = (_eval(table, point) + 1) % SPEC.modulus
    assert not ML.check(vk, comm, point, bad, proof)


def test_zero_vars_rejected():
    with pytest.raises(Exception):
        ML.setup(0, HostRng(0))
