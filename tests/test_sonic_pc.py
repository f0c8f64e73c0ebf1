"""SonicKZG10 end-to-end (same matrix as the reference's sonic_pc tests)."""

import pytest

from poly_commit_tpu.pcs import errors
from poly_commit_tpu.pcs.sonic_pc import SonicKZG10
from tests.harness import run_equation_template, run_template

PC = SonicKZG10
SIZES = dict(max_degree=16, supported_degree=8)


def test_single_poly():
    assert run_template(PC, num_polys=1, num_points=1, hiding=True, **SIZES)


def test_two_polys_two_points():
    assert run_template(PC, num_polys=2, num_points=2, hiding=True, **SIZES)


def test_no_hiding():
    assert run_template(PC, num_polys=2, num_points=1, hiding=False, **SIZES)


def test_degree_bounds():
    assert run_template(
        PC, num_polys=2, degree_bounds=[4, 6], num_points=2, hiding=True, **SIZES
    )


def test_mixed_degree_bounds():
    assert run_template(
        PC, num_polys=3, degree_bounds=[4, None, 6], num_points=1, hiding=True, **SIZES
    )


def test_wrong_value_rejected():
    assert not run_template(
        PC, num_polys=1, num_points=1, hiding=True, corrupt_value=True, **SIZES
    )


def test_bad_degree_bound():
    from poly_commit_tpu.pcs.data_structures import HostRng, LabeledPolynomial
    from tests.harness import rand_poly

    rng = HostRng(3)
    pp = PC.setup(16, rng=rng)
    ck, vk = PC.trim(pp, 8, 2, [4, 6])
    lp = LabeledPolynomial("bad", rand_poly(PC, rng, 8), degree_bound=4, hiding_bound=2)
    with pytest.raises(errors.PCError):
        PC.commit(ck, [lp], rng)


def test_single_equation():
    assert run_equation_template(PC, num_polys=2, num_equations=1, **SIZES)


def test_two_equation_degree_bound():
    assert run_equation_template(
        PC, num_polys=2, num_equations=2, degree_bounds=[4, None], **SIZES
    )
