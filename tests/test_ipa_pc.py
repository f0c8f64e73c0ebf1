"""InnerProductArgPC end-to-end (mirrors ipa_pc/mod.rs tests, JubJub+Blake2s)."""

import pytest

from poly_commit_tpu.pcs import errors
from poly_commit_tpu.pcs.ipa_pc import InnerProductArgPC, sample_generators
from tests.harness import run_equation_template, run_template

PC = InnerProductArgPC
SIZES = dict(max_degree=15, supported_degree=7)


def test_generators_on_curve():
    from poly_commit_tpu.core import field_params as FP

    p = FP.FR_BLS12_381.modulus
    d = FP.JUBJUB_D
    for (x, y) in sample_generators(4):
        assert (-x * x + y * y) % p == (1 + d * x * x * y * y) % p


def test_single_poly():
    assert run_template(PC, num_polys=1, num_points=1, hiding=True, **SIZES)


def test_two_polys_two_points():
    assert run_template(PC, num_polys=2, num_points=2, hiding=True, **SIZES)


def test_no_hiding():
    assert run_template(PC, num_polys=2, num_points=1, hiding=False, **SIZES)


def test_degree_bounds():
    assert run_template(
        PC, num_polys=2, degree_bounds=[4, 6], num_points=1, hiding=True, **SIZES
    )


def test_wrong_value_rejected():
    assert not run_template(
        PC, num_polys=1, num_points=1, hiding=True, corrupt_value=True, **SIZES
    )


def test_single_equation():
    assert run_equation_template(PC, num_polys=2, num_equations=1, **SIZES)


def test_two_equation_degree_bound():
    assert run_equation_template(
        PC, num_polys=2, num_equations=2, degree_bounds=[4, None], **SIZES
    )
