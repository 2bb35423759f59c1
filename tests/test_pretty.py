"""Pretty-printer (core/pretty.py) — the gbp_linalg::pretty_print
capability. Digit counting matches the reference's doctest table
(pretty_print.rs:31-42)."""

import math

import numpy as np

from magics_tpu.core.pretty import (
    format_gaussian,
    format_matrix,
    format_vector,
    num_of_integral_digits,
)


def test_num_of_integral_digits_reference_table():
    assert num_of_integral_digits(0.0) == 1
    assert num_of_integral_digits(1.0) == 1
    assert num_of_integral_digits(10.0) == 2
    assert num_of_integral_digits(100.0) == 3
    assert num_of_integral_digits(1e5) == 6
    assert num_of_integral_digits(1e-5) == 1
    assert num_of_integral_digits(1.2345) == 1
    assert num_of_integral_digits(float("nan")) is None
    assert num_of_integral_digits(float("inf")) is None
    assert num_of_integral_digits(float("-inf")) is None
    assert num_of_integral_digits(-1.5) == 2


def test_format_matrix_box_and_values():
    s = format_matrix(np.array([[1.5, -2.0], [0.0, 10.25]]), name="m", color=False)
    lines = s.splitlines()
    assert lines[0].startswith("m (2x2)")
    assert lines[1].startswith("╭") and lines[1].endswith("╮")
    assert lines[-1].startswith("╰") and lines[-1].endswith("╯")
    assert "1.500" in s and "-2.000" in s and "10.250" in s


def test_format_vector_and_nonfinite():
    s = format_vector([math.inf, 1.0], color=False)
    assert "inf" in s and "1.000" in s


def test_format_gaussian_recovers_mean():
    lam = np.diag([2.0, 4.0])
    mean = np.array([1.0, -3.0])
    eta = lam @ mean
    s = format_gaussian(eta, lam, name="g", color=False)
    assert "g.mean" in s and "-3.000" in s
    # singular precision: no mean block, message instead
    s2 = format_gaussian([0.0, 0.0], np.zeros((2, 2)), name="h", color=False)
    assert "singular" in s2
