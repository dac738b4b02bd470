"""Monomial-exactness tests for every quadrature rule."""

import numpy as np
import pytest
from math import factorial

from navier_stokes_tpu.fem.quadrature import conical_product, gauss_segment, gauss_simplex


def exact_simplex_integral(alpha):
    """Integral of prod x_i^a_i over the unit simplex: prod(a_i!) / (|a|+d)!"""
    d = len(alpha)
    num = 1
    for a in alpha:
        num *= factorial(a)
    return num / factorial(sum(alpha) + d)


def monomials_upto(dim, degree):
    if dim == 1:
        return [(a,) for a in range(degree + 1)]
    if dim == 2:
        return [(a, b) for a in range(degree + 1) for b in range(degree + 1 - a)]
    return [
        (a, b, c)
        for a in range(degree + 1)
        for b in range(degree + 1 - a)
        for c in range(degree + 1 - a - b)
    ]


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_gauss_simplex_exactness(dim, degree):
    rule = gauss_simplex(dim, degree)
    assert rule.points.shape[1] == dim
    assert np.all(rule.points >= -1e-14)
    assert np.all(rule.points.sum(axis=1) <= 1 + 1e-14)
    for alpha in monomials_upto(dim, degree):
        val = np.sum(rule.weights * np.prod(rule.points ** np.array(alpha), axis=1))
        assert val == pytest.approx(exact_simplex_integral(alpha), rel=1e-12, abs=1e-15), alpha


@pytest.mark.parametrize("dim,n1d", [(2, 2), (2, 3), (2, 4), (3, 2), (3, 3), (3, 4)])
def test_conical_product_exactness(dim, n1d):
    rule = conical_product(dim, n1d)
    for alpha in monomials_upto(dim, rule.degree):
        val = np.sum(rule.weights * np.prod(rule.points ** np.array(alpha), axis=1))
        assert val == pytest.approx(exact_simplex_integral(alpha), rel=1e-12, abs=1e-15), alpha


@pytest.mark.parametrize("degree", [1, 3, 5, 7])
def test_segment(degree):
    rule = gauss_segment(degree)
    for a in range(degree + 1):
        val = np.sum(rule.weights * rule.points[:, 0] ** a)
        assert val == pytest.approx(1.0 / (a + 1), rel=1e-13)


def test_weights_sum_to_measure():
    assert gauss_simplex(2, 5).weights.sum() == pytest.approx(0.5)
    assert gauss_simplex(3, 3).weights.sum() == pytest.approx(1 / 6)
    assert conical_product(3, 3).weights.sum() == pytest.approx(1 / 6)
