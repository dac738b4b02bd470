"""Shape-function sanity: nodal property, partition of unity, gradients."""

import numpy as np
import pytest

from navier_stokes_tpu.fem.quadrature import gauss_simplex
from navier_stokes_tpu.fem.reference_element import p_element, taylor_hood


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3])
def test_nodal_basis(dim, degree):
    el = p_element(dim, degree)
    vals, _ = el.tabulate(el.support_points)
    assert np.allclose(vals, np.eye(el.n_basis), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3])
def test_partition_of_unity(dim, degree):
    el = p_element(dim, degree)
    q = gauss_simplex(dim, 4)
    vals, grads = el.tabulate(q.points)
    assert np.allclose(vals.sum(axis=0), 1.0, atol=1e-13)
    assert np.allclose(grads.sum(axis=0), 0.0, atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3])
def test_gradients_fd(dim, degree):
    """Finite-difference check of tabulated gradients at interior points."""
    el = p_element(dim, degree)
    pts = np.full((1, dim), 1.0 / (dim + 2.0))
    h = 1e-6
    _, grads = el.tabulate(pts)
    for d in range(dim):
        pp, pm = pts.copy(), pts.copy()
        pp[0, d] += h
        pm[0, d] -= h
        vp, _ = el.tabulate(pp)
        vm, _ = el.tabulate(pm)
        fd = (vp - vm)[:, 0] / (2 * h)
        assert np.allclose(grads[:, 0, d], fd, atol=1e-8)


def test_linear_reproduction():
    """P2 interpolation reproduces quadratics exactly at arbitrary points."""
    el = p_element(2, 2)
    f = lambda x: 1.0 + 2 * x[:, 0] - 3 * x[:, 1] + x[:, 0] * x[:, 1] + x[:, 0] ** 2
    coef = f(el.support_points)
    pts = np.random.default_rng(1).random((20, 2)) * 0.4
    vals, _ = el.tabulate(pts)
    assert np.allclose(coef @ vals, f(pts), atol=1e-12)


def test_taylor_hood_layout():
    th = taylor_hood(2)
    assert th.n_v == 6 and th.n_p == 3 and th.dofs_per_cell == 15
    th3 = taylor_hood(3)
    assert th3.n_v == 10 and th3.n_p == 4 and th3.dofs_per_cell == 34
