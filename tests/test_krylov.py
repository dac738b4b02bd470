"""FGMRES / CG unit tests on dense random systems (via closure matvecs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.la.cg import cg
from navier_stokes_tpu.la.gmres import fgmres


def make_spd(n, rng, cond=100.0):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.geomspace(1.0, cond, n)
    return Q @ np.diag(d) @ Q.T


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(0)
    n = 80
    # well-posed nonsymmetric perturbation of identity (spectral radius < 1)
    A = np.eye(n) + (0.5 / np.sqrt(n)) * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = fgmres(lambda x: Aj @ x, jnp.asarray(b), atol=1e-10, restart=40, maxiter=400)
    assert bool(res.converged)
    assert np.linalg.norm(A @ np.asarray(res.x) - b) <= 1e-9


def test_gmres_restart_cycles():
    """Convergence must survive restarts (restart < n)."""
    rng = np.random.default_rng(1)
    n = 60
    A = make_spd(n, rng, cond=50.0) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = fgmres(lambda x: Aj @ x, jnp.asarray(b), atol=1e-8, restart=12, maxiter=2000)
    assert bool(res.converged)
    assert np.linalg.norm(A @ np.asarray(res.x) - b) <= 1e-7


def test_gmres_absolute_tolerance_semantics():
    """Stops at ||r|| <= atol like SolverControl (loose tol -> few iters)."""
    rng = np.random.default_rng(2)
    n = 50
    A = make_spd(n, rng)
    b = rng.standard_normal(n)
    atol = 1e-2 * np.linalg.norm(b)
    res = fgmres(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), atol=atol, restart=50, maxiter=500)
    r = np.linalg.norm(A @ np.asarray(res.x) - b)
    assert r <= atol * 1.01
    assert int(res.iters) < n


def test_gmres_zero_rhs():
    A = jnp.eye(10)
    res = fgmres(lambda x: A @ x, jnp.zeros(10), atol=0.0, restart=5, maxiter=50)
    assert np.allclose(np.asarray(res.x), 0)
    assert int(res.iters) == 0


def test_gmres_right_preconditioned():
    rng = np.random.default_rng(3)
    n = 100
    A = make_spd(n, rng, cond=1e4)
    b = rng.standard_normal(n)
    dinv = jnp.asarray(1.0 / np.diag(A))
    Aj = jnp.asarray(A)
    plain = fgmres(lambda x: Aj @ x, jnp.asarray(b), atol=1e-8, restart=30, maxiter=3000)
    prec = fgmres(
        lambda x: Aj @ x, jnp.asarray(b), atol=1e-8, restart=30, maxiter=3000,
        precond=lambda v: dinv * v,
    )
    assert bool(prec.converged)
    assert np.linalg.norm(A @ np.asarray(prec.x) - b) <= 1e-7


def test_gmres_flexible_inner_solver():
    """FGMRES with an ITERATIVE preconditioner (inner CG), like hpp:575-639."""
    rng = np.random.default_rng(4)
    n = 64
    A = make_spd(n, rng, cond=500.0)
    Aj = jnp.asarray(A)
    b = rng.standard_normal(n)

    def inner(v):
        return cg(lambda x: Aj @ x, v, atol=1e-2 * jnp.linalg.norm(v), maxiter=50).x

    res = fgmres(lambda x: Aj @ x, jnp.asarray(b), atol=1e-9, restart=20, maxiter=200, precond=inner)
    assert bool(res.converged)
    assert int(res.iters) <= 20  # strong inner solve -> few outer iterations


def test_gmres_under_jit():
    rng = np.random.default_rng(5)
    n = 40
    A = jnp.asarray(make_spd(n, rng))
    b = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def solve(bb):
        return fgmres(lambda x: A @ x, bb, atol=1e-9, restart=20, maxiter=200).x

    x = solve(b)
    assert np.linalg.norm(np.asarray(A @ x - b)) <= 1e-8


def test_cg_spd():
    rng = np.random.default_rng(6)
    n = 90
    A = make_spd(n, rng, cond=1e3)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = cg(lambda x: Aj @ x, jnp.asarray(b), atol=1e-10, maxiter=2000)
    assert bool(res.converged)
    assert np.linalg.norm(A @ np.asarray(res.x) - b) <= 1e-9


def test_cg_jacobi_preconditioned():
    rng = np.random.default_rng(7)
    n = 90
    # badly row-scaled SPD system: Jacobi must help dramatically
    base = make_spd(n, rng, cond=10.0)
    s = np.sqrt(np.geomspace(1.0, 1e6, n))
    A = (base * s).T * s
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    dinv = jnp.asarray(1.0 / np.diag(A))
    plain = cg(lambda x: Aj @ x, jnp.asarray(b), atol=1e-8, maxiter=4000)
    prec = cg(lambda x: Aj @ x, jnp.asarray(b), atol=1e-8, maxiter=4000, precond=lambda v: dinv * v)
    assert bool(prec.converged)
    assert int(prec.iters) < int(plain.iters)


def test_gmres_deflation_rescues_restarted_near_null():
    """fgmres(deflate=...): a fixed near-null direction forced into every
    cycle lets a SMALL-restart solve converge where the plain restarted one
    stalls for its whole budget (the weakly-pinned pressure-mode scenario;
    KrylovConfig.kp_deflate)."""
    rng = np.random.default_rng(3)
    n = 120
    # SPD with one isolated tiny eigenvalue and a spread bulk: restarted
    # GMRES with a small window loses the tiny mode at every restart
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.concatenate([[1e-6], np.linspace(0.5, 3.0, n - 1)])
    A = (Q * eigs) @ Q.T
    b = A @ rng.standard_normal(n)  # consistent RHS with a big mode component
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)
    atol = 1e-8 * float(np.linalg.norm(b))

    mv = lambda v: Aj @ v
    plain = fgmres(mv, bj, atol=atol, restart=8, maxiter=200)
    defl = fgmres(
        mv, bj, atol=atol, restart=8, maxiter=200,
        deflate=jnp.asarray(Q[:, :1].T),
    )
    assert bool(defl.converged)
    assert int(defl.iters) < int(plain.iters) or not bool(plain.converged)
    x_exact = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(defl.x), x_exact, atol=1e-5)


def test_gmres_deflation_spanned_direction_is_safe():
    """A deflation direction that is useless/duplicated must not corrupt the
    solve or report false convergence."""
    rng = np.random.default_rng(4)
    n = 40
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    d = np.zeros((2, n))
    d[0] = b / np.linalg.norm(b)  # same as the first Krylov direction
    d[1] = d[0]  # duplicate
    atol = 1e-10 * float(np.linalg.norm(b))
    sol = fgmres(
        jnp.asarray(A).__matmul__, jnp.asarray(b), atol=atol, restart=20,
        maxiter=200, deflate=jnp.asarray(d),
    )
    assert bool(sol.converged)
    np.testing.assert_allclose(
        np.asarray(sol.x), np.linalg.solve(A, b), atol=1e-7
    )
