"""Time-dependent manufactured solution through the FULL Newton /
implicit-Euler Navier-Stokes path (VERDICT r1 item 10): temporal order 1 in
dt, plus accuracy vs the exact solution.  This is the test that protects the
assembly/kernel optimizations — a Jacobian-vs-residual inconsistency (easy to
introduce via the quirk flags) breaks Newton convergence or the measured
order immediately.

Manufactured fields (divergence-free, ZERO at t=0 so the solver's as-shipped
zero initial condition is exact, cpp:650):

    u(x, t) = sin(t) * curl(psi),  psi = sin^2(pi x) sin^2(pi y) / pi
    p(x, t) = sin(t) * sin(pi x) cos(pi y)

with corrected physics flags (standard convection, continuity residual
included) so the discrete root is isolated and matches the PDE.
"""

import numpy as np
import pytest
import sympy as sp

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.fem.geometry import cell_geometry
from navier_stokes_tpu.fem.quadrature import gauss_simplex
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.utils.logging import RunLog

NU, RHO = 0.1, 1.0

_x, _y, _t = sp.symbols("x y t")
_psi = sp.sin(sp.pi * _x) ** 2 * sp.sin(sp.pi * _y) ** 2 / sp.pi
_g = sp.sin(_t)
_u1 = _g * sp.diff(_psi, _y)
_u2 = -_g * sp.diff(_psi, _x)
_p = _g * sp.sin(sp.pi * _x) * sp.cos(sp.pi * _y)
# momentum residual of the strong form:
#   f = rho u_t + rho (u . grad) u - nu rho laplace(u) + grad p
_f1 = (
    RHO * sp.diff(_u1, _t)
    + RHO * (_u1 * sp.diff(_u1, _x) + _u2 * sp.diff(_u1, _y))
    - NU * RHO * (sp.diff(_u1, _x, 2) + sp.diff(_u1, _y, 2))
    + sp.diff(_p, _x)
)
_f2 = (
    RHO * sp.diff(_u2, _t)
    + RHO * (_u1 * sp.diff(_u2, _x) + _u2 * sp.diff(_u2, _y))
    - NU * RHO * (sp.diff(_u2, _x, 2) + sp.diff(_u2, _y, 2))
    + sp.diff(_p, _y)
)

u_exact = sp.lambdify((_x, _y, _t), (_u1, _u2), "numpy")
f_exact = sp.lambdify((_x, _y, _t), (_f1, _f2), "numpy")


def forcing(pts, t):
    fx, fy = f_exact(pts[:, 0], pts[:, 1], t)
    n = len(pts)
    return np.stack([np.broadcast_to(fx, n), np.broadcast_to(fy, n)], axis=1)


def inlet(x, t=0.0):
    u1, u2 = u_exact(x[:, 0], x[:, 1], t)
    n = len(x)
    return np.stack([np.broadcast_to(u1, n), np.broadcast_to(u2, n)], axis=1)


def solve_ns(n, dt, T, scheme="bdf1"):
    cfg = SolverConfig(
        inlet_tags=(0, 1, 2, 3), neumann_tags=(), wall_tags=(),
        nu=NU, rho=RHO, p_out=0.0, dt=dt, T=T,
    )
    cfg.time_scheme = scheme
    cfg.convection_form = "standard"
    cfg.include_continuity_residual = True
    cfg.jacobian_mass_rho = True
    cfg.newton.tol = 1e-9
    cfg.newton.max_iters = 20
    cfg.krylov.rel_tol = 1e-8
    cfg.krylov.max_iters = 4000
    s = NavierStokesSolver(
        unit_square(n), cfg, log=RunLog(verbose=False),
        forcing=forcing, inlet=inlet,
    )
    s.solve()
    return s


def u_l2_error(solver, t):
    """Quadrature L2 velocity error vs the exact solution at time t."""
    dofs = solver.dofs
    quad = gauss_simplex(2, 7)
    geo = cell_geometry(dofs.mesh, quad)
    Nv, _ = dofs.element.velocity.tabulate(quad.points)
    sol = np.asarray(solver.solution, np.float64)
    uc = sol[dofs.cell_vdofs[:, None, :] + np.arange(2)[None, :, None] * dofs.n_vs]
    u_h = np.einsum("cdb,bq->cqd", uc, Nv)
    xq = geo.qpts
    ue1, ue2 = u_exact(xq[..., 0], xq[..., 1], t)
    W = geo.jxw
    return float(
        np.sqrt((((u_h[..., 0] - ue1) ** 2 + (u_h[..., 1] - ue2) ** 2) * W).sum())
    )


@pytest.mark.slow
def test_implicit_euler_temporal_order():
    """Successive dt-halvings on one mesh: ||u_dt - u_dt/2|| ratios ~ 2
    (pure temporal order 1; the shared spatial error cancels)."""
    T = 0.4
    sols = {dt: np.asarray(solve_ns(8, dt, T).solution) for dt in (0.1, 0.05, 0.025)}
    d1 = np.linalg.norm(sols[0.1] - sols[0.05])
    d2 = np.linalg.norm(sols[0.05] - sols[0.025])
    rate = np.log2(d1 / d2)
    assert 0.7 < rate < 1.4, (d1, d2, rate)


@pytest.mark.slow
def test_bdf2_temporal_order():
    """BDF2 (time_scheme='bdf2'): difference ratios ~ 4 (temporal order 2).
    Exercises the BDF1-bootstrap first step + the (4u^n - u^{n-1})/3 history
    combination through the same Newton kernel."""
    T = 0.4
    sols = {
        dt: np.asarray(solve_ns(8, dt, T, scheme="bdf2").solution)
        for dt in (0.1, 0.05, 0.025)
    }
    d1 = np.linalg.norm(sols[0.1] - sols[0.05])
    d2 = np.linalg.norm(sols[0.05] - sols[0.025])
    rate = np.log2(d1 / d2)
    assert 1.6 < rate < 2.6, (d1, d2, rate)


@pytest.mark.slow
def test_bdf2_beats_bdf1_accuracy():
    """Temporal error vs a time-converged reference on the SAME mesh (the
    shared spatial error cancels in the state-vector comparison)."""
    T = 0.4
    ref = np.asarray(solve_ns(8, 0.00625, T, scheme="bdf2").solution)
    e1 = np.linalg.norm(np.asarray(solve_ns(8, 0.05, T, scheme="bdf1").solution) - ref)
    e2 = np.linalg.norm(np.asarray(solve_ns(8, 0.05, T, scheme="bdf2").solution) - ref)
    assert e2 < 0.25 * e1, (e1, e2)


@pytest.mark.slow
def test_ns_accuracy_vs_exact():
    """Full path vs the exact manufactured solution at T (temporal +
    spatial error both small)."""
    T = 0.2
    s = solve_ns(12, 0.0125, T)
    err = u_l2_error(s, T)
    # |u| ~ 0.6; dt error ~ T/2 * dt * |u_tt| ~ 1e-3, spatial ~ 1e-3
    assert err < 5e-3, err
    # every Newton solve must actually have converged
    fails = [r for r in s.log.records if r.get("event") == "krylov_failure"]
    assert not fails
