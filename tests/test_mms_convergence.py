"""Method-of-manufactured-solutions convergence (SURVEY §4's recommended
strategy): Taylor-Hood P2/P1 must converge at order 3 in velocity L2 and
order 2 in pressure L2 under uniform refinement."""

import numpy as np
import pytest
import sympy as sp

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.fem.geometry import cell_geometry
from navier_stokes_tpu.fem.quadrature import gauss_simplex
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.stokes import StokesSolver
from navier_stokes_tpu.utils.logging import RunLog

NU, RHO = 0.7, 1.0

# divergence-free manufactured solution, zero on the unit-square boundary:
#   psi = (1/pi) sin^2(pi x) sin^2(pi y);  u = (d psi/dy, -d psi/dx)
#   p   = sin(pi x) cos(pi y)   (zero mean)
_x, _y = sp.symbols("x y")
_psi = sp.sin(sp.pi * _x) ** 2 * sp.sin(sp.pi * _y) ** 2 / sp.pi
_u1 = sp.diff(_psi, _y)
_u2 = -sp.diff(_psi, _x)
_p = sp.sin(sp.pi * _x) * sp.cos(sp.pi * _y)
# steady Stokes forcing for the gradient-form weak formulation:
#   f = -nu rho laplace(u) + grad p
_f1 = -NU * RHO * (sp.diff(_u1, _x, 2) + sp.diff(_u1, _y, 2)) + sp.diff(_p, _x)
_f2 = -NU * RHO * (sp.diff(_u2, _x, 2) + sp.diff(_u2, _y, 2)) + sp.diff(_p, _y)

u_exact = sp.lambdify((_x, _y), (_u1, _u2), "numpy")
p_exact = sp.lambdify((_x, _y), _p, "numpy")
f_exact = sp.lambdify((_x, _y), (_f1, _f2), "numpy")


def forcing(pts):
    fx, fy = f_exact(pts[:, 0], pts[:, 1])
    return np.stack([np.broadcast_to(fx, len(pts)), np.broadcast_to(fy, len(pts))], axis=1)


def zero_inlet(x, t=0.0):
    return np.zeros_like(x)


def l2_errors(solver):
    """Quadrature L2 errors of (velocity, pressure), pressure mean-adjusted."""
    dofs = solver.dofs
    mesh = dofs.mesh
    quad = gauss_simplex(2, 7)
    geo = cell_geometry(mesh, quad)
    Nv, _ = dofs.element.velocity.tabulate(quad.points)
    Np, _ = dofs.element.pressure.tabulate(quad.points)
    sol = np.asarray(solver.solution, dtype=np.float64)

    uc = sol[dofs.cell_vdofs[:, None, :] + np.arange(2)[None, :, None] * dofs.n_vs]
    u_h = np.einsum("cdb,bq->cqd", uc, Nv)  # [nc, nq, 2]
    pc = sol[dofs.n_u + dofs.cell_pdofs]
    p_h = np.einsum("cb,bq->cq", pc, Np)

    xq = geo.qpts  # [nc, nq, 2]
    ue1, ue2 = u_exact(xq[..., 0], xq[..., 1])
    pe = p_exact(xq[..., 0], xq[..., 1])
    W = geo.jxw

    # remove the pressure's free constant (all-Dirichlet velocity BCs)
    vol = W.sum()
    shift = ((p_h - pe) * W).sum() / vol
    err_u = np.sqrt((((u_h[..., 0] - ue1) ** 2 + (u_h[..., 1] - ue2) ** 2) * W).sum())
    err_p = np.sqrt((((p_h - pe - shift) ** 2) * W).sum())
    return err_u, err_p


def solve_on(n, deg_v=2, deg_p=1):
    cfg = SolverConfig(
        inlet_tags=(0, 1, 2, 3), neumann_tags=(), wall_tags=(), nu=NU, rho=RHO, p_out=0.0
    )
    cfg.degree_velocity = deg_v
    cfg.degree_pressure = deg_p
    cfg.quadrature_degree = 2 * deg_v
    cfg.krylov.preconditioner = "block_triangular"
    cfg.krylov.stokes_rel_tol = 1e-10
    cfg.krylov.inner_tol = 1e-3
    cfg.krylov.max_iters = 6000
    solver = StokesSolver(
        unit_square(n), cfg, log=RunLog(verbose=False), forcing=forcing, inlet=zero_inlet
    )
    solver.solve()
    return solver


@pytest.mark.slow
def test_taylor_hood_convergence_orders():
    errors = [l2_errors(solve_on(n)) for n in (4, 8, 16)]
    eu = [e[0] for e in errors]
    ep = [e[1] for e in errors]
    rate_u = np.log2(eu[0] / eu[1]), np.log2(eu[1] / eu[2])
    rate_p = np.log2(ep[0] / ep[1]), np.log2(ep[1] / ep[2])
    # P2 velocity: L2 order 3; P1 pressure: order 2 (superconvergence tolerated)
    assert rate_u[1] > 2.6, (eu, rate_u)
    assert rate_p[1] > 1.6, (ep, rate_p)
    assert eu[-1] < 2e-3 and ep[-1] < 2e-2


@pytest.mark.slow
def test_p3_p2_convergence_orders():
    """P3/P2 Taylor-Hood: velocity L2 order 4, pressure order 3 (VERDICT r1
    item 9 — P3 end-to-end through the dof map + solver)."""
    errors = [l2_errors(solve_on(n, deg_v=3, deg_p=2)) for n in (2, 4, 8)]
    eu = [e[0] for e in errors]
    ep = [e[1] for e in errors]
    rate_u = np.log2(eu[1] / eu[2])
    rate_p = np.log2(ep[1] / ep[2])
    assert rate_u > 3.5, (eu, rate_u)
    assert rate_p > 2.5, (ep, rate_p)
    assert eu[-1] < 5e-4 and ep[-1] < 5e-3
