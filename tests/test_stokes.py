"""Steady Stokes solver: exact Poiseuille reproduction + reference-path smoke.

Poiseuille in the unit square is EXACTLY representable in Taylor-Hood P2/P1:
  u = (y(1-y), 0),  p = p_out + 2 nu rho (1 - x)
with Dirichlet inlet at x=0 (tag 0), walls at y=0/1 (tags 2,3) and the
do-nothing outflow nu rho du/dn - p n = -p_out n at x=1 (tag 1) — the exact
tag set of the reference's Stokes path (cpp:466-530).  The discrete solution
must match to solver tolerance.
"""

import numpy as np
import pytest

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.stokes import StokesSolver
from navier_stokes_tpu.utils.logging import RunLog

NU, RHO, POUT = 0.04, 1.0, 10.0


def poiseuille_inlet(x, t=0.0):
    v = np.zeros_like(x)
    v[:, 0] = x[:, 1] * (1.0 - x[:, 1])
    return v


def exact_velocity(coords):
    u = np.zeros_like(coords)
    u[:, 0] = coords[:, 1] * (1 - coords[:, 1])
    return u


def exact_pressure(coords):
    return POUT + 2 * NU * RHO * (1 - coords[:, 0])


@pytest.mark.parametrize("precond", ["block_triangular", "block_diagonal", "identity"])
def test_stokes_poiseuille_exact(precond):
    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3), nu=NU, rho=RHO, p_out=POUT
    )
    cfg.krylov.preconditioner = precond
    cfg.krylov.max_iters = 4000
    solver = StokesSolver(unit_square(4), cfg, log=RunLog(verbose=False), inlet=poiseuille_inlet)
    solver.solve()

    u = solver.velocity()
    p = solver.pressure()
    ue = exact_velocity(solver.dofs.v_coords)
    pe = exact_pressure(solver.dofs.p_coords)
    assert np.max(np.abs(u - ue)) < 5e-5
    assert np.max(np.abs(p - pe)) < 5e-3


def test_stokes_reference_square_mesh(ref_mesh_dir):
    """Reference Stokes config on the shipped square mesh.  As shipped the
    inlet is frozen at sin(0)=0, so the EXACT solution is hydrostatic:
    u = 0, p = p_out everywhere (the do-nothing BC absorbs the constant
    pressure).  The solver must find exactly that — the same state the
    reference's (dead) Stokes path would produce."""
    import os

    cfg = SolverConfig(inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3))
    cfg.krylov.max_iters = 4000
    cfg.krylov.preconditioner = "block_triangular"  # cpp:546
    solver = StokesSolver(
        os.path.join(ref_mesh_dir, "mesh-square-h0.100000.msh"),
        cfg,
        log=RunLog(verbose=False),
    )
    x = solver.solve()
    assert np.all(np.isfinite(np.asarray(x)))
    u = solver.velocity()
    bd = solver.dofs.boundary_scalar_vdofs([0, 2, 3])
    assert np.max(np.abs(u[bd])) < 1e-8  # Dirichlet rows exactly honored
    assert np.max(np.abs(u)) < 1e-4  # hydrostatic state: no flow
    assert np.allclose(solver.pressure(), POUT, atol=1e-3)


@pytest.mark.parametrize("n_dev", [None, 2])
def test_stokes_windowed_matches_exact(n_dev):
    """StokesSolver with matvec='windowed' (delegating to the windowed/SPMD
    Stokes machinery) reproduces Poiseuille exactly too."""
    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3), nu=NU, rho=RHO, p_out=POUT
    )
    cfg.krylov.matvec = "windowed"
    cfg.krylov.cells_per_block = 16
    cfg.krylov.preconditioner = "block_triangular"
    cfg.krylov.max_iters = 4000
    solver = StokesSolver(
        unit_square(4), cfg, log=RunLog(verbose=False), inlet=poiseuille_inlet,
        n_devices=n_dev,
    )
    solver.solve()
    assert solver._ns is not None  # actually took the windowed path
    mask = solver.dofs.v_mask
    u = solver.velocity(real_only=True)
    ue = exact_velocity(solver.dofs.v_coords[mask])
    np.testing.assert_allclose(u, ue, atol=3e-5)
    pmask = solver.dofs.p_mask
    p = solver.pressure(real_only=True)
    pe = exact_pressure(solver.dofs.p_coords[pmask])
    np.testing.assert_allclose(p, pe, atol=3e-4)
    gm = [r for r in solver.log.records if r.get("event") == "gmres"]
    assert gm and gm[-1]["system"] == "stokes"
