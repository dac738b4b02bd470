"""Unsteady Navier-Stokes solver tests: Newton convergence, exact steady
state, and the reference's convection-form quirk."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.fem.assembly import assemble_navier_stokes
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.utils.logging import RunLog

NU, RHO, POUT = 0.04, 1.0, 10.0


def square_cfg(**kw):
    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
        nu=NU, rho=RHO, p_out=POUT, dt=0.05, T=0.15,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.krylov.max_iters = 4000
    return cfg


def poiseuille_inlet(x, t=0.0):
    v = np.zeros_like(x)
    v[:, 0] = x[:, 1] * (1.0 - x[:, 1])
    return v


def exact_state(dofs):
    """Poiseuille as a Taylor-Hood coefficient vector."""
    u = np.zeros(dofs.n_total)
    u[: dofs.n_vs] = dofs.v_coords[:, 1] * (1 - dofs.v_coords[:, 1])
    u[dofs.n_u :] = POUT + 2 * NU * RHO * (1 - dofs.p_coords[:, 0])
    return u


def test_unsteady_run_converges():
    """3 implicit-Euler steps of the as-shipped configuration shape (zero
    frozen inlet, pressure-driven): Newton must converge every step."""
    log = RunLog(verbose=False)
    solver = NavierStokesSolver(unit_square(3), square_cfg(), log=log)
    sol = solver.solve()
    s = np.asarray(sol)
    assert np.all(np.isfinite(s))
    # Dirichlet rows honored (zero inlet + walls)
    u = solver.velocity()
    bd = solver.dofs.boundary_scalar_vdofs([0, 2, 3])
    assert np.max(np.abs(u[bd])) < 1e-8
    # three time steps logged, each with a converged newton trajectory
    steps = [r for r in log.records if r.get("event") == "time_step"]
    assert len(steps) == 3
    traj = log.residual_trajectory()
    assert traj[-1]["residual"] <= solver.cfg.newton.tol


def test_exact_steady_state_is_fixed_point():
    """With standard convection, Poiseuille is an exact discrete steady state:
    starting Newton there, the first residual is already below tolerance."""
    cfg = square_cfg(convection_form="standard")
    solver = NavierStokesSolver(
        unit_square(3), cfg, log=RunLog(verbose=False), inlet=poiseuille_inlet
    ).setup()
    exact = exact_state(solver.dofs)
    solver.solution = jnp.asarray(exact)
    solver.solution_old = jnp.asarray(exact)
    solver.time = cfg.dt
    n_iter, res = solver.solve_newton()
    assert n_iter == 1  # converged immediately (assemble-check only)
    assert res < 1e-9


def test_newton_converges_to_poiseuille_from_zero():
    """March to steady state from u=0 with the Poiseuille inlet: the flow must
    approach the exact profile.

    Uses the CORRECTED flags (standard convection + continuity residual).
    With the reference's omitted continuity residual, inexact tangent solves
    (rel. tol 1e-2, cpp:566) let divergence errors accumulate — the pressure
    residual rows are identically zero so Newton never corrects them — and
    the run converges to a spurious momentum-only steady state ~0.1 away
    (observed; that IS reference-parity behavior for nonzero inflow)."""
    cfg = square_cfg(
        convection_form="standard", include_continuity_residual=True, T=8.0, dt=0.5
    )
    cfg.newton.tol = 1e-8
    solver = NavierStokesSolver(
        unit_square(3), cfg, log=RunLog(verbose=False), inlet=poiseuille_inlet
    )
    solver.solve()
    exact = exact_state(solver.dofs)
    u = np.asarray(solver.solution)
    err = np.max(np.abs(u[: solver.dofs.n_u] - exact[: solver.dofs.n_u]))
    # slowest decay mode has tau ~ rho/(nu * 2 pi^2) ~ 1.3 s; by T=8 the
    # transient is ~e^-6 of the initial defect
    assert err < 5e-3


def test_reference_convection_quirk_changes_residual():
    """The reference's u^T(grad u) residual differs from (u.grad)u — document
    the quirk: at the Poiseuille state the two forms disagree."""
    solver = NavierStokesSolver(
        unit_square(2), square_cfg(), log=RunLog(verbose=False), inlet=poiseuille_inlet
    ).setup()
    exact = jnp.asarray(exact_state(solver.dofs))
    out = {}
    free = np.ones(solver.dofs.n_total, dtype=bool)
    free[solver.dirichlet.rows] = False  # raw residual is only meaningful on
    # test functions vanishing at the Dirichlet boundary
    for form in ("reference", "standard"):
        _, _, r = assemble_navier_stokes(
            solver.ctx, exact, exact, dt=0.05, nu=NU, rho=RHO, p_out=POUT,
            convection_form=form,
        )
        out[form] = np.asarray(r)[free]
    assert np.linalg.norm(out["standard"]) < 1e-10
    assert np.linalg.norm(out["reference"]) > 1e-4


def test_dirichlet_modes_identical_for_zero_bc():
    """With the as-shipped zero inlet, 'increment' and 'reference' Dirichlet
    modes must produce bit-identical trajectories (SURVEY C4 quirk)."""
    sols = []
    for mode in ("increment", "reference"):
        cfg = square_cfg(dirichlet_mode=mode, T=0.1)
        solver = NavierStokesSolver(unit_square(2), cfg, log=RunLog(verbose=False))
        sols.append(np.asarray(solver.solve()))
    assert np.array_equal(sols[0], sols[1])
