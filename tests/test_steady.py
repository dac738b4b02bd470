"""First-class steady Navier-Stokes driver (solve_steady): the reference's
legacy variant (hpp:1-368, run_newton_loop cpp:811-833) — Newton on the
steady residual from the Stokes guess, relative-update stopping."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.fem.windowed_assembly import assemble_windowed, build_windowed_assembly
from navier_stokes_tpu.la.gmres import _norm
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.utils.logging import RunLog


def _inflow(x, t=0.0):
    v = np.zeros_like(x)
    y = x[:, 1]
    v[:, 0] = 4.0 * y * (1.0 - y)
    return v


def _cfg(nu=0.1):
    cfg = SolverConfig(inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
                       nu=nu, p_out=0.0)
    cfg.convection_form = "standard"
    cfg.include_continuity_residual = True
    cfg.jacobian_mass_rho = True
    cfg.krylov.matvec = "windowed"
    cfg.krylov.cells_per_block = 16
    cfg.krylov.preconditioner = "cahouet_chabard"
    cfg.krylov.rel_tol = 1e-8
    cfg.krylov.max_iters = 800
    return cfg


def _steady_residual_norm(s):
    """Independent steady-residual check of the converged state."""
    wa = build_windowed_assembly(
        s.ctx, s._win_layout, s.dofs, dt=1.0, nu=s.cfg.nu, rho=s.cfg.rho,
        p_out=s.cfg.p_out, terms="stokes",
    )
    _, r, diag0 = assemble_windowed(
        wa, s._win_layout, s.solution, s.solution, dt=1.0, nu=s.cfg.nu,
        rho=s.cfg.rho, convection_form=s.cfg.convection_form,
        include_continuity_residual=s.cfg.include_continuity_residual,
        include_time_term=False,
    )
    bc_rows = s._bc_rows
    bc_diag = diag0.at[bc_rows].get(mode="fill", fill_value=1.0)
    tgt = jnp.asarray(s.dirichlet.values(0.0), s._dtype) - s.solution.at[
        bc_rows
    ].get(mode="fill", fill_value=0.0)
    r = r.at[bc_rows].set(bc_diag * tgt, mode="drop")
    return float(_norm(r, None))


def test_solve_steady_converges_and_matches_time_marching():
    s = NavierStokesSolver(unit_square(3), _cfg(), log=RunLog(verbose=False),
                           inlet=_inflow)
    iters, upd = s.solve_steady(tol=1e-12, max_iters=12)
    assert iters < 12, "steady Newton must converge before MAX_ITER"
    v = s.velocity(real_only=True)
    assert np.abs(v[:, 0]).max() > 0.5, "flow must be nontrivial"
    assert _steady_residual_norm(s) < 1e-6

    # the steady state must agree with long time marching (BDF1 to T=40)
    cfg2 = _cfg()
    cfg2.T, cfg2.dt = 40.0, 2.0
    cfg2.newton.tol = 1e-9
    cfg2.krylov.a00_solver = "gmres"  # large-dt tangent: convection-dominated
    s2 = NavierStokesSolver(unit_square(3), cfg2, log=RunLog(verbose=False),
                            inlet=_inflow)
    s2.solve()
    dv = np.abs(s.velocity(real_only=True) - s2.velocity(real_only=True)).max()
    assert dv < 1e-5, dv


def test_solve_steady_spmd_matches_single():
    def run(n_devices):
        s = NavierStokesSolver(unit_square(4), _cfg(), log=RunLog(verbose=False),
                               inlet=_inflow, n_devices=n_devices)
        s.solve_steady(tol=1e-12, max_iters=12)
        return s

    s1 = run(None)
    s2 = run(2)
    assert s2._dist is not None
    f1 = {tuple(np.round(c, 10)): v
          for c, v in zip(s1.velocity_coords(real_only=True), s1.velocity(real_only=True))}
    f2 = {tuple(np.round(c, 10)): v
          for c, v in zip(s2.velocity_coords(real_only=True), s2.velocity(real_only=True))}
    err = max(np.max(np.abs(f1[k] - f2[k])) for k in f1)
    assert err < 1e-8, err


def test_solve_steady_line_search_recovers_big_step():
    """At a harder Re the full step can overshoot: the backtracking ladder
    must still deliver convergence."""
    s = NavierStokesSolver(unit_square(3), _cfg(nu=0.02), log=RunLog(verbose=False),
                           inlet=_inflow)
    iters, upd = s.solve_steady(tol=1e-11, max_iters=15, line_search=True)
    assert upd <= 1e-11
    assert _steady_residual_norm(s) < 1e-5
