"""Enclosed-flow (lid-driven cavity) coverage: all-Dirichlet velocity BCs,
NO Neumann boundary — the pressure carries the constant nullspace and the
Cahouet-Chabard Kp sweep takes its pure-Neumann diagonal-shift path
(fem/windowed_assembly.py). The full Ghia-profile validation is
examples/lid_cavity.py (archived artifact: centerline error < 0.01 at n=32);
this test asserts the qualitative solution structure at a size the CPU
suite can afford."""

import numpy as np

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.mesh.generate import rectangle
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.utils.logging import RunLog


def _lid(x, t=0.0):
    v = np.zeros_like(x)
    v[:, 0] = 1.0
    return v


def test_cavity_enclosed_flow_structure():
    cfg = SolverConfig(
        T=1.0, dt=0.1, nu=0.01, rho=1.0, p_out=0.0,
        inlet_tags=(3,), wall_tags=(0, 1, 2), neumann_tags=(),
    )
    cfg.convection_form = "standard"
    cfg.include_continuity_residual = True
    cfg.jacobian_mass_rho = True
    cfg.time_scheme = "bdf2"
    cfg.krylov.matvec = "windowed"
    cfg.krylov.cells_per_block = 16
    cfg.krylov.preconditioner = "cahouet_chabard"
    cfg.krylov.rel_tol = 1e-4
    cfg.krylov.max_iters = 300
    cfg.newton.tol = 1e-6
    cfg.newton.min_iters = 1
    cfg.newton.max_iters = 6

    s = NavierStokesSolver(
        rectangle(16, 16), cfg, log=RunLog(verbose=False), inlet=_lid
    )
    s.setup()
    out = s.solve_scanned(chunk=5, newton_iters=2)

    v = np.asarray(s.velocity(real_only=True))
    c = s.velocity_coords(real_only=True)
    assert np.isfinite(v).all()
    assert float(np.asarray(out["residual"])[-1]) < 1e-3

    # vertical centerline u(y): positive near the lid, the primary vortex
    # returns flow below (u < 0 around mid-depth)
    on = np.isclose(c[:, 0], 0.5, atol=1e-9)
    y, u = c[on][:, 1], v[on][:, 0]
    assert u[np.argmax(y)] > 0.5  # near-lid velocity follows the lid
    assert u.min() < -0.05  # return flow exists
    # horizontal centerline v(x): down near the right wall, up near the left
    on = np.isclose(c[:, 1], 0.5, atol=1e-9)
    x, w = c[on][:, 0], v[on][:, 1]
    assert w[x > 0.6].min() < -0.02
    assert w[x < 0.4].max() > 0.02
    # enclosed flow: pressure is defined up to a constant but must be finite
    assert np.isfinite(np.asarray(s.pressure())).all()
