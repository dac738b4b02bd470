"""XDMF/HDF5 output, checkpoint/restart, and flow functionals."""

import os

import numpy as np
import pytest

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from navier_stokes_tpu.io.xdmf import XdmfWriter
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.functionals import BoundaryForce, divergence_l2, strouhal_number
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.models.stokes import StokesSolver
from navier_stokes_tpu.utils.logging import RunLog

NU, RHO, POUT = 0.04, 1.0, 10.0


def square_cfg(**kw):
    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
        nu=NU, rho=RHO, p_out=POUT, dt=0.05, T=0.1,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.krylov.max_iters = 1000
    return cfg


def poiseuille_inlet(x, t=0.0):
    v = np.zeros_like(x)
    v[:, 0] = x[:, 1] * (1.0 - x[:, 1])
    return v


@pytest.fixture(scope="module")
def poiseuille_solution():
    cfg = SolverConfig(inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
                       nu=NU, rho=RHO, p_out=POUT)
    cfg.krylov.preconditioner = "block_triangular"
    cfg.krylov.max_iters = 4000
    s = StokesSolver(unit_square(6), cfg, log=RunLog(verbose=False), inlet=poiseuille_inlet)
    s.solve()
    return s


def test_xdmf_write(tmp_path, poiseuille_solution):
    import h5py

    s = poiseuille_solution
    w = XdmfWriter(s.dofs, output_dir=str(tmp_path))
    name = w.write(0, 0.0, np.asarray(s.solution))
    w.write(1, 0.05, np.asarray(s.solution))
    series = w.write_series()
    # reference-compatible file names (cpp:712)
    assert name == "output-0000.h5"
    assert (tmp_path / "output-0000.xdmf").exists()
    assert (tmp_path / series).exists()
    with h5py.File(tmp_path / "output-0000.h5") as f:
        assert f["nodes"].shape == (s.dofs.mesh.n_nodes, 2)
        assert f["cells"].shape == (s.dofs.mesh.n_cells, 3)
        vel = f["velocity"][:]
        assert vel.shape == (s.dofs.mesh.n_nodes, 3)
        # vertex velocities must equal the dof values at matching coords
        vv = s.dofs.vertex_vdofs
        np.testing.assert_allclose(vel[:, 0], np.asarray(s.solution)[vv], rtol=1e-12)
        # xdmf references the h5 datasets
    text = (tmp_path / "output-0000.xdmf").read_text()
    assert "output-0000.h5:/velocity" in text and "Triangle" in text


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.h5")
    sol = np.random.default_rng(0).standard_normal(100)
    save_checkpoint(path, solution=sol, solution_old=sol * 2, time=0.3, step=6,
                    config={"dt": 0.05})
    d = load_checkpoint(path)
    np.testing.assert_allclose(d["solution"], sol)
    np.testing.assert_allclose(d["solution_old"], sol * 2)
    assert d["time"] == 0.3 and d["step"] == 6 and d["config"]["dt"] == 0.05


def test_restart_continues_identically(tmp_path):
    """T=0.1 run, checkpoint, resume to T=0.2 == direct T=0.2 run (the
    capability the reference lacks: its runs cannot resume, SURVEY §5)."""
    direct = NavierStokesSolver(unit_square(3), square_cfg(T=0.2), log=RunLog(verbose=False))
    direct.solve()

    first = NavierStokesSolver(unit_square(3), square_cfg(T=0.1), log=RunLog(verbose=False))
    first.solve()
    ck = str(tmp_path / "resume.h5")
    first.save_checkpoint(ck)

    second = NavierStokesSolver(unit_square(3), square_cfg(T=0.2), log=RunLog(verbose=False))
    second.restore_checkpoint(ck)
    second.solve(resume=True)

    np.testing.assert_allclose(
        np.asarray(second.solution), np.asarray(direct.solution), atol=1e-12
    )


def test_boundary_force_poiseuille(poiseuille_solution):
    """Wall shear of Poiseuille flow: traction on y=0 is
    (nu rho du/dy * n_y, p) with du/dy = 1 -> F_x = -nu rho per unit length."""
    s = poiseuille_solution
    bf = BoundaryForce(s.dofs, tags=(2,), nu=NU, rho=RHO)  # y = 0 wall
    f = bf.force(s.solution)
    # fluid flows +x and drags the wall forward: F_x = +nu rho du/dy = nu rho
    assert f[0] == pytest.approx(NU * RHO, rel=1e-3)
    # pressure pushes the wall away from the fluid (-y); mean wall pressure is
    # p_out + 2 nu rho * mean(1 - x) = p_out + nu rho
    assert f[1] == pytest.approx(-(POUT + NU * RHO), rel=1e-2)


def test_drag_lift_coefficients(poiseuille_solution):
    s = poiseuille_solution
    bf = BoundaryForce(s.dofs, tags=(2,), nu=NU, rho=RHO)
    cd, cl = bf.coefficients(s.solution, u_mean=1.0, length=1.0)
    assert cd == pytest.approx(2 * NU * RHO, rel=1e-3)


def test_divergence_l2(poiseuille_solution):
    # bounded by the Stokes solve tolerance (1e-6 relative on an O(10) rhs)
    s = poiseuille_solution
    assert divergence_l2(s.ctx, s.solution) < 1e-3


def test_strouhal():
    dt, f0 = 0.01, 3.0
    t = np.arange(2000) * dt
    lift = 0.5 + 0.2 * np.sin(2 * np.pi * f0 * t)
    st = strouhal_number(lift, dt, D=0.1, U=1.0)
    assert st == pytest.approx(f0 * 0.1, rel=0.05)
    assert strouhal_number(np.zeros(100), dt, 0.1, 1.0) == 0.0


def test_boundary_reaction_poiseuille_exact():
    """Plane Poiseuille is EXACT in P2/P1, so the reaction functional on a
    channel wall must equal the analytic wall drag mu * (4 u_m / H) * L to
    machine precision (the superconvergent force evaluator validated against
    scripts/oracle_steady_ns.py on the DFG benchmark)."""
    import jax.numpy as jnp

    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.mesh.generate import rectangle
    from navier_stokes_tpu.models.functionals import BoundaryReaction
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.utils.logging import RunLog

    L, H, um, nu = 2.0, 0.5, 0.3, 0.01
    mesh = rectangle(16, 8, 0, L, 0, H)

    def inflow(x, t=0.0):
        v = np.zeros_like(x)
        v[:, 0] = um * 4.0 * x[:, 1] * (H - x[:, 1]) / H**2
        return v

    cfg = SolverConfig(
        T=0.1, dt=0.1, nu=nu, rho=1.0, p_out=0.0,
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
    )
    cfg.dtype = "float64"
    cfg.convection_form = "standard"
    cfg.include_continuity_residual = True
    cfg.jacobian_mass_rho = True
    s = NavierStokesSolver(mesh, cfg, log=RunLog(verbose=False), inlet=inflow)
    s.setup()
    # inject the exact Poiseuille state (u quadratic, p linear: exact in
    # Taylor-Hood), no solve needed: the functional is what's under test
    vc = s.dofs.v_coords
    dpdx = -8.0 * nu * um / H**2
    u = np.zeros(s.dofs.n_total)
    u[: s.dofs.n_vs] = um * 4.0 * vc[:, 1] * (H - vc[:, 1]) / H**2
    pc = s.dofs.p_coords
    u[s.dofs.n_u :] = dpdx * (pc[:, 0] - L)
    if s.dofs.v_mask is not None:
        u[: s.dofs.n_vs] *= s.dofs.v_mask
    # bottom wall (tag 2): drag = mu * du/dy|_0 * L, MINUS the inlet-corner
    # term: the corner vertex dof's test function extends onto the first
    # inlet edge (length h) where (sigma.n_out)_x = +p, and the reaction is
    # the NEGATIVE boundary-traction sum (force BY fluid); the P2 vertex
    # function's edge integral is h/6.  (For a CLOSED boundary like the DFG
    # cylinder there are no such junction terms.)
    r = BoundaryReaction(s, tags=(2,))
    f = r.force(u)
    h = H / 8
    p_inlet = -dpdx * L  # p(x=0)
    f_exact_x = nu * 4.0 * um / H * L - p_inlet * h / 6
    assert abs(f[0] - f_exact_x) < 1e-12, f
    # wall-normal force = integral of p over the wall (pressure pushes DOWN
    # on the bottom wall -> force on wall is -y... reaction sign: force BY
    # fluid ON wall in -y has magnitude integral p dx)
    p_int = -dpdx * L**2 / 2  # integral of p(x) = dpdx*(x-L) over [0, L]
    assert abs(f[1] + p_int) < 1e-12, (f, p_int)
