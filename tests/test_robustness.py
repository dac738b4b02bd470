"""Failure-surfacing and API-robustness behaviors (VERDICT r1 weak #4/#6,
ADVICE r1): Krylov non-convergence must be visible, configs must not be
mutated, checkpoints must carry layout metadata, hole dofs must be maskable."""

import copy

import numpy as np
import pytest

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.utils.logging import RunLog


def _stall_cfg(**kw):
    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
        nu=0.04, p_out=10.0, dt=0.05, T=0.05,
    )
    # unreachable Krylov tolerance within the iteration budget -> forced stall
    cfg.krylov.rel_tol = 1e-14
    cfg.krylov.max_iters = 2
    cfg.krylov.restart = 2
    cfg.newton.max_iters = 1
    for k, v in kw.items():
        setattr(cfg.krylov, k, v)
    return cfg


def test_krylov_failure_logged():
    cfg = _stall_cfg(on_failure="warn")
    log = RunLog(verbose=False)
    s = NavierStokesSolver(unit_square(3), cfg, log=log)
    s.solve()
    fails = [r for r in log.records if r.get("event") == "krylov_failure"]
    assert fails, "stalled tangent solve must produce a krylov_failure record"
    assert fails[0]["residual"] > 0


def test_krylov_failure_raises():
    cfg = _stall_cfg(on_failure="raise")
    s = NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False))
    with pytest.raises(RuntimeError, match="did not converge"):
        s.solve()


def test_krylov_failure_surfaced_on_forced_solve():
    """A newton.min_iters-FORCED tangent solve that stalls must surface the
    failure too: the res<=tol branch used to swallow kconv entirely."""
    cfg = _stall_cfg(on_failure="warn")
    cfg.newton.tol = 1e6  # residual is instantly 'converged'...
    cfg.newton.min_iters = 1  # ...but min_iters forces one solve anyway
    log = RunLog(verbose=False)
    s = NavierStokesSolver(unit_square(3), cfg, log=log)
    s.solve()
    fails = [r for r in log.records if r.get("event") == "krylov_failure"]
    assert fails, "forced stalled tangent solve must produce a krylov_failure record"

    cfg2 = _stall_cfg(on_failure="raise")
    cfg2.newton.tol = 1e6
    cfg2.newton.min_iters = 1
    s2 = NavierStokesSolver(unit_square(3), cfg2, log=RunLog(verbose=False))
    with pytest.raises(RuntimeError, match="did not converge"):
        s2.solve()


def test_cahouet_chabard_degrades_on_flat_path():
    """cahouet_chabard is built on the windowed sub-block kernels; on the
    flat path (explicit, or the windowed-infeasible auto fallback) it must
    degrade to block_triangular instead of raising at solve time."""
    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
        p_out=0.0, dt=0.05, T=0.05,
    )
    cfg.krylov.matvec = "flat"
    cfg.krylov.preconditioner = "cahouet_chabard"
    cfg.krylov.max_iters = 400
    cfg.newton.max_iters = 6
    s = NavierStokesSolver(unit_square(4), cfg, log=RunLog(verbose=False))
    s.setup()
    s.solve()
    assert np.isfinite(np.asarray(s.solution)).all()


def test_setup_does_not_mutate_config():
    """ADVICE r1: setup() used to write the resolved matvec back into cfg."""
    cfg = SolverConfig(inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3))
    cfg.krylov.matvec = "windowed"
    cfg.krylov.cells_per_block = 16
    before = copy.deepcopy(cfg.to_dict())
    s = NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False)).setup()
    assert cfg.to_dict() == before
    assert s._matvec in ("windowed", "flat")


def test_checkpoint_layout_mismatch_rejected(tmp_path):
    """ADVICE r1: restoring a checkpoint written under a different DoF
    numbering must fail loudly, not permute the field."""
    def make(matvec):
        cfg = SolverConfig(inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3), T=0.05)
        cfg.krylov.matvec = matvec
        cfg.krylov.cells_per_block = 16
        return NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False)).setup()

    s_win = make("windowed")
    path = str(tmp_path / "ck.h5")
    s_win.save_checkpoint(path, step=3)

    s_flat = make("flat")
    with pytest.raises(ValueError, match="layout mismatch|vector length"):
        s_flat.restore_checkpoint(path)

    # same-layout restore round-trips
    s_win2 = make("windowed")
    s_win2.restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(s_win2.solution), np.asarray(s_win.solution))


def test_real_dof_mask_filters_holes():
    cfg = SolverConfig(inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3))
    cfg.krylov.matvec = "windowed"
    cfg.krylov.cells_per_block = 16
    s = NavierStokesSolver(unit_square(4), cfg, log=RunLog(verbose=False)).setup()
    if s.dofs.v_mask is None:
        pytest.skip("windowed layout infeasible on this mesh")
    n_real = int(s.dofs.v_mask.sum())
    assert n_real < s.dofs.n_vs  # padding holes exist
    assert s.velocity(real_only=True).shape == (n_real, 2)
    assert s.velocity_coords(real_only=True).shape == (n_real, 2)
    # every real P2 support point appears exactly once
    pts = {tuple(np.round(c, 12)) for c in s.velocity_coords(real_only=True)}
    assert len(pts) == n_real


def test_a00_solver_gmres_windowed():
    """a00_solver='gmres' (convection-robust inner sweeps for the windowed
    Schur preconditioners) must produce a working tangent solve."""
    import jax.numpy as jnp

    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.mesh.generate import unit_square
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.utils.logging import RunLog

    for precond in ("cahouet_chabard", "block_triangular"):
        cfg = SolverConfig(
            T=0.05, dt=0.05, inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
            p_out=0.0,
        )
        cfg.krylov.matvec = "windowed"
        cfg.krylov.cells_per_block = 64
        cfg.krylov.preconditioner = precond
        cfg.krylov.a00_solver = "gmres"
        cfg.krylov.cc_iters_a00 = 3
        cfg.krylov.max_iters = 150
        cfg.newton.max_iters = 3
        s = NavierStokesSolver(unit_square(12), cfg, log=RunLog(verbose=False))
        s.setup()
        s.solve()
        assert bool(jnp.all(jnp.isfinite(s.solution)))
