"""SPMD domain decomposition correctness on a virtual 8-device CPU mesh.

The sharded solver must produce (numerically) the same trajectory as the
single-device solver — the analogue of checking mpirun -n 8 against -n 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.fem.assembly import assemble_navier_stokes, build_context
from navier_stokes_tpu.fem.dofs import make_dofs
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.parallel.spmd import (
    context_pspecs,
    device_mesh,
    morton_order,
    pad_and_shard_context,
    shard_map,
)
from navier_stokes_tpu.utils.logging import RunLog

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def square_cfg(**kw):
    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
        nu=0.04, rho=1.0, p_out=10.0, dt=0.05, T=0.1,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    # modest iteration caps: on the 1-core CI box every collective is a
    # thread rendezvous across all virtual devices — keep counts bounded
    cfg.krylov.max_iters = 400
    cfg.krylov.restart = 40
    cfg.krylov.inner_max_iters = 200
    return cfg


def test_sharded_assembly_matches_single_device():
    mesh = unit_square(3)
    dofs = make_dofs(mesh)
    ctx = build_context(dofs, neumann_tags=(1,))
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal(dofs.n_total))
    u_old = jnp.asarray(rng.standard_normal(dofs.n_total))
    kw = dict(dt=0.05, nu=0.04, rho=1.0, p_out=10.0)

    _, _, res_ref = assemble_navier_stokes(ctx, u, u_old, **kw)

    dm = device_mesh(8)
    centroids = mesh.coords[mesh.cells].mean(axis=1)
    sctx = pad_and_shard_context(ctx, dm, cell_order=morton_order(centroids))
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        lambda c, a, b: assemble_navier_stokes(c, a, b, **kw)[2],
        dm,
        in_specs=(context_pspecs(sctx), P(), P()),
        out_specs=P(),
    )
    res_sh = jax.jit(fn)(sctx, u, u_old)
    np.testing.assert_allclose(np.asarray(res_sh), np.asarray(res_ref), atol=1e-12)


def test_sharded_solver_matches_single_device():
    """Full Newton/implicit-Euler trajectories agree across 1 vs 2 devices.

    (2 devices, not 8: every Krylov iteration is an allreduce rendezvous
    across ALL virtual device threads on one CPU core — 8-way full solves
    starve XLA's 40 s collective timeout.  Assembly-level 8-way coverage is
    in test_sharded_assembly_matches_single_device.)"""
    sols = []
    for ndev in (None, 2):
        solver = NavierStokesSolver(
            unit_square(3), square_cfg(), log=RunLog(verbose=False), n_devices=ndev
        )
        sols.append(np.asarray(solver.solve()))
    np.testing.assert_allclose(sols[1], sols[0], atol=1e-8)


def test_sharded_with_block_preconditioner():
    cfg = square_cfg()
    cfg.krylov.preconditioner = "block_triangular"
    solver = NavierStokesSolver(
        unit_square(3), cfg, log=RunLog(verbose=False), n_devices=2
    )
    sol = np.asarray(solver.solve())
    assert np.all(np.isfinite(sol))

    ref = NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False))
    sol_ref = np.asarray(ref.solve())
    np.testing.assert_allclose(sol, sol_ref, atol=1e-6)


def test_flat_spmd_time_dep_forcing_and_stokes_guess():
    """Flat-SPMD composition (VERDICT r2 item 3): time-dependent forcing
    re-places the padded/sharded f_q, and the Stokes initial guess runs (the
    flat path replicates vectors, so the single-device Stokes solution is
    layout-identical)."""

    def forcing(pts, t):
        out = np.zeros_like(pts)
        out[:, 0] = t * pts[:, 1]
        return out

    def run(n_devices):
        cfg = square_cfg(T=0.1)
        cfg.initial_guess = "stokes"
        cfg.krylov.matvec = "flat"
        cfg.krylov.preconditioner = "block_triangular"
        s = NavierStokesSolver(
            unit_square(4), cfg, log=RunLog(verbose=False),
            n_devices=n_devices, forcing=forcing,
        )
        s.solve()
        assert s._matvec == "flat" and s._forcing_time_dep
        return np.asarray(s._planar(s.solution))

    u1 = run(None)
    u2 = run(4)
    np.testing.assert_allclose(u1, u2, rtol=0, atol=1e-8)
