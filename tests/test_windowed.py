"""Windowed (SFC-blocked) matvec: layout construction, reference math, and
the Pallas kernel (interpret mode) must all agree with the flat operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.fem.assembly import assemble_navier_stokes, build_context
from navier_stokes_tpu.fem.dofs import make_dofs, renumber_blocked, renumber_sfc
from navier_stokes_tpu.la import operators as ops
from navier_stokes_tpu.mesh.generate import unit_square
from navier_stokes_tpu.ops.windowed import (
    build_windowed_layout,
    to_block_form,
    windowed_gather,
    windowed_matvec,
    windowed_matvec_reference,
    windowed_scatter,
)
from navier_stokes_tpu.parallel.spmd import morton_order


@pytest.fixture(scope="module")
def setup():
    mesh = unit_square(6)
    dofs, block_info = renumber_blocked(make_dofs(mesh), cells_per_block=16)
    ctx = build_context(dofs, neumann_tags=(1,))
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal(dofs.n_total))
    u_old = jnp.asarray(rng.standard_normal(dofs.n_total))
    cell_mat, _, _ = assemble_navier_stokes(
        ctx, u, u_old, dt=0.1, nu=0.01, rho=1.0, p_out=2.0
    )
    lay = build_windowed_layout(
        dofs.cell_vdofs, dofs.cell_pdofs, dofs.n_vs, dofs.n_ps, mesh.dim,
        block_info=block_info,
    )
    x = jnp.asarray(rng.standard_normal(dofs.n_total))
    op = ops.ElementOperator(
        cell_mat=cell_mat,
        cell_dofs=ctx.cell_dofs,
        bc_rows=jnp.zeros((0,), jnp.int32),
        bc_diag=jnp.zeros((0,)),
        scatter_idx=None,
        n=dofs.n_total,
    )
    y_flat = np.asarray(ops.matvec(op, x))
    A_t = to_block_form(lay, cell_mat)
    return dofs, lay, cell_mat, A_t, x, y_flat


def test_layout_covers_every_contribution(setup):
    dofs, lay, cell_mat, A_t, x, y_flat = setup
    # every cell appears in exactly one block; padding is modest
    ids = np.asarray(lay.cell_ids)
    hi = np.asarray(lay.loc_v_hi)  # [nb, kpad, Bmax]
    valid = hi[:, 0, :] < lay.RVv  # sentinel slots carry hi == RVv
    assert sorted(ids[valid].tolist()) == list(range(dofs.mesh.n_cells))
    # Bmax is the per-block cell count rounded up to one lane-chunk: padding
    # beyond chunk-granularity rounding would mean misassigned home blocks
    per_block = valid.sum(axis=1).max()
    assert lay.Bmax - lay.Bc < per_block <= lay.Bmax


def test_reference_matches_flat(setup):
    dofs, lay, cell_mat, A_t, x, y_flat = setup
    y_win = np.asarray(windowed_matvec_reference(lay, A_t, x))
    np.testing.assert_allclose(y_win, y_flat, rtol=1e-10, atol=1e-10)


def test_gather_scatter_roundtrip(setup):
    """windowed_gather must return x at every cell dof; windowed_scatter of
    per-cell rows must equal the flat segment-sum (each cell counted once)."""
    dofs, lay, cell_mat, A_t, x, y_flat = setup
    X = np.asarray(windowed_gather(lay, x))  # [nli, ncd]
    ids = np.asarray(lay.cell_ids).reshape(-1)
    valid = (np.asarray(lay.loc_v_hi)[:, 0, :] < lay.RVv).reshape(-1)
    cd = np.concatenate(
        [dofs.cell_vdofs + c * dofs.n_vs for c in range(dofs.dim)]
        + [dofs.n_u + dofs.cell_pdofs],
        axis=1,
    )
    expect = np.asarray(x)[cd[ids]].T  # [nl, ncd]
    np.testing.assert_allclose(X[: lay.nl][:, valid], expect[:, valid], atol=1e-12)

    rng = np.random.default_rng(7)
    Rcell = rng.standard_normal((dofs.mesh.n_cells, lay.nl))
    R = np.zeros((lay.nli, lay.ncd))
    R[: lay.nl, valid] = Rcell[ids[valid]].T
    # duplicated slots carry the same rows; scatter keeps owned rows once
    y = np.asarray(windowed_scatter(lay, jnp.asarray(R)))
    y_expect = np.zeros(dofs.n_total)
    np.add.at(y_expect, cd.ravel(), Rcell.ravel())
    np.testing.assert_allclose(y, y_expect, atol=1e-10)


def test_pallas_interpret_matches_flat(setup):
    dofs, lay, cell_mat, A_t, x, y_flat = setup
    y = np.asarray(
        windowed_matvec(
            lay, jnp.asarray(A_t, jnp.float32), jnp.asarray(x, jnp.float32),
            interpret=True,
        )
    )
    np.testing.assert_allclose(y, y_flat, rtol=2e-4, atol=2e-4)


def test_solver_with_windowed_matvec():
    """Full NS solve with matvec='windowed' (CPU reference path) matches the
    flat-path solution field at matching support points."""
    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.utils.logging import RunLog

    def run(matvec):
        cfg = SolverConfig(
            inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
            nu=0.04, p_out=10.0, dt=0.05, T=0.1,
        )
        cfg.krylov.max_iters = 500
        cfg.krylov.matvec = matvec
        cfg.krylov.cells_per_block = 16
        s = NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False))
        s.solve()
        return {
            tuple(np.round(c, 10)): v
            for c, v in zip(s.dofs.v_coords, s.velocity())
            if np.any(v != 0) or True
        }, s

    f_flat, s_flat = run("flat")
    f_win, s_win = run("windowed")
    # compare only at REAL dofs (windowed layout pads with hole dofs at 0,0)
    real = {tuple(np.round(c, 10)) for c in s_flat.dofs.v_coords}
    err = max(np.max(np.abs(f_flat[k] - f_win[k])) for k in real)
    assert err < 1e-8


def test_solver_windowed_block_triangular():
    """Windowed matvec + the lumped-Schur preconditioner converges to the
    same solution as the flat path with identity preconditioning."""
    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.utils.logging import RunLog

    def run(matvec, precond):
        cfg = SolverConfig(
            inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
            nu=0.04, p_out=10.0, dt=0.05, T=0.1,
        )
        cfg.newton.tol = 1e-6
        cfg.krylov.rel_tol = 1e-6
        cfg.krylov.max_iters = 800
        cfg.krylov.matvec = matvec
        cfg.krylov.cells_per_block = 16
        cfg.krylov.preconditioner = precond
        s = NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False))
        s.solve()
        return {tuple(np.round(c, 10)): v for c, v in zip(s.dofs.v_coords, s.velocity())}, s

    f_ref, s_ref = run("flat", "identity")
    f_win, _ = run("windowed", "block_triangular")
    real = {tuple(np.round(c, 10)) for c in s_ref.dofs.v_coords}
    err = max(np.max(np.abs(f_ref[k] - f_win[k])) for k in real)
    # both converged to newton tol 1e-6 (absolute); solutions agree to the
    # solve level times a modest conditioning factor
    assert err < 1e-4


def test_renumbered_solution_equivalent():
    """Same physics under SFC renumbering: fields agree at matching coords."""
    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.utils.logging import RunLog

    cfg = SolverConfig(
        inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
        nu=0.04, p_out=10.0, dt=0.05, T=0.1,
    )
    cfg.krylov.max_iters = 500

    base = NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False))
    base.solve()

    # manual renumbered run
    ren = NavierStokesSolver(unit_square(3), cfg, log=RunLog(verbose=False))
    ren.mesh_order = None
    ren.setup()
    order = morton_order(ren.mesh.coords[ren.mesh.cells].mean(axis=1))
    ren.dofs = renumber_sfc(make_dofs(ren.mesh), order)
    from navier_stokes_tpu.fem.assembly import build_context as bc
    from navier_stokes_tpu.fem.bcs import DirichletBC, build_dirichlet

    ren.ctx = bc(ren.dofs, neumann_tags=cfg.neumann_tags, dtype=ren._dtype)
    specs = [DirichletBC(tags=tuple(cfg.inlet_tags), value=ren.inlet), DirichletBC(tags=tuple(cfg.wall_tags))]
    ren.dirichlet = build_dirichlet(ren.dofs, specs)
    ren._bc_rows = jnp.asarray(ren.dirichlet.rows, dtype=jnp.int32)
    ren.solution = jnp.zeros(ren.dofs.n_total, dtype=ren._dtype)
    ren.solution_old = ren.solution
    ren._build_kernels()
    ren.solve()

    # compare velocity fields at matched support points
    def field(s):
        return {tuple(np.round(c, 10)): v for c, v in zip(s.dofs.v_coords, s.velocity())}

    fb, fr = field(base), field(ren)
    err = max(np.max(np.abs(fb[k] - fr[k])) for k in fb)
    assert err < 1e-8


def test_bf16_operator_kernel_semantics(setup):
    """bf16-stored A (KrylovConfig.operator_dtype): the interpret-mode kernel
    must compute in x's dtype with A widened on read — i.e. match the
    reference einsum on the bf16-cast A tightly, and the f32 result to the
    bf16 rounding level."""
    dofs, lay, cell_mat, A_t, x, y_flat = setup
    A16 = jnp.asarray(A_t, jnp.bfloat16)
    x32 = jnp.asarray(x, jnp.float32)
    y = windowed_matvec(lay, A16, x32, interpret=True)
    assert y.dtype == jnp.float32  # compute dtype follows x, not A
    y_ref16 = windowed_matvec_reference(lay, A16, x32)
    scale = np.max(np.abs(y_flat))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref16), rtol=0, atol=3e-4 * scale
    )
    # vs the exact f32 operator: bf16 storage rounding only (~3e-3 relative)
    np.testing.assert_allclose(np.asarray(y), y_flat, rtol=0, atol=2e-2 * scale)


def test_operator_dtype_auto_solver():
    """operator_dtype='auto' engages bf16 A_t storage on the f32 path at the
    reference-parity rel_tol (1e-2) and leaves the Newton limit unchanged:
    the residual stays f32-exact, so both runs converge to the same root
    within the Newton tolerance."""
    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.utils.logging import RunLog

    def run(operator_dtype):
        cfg = SolverConfig(
            inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3),
            nu=0.04, p_out=10.0, dt=0.05, T=0.1,
        )
        cfg.dtype = "float32"
        cfg.newton.tol = 1e-5
        cfg.krylov.max_iters = 500
        cfg.krylov.matvec = "windowed"
        cfg.krylov.cells_per_block = 16
        cfg.krylov.operator_dtype = operator_dtype
        log = RunLog(verbose=False)
        s = NavierStokesSolver(unit_square(3), cfg, log=log)
        s.solve()
        final_res = [r["residual"] for r in log.records if r.get("event") == "newton"][-1]
        assert final_res < cfg.newton.tol
        return s

    s32 = run("float32")
    s16 = run("auto")  # f32 run at rel_tol 1e-2 -> bfloat16 engaged
    d = np.max(np.abs(np.asarray(s32.solution) - np.asarray(s16.solution)))
    scale = np.max(np.abs(np.asarray(s32.solution)))
    # both roots satisfy |r| < 1e-5; the solutions differ by the Newton
    # tolerance amplified by local conditioning, far below the bf16 level
    # that a perturbed LIMIT would show
    assert d < 1e-3 * scale
