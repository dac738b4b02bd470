"""Steady Stokes solver — the reference's initial-guess path made first-class.

The reference carries a complete Stokes pipeline (``assemble_stokes_system``
cpp:380-531, ``solve_stokes_system`` cpp:533-559 with GMRES tol 1e-6 and the
block-triangular preconditioner) whose call site is commented out
(cpp:636-644).  Per SURVEY §3.6 it is the only live wiring of the
sophisticated preconditioners, so here it is a standalone solver: steady
Stokes, and Stokes-as-initial-guess for Navier-Stokes.

Default boundary ids follow the reference's Stokes path (mesh-square tag set):
0 = inlet Dirichlet, 1 = outlet Neumann, 2/3 = walls (cpp:472,511,518-526).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig
from ..fem.assembly import assemble_stokes, build_context
from ..fem.bcs import DirichletBC, build_dirichlet
from ..fem.dofs import make_dofs
from ..fem.functions import InletVelocity, ZeroForcing
from ..la import operators as ops
from ..la.gmres import fgmres
from ..mesh.mesh import Mesh
from ..mesh.msh_io import read_msh
from ..utils.logging import RunLog

__all__ = ["StokesSolver"]


class StokesSolver:
    def __init__(
        self,
        mesh: Mesh | str,
        config: SolverConfig | None = None,
        log: RunLog | None = None,
        forcing=None,
        inlet=None,
        n_devices: int | None = None,
    ):
        if config is None:
            # reference Stokes-path defaults: mesh-square tags, tol 1e-6,
            # block-triangular preconditioner (cpp:472,511,538,546)
            config = SolverConfig(inlet_tags=(0,), neumann_tags=(1,), wall_tags=(2, 3))
            config.krylov.preconditioner = "block_triangular"
        self.cfg = cfg = config
        self.log = log or RunLog()
        self.mesh = read_msh(mesh) if isinstance(mesh, str) else mesh
        self.forcing = forcing or ZeroForcing()
        self.inlet = inlet or InletVelocity(
            u_m=cfg.inlet.u_m, H=cfg.inlet.H, freeze_time=cfg.inlet.freeze_time
        )
        self.n_devices = n_devices
        self._is_setup = False

    def setup(self):
        cfg = self.cfg
        if cfg.krylov.matvec == "windowed":
            # windowed (and SPMD) Stokes rides the NavierStokesSolver's
            # machinery: blocked renumbering, windowed Stokes operator,
            # halo-exchange sharding (stokes_initial_guess, cpp:533-559)
            from .navier_stokes import NavierStokesSolver

            self._ns = NavierStokesSolver(
                self.mesh, self.cfg, log=RunLog(verbose=False),
                forcing=self.forcing, inlet=self.inlet, n_devices=self.n_devices,
            )
            self._ns.setup()
            if self._ns._win_layout is not None:
                self.dofs = self._ns.dofs
                self._dtype = self._ns._dtype
                self.dirichlet = self._ns.dirichlet
                self._is_setup = True
                return self
            self._ns = None  # layout infeasible: fall through to flat
        else:
            self._ns = None
        self.dofs = make_dofs(self.mesh, cfg.degree_velocity, cfg.degree_pressure)
        self._dtype = {
            "auto": jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
            "float32": jnp.float32,
            "float64": jnp.float64,
        }[cfg.dtype]
        from .navier_stokes import _takes_time

        self._forcing_time_dep = _takes_time(self.forcing)
        self._forcing_t = 0.0
        self.ctx = build_context(
            self.dofs,
            neumann_tags=cfg.neumann_tags,
            forcing=(lambda pts: self.forcing(pts, 0.0))
            if self._forcing_time_dep
            else self.forcing,
            quadrature_degree=cfg.quadrature_degree,
            dtype=self._dtype,
        )
        specs = [
            DirichletBC(tags=tuple(cfg.inlet_tags), value=self.inlet),
            DirichletBC(tags=tuple(cfg.wall_tags)),
        ]
        self.dirichlet = build_dirichlet(self.dofs, specs)
        self._bc_rows = jnp.asarray(self.dirichlet.rows, dtype=jnp.int32)
        self._build_kernel()
        self._is_setup = True
        return self

    def _build_kernel(self):
        cfg, ctx = self.cfg, self.ctx
        n = self.dofs.n_total
        cell_dofs = ctx.cell_dofs
        bc_rows = self._bc_rows
        dim, nb_v = ctx.dim, ctx.nb_v
        nvl = dim * nb_v
        cell_pdofs = jnp.asarray(self.dofs.cell_pdofs, dtype=jnp.int32)
        bc_mask_u = np.asarray(self.dirichlet.rows) < self.dofs.n_u

        from ..la.preconditioners import block_diagonal, block_triangular, identity

        def solve_fn(ctx, bc_vals):
            cell_mat, cell_pmass, rhs = assemble_stokes(
                ctx, nu=cfg.nu, rho=cfg.rho, p_out=cfg.p_out
            )
            diag0 = ops.raw_diagonal(cell_mat, cell_dofs, n, ctx.axis_name, ctx.scatter_full)
            bc_diag = diag0[bc_rows]
            rhs = rhs.at[bc_rows].set(bc_diag * bc_vals)
            op = ops.ElementOperator(
                cell_mat=cell_mat,
                cell_dofs=cell_dofs,
                bc_rows=bc_rows,
                bc_diag=bc_diag,
                scatter_idx=ctx.scatter_full,
                n=n,
                axis_name=ctx.axis_name,
            )
            kind = cfg.krylov.preconditioner
            if kind == "identity":
                precond = identity()
            else:
                A00 = ops.velocity_block(
                    op, dim, nb_v, self.dofs.n_u, bc_mask=bc_mask_u,
                    scatter_idx=ctx.scatter_vel,
                )
                Mp = ops.pressure_mass_block(
                    cell_pmass, cell_pdofs, self.dofs.n_p, scatter_idx=ctx.scatter_p
                )
                if kind == "block_diagonal":
                    precond = block_diagonal(A00, Mp, inner_tol=cfg.krylov.inner_tol)
                else:
                    precond = block_triangular(
                        A00,
                        Mp,
                        cell_mat[:, nvl:, :nvl],
                        cell_dofs[:, :nvl],
                        cell_pdofs,
                        inner_tol=cfg.krylov.inner_tol,
                        inner_maxiter=cfg.krylov.inner_max_iters,
                        B_scatter_idx=ctx.scatter_p,
                    )
            # x0 satisfying the BCs so constrained rows are solved exactly
            x0 = jnp.zeros(n, dtype=rhs.dtype).at[bc_rows].set(bc_vals)
            sol = fgmres(
                lambda v: ops.matvec(op, v),
                rhs,
                x0=x0,
                atol=cfg.krylov.stokes_rel_tol * jnp.linalg.norm(rhs),  # cpp:538
                restart=cfg.krylov.restart,
                maxiter=cfg.krylov.max_iters,
                precond=precond,
            )
            return sol.x, sol.iters, sol.residual

        self._solve_fn = jax.jit(solve_fn)

    def _refresh_forcing(self, t: float):
        """Re-evaluate a time-dependent forcing at t and swap ctx.f_q
        (leaf swap; _solve_fn takes ctx as an argument, so no recompile)."""
        import dataclasses

        from ..fem.geometry import cell_geometry
        from ..fem.quadrature import gauss_simplex

        if not self._forcing_time_dep or t == self._forcing_t:
            return
        deg = self.cfg.quadrature_degree or (
            2 * (self.dofs.element.velocity.degree + 1) - 1
        )
        geo = cell_geometry(self.mesh, gauss_simplex(self.mesh.dim, deg))
        nc, nq, dim = geo.qpts.shape
        f_q = np.asarray(self.forcing(geo.qpts.reshape(-1, dim), t)).reshape(
            nc, nq, dim
        )
        self.ctx = dataclasses.replace(self.ctx, f_q=jnp.asarray(f_q, self._dtype))
        self._forcing_t = t

    def solve(self, t: float = 0.0):
        """Assemble + solve (cpp:533-559); returns the solution vector
        (PLANAR layout, also under windowed SPMD)."""
        if not self._is_setup:
            self.setup()
        if self._ns is not None:
            x = self._ns.stokes_initial_guess(t)
            self.solution = jnp.asarray(self._ns._planar(x), dtype=self._dtype)
            gm = [r for r in self._ns.log.records if r.get("event") == "gmres"]
            if gm:  # surface the delegate's iteration count
                self.log.gmres_iters(int(gm[-1]["iters"]), system="stokes")
            return self.solution
        self.log.banner()
        self.log.print("Assembling the Stokes system")
        self._refresh_forcing(t)
        bc_vals = jnp.asarray(self.dirichlet.values(t), dtype=self._dtype)
        x, iters, res = self._solve_fn(self.ctx, bc_vals)
        self.log.print("Solving the Stokes system")
        self.log.gmres_iters(int(iters), system="stokes")
        self.solution = x
        return x

    def velocity(self, real_only: bool = False) -> np.ndarray:
        s = np.asarray(self.solution)
        v = s[: self.dofs.n_u].reshape(self.dofs.dim, self.dofs.n_vs).T
        if real_only and self.dofs.v_mask is not None:
            v = v[self.dofs.v_mask]
        return v

    def pressure(self, real_only: bool = False) -> np.ndarray:
        p = np.asarray(self.solution)[self.dofs.n_u :]
        if real_only and self.dofs.p_mask is not None:
            p = p[self.dofs.p_mask]
        return p
