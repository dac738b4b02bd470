"""Unsteady incompressible Navier-Stokes solver: implicit Euler + Newton + FGMRES.

TPU-native re-design of the reference ``NavierStokesSolver``
(``/root/reference/src/NavierStokesSolver.{hpp,cpp}``) — same capability
surface, idiomatic JAX/XLA execution:

  * setup()        <-> cpp:3-176   (mesh/FE/DoF/linear-system init + log lines)
  * solve()        <-> cpp:629-679 (time loop; host-side scalar loop, 20 steps)
  * solve_newton() <-> cpp:590-627 (Newton loop; host loop for parity logging)
  * one Newton iteration = ONE jitted device program: batched assembly,
    Dirichlet row fixes, residual norm, and a lax.cond-guarded FGMRES solve
    (the reference's assemble -> check -> maybe-solve control flow,
    cpp:599-626, with the tangent solve of cpp:561-588 inlined).

Dirichlet semantics match ``apply_boundary_values(..., false)`` (cpp:375-376):
constrained rows are replaced by ``diag * x`` with the PRE-constraint assembled
diagonal, rhs rows get ``diag * value``, so GMRES reproduces delta = value at
constrained DoFs (with the as-shipped zero-inlet quirk, value = 0 always).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig
from ..fem.assembly import assemble_navier_stokes, build_context
from ..fem.bcs import DirichletBC, build_dirichlet
from ..fem.dofs import make_dofs
from ..fem.functions import InletVelocity, ZeroForcing
from ..la import operators as ops
from ..la.gmres import fgmres
from ..la.preconditioners import block_diagonal, block_triangular, identity
from ..mesh.mesh import Mesh
from ..mesh.msh_io import read_msh
from ..utils.logging import RunLog

_PREC_HI = jax.lax.Precision.HIGHEST

__all__ = ["NavierStokesSolver"]


def _takes_time(forcing) -> bool:
    """True if the forcing callable is f(x, t) (time-dependent) rather than
    f(x).  Bound __call__ signatures exclude self, so dataclass functions
    like ZeroForcing count their real positional params.

    Callables whose signature cannot be inspected or is ambiguous (builtins,
    ``*args``) raise instead of silently guessing — pass
    ``forcing_time_dependent=`` explicitly for those (a wrong silent guess
    would freeze a time-dependent forcing at t=0, ADVICE r3/minor r4).
    """
    import inspect

    try:
        # signature() on the object itself resolves functools.partial and
        # plain functions correctly; only fall back to __call__ for class
        # instances (where signature() would see self-excluded params anyway)
        try:
            sig = inspect.signature(forcing)
        except (TypeError, ValueError):
            sig = inspect.signature(forcing.__call__)
    except (TypeError, ValueError, AttributeError) as e:
        raise TypeError(
            f"cannot infer whether forcing {forcing!r} takes a time "
            "argument (uninspectable signature); pass "
            "forcing_time_dependent=True/False explicitly"
        ) from e
    params = list(sig.parameters.values())
    if any(p.kind == p.VAR_POSITIONAL for p in params):
        raise TypeError(
            f"forcing {forcing!r} has a *args signature — ambiguous arity; "
            "pass forcing_time_dependent=True/False explicitly"
        )
    positional = [
        p
        for p in params
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]
    return len(positional) >= 2


class NavierStokesSolver:
    def __init__(
        self,
        mesh: Mesh | str,
        config: SolverConfig | None = None,
        log: RunLog | None = None,
        forcing=None,
        inlet=None,
        n_devices: int | None = None,
        forcing_time_dependent: bool | None = None,
    ):
        """n_devices: shard cells over this many devices (SPMD domain
        decomposition, the reference's mpirun -n N); None = single device.

        forcing_time_dependent: explicitly declare whether ``forcing`` is
        f(x, t) (True) or f(x) (False).  None (default) infers it from the
        callable's signature (_takes_time) — pass the flag when the callable
        is wrapped/dynamic and signature inspection would misread it."""
        self.cfg = config or SolverConfig()
        self.log = log or RunLog()
        self.mesh = read_msh(mesh) if isinstance(mesh, str) else mesh
        self.n_devices = n_devices
        self.spmd_mesh = None
        self.forcing = forcing or ZeroForcing()
        self._forcing_time_dep_override = forcing_time_dependent
        self.inlet = inlet or InletVelocity(
            u_m=self.cfg.inlet.u_m, H=self.cfg.inlet.H, freeze_time=self.cfg.inlet.freeze_time
        )
        self.time = 0.0
        self._is_setup = False
        self.output_hooks = []  # callables (step, t, solution_np)
        from ..utils.timers import PhaseTimers

        self.timers = PhaseTimers()  # observability the reference lacks (SURVEY §5)

    # ------------------------------------------------------------------
    def setup(self):
        """Build DoFs, device context, BC structure, jitted kernels (cpp:3-176)."""
        cfg, log = self.cfg, self.log
        log.print("Initializing the mesh")
        log.print(f"  Number of elements = {self.mesh.n_cells}")
        log.rule()

        log.print("Initializing the finite element space")
        if cfg.time_scheme not in ("bdf1", "bdf2"):
            raise ValueError(f"unknown time_scheme {cfg.time_scheme!r}")
        # the tangent's time-term step: BDF2's mass coefficient is 3/(2 dt)
        # = 1/(dt/1.5); the windowed A_const is prebuilt with it
        self._dt_tangent = cfg.dt / 1.5 if cfg.time_scheme == "bdf2" else cfg.dt
        self.dofs = make_dofs(self.mesh, cfg.degree_velocity, cfg.degree_pressure)
        self._win_layout = None
        self._wassembly = None
        # resolved operator mode lives on the solver, NOT written back into
        # the caller's config (a shared config must stay reusable)
        self._matvec = cfg.krylov.matvec
        self._dist = None  # windowed-SPMD distributed-vector layout
        n_dev = self.n_devices or 1
        if self._matvec == "windowed":
            from ..fem.dofs import renumber_blocked
            from ..ops.windowed import build_windowed_layout

            base_dofs = self.dofs
            cpb = cfg.krylov.cells_per_block
            # The kernels prefetch ONE row of the per-block offset tables per
            # grid step (ops/windowed: per-row SMEM windows), so block count
            # no longer hits the 1 MB SMEM budget — the former <=2048-block
            # cap (which still crashed the compiler at >1000 blocks once two
            # tables were counted) is gone.  A generous backstop remains for
            # pathological cells_per_block settings.
            while -(-self.mesh.n_cells // cpb) > 16384:
                cpb *= 2
            if cpb != cfg.krylov.cells_per_block:
                log.print(
                    f"  cells_per_block {cfg.krylov.cells_per_block} -> {cpb} "
                    "(block-count backstop: <=16384 blocks)"
                )
            for attempt in range(4):
                try:
                    dofs_r, block_info = renumber_blocked(
                        base_dofs, cells_per_block=cpb, nb_multiple=n_dev
                    )
                    lay = build_windowed_layout(
                        dofs_r.cell_vdofs,
                        dofs_r.cell_pdofs,
                        dofs_r.n_vs,
                        dofs_r.n_ps,
                        self.mesh.dim,
                        block_info=block_info,
                        Bc=cfg.krylov.chunk_cells,
                    )
                    if n_dev > 1:
                        from ..parallel.windowed_spmd import make_dist_layout

                        self._dist = make_dist_layout(lay, n_dev)
                    self._win_layout = lay
                    self.dofs = dofs_r
                    break
                except ValueError:
                    cpb *= 2  # halo too wide (or too few blocks/device)
            if self._win_layout is None:
                log.print("  (windowed layout infeasible for this mesh: flat path)")
                self._matvec = "flat"
            else:
                log.print(
                    f"  Windowed operator: {self._win_layout.nb} blocks "
                    f"(cells/block {cpb}), pad {self._win_layout.pad_factor:.2f}"
                    + (f", {self._dist.nb_loc} blocks/device" if self._dist else "")
                )
        # per-cell ownership: the reference writes this as the per-cell
        # "partitioning" output field every step (cpp:702-705)
        self.cell_owner = np.zeros(self.mesh.n_cells, dtype=np.int32)
        if self._dist is not None:
            lay = self._win_layout
            ids = np.asarray(lay.cell_ids)  # [nb, Bmax], pad slots repeat ids
            valid = np.asarray(lay.loc_p_hi)[:, 0, :] < lay.RVp
            block_of = np.empty(self.mesh.n_cells, dtype=np.int64)
            bidx = np.broadcast_to(
                np.arange(lay.nb)[:, None], ids.shape
            )
            block_of[ids[valid]] = bidx[valid]
            self.cell_owner = (block_of // self._dist.nb_loc).astype(np.int32)

        elem = self.dofs.element
        log.print(f"  Velocity degree:           = {cfg.degree_velocity}")
        log.print(f"  Pressure degree:           = {cfg.degree_pressure}")
        log.print(f"  DoFs per cell              = {elem.dofs_per_cell}")
        log.rule()

        log.print("Initializing the DoF handler")
        log.print("  Number of DoFs: ")
        log.print(f"    velocity = {self.dofs.n_u}")
        log.print(f"    pressure = {self.dofs.n_p}")
        log.print(f"    total    = {self.dofs.n_total}")
        log.rule()

        log.print("  Initializing the linear system")
        self._dtype = {
            "auto": jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
            "float32": jnp.float32,
            "float64": jnp.float64,
        }[cfg.dtype]
        self._forcing_time_dep = (
            self._forcing_time_dep_override
            if self._forcing_time_dep_override is not None
            else _takes_time(self.forcing)
        )
        self.ctx = build_context(
            self.dofs,
            neumann_tags=cfg.neumann_tags,
            forcing=(lambda pts: self.forcing(pts, 0.0))
            if self._forcing_time_dep
            else self.forcing,
            quadrature_degree=cfg.quadrature_degree,
            dtype=self._dtype,
        )
        if self.n_devices is not None and self.n_devices > 1 and self._dist is None:
            # flat-path domain decomposition (replicated vectors, round-1 design)
            from ..parallel.spmd import device_mesh, morton_order, pad_and_shard_context

            self.spmd_mesh = device_mesh(self.n_devices)
            centroids = self.mesh.coords[self.mesh.cells].mean(axis=1)
            order = morton_order(centroids)
            self._cell_order = order  # natural -> padded/sharded cell order
            self.ctx = pad_and_shard_context(self.ctx, self.spmd_mesh, cell_order=order)
            # real per-cell ownership for the output writer (cpp:702-705):
            # contiguous morton chunks of padded cells per device
            nc_pad = self.ctx.cell_dofs.shape[0]
            owner = np.arange(nc_pad) // (nc_pad // self.n_devices)
            self.cell_owner = np.empty(self.mesh.n_cells, dtype=np.int32)
            self.cell_owner[order] = owner[: self.mesh.n_cells]
            log.print(
                f"  Domain decomposition: {self.n_devices} devices, "
                f"{self.ctx.cell_dofs.shape[0]} padded cells"
            )
        if self._win_layout is not None:
            from ..fem.windowed_assembly import build_windowed_assembly

            # bf16 tangent store (single-chip capacity mode for large 3D
            # problems): halves A_const AND the per-iteration A_t it emits;
            # f32-path only (KrylovConfig.tangent_store_dtype)
            if cfg.krylov.tangent_store_dtype not in ("float32", "bfloat16"):
                raise ValueError(
                    "krylov.tangent_store_dtype must be 'float32' or "
                    f"'bfloat16', got {cfg.krylov.tangent_store_dtype!r}"
                )
            if (
                cfg.krylov.tangent_store_dtype == "bfloat16"
                and cfg.krylov.operator_dtype == "float32"
                and self._dtype == jnp.float32
            ):
                log.print(
                    "  note: operator_dtype='float32' is ineffective with a "
                    "bfloat16 tangent store (the operator streams the bf16 "
                    "store); set tangent_store_dtype='float32' for an exact "
                    "outer operator"
                )
            store = (
                jnp.bfloat16
                if (
                    cfg.krylov.tangent_store_dtype == "bfloat16"
                    and self._dtype == jnp.float32
                )
                else None
            )
            self._wassembly = build_windowed_assembly(
                self.ctx,
                self._win_layout,
                self.dofs,
                dt=self._dt_tangent,
                nu=cfg.nu,
                rho=cfg.rho,
                p_out=cfg.p_out,
                store_dtype=store,
                jacobian_mass_rho=cfg.jacobian_mass_rho,
                pin_pdofs=self.dofs.boundary_scalar_pdofs(cfg.neumann_tags),
                coarse_agg=cfg.krylov.cc_coarse_agg,
                coarse_agg_v=cfg.krylov.cc_coarse_agg_v,
                pin_vdofs=self.dofs.boundary_scalar_vdofs(
                    tuple(cfg.inlet_tags) + tuple(cfg.wall_tags)
                ),
                coarse_cond_cap=cfg.krylov.cc_coarse_cond_cap,
                kp_deflate=cfg.krylov.kp_deflate,
                kp_deflate_min_amp=cfg.krylov.kp_deflate_min_amp,
            )
            if self._wassembly.kp_modes is not None:
                self.log.print(
                    f"  Kp deflation: {self._wassembly.kp_modes.shape[0]} "
                    "near-null mode(s) augment every FGMRES cycle"
                )

        # Dirichlet: inlet first, walls override on shared DoFs (cpp:354-373)
        specs = [
            DirichletBC(tags=tuple(cfg.inlet_tags), value=self.inlet),
            DirichletBC(tags=tuple(cfg.wall_tags)),
        ]
        self.dirichlet = build_dirichlet(self.dofs, specs)
        self._bc_rows = jnp.asarray(self.dirichlet.rows, dtype=jnp.int32)

        if self._dist is not None:
            # owned-range windowed SPMD: blocks sharded contiguously, state
            # vectors in the device-major distributed layout, O(halo)
            # ppermute exchanges inside the kernels (parallel/windowed_spmd)
            from ..parallel import windowed_spmd as wspmd
            from ..parallel.spmd import device_mesh

            dl = self._dist
            self.spmd_mesh = device_mesh(dl.n_dev, axis=wspmd.AXIS)
            self._lay_sharded = wspmd.shard_layout(self._win_layout, dl, self.spmd_mesh)
            self._wa_sharded = wspmd.shard_wa(self._wassembly, dl, self.spmd_mesh)
            rows_planar = np.asarray(self.dirichlet.rows, dtype=np.int64)
            self._bc_local, self._bc_dev, self._bc_slot = wspmd.localize_rows(
                rows_planar, dl
            )
            log.print(
                f"  Domain decomposition: {dl.n_dev} devices x "
                f"{dl.nb_loc} blocks, halo {max(self._win_layout.hv, self._win_layout.hp)}"
            )

        self.solution = jnp.zeros(self.dofs.n_total, dtype=self._dtype)
        if self._dist is not None:
            # state vectors live block-sharded from step 0: at capacity scale
            # no device ever holds a full-length vector (the owned/ghost
            # split of hpp:785-794)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import windowed_spmd as wspmd

            self.solution = jax.device_put(
                self.solution, NamedSharding(self.spmd_mesh, P(wspmd.AXIS))
            )
        self.solution_old = self.solution
        self._build_kernels()
        self._is_setup = True
        return self

    # ------------------------------------------------------------------
    def _make_preconditioner(self, ctx, op, cell_pmass):
        """Assemble the configured preconditioner from device operators."""
        cfg = self.cfg
        kind = cfg.krylov.preconditioner
        if kind == "cahouet_chabard":
            # the CC Schur sweep is built ON the windowed sub-block kernels;
            # on the flat path (explicit, or the windowed-infeasible auto
            # fallback) degrade to the nearest flat Schur preconditioner
            # instead of failing the run
            self.log.print(
                "  (cahouet_chabard requires the windowed operator: "
                "using block_triangular on the flat path)"
            )
            kind = "block_triangular"
        if kind == "identity":
            return identity()
        dim, nb_v, nb_p = ctx.dim, ctx.nb_v, ctx.nb_p
        nvl = dim * nb_v
        A00 = ops.velocity_block(
            op,
            dim,
            nb_v,
            self.dofs.n_u,
            bc_mask=np.asarray(self.dirichlet.rows) < self.dofs.n_u,
            scatter_idx=ctx.scatter_vel,
        )
        # pressure-space cell dofs, robust to sharding padding (padded cells
        # carry cell_dofs == 0 -> clamp to pressure dof 0; zero-valued adds)
        cell_pdofs = jnp.maximum(ctx.cell_dofs[:, -nb_p:] - self.dofs.n_u, 0)
        Mp = ops.pressure_mass_block(
            cell_pmass, cell_pdofs, self.dofs.n_p,
            axis_name=ctx.axis_name, scatter_idx=ctx.scatter_p,
        )
        if kind == "block_diagonal":
            return block_diagonal(
                A00,
                Mp,
                inner_tol=cfg.krylov.inner_tol,
                inner_maxiter=min(cfg.krylov.inner_max_iters, 1000),
            )
        if kind == "block_triangular":
            return block_triangular(
                A00,
                Mp,
                op.cell_mat[:, nvl:, :nvl],
                op.cell_dofs[:, :nvl],
                cell_pdofs,
                inner_tol=cfg.krylov.inner_tol,
                inner_maxiter=cfg.krylov.inner_max_iters,
                B_scatter_idx=ctx.scatter_p,
            )
        raise ValueError(f"unknown preconditioner {kind!r}")

    def _make_windowed_preconditioner(
        self, lay, A_t, wa, bc_diag, diag0, bc_rows, axis_name=None,
        mass_coef=None, kind=None, a00_solver=None,
    ):
        """Schur preconditioners built ON the windowed operator.

        block_diagonal / block_triangular mirror the reference classes
        (hpp:520-639) with the LUMPED pressure-mass inverse as the Schur
        surrogate.  cahouet_chabard is the framework's own flagship: with
        implicit Euler the tangent's A00 is mass-dominated, so the true Schur
        complement is ~ (dt/rho) * pressure Laplacian — the CC formula
        S^-1 ~ nu*rho*Mp^-1 + mass_coef*Kp^-1 preconditions it with a few
        Jacobi-CG Poisson sweeps on the CHEAP p->p block kernel
        (ops/windowed.windowed_matvec_block), cutting outer FGMRES
        iterations ~6x vs identity (scripts/schur_probe.py).

        With axis_name set (windowed SPMD), all vectors here are per-device
        chunks of the distributed layout: the planar velocity slice is the
        LOCAL [dim*nvs_loc) prefix, bc_rows are local (sentinel-padded), and
        inner-CG reductions psum.
        """
        cfg = self.cfg
        kind = kind or cfg.krylov.preconditioner
        a00_solver = a00_solver or cfg.krylov.a00_solver
        if kind == "identity":
            return identity()
        from ..la.cg import cg
        from ..la.gmres import _norm
        from ..la.preconditioners import (
            coarse_correction, jacobi, two_level_vcycle)
        from ..ops.windowed import slice_block, windowed_matvec, windowed_matvec_block

        n = lay.dim * lay.n_vs + lay.n_ps  # local length under SPMD
        n_u = lay.dim * lay.n_vs
        # preconditioner matvecs run at reduced precision (default pure bf16):
        # M only steers FGMRES, the outer operator keeps matvec_passes.
        # The sliced blocks are also STORED bf16 (precond_block_dtype) — the
        # A00 stream per inner CG iteration is the dominant HBM traffic of
        # the whole outer iteration; halving it is the roofline lever
        # (VERDICT r2 #2).  The kernel widens rows to f32 in VMEM.
        passes = cfg.krylov.precond_passes
        bdt = (
            jnp.bfloat16
            if (
                cfg.krylov.precond_block_dtype == "bfloat16"
                and A_t.dtype == jnp.float32
            )
            else A_t.dtype
        )
        inv_mp = wa.inv_mp

        # Jacobi diagonal of A00 with symmetric-BC replacement (sentinel
        # rows drop; bc rows are all velocity rows by construction), plus the
        # two-level velocity coarse correction when built (cc_coarse_agg_v):
        # a fixed dofs-per-aggregate coarse space keeps the A00 sweep's
        # contraction h-independent, which keeps the OUTER FGMRES count flat
        # as the mesh refines (VERDICT r2 #1)
        diag_u = diag0[:n_u]
        if bc_rows.shape[0]:
            diag_u = diag_u.at[bc_rows].set(bc_diag, mode="drop")
        pA = jacobi(diag_u)
        coarse_v = None
        if wa.coarse_inv_v is not None:
            jac_u = pA
            coarse_v = coarse_correction(
                wa.agg_v, wa.coarse_inv_v, wa.coarse_agg_size_v,
                ncomp=lay.dim, axis_name=axis_name,
            )
            pA = lambda r: jac_u(r) + coarse_v(r)

        if kind == "cahouet_chabard":
            A00_blk = slice_block(lay, A_t, "v", "v").astype(bdt)
            B_blk = slice_block(lay, A_t, "v", "p").astype(bdt)
            Kp_blk = wa.Kp_t.astype(bdt)

            def A00_mv(v):
                if bc_rows.shape[0]:
                    v = v.at[bc_rows].set(0.0, mode="drop")  # BC columns
                y = windowed_matvec_block(
                    lay, A00_blk, v, in_spaces="v", out_spaces="v",
                    passes=passes, axis_name=axis_name,
                )
                return y

            def A00_bc(v):  # SPD-consistent (symmetric BC elimination)
                y = A00_mv(v)
                if bc_rows.shape[0]:
                    vb = v.at[bc_rows].get(mode="fill", fill_value=0.0)
                    y = y.at[bc_rows].set(bc_diag * vb, mode="drop")
                return y

            def Kp_mv(p):
                return windowed_matvec_block(
                    lay, Kp_blk, p, in_spaces="p", out_spaces="p",
                    passes=passes, axis_name=axis_name,
                )

            # multiplicative V(1,1) composition of the A00 sweep's smoother
            # + coarse correction (KrylovConfig.cc_cycle_a00): two extra
            # bf16 A00 matvecs per application for a per-CG-iteration
            # contraction that stays flat as the mesh refines
            if coarse_v is not None and cfg.krylov.cc_cycle_a00 == "vcycle":
                pA = two_level_vcycle(
                    A00_bc, diag_u, coarse_v, omega=cfg.krylov.cc_vcycle_omega
                )

            pKp = jacobi(wa.diag_kp)
            if wa.coarse_inv is not None:
                # two-level: M^-1 = D^-1 + Z Kc^-1 Zt (SPD additive coarse
                # correction; KrylovConfig.cc_coarse_agg).  The [m] restriction
                # is global — one tiny psum under SPMD — and holes route to the
                # dropped sentinel segment m.  Shared reshape-based apply:
                # la/preconditioners.coarse_correction.
                jac_kp = pKp
                coarse_p = coarse_correction(
                    wa.agg_p, wa.coarse_inv, wa.coarse_agg_size,
                    ncomp=1, axis_name=axis_name,
                )
                pKp = lambda r: jac_kp(r) + coarse_p(r)
                if cfg.krylov.cc_cycle_ap == "vcycle":
                    pKp = two_level_vcycle(
                        Kp_mv, wa.diag_kp, coarse_p,
                        omega=cfg.krylov.cc_vcycle_omega,
                    )
            if mass_coef is None:
                # time-stepping tangent: A00 ~ coef/dt_tangent * M => S^-1's
                # Laplacian term carries the same coefficient (BDF2 folds its
                # 3/2 into _dt_tangent).  Steady Stokes passes 0.0 (pure
                # pressure-mass Schur), cpp:546-552.
                mass_coef = (
                    cfg.rho if cfg.jacobian_mass_rho else 1.0
                ) / self._dt_tangent

            if a00_solver == "gmres":
                # convection-robust inner sweep: at large dt (steady-ish
                # tangents) A00 is convection-dominated and NONSYMMETRIC —
                # fixed-iteration CG on it returns garbage directions that
                # stagnate the outer solve (measured: identity beat CC 340x
                # vs 13x per 300 outer iterations on DFG 2D-1 at dt=2).
                # A few Jacobi-FGMRES iterations cost the same matvecs and
                # stay valid for any dt.
                def a00_sweep(vu):
                    return fgmres(
                        A00_bc, vu, atol=0.0,
                        restart=cfg.krylov.cc_iters_a00,
                        maxiter=cfg.krylov.cc_iters_a00,
                        precond=pA, axis_name=axis_name,
                    ).x
            else:  # "cg": mass-dominated tangents (small dt), cheapest

                def a00_sweep(vu):
                    return cg(
                        A00_bc, vu, atol=0.0, maxiter=cfg.krylov.cc_iters_a00,
                        precond=pA, axis_name=axis_name,
                    ).x

            def apply(v):
                vu, vp = v[:n_u], v[n_u:]
                du = a00_sweep(vu)
                B_du = windowed_matvec_block(
                    lay, B_blk, du, in_spaces="v", out_spaces="p",
                    passes=passes, axis_name=axis_name,
                )
                rp = vp - B_du
                dp = cfg.rho * inv_mp * rp
                if mass_coef:
                    dp_lap = cg(
                        Kp_mv, rp, atol=0.0, maxiter=cfg.krylov.cc_iters_ap,
                        precond=pKp, axis_name=axis_name,
                    ).x
                    dp = dp + mass_coef * dp_lap
                return jnp.concatenate([du, dp])

            return apply

        def apply_full(xu, zero_bc):
            x = jnp.zeros(n, dtype=xu.dtype).at[:n_u].set(xu)
            if zero_bc and bc_rows.shape[0]:
                x = x.at[bc_rows].set(0.0, mode="drop")
            return windowed_matvec(lay, A_t, x, passes=passes, axis_name=axis_name)

        def A00_mv(v):  # SPD-consistent (symmetric BC elimination)
            y = apply_full(v, zero_bc=True)[:n_u]
            if bc_rows.shape[0]:
                vb = v.at[bc_rows].get(mode="fill", fill_value=0.0)
                y = y.at[bc_rows].set(bc_diag * vb, mode="drop")
            return y

        inner_maxiter = min(cfg.krylov.inner_max_iters, 60)

        if a00_solver == "gmres":
            # convection-robust inner sweep (see KrylovConfig.a00_solver):
            # the CG sweep below on a convection-dominated NONSYMMETRIC A00
            # emits divergent directions that stagnate the outer FGMRES
            def a00_solve(vu):
                return fgmres(
                    A00_mv, vu,
                    atol=cfg.krylov.inner_tol * _norm(vu, axis_name),
                    restart=min(inner_maxiter, 30), maxiter=inner_maxiter,
                    precond=pA, axis_name=axis_name,
                ).x
        else:  # "cg": reference parity (hpp:598)

            def a00_solve(vu):
                return cg(
                    A00_mv, vu,
                    atol=cfg.krylov.inner_tol * _norm(vu, axis_name),
                    maxiter=inner_maxiter, precond=pA, axis_name=axis_name,
                ).x

        def apply(v):
            vu, vp = v[:n_u], v[n_u:]
            du = a00_solve(vu)
            if kind == "block_diagonal":
                dp = inv_mp * vp
            else:  # block_triangular Schur sweep (hpp:594-619)
                B_du = apply_full(du, zero_bc=False)[n_u:]
                dp = inv_mp * (vp - B_du)
            return jnp.concatenate([du, dp])

        return apply

    def _build_kernels(self):
        cfg = self.cfg
        n = self.dofs.n_total

        def newton_iteration(
            ctx, wa, lay, u, u_old, bc_rows, bc_vals, dt_res,
            force_solve=False, axis_name=None,
        ):
            # ctx / wa / lay are pytree ARGUMENTS (not closures): their
            # multi-hundred-MB arrays must be runtime parameters, not
            # constants baked into the compiled program.  Under windowed SPMD
            # (axis_name set) every vector here is the device's local chunk,
            # bc_rows/bc_vals are local sentinel-padded arrays, and the only
            # collectives are the O(halo) ppermutes + dot psums.
            #
            # dt_res (traced scalar): the RESIDUAL's time-term step.  BDF1:
            # cfg.dt always.  BDF2: cfg.dt/1.5 with u_old = (4u^n - u^{n-1})/3
            # gives exactly rho/(2 dt) (3u - 4u^n + u^{n-1}); its FIRST step
            # passes cfg.dt + u^0 (an exact BDF1 residual under the BDF2
            # tangent - quasi-Newton with an unchanged root).
            from ..la.gmres import _norm

            if lay is not None:
                # blocked assembly: constant terms precomputed, solution
                # fields via the windowed gather kernel, residual via the
                # windowed scatter — no flat [nc, nl, nl] buffer exists
                from ..fem.windowed_assembly import assemble_windowed

                A_t, residual, diag0 = assemble_windowed(
                    wa,
                    lay,
                    u,
                    u_old,
                    dt=dt_res,
                    nu=cfg.nu,
                    rho=cfg.rho,
                    convection_form=cfg.convection_form,
                    include_continuity_residual=cfg.include_continuity_residual,
                    axis_name=axis_name,
                )
            else:
                cell_mat, cell_pmass, residual = assemble_navier_stokes(
                    ctx,
                    u,
                    u_old,
                    dt=dt_res,
                    nu=cfg.nu,
                    rho=cfg.rho,
                    p_out=cfg.p_out,
                    convection_form=cfg.convection_form,
                    include_continuity_residual=cfg.include_continuity_residual,
                    jacobian_mass_rho=cfg.jacobian_mass_rho,
                )
                diag0 = ops.raw_diagonal(
                    cell_mat, ctx.cell_dofs, n, ctx.axis_name, ctx.scatter_full
                )
            bc_diag = diag0.at[bc_rows].get(mode="fill", fill_value=1.0)
            if cfg.dirichlet_mode == "increment":
                bc_target = bc_vals - u.at[bc_rows].get(mode="fill", fill_value=0.0)
            else:  # "reference": delta = g verbatim (cpp:375-376)
                bc_target = bc_vals
            residual = residual.at[bc_rows].set(bc_diag * bc_target, mode="drop")
            res_norm = _norm(residual, axis_name)
            if lay is not None:
                from ..ops.windowed import windowed_matvec

                # KrylovConfig.operator_dtype: bf16-stored outer operator on
                # the f32 reference-parity path (rel_tol >= 5e-3) — one cast
                # pass here buys halved A_t traffic on every Krylov matvec;
                # the preconditioner below keeps the f32 A_t source and
                # narrows its own blocks (precond_block_dtype)
                od = cfg.krylov.operator_dtype
                if od == "auto":
                    od = (
                        "bfloat16"
                        if A_t.dtype == jnp.float32
                        and cfg.krylov.rel_tol >= 5e-3
                        else "float32"
                    )
                A_op = (
                    A_t.astype(jnp.bfloat16)
                    if od == "bfloat16" and A_t.dtype == jnp.float32
                    else A_t
                )

                def apply_op(v):
                    y = windowed_matvec(
                        lay, A_op, v, passes=cfg.krylov.matvec_passes,
                        axis_name=axis_name,
                    )
                    if bc_rows.shape[0]:
                        vb = v.at[bc_rows].get(mode="fill", fill_value=0.0)
                        y = y.at[bc_rows].set(bc_diag * vb, mode="drop")
                    return y

                precond = self._make_windowed_preconditioner(
                    lay, A_t, wa, bc_diag, diag0, bc_rows, axis_name
                )
            else:
                op = ops.ElementOperator(
                    cell_mat=cell_mat,
                    cell_dofs=ctx.cell_dofs,
                    bc_rows=bc_rows,
                    bc_diag=bc_diag,
                    scatter_idx=ctx.scatter_full,
                    n=n,
                    axis_name=ctx.axis_name,
                )

                def apply_op(v):
                    return ops.matvec(op, v)

                precond = self._make_preconditioner(ctx, op, cell_pmass)

            def do_solve(_):
                sol = fgmres(
                    apply_op,
                    residual,
                    atol=cfg.krylov.rel_tol * res_norm,
                    restart=cfg.krylov.restart,
                    maxiter=cfg.krylov.max_iters,
                    precond=precond,
                    axis_name=axis_name,
                    # near-null Kp modes forced into every cycle (None when
                    # the mesh is well pinned; KrylovConfig.kp_deflate).
                    # CC-preconditioned solves only: the identity/block
                    # parity preconditioners never produced the stall the
                    # augmentation exists for, and the reference-parity
                    # iteration counts are a comparison signal.
                    deflate=(
                        wa.kp_modes
                        if (lay is not None and wa is not None
                            and cfg.krylov.preconditioner == "cahouet_chabard")
                        else None
                    ),
                )
                return (
                    u + cfg.newton.damping * sol.x,
                    sol.iters,
                    sol.converged,
                    sol.residual,
                )

            def skip(_):
                return u, jnp.int32(0), jnp.bool_(True), jnp.zeros((), residual.dtype)

            u_new, iters, kconv, kres = jax.lax.cond(
                jnp.logical_or(force_solve, res_norm > cfg.newton.tol),
                do_solve, skip, None,
            )
            return u_new, res_norm, iters, kconv, kres

        bc_rows = self._bc_rows
        if self._dist is not None:
            # owned-range windowed SPMD: the whole Newton iteration runs
            # inside ONE shard_map over the block axis
            from jax.sharding import PartitionSpec as P

            from ..parallel import windowed_spmd as wspmd
            from ..parallel.spmd import shard_map

            lay_s = self._lay_sharded
            bcl = jnp.asarray(self._bc_local)  # [n_dev, m] local rows
            sh = P(wspmd.AXIS)
            wrapped = shard_map(
                lambda wa, lay, u, uo, br, bv, dtr, fs: newton_iteration(
                    None, wa, lay, u, uo, br[0], bv[0], dtr, fs,
                    axis_name=wspmd.AXIS,
                ),
                self.spmd_mesh,
                in_specs=(
                    wspmd.wa_pspecs(self._wa_sharded), wspmd.layout_pspecs(lay_s),
                    sh, sh, sh, sh, P(), P(),
                ),
                out_specs=(sh, P(), P(), P(), P()),
            )
            # wa is read from self at CALL time (not baked at build time) so
            # time-dependent forcing's r_const leaf swap takes effect
            self.newton_iteration_fn = lambda u, uo, bv: wrapped(
                self._wa_sharded, lay_s, u, uo, bcl, bv,
                jnp.asarray(cfg.dt, self._dtype), jnp.asarray(False),
            )
            jitted = jax.jit(wrapped, donate_argnums=(2,))
            self._newton_iteration = lambda u, uo, bv, dtr, fs: jitted(
                self._wa_sharded, lay_s, u, uo, bcl, bv, dtr, fs
            )
        elif self.spmd_mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import context_pspecs, shard_map

            wrapped = shard_map(
                lambda ctx, u, uo, bv, dtr, fs: newton_iteration(
                    ctx, None, None, u, uo, bc_rows, bv, dtr, fs
                ),
                self.spmd_mesh,
                in_specs=(context_pspecs(self.ctx), P(), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P(), P()),
            )
            # ctx read from self at CALL time: forcing updates swap ctx.f_q
            self.newton_iteration_fn = lambda u, uo, bv: wrapped(
                self.ctx, u, uo, bv, jnp.asarray(cfg.dt, self._dtype),
                jnp.asarray(False),
            )
            jitted = jax.jit(wrapped, donate_argnums=(1,))
            self._newton_iteration = lambda u, uo, bv, dtr, fs: jitted(
                self.ctx, u, uo, bv, dtr, fs
            )
        else:
            jitted = jax.jit(newton_iteration, donate_argnums=(3,), static_argnames=("axis_name",))
            self._newton_iteration = lambda u, uo, bv, dtr=None, fs=False: jitted(
                self.ctx, self._wassembly, self._win_layout, u, uo, bc_rows, bv,
                jnp.asarray(cfg.dt if dtr is None else dtr, self._dtype),
                jnp.asarray(fs),
            )
            # newton_iteration_fn: un-donated jittable variant for external
            # callers that reuse their arrays (compile checks, benchmarking)
            self.newton_iteration_fn = lambda u, uo, bv: newton_iteration(
                self.ctx, self._wassembly, self._win_layout, u, uo, bc_rows, bv,
                jnp.asarray(cfg.dt, self._dtype),
            )
        # raw body for the device-resident scanned time loop (solve_scanned)
        self._newton_body = newton_iteration

    # ------------------------------------------------------------------
    def stokes_initial_guess(self, t: float | None = None):
        """Solve steady Stokes on THIS solver's DoF layout (the reference's
        designed-but-commented initial-guess path, cpp:636-644; the solve is
        cpp:533-559: GMRES tol 1e-6 with the block preconditioner).

        Returns the solution vector in the solver's state layout (planar, or
        device-major distributed under windowed SPMD).
        """
        cfg, log = self.cfg, self.log
        t = self.time if t is None else t
        log.banner()
        log.print("Assembling the Stokes system")
        if self._win_layout is None:
            # flat path: StokesSolver shares the natural dof numbering (flat
            # SPMD permutes/pads CELLS only and replicates vectors, so the
            # single-device Stokes solution is layout-identical)
            import copy as _copy

            from .stokes import StokesSolver

            st = StokesSolver(
                self.mesh, _copy.deepcopy(cfg), log=RunLog(verbose=False),
                forcing=self.forcing, inlet=self.inlet,
            )
            x = st.solve(t)
            log.print("Solving the Stokes system")
            log.gmres_iters(
                int([r for r in st.log.records if r.get("event") == "gmres"][-1]["iters"]),
                system="stokes",
            )
            return jnp.asarray(x, dtype=self._dtype)

        from ..fem.windowed_assembly import build_windowed_assembly
        from ..la.gmres import _norm
        from ..ops.windowed import windowed_matvec, windowed_scatter

        wa_st = build_windowed_assembly(
            self.ctx, self._win_layout, self.dofs,
            dt=1.0, nu=cfg.nu, rho=cfg.rho, p_out=cfg.p_out, terms="stokes",
            pin_pdofs=self.dofs.boundary_scalar_pdofs(cfg.neumann_tags),
            kp_deflate=cfg.krylov.kp_deflate,
            kp_deflate_min_amp=cfg.krylov.kp_deflate_min_amp,
        )

        def stokes_solve(wa, lay, bc_rows, bc_vals, axis_name=None):
            A_t = wa.A_const  # the Stokes operator is u-independent
            nl = lay.nl
            d_loc = A_t[jnp.arange(nl), jnp.arange(nl), :]
            Dv = jnp.zeros((lay.nli, lay.ncd), dtype=A_t.dtype).at[:nl].set(d_loc)
            diag0 = windowed_scatter(lay, Dv, axis_name=axis_name)
            bc_diag = diag0.at[bc_rows].get(mode="fill", fill_value=1.0)
            rhs = wa.r_const.at[bc_rows].set(bc_diag * bc_vals, mode="drop")

            def apply_op(v):
                y = windowed_matvec(
                    lay, A_t, v, passes=cfg.krylov.matvec_passes, axis_name=axis_name
                )
                vb = v.at[bc_rows].get(mode="fill", fill_value=0.0)
                return y.at[bc_rows].set(bc_diag * vb, mode="drop")

            # the reference's designed Stokes path wires
            # PreconditionBlockTriangular with REAL inner solves
            # (cpp:546-552); CC's fixed micro-sweeps on the pure-viscous A00
            # are far too weak for the 1e-6 Stokes tolerance
            precond = self._make_windowed_preconditioner(
                lay, A_t, wa, bc_diag, diag0, bc_rows, axis_name,
                kind="block_triangular"
                if cfg.krylov.preconditioner in ("identity", "cahouet_chabard")
                else None,
            )
            x0 = jnp.zeros_like(rhs).at[bc_rows].set(bc_vals, mode="drop")
            sol = fgmres(
                apply_op, rhs, x0=x0,
                atol=cfg.krylov.stokes_rel_tol * _norm(rhs, axis_name),  # cpp:538
                restart=cfg.krylov.restart,
                maxiter=cfg.krylov.max_iters,
                precond=precond,
                axis_name=axis_name,
                deflate=(
                    wa.kp_modes
                    if cfg.krylov.preconditioner == "cahouet_chabard" else None
                ),
            )
            return sol.x, sol.iters, sol.residual

        vals = np.asarray(self.dirichlet.values(t))
        if self._dist is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel import windowed_spmd as wspmd
            from ..parallel.spmd import shard_map

            wa_s = wspmd.shard_wa(wa_st, self._dist, self.spmd_mesh)
            vals = wspmd.localize_values(
                vals, self._bc_dev, self._bc_slot,
                self._dist.n_dev, self._bc_local.shape[1],
            )
            sh = P(wspmd.AXIS)
            fn = shard_map(
                lambda wa, lay, br, bv: stokes_solve(
                    wa, lay, br[0], bv[0], axis_name=wspmd.AXIS
                ),
                self.spmd_mesh,
                in_specs=(wspmd.wa_pspecs(wa_s), wspmd.layout_pspecs(self._lay_sharded), sh, sh),
                out_specs=(sh, P(), P()),
            )
            x, iters, res = jax.jit(fn)(
                wa_s, self._lay_sharded, jnp.asarray(self._bc_local),
                jnp.asarray(vals, dtype=self._dtype),
            )
        else:
            x, iters, res = jax.jit(stokes_solve)(
                wa_st, self._win_layout, self._bc_rows,
                jnp.asarray(vals, dtype=self._dtype),
            )
        log.print("Solving the Stokes system")
        log.gmres_iters(int(iters), system="stokes")
        return x

    # ------------------------------------------------------------------
    def solve_steady(
        self,
        *,
        tol: float = 1e-8,
        max_iters: int = 10,
        damping: float = 1.0,
        line_search: bool = True,
        initial_guess: str = "stokes",
        tangent_solver: str = "fgmres",
    ):
        """First-class STEADY Navier-Stokes solve.

        The reference's legacy variant (``hpp:1-368`` declares the steady
        class; ``cpp:811-833`` is its ``run_newton_loop``): Newton on the
        steady residual (no mass term) starting from the Stokes solution,
        stopping on the RELATIVE-UPDATE criterion
        ``||u_new - u_prev|| / n_dofs <= tol`` (cpp:823-825; legacy defaults
        TOL=1e-8, MAX_ITER=10).  Framework extensions over the legacy loop:
        optional damping and backtracking line search on the residual norm
        (the damped variants the reference comments out at cpp:615-617), and
        the tangent's A00 inner sweeps forced to FGMRES — the steady tangent
        is convection-dominated and NONSYMMETRIC, where fixed-iteration CG
        returns divergent directions (KrylovConfig.a00_solver).

        The Schur preconditioner runs with mass_coef=0 (pure pressure-mass
        surrogate): without the time term the Schur complement is spectrally
        equivalent to Mp/nu, not to the Cahouet-Chabard Laplacian sum.

        tangent_solver: "fgmres" (default, device Krylov) or "lu" — an EXACT
        sparse-direct tangent solve on host (scipy SuperLU), the analogue of
        deal.II's SparseDirectUMFPACK in the reference's stack.  "lu" is the
        PARITY/VERIFICATION path (single device, intended with
        cfg.dtype="float64"): it removes ALL linear-solver error, which the
        1e-6 Cd/Cl north-star comparison requires — the restarted Krylov
        stalls near rel ~1e-4 on the weakly-pinned DFG channel in any
        precision (measured; neither restart=2000 nor near-null-mode
        deflation moves the floor), which caps Newton residuals far above
        the parity target.

        Returns (n_iters, update_norm).  Requires the windowed operator.
        """
        if not self._is_setup:
            self.setup()
        cfg, log = self.cfg, self.log
        if self._win_layout is None:
            raise NotImplementedError(
                "solve_steady requires the windowed operator "
                "(cfg.krylov.matvec='windowed')"
            )
        from ..fem.windowed_assembly import assemble_windowed, build_windowed_assembly
        from ..la.gmres import _norm
        from ..ops.windowed import windowed_matvec

        wa_sd = build_windowed_assembly(
            self.ctx, self._win_layout, self.dofs,
            dt=1.0, nu=cfg.nu, rho=cfg.rho, p_out=cfg.p_out,
            terms="stokes",  # constant tangent part without the mass block
            pin_pdofs=self.dofs.boundary_scalar_pdofs(cfg.neumann_tags),
            coarse_agg=cfg.krylov.cc_coarse_agg,
            coarse_agg_v=cfg.krylov.cc_coarse_agg_v,
            pin_vdofs=self.dofs.boundary_scalar_vdofs(
                tuple(cfg.inlet_tags) + tuple(cfg.wall_tags)
            ),
            coarse_cond_cap=cfg.krylov.cc_coarse_cond_cap,
            kp_deflate=cfg.krylov.kp_deflate,
            kp_deflate_min_amp=cfg.krylov.kp_deflate_min_amp,
        )

        def steady_iteration(wa, lay, u, bc_rows, bc_vals, axis_name=None):
            A_t, residual, diag0 = assemble_windowed(
                wa, lay, u, u, dt=1.0, nu=cfg.nu, rho=cfg.rho,
                convection_form=cfg.convection_form,
                include_continuity_residual=cfg.include_continuity_residual,
                include_time_term=False, axis_name=axis_name,
            )
            bc_diag = diag0.at[bc_rows].get(mode="fill", fill_value=1.0)
            bc_target = bc_vals - u.at[bc_rows].get(mode="fill", fill_value=0.0)
            residual = residual.at[bc_rows].set(bc_diag * bc_target, mode="drop")
            res_norm = _norm(residual, axis_name)

            def apply_op(v):
                y = windowed_matvec(
                    lay, A_t, v, passes=cfg.krylov.matvec_passes,
                    axis_name=axis_name,
                )
                if bc_rows.shape[0]:
                    vb = v.at[bc_rows].get(mode="fill", fill_value=0.0)
                    y = y.at[bc_rows].set(bc_diag * vb, mode="drop")
                return y

            precond = self._make_windowed_preconditioner(
                lay, A_t, wa, bc_diag, diag0, bc_rows, axis_name,
                mass_coef=0.0, a00_solver="gmres",
            )
            sol = fgmres(
                apply_op, residual,
                atol=cfg.krylov.rel_tol * res_norm,
                restart=cfg.krylov.restart,
                maxiter=cfg.krylov.max_iters,
                precond=precond,
                axis_name=axis_name,
                deflate=(
                    wa.kp_modes
                    if cfg.krylov.preconditioner == "cahouet_chabard" else None
                ),
            )
            return sol.x, bc_diag, res_norm, sol.iters, sol.converged, sol.residual

        _ALPHAS = (1.0, 0.5, 0.25, 0.125)

        def trial_norms(wa, lay, u, delta, bc_rows, bc_vals, bc_diag, axis_name=None):
            # residual norms along the backtracking ladder; the tangent
            # blocks are unused outputs, so XLA dead-code-eliminates them —
            # each trial costs ~the residual part of one assembly
            norms = []
            for a in _ALPHAS:
                ut = u + (a * damping) * delta
                _, r, _ = assemble_windowed(
                    wa, lay, ut, ut, dt=1.0, nu=cfg.nu, rho=cfg.rho,
                    convection_form=cfg.convection_form,
                    include_continuity_residual=cfg.include_continuity_residual,
                    include_time_term=False, axis_name=axis_name,
                )
                tgt = bc_vals - ut.at[bc_rows].get(mode="fill", fill_value=0.0)
                r = r.at[bc_rows].set(bc_diag * tgt, mode="drop")
                norms.append(_norm(r, axis_name))
            return jnp.stack(norms)

        if self._dist is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel import windowed_spmd as wspmd
            from ..parallel.spmd import shard_map

            wa_s = wspmd.shard_wa(wa_sd, self._dist, self.spmd_mesh)
            lay_s = self._lay_sharded
            bcl = jnp.asarray(self._bc_local)
            sh = P(wspmd.AXIS)
            it_fn = jax.jit(shard_map(
                lambda wa, lay, u, br, bv: steady_iteration(
                    wa, lay, u, br[0], bv[0], axis_name=wspmd.AXIS
                ),
                self.spmd_mesh,
                in_specs=(wspmd.wa_pspecs(wa_s), wspmd.layout_pspecs(lay_s),
                          sh, sh, sh),
                out_specs=(sh, P(), P(), P(), P(), P()),
            ))
            ls_fn = jax.jit(shard_map(
                lambda wa, lay, u, d, br, bv, bd: trial_norms(
                    wa, lay, u, d, br[0], bv[0], bd, axis_name=wspmd.AXIS
                ),
                self.spmd_mesh,
                in_specs=(wspmd.wa_pspecs(wa_s), wspmd.layout_pspecs(lay_s),
                          sh, sh, sh, sh, P()),
                out_specs=P(),
            ))
            vals = wspmd.localize_values(
                np.asarray(self.dirichlet.values(self.time)),
                self._bc_dev, self._bc_slot,
                self._dist.n_dev, self._bc_local.shape[1],
            )
            bc_vals = jnp.asarray(vals, dtype=self._dtype)

            def do_iter(u):
                return it_fn(wa_s, lay_s, u, bcl, bc_vals)

            def do_ls(u, d, bd):
                return ls_fn(wa_s, lay_s, u, d, bcl, bc_vals, bd)

        else:
            lay = self._win_layout
            bc_rows = self._bc_rows
            bc_vals = jnp.asarray(
                self.dirichlet.values(self.time), dtype=self._dtype
            )
            it_fn = jax.jit(steady_iteration, static_argnames=("axis_name",))
            ls_fn = jax.jit(trial_norms, static_argnames=("axis_name",))

            def do_iter(u):
                return it_fn(wa_sd, lay, u, bc_rows, bc_vals)

            def do_ls(u, d, bd):
                return ls_fn(wa_sd, lay, u, d, bc_rows, bc_vals, bd)

            if tangent_solver == "lu":
                do_iter = self._steady_lu_iteration(bc_rows, bc_vals)

        if tangent_solver == "lu" and self._dist is not None:
            raise NotImplementedError("tangent_solver='lu' is single-device")

        log.banner()
        if initial_guess == "stokes":
            u = jnp.asarray(self.stokes_initial_guess(self.time), self._dtype)
        else:  # "current": continuation from the solver's state
            u = self.solution
        n_scale = float(self.dofs.n_total)
        upd = tol + 1.0
        it = 0
        while it == 0 or (upd > tol and it < max_iters):  # cpp:820
            delta, bc_diag, res_norm, kiters, kconv, kres = do_iter(u)
            log.print("Assembling the system")
            log.gmres_iters(int(kiters))
            if not bool(kconv):
                log.krylov_failure(int(kiters), float(kres))
                if cfg.krylov.on_failure == "raise":
                    raise RuntimeError(
                        f"steady tangent solve did not converge: residual "
                        f"{float(kres):.6e} after {int(kiters)} iterations"
                    )
            alpha = damping
            if line_search:
                norms = np.asarray(do_ls(u, delta, bc_diag))
                r0 = float(res_norm)
                # largest step with sufficient decrease; fall back to the
                # best trial (classic backtracking on ||r||)
                ok = norms <= (1.0 - 1e-4 * np.asarray(_ALPHAS)) * r0
                pick = int(np.argmax(ok)) if ok.any() else int(np.argmin(norms))
                alpha = _ALPHAS[pick] * damping
            u = u + alpha * delta
            # the device-major distributed layout is a permutation of the
            # planar vector, so one norm covers both paths
            upd = float(alpha) * float(jnp.linalg.norm(delta)) / n_scale
            it += 1
            log.print(f"Residual = {upd:.6f}")  # cpp:829 legacy format
            log.records.append({
                "event": "steady_newton", "iter": it, "update": upd,
                "res_norm": float(res_norm), "gmres_iters": int(kiters),
                "alpha": float(alpha),
            })
        if it >= max_iters and upd > tol:
            log.print("WARNING: Newton's method failed to converge\n")  # cpp:831
        self.solution = u
        self.solution_old = u.copy()
        return it, upd

    # ------------------------------------------------------------------
    def _steady_lu_iteration(self, bc_rows, bc_vals):
        """One exact steady-Newton iteration via host sparse LU (SuperLU).

        The steady tangent is assembled on the flat path with u_old = u and
        dt = 1e30: the residual's time term vanishes IDENTICALLY (u - u_old
        = 0) and the Jacobian's mass perturbation is ~1e-30 relative — the
        steady system to f64 roundoff.  Dirichlet rows are eliminated with
        the pre-constraint diagonal, matching apply_boundary_values(...,
        false) semantics (cpp:349-377).  See solve_steady(tangent_solver).
        """
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        cfg = self.cfg
        ctx = self.ctx
        nl = ctx.cell_dofs.shape[1]
        cd = np.asarray(ctx.cell_dofs, np.int64)
        ii = np.broadcast_to(cd[:, :, None], (cd.shape[0], nl, nl))
        jj = np.broadcast_to(cd[:, None, :], (cd.shape[0], nl, nl))
        # bc_rows is in SPEC order (inlet first, wall entries overriding
        # shared DoFs later) and bc_vals/bc_diag index it in that order — a
        # boolean mask would silently re-sort and scramble inlet values onto
        # wrong rows, which converges to clean-but-WRONG physics (measured:
        # Cd 0.30 instead of 5.56)
        br = np.asarray(bc_rows, np.int64)
        rows_mask = np.zeros(self.dofs.n_total, dtype=bool)
        rows_mask[br] = True
        bc_vals_np = np.asarray(bc_vals, np.float64)
        # blocked-renumbered dof vectors carry PADDING holes (real-dof masks):
        # their rows/cols are identically zero, which makes the assembled
        # matrix structurally singular for a direct factorization — give them
        # unit diagonals (their residual is zero, so delta stays zero there)
        real = np.ones(self.dofs.n_total, dtype=bool)
        if self.dofs.v_mask is not None:
            vm = np.asarray(self.dofs.v_mask, bool)
            for a in range(self.dofs.dim):
                real[a * self.dofs.n_vs : (a + 1) * self.dofs.n_vs] = vm
        if self.dofs.p_mask is not None:
            real[self.dofs.n_u :] = np.asarray(self.dofs.p_mask, bool)
        hole_diag = sp.diags((~real).astype(np.float64))

        def do_iter(u):
            from ..fem.assembly import assemble_navier_stokes

            cell_mat, _, residual = assemble_navier_stokes(
                ctx, u, u, dt=1e30, nu=cfg.nu, rho=cfg.rho, p_out=cfg.p_out,
                convection_form=cfg.convection_form,
                include_continuity_residual=cfg.include_continuity_residual,
                jacobian_mass_rho=cfg.jacobian_mass_rho,
            )
            cm = np.asarray(cell_mat, np.float64)
            r = np.array(residual, np.float64)  # writable copy
            A = sp.coo_matrix(
                (cm.ravel(), (ii.ravel(), jj.ravel())),
                shape=(self.dofs.n_total,) * 2,
            ).tocsr()
            diag0 = np.asarray(A.diagonal())
            bc_diag = np.where(diag0[br] != 0.0, diag0[br], 1.0)  # spec order
            # row elimination, unsymmetric (apply_boundary_values semantics)
            un = np.asarray(u, np.float64)
            keep = sp.diags((~rows_mask).astype(np.float64))
            A = keep @ A + sp.diags(
                np.where(rows_mask, np.where(diag0 != 0.0, diag0, 1.0), 0.0)
            ) + hole_diag
            r[br] = bc_diag * (bc_vals_np - un[br])  # later entries override
            r[~real] = 0.0
            res_norm = float(np.linalg.norm(r))
            delta = spla.splu(A.tocsc()).solve(r)
            return (
                jnp.asarray(delta, self._dtype),
                jnp.asarray(bc_diag, self._dtype),
                res_norm,
                1,
                True,
                0.0,
            )

        return do_iter

    # ------------------------------------------------------------------
    def solve_newton(self):
        """Newton loop with parity logging (cpp:590-627)."""
        cfg, log = self.cfg, self.log
        # residual time-term: BDF1 always; BDF2 once two history levels exist
        u_old_arg = self.solution_old
        dt_res = cfg.dt
        if cfg.time_scheme == "bdf2" and getattr(self, "solution_old2", None) is not None:
            u_old_arg = (4.0 * self.solution_old - self.solution_old2) / 3.0
            dt_res = cfg.dt / 1.5
        vals = np.asarray(self.dirichlet.values(self.time))
        if self._dist is not None:
            from ..parallel.windowed_spmd import localize_values

            vals = localize_values(
                vals, self._bc_dev, self._bc_slot,
                self._dist.n_dev, self._bc_local.shape[1],
            )
        bc_vals = jnp.asarray(vals, dtype=self._dtype)
        n_iter, res_norm = 0, cfg.newton.tol + 1
        while n_iter < cfg.newton.max_iters and (
            res_norm > cfg.newton.tol or n_iter < cfg.newton.min_iters
        ):
            log.banner()
            log.print("Assembling the system")
            forced = n_iter < cfg.newton.min_iters
            with self.timers("newton_iteration"):
                self.solution, rn, gmres_iters, kconv, kres = self._newton_iteration(
                    self.solution, u_old_arg, bc_vals, dt_res, forced,
                )
                res_norm = float(rn)  # host sync inside the timed region
            log.banner()
            log.newton_residual(n_iter, cfg.newton.max_iters, res_norm)
            # a solve happened if the residual was above tol OR min_iters
            # forced one: surface tangent-solve failure in BOTH cases —
            # deal.II's SolverControl throws NoConvergence (cpp:566-585)
            if res_norm > cfg.newton.tol or forced:
                log.print("Solving system...")
                log.gmres_iters(int(gmres_iters))
                if not bool(kconv):
                    log.krylov_failure(int(gmres_iters), float(kres))
                    if cfg.krylov.on_failure == "raise":
                        raise RuntimeError(
                            f"GMRES tangent solve did not converge: residual "
                            f"{float(kres):.6e} after {int(gmres_iters)} iterations "
                            f"(deal.II SolverControl::NoConvergence equivalent)"
                        )
                log.print("System solved!")
            if res_norm <= cfg.newton.tol:
                log.newton_converged()
            n_iter += 1
        return n_iter, res_norm

    # ------------------------------------------------------------------
    def _layout_meta(self) -> dict:
        """Layout identifiers stored in checkpoints: a checkpoint written
        under one DoF numbering (flat vs windowed, different block size) must
        not silently restore into another with a coincidentally equal length."""
        lay = self._win_layout
        return {
            "n_total": int(self.dofs.n_total),
            "n_vs": int(self.dofs.n_vs),
            "n_ps": int(self.dofs.n_ps),
            "matvec": self._matvec,
            "blocks": None if lay is None else [lay.nb, lay.OWv, lay.OWp],
            "mesh_cells": int(self.mesh.n_cells),
        }

    def _planar(self, x) -> np.ndarray:
        """State vector in the PLANAR layout (identity unless windowed SPMD,
        whose state lives in the device-major distributed layout)."""
        x = np.asarray(jax.device_get(x))
        if self._dist is not None:
            from ..parallel.windowed_spmd import from_dist

            x = from_dist(x, self._dist)
        return x

    def save_checkpoint(self, path, step: int | None = None):
        """Full restart state (solution, previous step, time) — capability the
        reference lacks (SURVEY §5: its HDF5 output is visualization-only)."""
        from ..io.checkpoint import save_checkpoint

        old2 = getattr(self, "solution_old2", None)
        return save_checkpoint(
            path,
            solution=np.asarray(self._planar(self.solution), np.float64),
            solution_old=np.asarray(self._planar(self.solution_old), np.float64),
            solution_old2=(
                None if old2 is None
                else np.asarray(self._planar(old2), np.float64)
            ),
            time=self.time,
            step=step if step is not None else getattr(self, "_step", 0),
            config={"solver": self.cfg.to_dict(), "layout": self._layout_meta()},
        )

    def restore_checkpoint(self, path):
        from ..io.checkpoint import load_checkpoint

        if not self._is_setup:
            self.setup()
        d = load_checkpoint(path)
        meta = d.get("config", {}).get("layout")
        if meta is not None and meta != self._layout_meta():
            mine = self._layout_meta()
            diff = {k: (meta.get(k), mine.get(k)) for k in mine if meta.get(k) != mine.get(k)}
            raise ValueError(
                f"checkpoint layout mismatch (stored vs current): {diff} — "
                "restoring would silently permute the solution field"
            )
        if len(d["solution"]) != self.dofs.n_total:
            raise ValueError(
                f"checkpoint vector length {len(d['solution'])} != solver "
                f"n_total {self.dofs.n_total}"
            )
        sol, sol_old = d["solution"], d["solution_old"]
        sol_old2 = d.get("solution_old2")
        if self._dist is not None:
            from ..parallel.windowed_spmd import to_dist

            sol, sol_old = to_dist(sol, self._dist), to_dist(sol_old, self._dist)
            if sol_old2 is not None:
                sol_old2 = to_dist(sol_old2, self._dist)
        self.solution = jnp.asarray(sol, dtype=self._dtype)
        self.solution_old = jnp.asarray(sol_old, dtype=self._dtype)
        # BDF2 second history level: restored when present so a resumed run
        # continues second-order without a BDF1 bootstrap step
        self.solution_old2 = (
            None if sol_old2 is None else jnp.asarray(sol_old2, dtype=self._dtype)
        )
        self.time = d["time"]
        self._step = d["step"]
        return self

    # ------------------------------------------------------------------
    def solve(self, resume: bool = False):
        """Implicit-Euler time loop (cpp:629-679).

        resume=True continues from the current (restored) state instead of
        re-applying the zero initial condition.
        """
        if not self._is_setup:
            self.setup()
        cfg, log = self.cfg, self.log
        log.banner()

        if not resume:
            self.time = 0.0
            self._step = 0
            if cfg.initial_guess == "stokes":
                # designed reference path (cpp:636-644): start from Stokes
                self.solution = jnp.asarray(
                    self.stokes_initial_guess(0.0), dtype=self._dtype
                )
            else:
                log.print("Applying the initial condition")
                self.solution = jnp.zeros(self.dofs.n_total, dtype=self._dtype)
            self._output(0, 0.0)
            log.rule()

        step = getattr(self, "_step", 0)
        while self.time < cfg.T - 0.5 * cfg.dt:
            self.time += cfg.dt
            step += 1
            self._step = step
            # copy (not alias): the Newton kernel donates `solution`, and a
            # donated buffer must not also be passed as solution_old
            self.solution_old2 = self.solution_old if step > 1 else None
            self.solution_old = self.solution.copy()
            log.time_step(step, self.time)
            if self._forcing_time_dep:
                # implicit Euler: the residual lives at the NEW time level
                self._update_forcing(self.time)
            self.solve_newton()
            self._output(step, self.time)
            log.print()
        return self.solution

    def solve_scanned(
        self,
        *,
        functional=None,
        functional_args: str = "u",
        reaction_tags=None,
        chunk: int = 100,
        newton_iters: int = 3,
        resume: bool = False,
        progress=None,
        progress_takes_diagnostics: bool | None = None,
    ):
        """Device-resident time loop: ``lax.scan`` over time steps.

        The reference's host time loop (cpp:629-679) costs several
        host<->device round trips per step (BC values up, residual norms and
        functionals down).  On TPU the natural shape is a scanned loop: the
        whole Dirichlet schedule is precomputed host-side and shipped once
        per chunk, each step runs a FIXED number of Newton iterations
        (each still ``lax.cond``-skipped once converged), and per-step
        functionals (e.g. the DFG boundary force) are evaluated on device
        and returned as stacked arrays — one round trip per ``chunk`` steps.

        functional: jittable f(solution) -> vector evaluated after each step.
        progress:  optional host callback (step, t, fvals_chunk) per chunk.
        Returns dict with per-step arrays: "functional" [n_steps, ...],
        "residual" [n_steps] (post-Newton), "gmres_iters" [n_steps].

        Composes with BOTH SPMD paths (the reference's ONE time loop runs on
        any rank count, cpp:629-679): under windowed SPMD the whole chunk
        scan runs inside shard_map with the per-step Dirichlet schedule
        pre-localized per device, and the functional is evaluated on the
        all-gathered planar vector (one O(n) collective per step, only when a
        functional is requested).  Restrictions: static forcing, no per-step
        output hooks (write checkpoints/fields at chunk boundaries instead).
        """
        if not self._is_setup:
            self.setup()
        cfg, log = self.cfg, self.log
        if self._forcing_time_dep:
            raise NotImplementedError("solve_scanned needs static forcing")
        if not resume:
            self.time = 0.0
            self._step = 0
            if cfg.initial_guess == "stokes":
                self.solution = jnp.asarray(
                    self.stokes_initial_guess(0.0), dtype=self._dtype
                )
            else:
                self.solution = jnp.zeros(self.dofs.n_total, dtype=self._dtype)
            self.solution_old = self.solution.copy()
            self.solution_old2 = None

        n_steps = int(round((cfg.T - self.time) / cfg.dt))
        t0 = self.time
        dist = self._dist
        if dist is not None:
            # windowed SPMD: Dirichlet schedule pre-localized per device,
            # [n_steps, n_dev, m] (same transform solve_newton applies per
            # step, hoisted over the whole schedule)
            from ..parallel.windowed_spmd import localize_values

            bc_sched = np.stack(
                [
                    localize_values(
                        np.asarray(self.dirichlet.values(t0 + (k + 1) * cfg.dt)),
                        self._bc_dev, self._bc_slot,
                        dist.n_dev, self._bc_local.shape[1],
                    )
                    for k in range(n_steps)
                ]
            ).astype(self._dtype)
        else:
            # host-precomputed Dirichlet schedule [n_steps, n_bc]
            bc_sched = np.stack(
                [
                    np.asarray(self.dirichlet.values(t0 + (k + 1) * cfg.dt))
                    for k in range(n_steps)
                ]
            ).astype(self._dtype)

        ctx, wa, lay = self.ctx, self._wassembly, self._win_layout
        body = self._newton_body
        bdf2 = cfg.time_scheme == "bdf2"
        dt_res1 = jnp.asarray(cfg.dt, self._dtype)
        dt_res2 = jnp.asarray(cfg.dt / 1.5, self._dtype)
        K = int(newton_iters)

        # superconvergent boundary reaction (models/functionals.
        # BoundaryReaction, evaluated in-scan): the force on a Dirichlet
        # boundary = sum of the UNCONSTRAINED weak-residual rows over its
        # velocity dofs, assembled from the flat ctx which both non-dist
        # branches already ship as a RUNTIME argument (never a baked jit
        # constant — the multi-hundred-MB rule above)
        rx_idx = rx_kw = None
        if reaction_tags is not None:
            if dist is not None:
                raise NotImplementedError(
                    "reaction_tags under windowed SPMD: the flat FEM context "
                    "is not sharded on this path — evaluate BoundaryReaction "
                    "on checkpointed states instead"
                )
            sdofs = self.dofs.boundary_scalar_vdofs(
                list(np.atleast_1d(reaction_tags))
            )
            rx_idx = jnp.asarray(
                sdofs[None, :] + np.arange(self.dofs.dim)[:, None] * self.dofs.n_vs,
                dtype=jnp.int32,
            )
            rx_kw = dict(
                nu=cfg.nu, rho=cfg.rho, p_out=cfg.p_out,
                convection_form=cfg.convection_form,
                include_continuity_residual=cfg.include_continuity_residual,
                jacobian_mass_rho=cfg.jacobian_mass_rho,
            )

        if dist is not None:
            from ..parallel import windowed_spmd as wspmd

            def planar_fn(u_loc):
                # functional input: the PLANAR global vector, rebuilt on
                # every device from the gathered local chunks (from_dist is
                # a pure reshape on the [n_dev, llen] gather)
                ch = jax.lax.all_gather(u_loc, wspmd.AXIS)
                return wspmd.from_dist(ch.reshape(-1), dist)

        else:

            def planar_fn(u_loc):
                return u_loc

        def step_fn(ctx_a, wa_a, lay_a, bc_rows_a, carry, bc_vals, axis_name):
            u, uo, uo2, kstep = carry
            if bdf2:
                use2 = kstep >= 1  # step 0 of the run bootstraps with BDF1
                u_old_eff = jnp.where(use2, (4.0 * u - uo) / 3.0, u)
                dt_res = jnp.where(use2, dt_res2, dt_res1)
            else:
                u_old_eff = u
                dt_res = dt_res1
            uo2_n, uo_n = uo, u
            uu = u
            res = jnp.zeros((), self._dtype)
            iters = jnp.int32(0)
            for k in range(K):
                uu, res, it, _kc, _kr = body(
                    ctx_a, wa_a, lay_a, uu, u_old_eff, bc_rows_a, bc_vals,
                    dt_res,
                    k < cfg.newton.min_iters,  # anti-freeze forced sweeps
                    axis_name=axis_name,
                )
                iters = iters + it
            if functional is None:
                f = jnp.zeros((1,), self._dtype)
            elif functional_args == "u_uold_dt":
                # residual-based functionals need the SAME effective history
                # the Newton residual used: under BDF2 the (u_old_eff, dt_res)
                # reformulation makes (3u-4uo+uo2)/(2dt) == (u-u_old_eff)/dt_res
                f = functional(planar_fn(uu), planar_fn(u_old_eff), dt_res)
            else:
                f = functional(planar_fn(uu))
            if rx_idx is not None:
                from ..fem.assembly import assemble_navier_stokes as _ans

                _, _, r_unc = _ans(ctx_a, uu, u_old_eff, dt=dt_res, **rx_kw)
                # framework residual = -R_weak (the Newton RHS, cpp:287-310):
                # force BY fluid ON boundary = +sum of reaction rows
                fr = jnp.stack(
                    [r_unc[rx_idx[d]].sum() for d in range(self.dofs.dim)]
                )
            else:
                fr = jnp.zeros((), self._dtype)
            return (uu, uo_n, uo2_n, kstep + 1), (f, fr, res, iters)

        # ctx/wa/lay MUST be runtime arguments, not closure constants: baked
        # multi-hundred-MB constants fault the device at scale (same rule as
        # newton_iteration's pytree-argument design).  Sharded leaves are
        # read from self at CALL time so forcing/config swaps take effect.
        if dist is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import shard_map

            sh = P(wspmd.AXIS)

            def chunk_body(wa_a, lay_a, br, u, uo, uo2, kstep, bc_chunk):
                (u, uo, uo2, kstep), ys = jax.lax.scan(
                    lambda c, bc: step_fn(
                        None, wa_a, lay_a, br[0], c, bc[0], wspmd.AXIS
                    ),
                    (u, uo, uo2, kstep), bc_chunk,
                )
                return u, uo, uo2, kstep, ys

            wrapped = shard_map(
                chunk_body,
                self.spmd_mesh,
                in_specs=(
                    wspmd.wa_pspecs(self._wa_sharded),
                    wspmd.layout_pspecs(self._lay_sharded),
                    sh, sh, sh, sh, P(), P(None, wspmd.AXIS),
                ),
                out_specs=(sh, sh, sh, P(), (P(), P(), P(), P())),
            )
            jit_chunk = jax.jit(wrapped)
            bcl = jnp.asarray(self._bc_local)

            def run_chunk(u, uo, uo2, kstep, bc_chunk):
                return jit_chunk(
                    self._wa_sharded, self._lay_sharded, bcl,
                    u, uo, uo2, kstep, bc_chunk,
                )

        elif self.spmd_mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import context_pspecs, shard_map

            bc_rows = self._bc_rows

            def chunk_body(ctx_a, u, uo, uo2, kstep, bc_chunk):
                (u, uo, uo2, kstep), ys = jax.lax.scan(
                    lambda c, bc: step_fn(ctx_a, None, None, bc_rows, c, bc, None),
                    (u, uo, uo2, kstep), bc_chunk,
                )
                return u, uo, uo2, kstep, ys

            wrapped = shard_map(
                chunk_body,
                self.spmd_mesh,
                in_specs=(context_pspecs(self.ctx), P(), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P(), (P(), P(), P(), P())),
            )
            jit_chunk = jax.jit(wrapped)

            def run_chunk(u, uo, uo2, kstep, bc_chunk):
                return jit_chunk(self.ctx, u, uo, uo2, kstep, bc_chunk)

        else:
            bc_rows = self._bc_rows

            @jax.jit
            def jit_chunk(ctx_a, wa_a, lay_a, u, uo, uo2, kstep, bc_chunk):
                (u, uo, uo2, kstep), ys = jax.lax.scan(
                    lambda c, x: step_fn(ctx_a, wa_a, lay_a, bc_rows, c, x, None),
                    (u, uo, uo2, kstep), bc_chunk,
                )
                return u, uo, uo2, kstep, ys

            def run_chunk(u, uo, uo2, kstep, bc_chunk):
                return jit_chunk(ctx, wa, lay, u, uo, uo2, kstep, bc_chunk)

        u = self.solution
        uo = self.solution_old
        uo2 = self.solution_old2 if self.solution_old2 is not None else uo
        kstep = jnp.int32(getattr(self, "_step", 0))
        fs, rxs, rs, its = [], [], [], []
        log.banner()
        log.print(
            f"Scanned time loop: {n_steps} steps x {K} Newton its, "
            f"chunk {chunk} ({cfg.time_scheme})"
        )
        # decide the progress-callback arity ONCE up front: catching
        # TypeError around the call itself would re-invoke (and duplicate the
        # side effects of) a modern callback that raised TypeError internally.
        # progress_takes_diagnostics=True/False declares it explicitly
        # (True: progress(step, t, fvals, res=..., iters=...); False: the
        # legacy 3-arg form); None infers from the signature.
        prog_legacy = False
        if progress is not None and progress_takes_diagnostics is not None:
            prog_legacy = not progress_takes_diagnostics
        elif progress is not None:
            import inspect

            try:
                sig = inspect.signature(progress)
                prog_legacy = not any(
                    p.name in ("res", "iters") or p.kind == p.VAR_KEYWORD
                    for p in sig.parameters.values()
                )
            except (TypeError, ValueError):
                prog_legacy = False
        done = 0
        while done < n_steps:
            m = min(chunk, n_steps - done)
            bc_chunk = jnp.asarray(bc_sched[done : done + m])
            u, uo, uo2, kstep, (f, fr, r, it) = run_chunk(u, uo, uo2, kstep, bc_chunk)
            jax.block_until_ready(u)
            done += m
            self.time = t0 + done * cfg.dt
            self._step = int(getattr(self, "_step", 0)) + m
            # keep the solver state current at every chunk boundary so a
            # progress callback can save_checkpoint() mid-run (3h production
            # runs on a flaky link need restartability, SURVEY §5)
            self.solution, self.solution_old, self.solution_old2 = u, uo, uo2
            fs.append(np.asarray(f))
            rxs.append(np.asarray(fr))
            rs.append(np.asarray(r))
            its.append(np.asarray(it))
            log.print(
                f"  step {self._step:6d}  t = {self.time:.4f}  "
                f"||r|| = {float(rs[-1][-1]):.3e}  gmres/step ~ {float(np.mean(its[-1])):.0f}"
            )
            if progress is not None:
                if prog_legacy:  # legacy 3-arg callback
                    progress(self._step, self.time, fs[-1])
                else:
                    kwargs = dict(res=rs[-1], iters=its[-1])
                    if reaction_tags is not None:
                        kwargs["reaction"] = rxs[-1]
                    progress(self._step, self.time, fs[-1], **kwargs)
        self.solution, self.solution_old = u, uo
        self.solution_old2 = uo2
        return {
            "functional": np.concatenate(fs) if functional is not None else None,
            "reaction": np.concatenate(rxs) if reaction_tags is not None else None,
            "residual": np.concatenate(rs),
            "gmres_iters": np.concatenate(its),
        }

    def _update_forcing(self, t: float):
        """Re-evaluate a time-dependent forcing f(x, t) at the new time level
        and swap it into the jitted kernels' pytree inputs (ctx.f_q for the
        flat path, wa.r_const for the windowed path) — leaf swaps, so no
        recompilation.  Under SPMD the swapped leaves are re-placed with their
        original shardings (r_const in the device-major distributed layout,
        flat f_q over the padded morton cell order).  The reference's
        equivalent is ForcingTerm::set_time (never exercised there: its
        forcing is constant, hpp:414-439)."""
        import dataclasses

        from ..fem.geometry import cell_geometry
        from ..fem.quadrature import gauss_simplex

        if not hasattr(self, "_f_qpts"):
            deg = self.cfg.quadrature_degree or (
                2 * (self.dofs.element.velocity.degree + 1) - 1
            )
            geo = cell_geometry(self.mesh, gauss_simplex(self.mesh.dim, deg))
            self._f_qpts = geo.qpts  # [nc, nq, dim] natural cell order
        nc, nq, dim = self._f_qpts.shape
        f_q = np.asarray(self.forcing(self._f_qpts.reshape(-1, dim), t)).reshape(
            nc, nq, dim
        )
        if self.spmd_mesh is not None and self._dist is None:
            # flat SPMD: ctx.f_q lives in the padded morton cell order,
            # sharded over the mesh — re-place the new values identically
            f_pad = np.zeros(self.ctx.f_q.shape, dtype=f_q.dtype)
            f_pad[:nc] = f_q[self._cell_order]
            self.ctx = dataclasses.replace(
                self.ctx,
                f_q=jax.device_put(
                    jnp.asarray(f_pad, self._dtype), self.ctx.f_q.sharding
                ),
            )
            return
        self.ctx = dataclasses.replace(self.ctx, f_q=jnp.asarray(f_q, self._dtype))
        if self._wassembly is not None:
            from ..fem.windowed_assembly import compute_r_const

            r = compute_r_const(self.ctx, self.cfg.p_out)
            self._wassembly = dataclasses.replace(
                self._wassembly, r_const=jnp.asarray(r, self._dtype)
            )
            if self._dist is not None:
                # windowed SPMD: distribute + re-place the sharded leaf the
                # call-time kernels read (self._wa_sharded)
                from ..parallel.windowed_spmd import to_dist

                r_d = jnp.asarray(to_dist(r, self._dist), self._dtype)
                self._wa_sharded = dataclasses.replace(
                    self._wa_sharded,
                    r_const=jax.device_put(
                        r_d, self._wa_sharded.r_const.sharding
                    ),
                )

    def _output(self, step: int, t: float):
        if not self.output_hooks:
            return
        # single-device planar layout is the identity: hand hooks the DEVICE
        # array so device-side functionals (e.g. BoundaryForce) fetch only
        # scalars; numpy consumers np.asarray() it themselves (one D2H).
        sol = self.solution if self._dist is None else self._planar(self.solution)
        for hook in self.output_hooks:
            hook(step, t, sol)

    # ------------------------------------------------------------------
    # convenience views
    def velocity(self, solution=None, real_only: bool = False) -> np.ndarray:
        """[n_vs, dim] nodal velocity (P2 scalar nodes).

        real_only=True drops the padding HOLE dofs introduced by the blocked
        renumbering (dofs.v_mask), pairing with velocity_coords(real_only=True).
        """
        s = self._planar(self.solution if solution is None else solution)
        v = s[: self.dofs.n_u].reshape(self.dofs.dim, self.dofs.n_vs).T
        if real_only and self.dofs.v_mask is not None:
            v = v[self.dofs.v_mask]
        return v

    def velocity_coords(self, real_only: bool = False) -> np.ndarray:
        c = self.dofs.v_coords
        if real_only and self.dofs.v_mask is not None:
            c = c[self.dofs.v_mask]
        return c

    def pressure(self, solution=None, real_only: bool = False) -> np.ndarray:
        s = self._planar(self.solution if solution is None else solution)
        p = s[self.dofs.n_u :]
        if real_only and self.dofs.p_mask is not None:
            p = p[self.dofs.p_mask]
        return p
