"""Round-2 profiling: where do assembly (80ms) and windowed matvec (7ms) go?

Run on the real TPU:  python -u scripts/profile_r2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

REFINE = int(os.environ.get("REFINE", "2"))


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.fem.assembly import assemble_navier_stokes
    from navier_stokes_tpu.mesh.mesh import refine_uniform
    from navier_stokes_tpu.mesh.msh_io import read_msh
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.ops.windowed import windowed_matvec, _pallas_matvec, build_windows, _round_up
    from navier_stokes_tpu.utils.logging import RunLog
    from navier_stokes_tpu.la import operators as ops

    mesh = refine_uniform(read_msh("/root/reference/mesh/correct_mesh_yt.msh"), REFINE)
    cfg = SolverConfig()
    cfg.dtype = "float32"
    cfg.krylov.matvec = "windowed"
    s = NavierStokesSolver(mesh, cfg, log=RunLog(verbose=False)).setup()
    lay = s._win_layout
    ctx = s.ctx
    n = s.dofs.n_total
    print(f"n_dofs={n} n_cells={mesh.n_cells} nb={lay.nb} Bmax={lay.Bmax} "
          f"OWv={lay.OWv} OWp={lay.OWp} hv={lay.hv} hp={lay.hp} pad={lay.pad_factor:.2f}", flush=True)

    kw = dict(dt=cfg.dt, nu=cfg.nu, rho=cfg.rho, p_out=cfg.p_out,
              convection_form=cfg.convection_form,
              include_continuity_residual=cfg.include_continuity_residual,
              jacobian_mass_rho=cfg.jacobian_mass_rho)

    u = s.solution + 0.01
    u_old = s.solution_old

    # --- assembly total
    f_all = jax.jit(lambda a, b: [x.ravel()[::4096].sum() for x in assemble_navier_stokes(ctx, a, b, **kw)])
    print(f"assembly total:            {timeit(f_all, u, u_old):8.2f} ms", flush=True)

    # --- assembly: return full cell_mat (forces materialization w/o sampling)
    f_mat = jax.jit(lambda a, b: assemble_navier_stokes(ctx, a, b, **kw)[0])
    print(f"assembly (cell_mat out):   {timeit(f_mat, u, u_old, reps=10):8.2f} ms", flush=True)

    cell_mat = f_mat(u, u_old)

    # --- gather to block order
    f_gather = jax.jit(lambda cm: cm[lay.cell_ids].ravel()[::4096].sum())
    print(f"A_blk gather:              {timeit(f_gather, cell_mat):8.2f} ms", flush=True)

    nb, Bmax, nl = lay.nb, lay.Bmax, cell_mat.shape[1]
    nli = _round_up(nl, 8)

    @jax.jit
    def f_transpose(cm):
        A_blk = cm[lay.cell_ids]
        A_t = jnp.zeros((nb, nl, nli, Bmax), dtype=cm.dtype)
        return A_t.at[:, :, :nl, :].set(A_blk.transpose(0, 3, 2, 1))

    print(f"gather+transpose to A_t:   {timeit(f_transpose, cell_mat, reps=10):8.2f} ms", flush=True)
    A_t = f_transpose(cell_mat)
    A_blk = jax.jit(lambda cm: cm[lay.cell_ids])(cell_mat)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), dtype=jnp.float32)

    # --- windowed matvec as used today (gather+transpose inside)
    f_mv = jax.jit(lambda a, v: windowed_matvec(lay, a, v))
    print(f"windowed matvec (A_blk):   {timeit(f_mv, A_blk, x):8.2f} ms", flush=True)

    # --- kernel only with pre-transposed A_t
    @jax.jit
    def f_kernel(a_t, v):
        comps = [v[c * lay.n_vs:(c + 1) * lay.n_vs] for c in range(lay.dim)]
        p = v[lay.n_u:lay.n_u + lay.n_ps]
        xw = [build_windows(c, lay.nb, lay.OWv, lay.hv) for c in comps] + [
            build_windows(p, lay.nb, lay.OWp, lay.hp)]
        outs = _pallas_matvec(lay, a_t, xw, False)
        ys = [o.reshape(lay.nb * lay.OWv)[: lay.n_vs] for o in outs[: lay.dim]]
        yp = outs[-1].reshape(lay.nb * lay.OWp)[: lay.n_ps]
        return jnp.concatenate(ys + [yp])

    print(f"windowed kernel (A_t):     {timeit(f_kernel, A_t, x):8.2f} ms", flush=True)

    # --- flat matvec
    op = ops.ElementOperator(cell_mat=cell_mat, cell_dofs=ctx.cell_dofs,
                             bc_rows=s._bc_rows, bc_diag=jnp.ones(s._bc_rows.shape[0], jnp.float32),
                             scatter_idx=ctx.scatter_full, n=n, axis_name=None)
    f_flat = jax.jit(lambda v: ops.matvec(op, v))
    print(f"flat matvec:               {timeit(f_flat, x):8.2f} ms", flush=True)

    # --- assembly sub-pieces
    from navier_stokes_tpu.fem.assembly import _phys_grads, _gather_velocity, _gather_pressure
    _PREC = jax.lax.Precision.HIGHEST

    @jax.jit
    def f_fields(a, b):
        Gp = _phys_grads(ctx)
        uc = _gather_velocity(ctx, a)
        uoc = _gather_velocity(ctx, b)
        pc = _gather_pressure(ctx, a)
        u_q = jnp.einsum("cdb,bq->cqd", uc, ctx.N_v, precision=_PREC)
        gu_q = jnp.einsum("cdb,cbqa->cqda", uc, Gp, precision=_PREC)
        return u_q.sum() + gu_q.sum() + uoc.sum() + pc.sum()

    print(f"  fields (gather+interp):  {timeit(f_fields, u, u_old):8.2f} ms", flush=True)

    @jax.jit
    def f_K(a):
        Gp = _phys_grads(ctx)
        K = jnp.einsum("ciqa,cjqa,cq->cij", Gp, Gp, ctx.jxw, precision=_PREC)
        return K.ravel()[::4096].sum()

    print(f"  K stiffness einsum:      {timeit(f_K, u):8.2f} ms", flush=True)

    @jax.jit
    def f_C1(a):
        Gp = _phys_grads(ctx)
        uc = _gather_velocity(ctx, a)
        gu_q = jnp.einsum("cdb,cbqa->cqda", uc, Gp, precision=_PREC)
        NvW = jnp.einsum("iq,cq->ciq", ctx.N_v, ctx.jxw, precision=_PREC)
        C1 = jnp.einsum("cqab,ciq,jq->cabij", gu_q, NvW, ctx.N_v, precision=_PREC)
        return C1.ravel()[::4096].sum()

    print(f"  C1 einsum:               {timeit(f_C1, u):8.2f} ms", flush=True)

    # --- pure transpose cost of [nc,15,15] -> [15,15,nc]
    f_tr = jax.jit(lambda cm: cm.transpose(1, 2, 0).ravel()[::4096].sum())
    print(f"  [nc,15,15]->[15,15,nc]:  {timeit(f_tr, cell_mat, reps=10):8.2f} ms", flush=True)

    # --- preconditioned newton step timing (block_triangular windowed)
    bc_vals = jnp.asarray(s.dirichlet.values(cfg.dt), dtype=jnp.float32)
    t0 = time.perf_counter()
    out = s._newton_iteration(u.copy(), u_old, bc_vals)
    jax.block_until_ready(out)
    print(f"newton step identity:      {(time.perf_counter()-t0)*1e3:8.1f} ms  iters={int(out[2])}", flush=True)


if __name__ == "__main__":
    main()
