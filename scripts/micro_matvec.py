"""Microbenchmark: windowed matvec / gather / scatter / assembly on real TPU.

Prints layout parameters and per-op timings so kernel work targets the
actual bottleneck (VERDICT round-1 item 3: ~7 ms/matvec vs ~0.2 ms roofline).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REFINE = int(os.environ.get("REFINE", "2"))
REPS = int(os.environ.get("REPS", "50"))


def timeit(fn, *args, reps=REPS):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.mesh.mesh import refine_uniform
    from navier_stokes_tpu.mesh.msh_io import read_msh
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.ops import windowed as W
    from navier_stokes_tpu.utils.logging import RunLog
    from navier_stokes_tpu.fem.windowed_assembly import assemble_windowed

    mesh = refine_uniform(read_msh("/root/reference/mesh/correct_mesh_yt.msh"), REFINE)
    cfg = SolverConfig()
    cfg.dtype = "float32"
    cfg.krylov.matvec = "windowed"
    s = NavierStokesSolver(mesh, cfg, log=RunLog(verbose=False)).setup()
    lay = s._win_layout
    wa = s._wassembly
    n = s.dofs.n_total
    print(
        f"n_dofs={n} nc={mesh.n_cells} nb={lay.nb} Bmax={lay.Bmax} Bc={lay.Bc} "
        f"nchunks={lay.nchunks} ncd={lay.ncd} pad={lay.pad_factor:.2f}"
    )
    print(
        f"OWv={lay.OWv} OWp={lay.OWp} hv={lay.hv} hp={lay.hp} "
        f"RWv={lay.RWv} RWp={lay.RWp} RVv={lay.RVv} RVp={lay.RVp} nl={lay.nl} nli={lay.nli}"
    )
    a_mb = lay.nl * lay.nli * lay.ncd * 4 / 1e6
    print(f"A_t size = {a_mb:.1f} MB -> HBM roofline ~{a_mb/819e3*1e3:.3f} ms")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n,), dtype=jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(1), (n,), dtype=jnp.float32) * 0.1

    # assemble once to get a real A_t (wa/lay as ARGS: their arrays must not
    # be baked into the program as constants)
    @jax.jit
    def asm(wa, lay, u, uo):
        return assemble_windowed(
            wa, lay, u, uo, dt=cfg.dt, nu=cfg.nu, rho=cfg.rho,
            convection_form=cfg.convection_form,
            include_continuity_residual=cfg.include_continuity_residual,
        )

    t_asm, (A_t, res, diag0) = timeit(asm, wa, lay, u, u * 0.9, reps=max(REPS // 5, 3))
    print(f"assemble_windowed: {t_asm:.3f} ms  ({n/t_asm/1e3:.1f} MDoF/s)")

    from functools import partial

    @partial(jax.jit, static_argnames=("passes",))
    def mv(lay, A, v, passes=3):
        return W.windowed_matvec(lay, A, v, passes=passes)

    for p in (3, 2, 1):
        t_mv, y = timeit(mv, lay, A_t, x, p)
        print(f"windowed_matvec(passes={p}): {t_mv:.3f} ms")

    @partial(jax.jit, static_argnames=("passes",))
    def g(lay, v, passes=3):
        return W.windowed_gather(lay, v, passes=passes)

    for p in (3, 2):
        t_g, X = timeit(g, lay, x, p)
        print(f"windowed_gather(passes={p}): {t_g:.3f} ms")

    @partial(jax.jit, static_argnames=("passes",))
    def sc(lay, R, passes=3):
        return W.windowed_scatter(lay, R, passes=passes)

    R = jnp.asarray(np.random.randn(lay.nli, lay.ncd), jnp.float32)
    for p in (3, 2):
        t_s, _ = timeit(sc, lay, R, p)
        print(f"windowed_scatter(passes={p}): {t_s:.3f} ms")

    wb = jax.jit(lambda lay, v: tuple(W._all_windows(lay, v)))
    t_w, _ = timeit(wb, lay, x)
    print(f"build windows:     {t_w:.3f} ms")

    # dispatch-free measurement: chain 20 matvecs inside one jit (normalize
    # between applications to avoid overflow), amortizing tunnel overhead
    @partial(jax.jit, static_argnames=("passes", "k"))
    def mv_chain(lay, A, v, passes=3, k=20):
        def body(i, v):
            y = W.windowed_matvec(lay, A, v, passes=passes)
            return y / jnp.linalg.norm(y)

        return jax.lax.fori_loop(0, k, body, v)

    @jax.jit
    def nullop(lay, A, v):
        return v * 2.0

    t0, _ = timeit(nullop, lay, A_t, x)
    print(f"dispatch overhead: {t0:.3f} ms")
    for p in (3, 2, 1):
        t_c, _ = timeit(mv_chain, lay, A_t, x, p, 20, reps=max(REPS // 5, 3))
        print(f"matvec chained(passes={p}): {(t_c - t0)/20:.3f} ms/matvec")


if __name__ == "__main__":
    main()
