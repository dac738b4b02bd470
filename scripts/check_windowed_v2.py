"""Exactness + perf check of the v2 windowed kernels on real TPU."""
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
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from navier_stokes_tpu.fem.dofs import make_dofs, renumber_blocked
    from navier_stokes_tpu.mesh.mesh import refine_uniform
    from navier_stokes_tpu.mesh.msh_io import read_msh
    from navier_stokes_tpu.ops.windowed import (
        build_windowed_layout, to_block_form, windowed_matvec,
        windowed_matvec_reference, windowed_gather, windowed_scatter,
        _gather_reference, _scatter_reference,
    )

    cpb = int(os.environ.get("CPB", "512"))
    mesh = refine_uniform(read_msh("/root/reference/mesh/correct_mesh_yt.msh"), REFINE)
    dofs = make_dofs(mesh, 2, 1)
    dofs, binfo = renumber_blocked(dofs, cells_per_block=cpb)
    lay = build_windowed_layout(dofs.cell_vdofs, dofs.cell_pdofs, dofs.n_vs,
                                dofs.n_ps, mesh.dim, block_info=binfo)
    n = dofs.n_total
    print(f"n={n} nb={lay.nb} Bmax={lay.Bmax} Bc={lay.Bc} nchunks={lay.nchunks} "
          f"OWv={lay.OWv} hv={lay.hv} RWv={lay.RWv} RVv={lay.RVv} RVp={lay.RVp} "
          f"pad={lay.pad_factor:.2f} ncd={lay.ncd}", flush=True)

    rng = np.random.default_rng(0)
    nc, nl = mesh.n_cells, lay.nl
    cell_mat = jnp.asarray(rng.standard_normal((nc, nl, nl)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    A_t = jax.jit(lambda cm: to_block_form(lay, cm))(cell_mat)
    print("A_t", A_t.shape, flush=True)

    # ground truth on host (f64 segment-sum)
    cm64 = np.asarray(cell_mat, np.float64)
    x64 = np.asarray(x, np.float64)
    cd = np.concatenate(
        [dofs.cell_vdofs + c * dofs.n_vs for c in range(mesh.dim)]
        + [dofs.n_u + dofs.cell_pdofs], axis=1)
    yl = np.einsum("cij,cj->ci", cm64, x64[cd])
    y_true = np.zeros(n)
    np.add.at(y_true, cd.ravel(), yl.ravel())

    # jnp reference impl
    y_ref = jax.jit(lambda a, v: windowed_matvec_reference(lay, a, v))(A_t, x)
    err_ref = np.abs(np.asarray(y_ref, np.float64) - y_true).max() / max(1e-30, np.abs(y_true).max())
    print(f"reference-impl rel err vs host f64: {err_ref:.3e}", flush=True)

    # pallas kernel
    f_mv = jax.jit(lambda a, v: windowed_matvec(lay, a, v))
    y_ker = f_mv(A_t, x)
    err_ker = np.abs(np.asarray(y_ker, np.float64) - y_true).max() / np.abs(y_true).max()
    err_kr = np.abs(np.asarray(y_ker) - np.asarray(y_ref)).max() / np.abs(y_true).max()
    print(f"kernel rel err vs host f64: {err_ker:.3e}; vs jnp ref: {err_kr:.3e}", flush=True)

    # gather kernel
    f_g = jax.jit(lambda v: windowed_gather(lay, v))
    Xg = f_g(x)
    Xr = jax.jit(lambda v: _gather_reference(lay, v))(x)
    print(f"gather kernel vs ref max err: {np.abs(np.asarray(Xg) - np.asarray(Xr)).max():.3e}", flush=True)

    # scatter kernel
    R = jnp.asarray(rng.standard_normal((lay.nli, lay.ncd)), jnp.float32)
    R = R.at[lay.nl:].set(0.0)
    f_s = jax.jit(lambda r: windowed_scatter(lay, r))
    ys = f_s(R)
    yr = jax.jit(lambda r: _scatter_reference(lay, r))(R)
    print(f"scatter kernel vs ref max rel err: "
          f"{(np.abs(np.asarray(ys) - np.asarray(yr)).max() / np.abs(np.asarray(yr)).max()):.3e}", flush=True)

    print(f"matvec:  {timeit(f_mv, A_t, x):7.3f} ms", flush=True)
    print(f"gather:  {timeit(f_g, x):7.3f} ms", flush=True)
    print(f"scatter: {timeit(f_s, R):7.3f} ms", flush=True)
    print(f"to_block_form: {timeit(jax.jit(lambda cm: to_block_form(lay, cm)), cell_mat, reps=10):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
