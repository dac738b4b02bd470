"""Cross-check batched device assembly against an independent dense assembler.

The dense reference below is written as straightforward per-cell loops
(the reference's FEValues style, cpp:218-343) — a deliberately different code
path from the batched einsum kernels, so agreement is meaningful.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.fem.assembly import (
    assemble_navier_stokes,
    assemble_stokes,
    build_context,
)
from navier_stokes_tpu.fem.dofs import make_dofs
from navier_stokes_tpu.fem.geometry import cell_geometry, facet_geometry
from navier_stokes_tpu.fem.quadrature import gauss_simplex
from navier_stokes_tpu.la import operators as ops
from navier_stokes_tpu.mesh.generate import box, unit_square

NU, RHO, DT, POUT = 0.01, 1.3, 0.05, 10.0


def dense_reference_ns(dofs, u, u_old, neumann_tags=()):
    """Slow loop-based Newton-tangent assembly (independent implementation)."""
    mesh, elem = dofs.mesh, dofs.element
    dim = mesh.dim
    quad = gauss_simplex(dim, 2 * (elem.velocity.degree + 1) - 1)
    geo = cell_geometry(mesh, quad)
    Nv, Gv = elem.velocity.tabulate(quad.points)
    Np, _ = elem.pressure.tabulate(quad.points)
    nb_v, nb_p, nq = elem.n_v, elem.n_p, quad.n_points
    nl = dim * nb_v + nb_p
    n = dofs.n_total
    J = np.zeros((n, n))
    R = np.zeros(n)
    MP = np.zeros((n, n))

    def comp(i):
        # local dof -> (component, scalar basis) with pressure as comp=dim
        return (i // nb_v, i % nb_v) if i < dim * nb_v else (dim, i - dim * nb_v)

    for c in range(mesh.n_cells):
        gd = dofs.cell_dofs[c]
        # physical gradients [nb_v, nq, dim]
        Gp = np.einsum("da,bqa->bqd", geo.invJT[c], Gv)
        uloc = u[dofs.cell_vdofs[c][None, :] + np.arange(dim)[:, None] * dofs.n_vs]
        uoloc = u_old[dofs.cell_vdofs[c][None, :] + np.arange(dim)[:, None] * dofs.n_vs]
        ploc = u[dofs.n_u + dofs.cell_pdofs[c]]
        for q in range(nq):
            w = geo.jxw[c, q]
            uq = uloc @ Nv[:, q]  # [dim]
            uoq = uoloc @ Nv[:, q]
            gradu = uloc @ Gp[:, q, :]  # [dim(comp), dim(deriv)]
            pq = ploc @ Np[:, q]
            for i in range(nl):
                ci, bi = comp(i)
                for j in range(nl):
                    cj, bj = comp(j)
                    val = 0.0
                    if ci < dim and cj < dim:
                        if ci == cj:
                            val += Nv[bi, q] * Nv[bj, q] / DT  # mass (no rho!)
                            val += NU * RHO * Gp[bi, q] @ Gp[bj, q]  # viscous
                            val += RHO * (uq @ Gp[bj, q]) * Nv[bi, q]  # conv2
                        val += RHO * gradu[ci, cj] * Nv[bj, q] * Nv[bi, q]  # conv1
                    elif ci < dim and cj == dim:
                        val -= Gp[bi, q, ci] * Np[bj, q]  # B^T
                    elif ci == dim and cj < dim:
                        val -= Gp[bj, q, cj] * Np[bi, q]  # B
                    else:
                        MP[gd[i], gd[j]] += Np[bi, q] * Np[bj, q] / NU * w
                    J[gd[i], gd[j]] += val * w
                # residual (momentum rows only — reference omits continuity)
                if ci < dim:
                    r = 0.0
                    r -= RHO * (uq[ci] - uoq[ci]) / DT * Nv[bi, q]
                    r -= NU * RHO * (gradu[ci] @ Gp[bi, q])
                    r -= RHO * (uq @ gradu[:, ci]) * Nv[bi, q]  # u^T grad u (!)
                    r += pq * Gp[bi, q, ci]
                    R[gd[i]] += r * w
    # Neumann faces
    if neumann_tags:
        fids = np.nonzero(np.isin(mesh.boundary_tags, neumann_tags))[0]
        fg = facet_geometry(mesh, fids, quad.degree)
        for k in range(len(fids)):
            c = fg.cell[k]
            vals, _ = elem.velocity.tabulate(fg.ref_qpts[k])
            for q in range(fg.jxw.shape[1]):
                for a in range(dim):
                    for b in range(nb_v):
                        gdof = a * dofs.n_vs + dofs.cell_vdofs[c, b]
                        R[gdof] += -POUT * fg.normal[k, a] * vals[b, q] * fg.jxw[k, q]
    return J, MP, R


@pytest.fixture(scope="module", params=[2, 3], ids=["2d", "3d"])
def setup(request):
    dim = request.param
    mesh = unit_square(2) if dim == 2 else box(1, 1, 1)
    dofs = make_dofs(mesh)
    rng = np.random.default_rng(42)
    u = rng.standard_normal(dofs.n_total)
    u_old = rng.standard_normal(dofs.n_total)
    return mesh, dofs, u, u_old


def test_navier_stokes_assembly_matches_dense(setup):
    mesh, dofs, u, u_old = setup
    neumann = (1,)
    ctx = build_context(dofs, neumann_tags=neumann)
    cell_mat, cell_pmass, residual = assemble_navier_stokes(
        ctx, jnp.asarray(u), jnp.asarray(u_old), dt=DT, nu=NU, rho=RHO, p_out=POUT
    )
    Jd, MPd, Rd = dense_reference_ns(dofs, u, u_old, neumann_tags=neumann)

    # scatter cell matrices to dense and compare
    n = dofs.n_total
    Jb = np.zeros((n, n))
    cm = np.asarray(cell_mat)
    for c in range(mesh.n_cells):
        gd = dofs.cell_dofs[c]
        Jb[np.ix_(gd, gd)] += cm[c]
    assert np.allclose(Jb, Jd, atol=1e-11)

    MPb = np.zeros((n, n))
    pm = np.asarray(cell_pmass)
    for c in range(mesh.n_cells):
        gp = dofs.n_u + dofs.cell_pdofs[c]
        MPb[np.ix_(gp, gp)] += pm[c]
    assert np.allclose(MPb, MPd, atol=1e-11)

    assert np.allclose(np.asarray(residual), Rd, atol=1e-11)


def test_matvec_matches_dense(setup):
    mesh, dofs, u, u_old = setup
    ctx = build_context(dofs, neumann_tags=())
    cell_mat, _, _ = assemble_navier_stokes(
        ctx, jnp.asarray(u), jnp.asarray(u_old), dt=DT, nu=NU, rho=RHO, p_out=POUT
    )
    n = dofs.n_total
    Jb = np.zeros((n, n))
    cm = np.asarray(cell_mat)
    for c in range(mesh.n_cells):
        gd = dofs.cell_dofs[c]
        Jb[np.ix_(gd, gd)] += cm[c]

    rng = np.random.default_rng(3)
    x = rng.standard_normal(n)
    rows = np.array([0, 5, n - 1], dtype=np.int32)
    diag = np.diag(Jb)[rows]
    op = ops.ElementOperator(
        cell_mat=cell_mat,
        cell_dofs=ctx.cell_dofs,
        bc_rows=jnp.asarray(rows),
        bc_diag=jnp.asarray(diag),
        scatter_idx=ctx.scatter_full,
        n=n,
    )
    y = np.asarray(ops.matvec(op, jnp.asarray(x)))
    y_ref = Jb @ x
    y_ref[rows] = diag * x[rows]
    assert np.allclose(y, y_ref, atol=1e-11)
    # diagonal extraction
    d = np.asarray(ops.diagonal(op))
    d_ref = np.diag(Jb).copy()
    d_ref[rows] = diag
    assert np.allclose(d, d_ref, atol=1e-11)


def test_stokes_symmetry_structure(setup):
    mesh, dofs, _, _ = setup
    ctx = build_context(dofs, neumann_tags=())
    cell_mat, _, rhs = assemble_stokes(ctx, nu=NU, rho=RHO, p_out=POUT)
    n = dofs.n_total
    Jb = np.zeros((n, n))
    cm = np.asarray(cell_mat)
    for c in range(mesh.n_cells):
        gd = dofs.cell_dofs[c]
        Jb[np.ix_(gd, gd)] += cm[c]
    # Stokes block system is symmetric; pressure-pressure block is zero
    assert np.allclose(Jb, Jb.T, atol=1e-12)
    assert np.allclose(Jb[dofs.n_u :, dofs.n_u :], 0.0)
    # velocity block is SPD on the subspace (positive diagonal)
    assert np.all(np.diag(Jb)[: dofs.n_u] > 0)
    assert np.allclose(np.asarray(rhs), 0.0)  # zero forcing, no neumann


def test_jacobian_is_derivative_of_residual():
    """J = -dR/du for interior dofs (standard convection, incl. continuity).

    With the STANDARD convection form and the continuity residual included,
    the assembled Jacobian must equal minus the residual derivative — checked
    with central finite differences on a tiny mesh.
    """
    mesh = unit_square(1)
    dofs = make_dofs(mesh)
    ctx = build_context(dofs, neumann_tags=())
    rng = np.random.default_rng(7)
    u = rng.standard_normal(dofs.n_total) * 0.3
    u_old = rng.standard_normal(dofs.n_total) * 0.3

    kw = dict(
        dt=DT, nu=NU, rho=RHO, p_out=POUT,
        convection_form="standard", include_continuity_residual=True,
        jacobian_mass_rho=True,
    )

    def res(v):
        _, _, r = assemble_navier_stokes(ctx, jnp.asarray(v), jnp.asarray(u_old), **kw)
        return np.asarray(r)

    cell_mat, _, _ = assemble_navier_stokes(ctx, jnp.asarray(u), jnp.asarray(u_old), **kw)
    n = dofs.n_total
    Jb = np.zeros((n, n))
    cm = np.asarray(cell_mat)
    for c in range(mesh.n_cells):
        gd = dofs.cell_dofs[c]
        Jb[np.ix_(gd, gd)] += cm[c]

    h = 1e-6
    cols = rng.choice(n, size=min(12, n), replace=False)
    for j in cols:
        e = np.zeros(n)
        e[j] = h
        dr = (res(u + e) - res(u - e)) / (2 * h)
        assert np.allclose(-dr, Jb[:, j], atol=5e-6), f"column {j}"
