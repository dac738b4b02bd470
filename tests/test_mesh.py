"""Mesh container, generators, refinement, and .msh parsing (golden counts
against the 13 meshes shipped with the reference repo — BASELINE.md table)."""

import os

import numpy as np
import pytest

from navier_stokes_tpu.fem.geometry import cell_geometry, facet_geometry
from navier_stokes_tpu.fem.quadrature import gauss_simplex
from navier_stokes_tpu.mesh.generate import box, rectangle, unit_square
from navier_stokes_tpu.mesh.mesh import refine_uniform
from navier_stokes_tpu.mesh.msh_io import read_msh

GOLDEN = {
    # name: (nodes, cells, dim) — BASELINE.md problem-size table, adjusted for
    # unused-vertex deletion (deal.II GridIn semantics): mesh_poli and mesh2d
    # each carry an orphan geometry point that no cell references
    "correct_mesh_yt.msh": (3350, 6448, 2),
    "mesh_poli.msh": (10845, 21166, 2),
    "mesh2d.msh": (371, 796, 2),
    "mesh_poli2.msh": (10956, 21354, 2),
    "mesh_poli2_t.msh": (10956, 21354, 2),
    "mesh-square-h0.100000.msh": (121, 200, 2),
    "mesh-square-h0.050000.msh": (441, 800, 2),
    "mesh-square-h0.025000.msh": (1681, 3200, 2),
    "mesh-square-h0.012500.msh": (6561, 12800, 2),
    "mesh-square-40.msh": (1931, 3700, 2),
    "mesh-step-3.msh": (911, 3420, 3),
    "mesh-step-5.msh": (3047, 13408, 3),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_msh_golden_counts(ref_mesh_dir, name):
    m = read_msh(os.path.join(ref_mesh_dir, name))
    nodes, cells, dim = GOLDEN[name]
    assert (m.n_nodes, m.n_cells, m.dim) == (nodes, cells, dim)
    # every cell positively oriented
    geo = cell_geometry(m, gauss_simplex(m.dim, 1))
    assert np.all(geo.detJ > 0)


def test_surface_mesh_rejected(ref_mesh_dir):
    """mesh_gg.msh is a cylinder SURFACE mesh (tris in 3D): clean refusal."""
    with pytest.raises(NotImplementedError):
        read_msh(os.path.join(ref_mesh_dir, "mesh_gg.msh"))


def test_cylinder_mesh_tags(ref_mesh_dir):
    """The default mesh's boundary ids: 10=outlet, 11=inlet, 12/13=walls."""
    m = read_msh(os.path.join(ref_mesh_dir, "correct_mesh_yt.msh"))
    assert set(m.tags) == {10, 11, 12, 13}
    # domain is [-2,5] x [-2,2] with a radius-0.5 cylinder at the origin
    assert m.coords[:, 0].min() == pytest.approx(-2)
    assert m.coords[:, 0].max() == pytest.approx(5)
    # NOTE the shipped mesh's geography: the Dirichlet "inlet" tag 11 is the
    # x=+5 side and the Neumann tag 10 is the x=-2 side (verified here); the
    # solver only cares about the tag numbers (cpp:320,357).
    dirichlet11 = m.boundary_facets[m.boundary_tags == 11]
    assert np.allclose(m.coords[dirichlet11.ravel(), 0], 5)
    neumann10 = m.boundary_facets[m.boundary_tags == 10]
    assert np.allclose(m.coords[neumann10.ravel(), 0], -2)
    cyl = m.boundary_facets[m.boundary_tags == 13]
    r = np.linalg.norm(m.coords[cyl.ravel()], axis=1)
    assert np.allclose(r, 0.5, atol=1e-6)


def test_v41_square_tags(ref_mesh_dir):
    m = read_msh(os.path.join(ref_mesh_dir, "mesh-square-h0.100000.msh"))
    assert set(m.tags) == {0, 1, 2, 3}
    left = m.boundary_facets[m.boundary_tags == 0]
    assert np.allclose(m.coords[left.ravel(), 0], 0)
    right = m.boundary_facets[m.boundary_tags == 1]
    assert np.allclose(m.coords[right.ravel(), 0], 1)


@pytest.mark.parametrize("mesh", [unit_square(4), box(2, 2, 2)])
def test_generated_geometry(mesh):
    q = gauss_simplex(mesh.dim, 2)
    geo = cell_geometry(mesh, q)
    assert np.all(geo.detJ > 0)
    assert geo.jxw.sum() == pytest.approx(1.0)  # unit measure
    # facet map is consistent & normals point outward of the unit domain
    fids = np.arange(len(mesh.boundary_tags))
    fg = facet_geometry(mesh, fids, 2)
    # total boundary measure: perimeter 4 (square) or area 6 (cube)
    assert fg.jxw.sum() == pytest.approx(4.0 if mesh.dim == 2 else 6.0)
    # outward normal at x=0 boundary must be (-1, 0, ...)
    tag0 = mesh.boundary_tags == 0
    n0 = fg.normal[tag0]
    assert np.allclose(n0[:, 0], -1, atol=1e-12)


def test_refine_square():
    m = unit_square(2)
    r = refine_uniform(m, 2)
    assert r.n_cells == m.n_cells * 16
    q = gauss_simplex(2, 1)
    assert cell_geometry(r, q).jxw.sum() == pytest.approx(1.0)
    assert np.all(cell_geometry(r, q).detJ > 0)
    # boundary preserved
    fids = np.arange(len(r.boundary_tags))
    fg = facet_geometry(r, fids, 2)
    assert fg.jxw.sum() == pytest.approx(4.0)


def test_refine_box():
    m = box(1, 1, 1)
    r = refine_uniform(m)
    assert r.n_cells == 8 * m.n_cells
    q = gauss_simplex(3, 1)
    assert cell_geometry(r, q).jxw.sum() == pytest.approx(1.0)
    assert np.all(cell_geometry(r, q).detJ > 0)


def test_refine_reference_mesh(ref_mesh_dir):
    m = read_msh(os.path.join(ref_mesh_dir, "mesh-square-h0.100000.msh"))
    r = refine_uniform(m)
    assert r.n_cells == 4 * m.n_cells
    geo = cell_geometry(r, gauss_simplex(2, 1))
    assert geo.jxw.sum() == pytest.approx(1.0)


def test_extract_cells_cylinder_interior(ref_mesh_dir):
    """The shipped DFG channel meshes mesh the cylinder INTERIOR (the circle
    is an internal facet loop); extract_cells must recover the true
    exterior-flow domain: no cells inside r=0.05, circle facets kept as
    genuine (single-cell) boundary, vertices renumbered compactly."""
    from navier_stokes_tpu.mesh.mesh import extract_cells

    m = read_msh(os.path.join(ref_mesh_dir, "mesh_poli.msh"))
    cent_r = np.linalg.norm(m.coords[m.cells].mean(axis=1), axis=1)
    assert (cent_r < 0.048).sum() > 0, "fixture: interior must be meshed"
    vr = np.linalg.norm(m.coords, axis=1)
    ex = extract_cells(m, vr[m.cells].max(axis=1) > 0.05 + 1e-9)

    cent_r2 = np.linalg.norm(ex.coords[ex.cells].mean(axis=1), axis=1)
    assert cent_r2.min() > 0.05
    # all 32 circle facets survive (facet of exactly one kept cell)
    fr = np.linalg.norm(ex.coords[ex.boundary_facets].mean(axis=1), axis=1)
    assert (fr < 0.05).sum() == 32
    # compact renumbering: every vertex referenced, indices in range
    assert ex.cells.max() == ex.n_nodes - 1
    assert len(np.unique(ex.cells)) == ex.n_nodes
    # outer boundary intact
    assert len(ex.boundary_facets) == len(m.boundary_facets)
    geo = cell_geometry(ex, gauss_simplex(2, 1))
    area = geo.jxw.sum()
    assert area == pytest.approx(2.2 * 0.41 - np.pi * 0.05**2, rel=2e-3)


def test_extract_cells_untagged_warning():
    """Extraction exposing untagged boundary must warn (the solver cannot
    see untagged facets — they silently become do-nothing)."""
    import warnings

    from navier_stokes_tpu.mesh.mesh import extract_cells

    m = unit_square(4)
    keep = m.coords[m.cells].mean(axis=1)[:, 0] < 0.5
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ex = extract_cells(m, keep)
    assert any("no tag" in str(x.message) for x in w)
    assert ex.n_cells == int(keep.sum())


def test_facet_ids_overflow_fallback():
    """_facet_ids must match facets identically whether it packs keys in
    base (n_nodes+1) or falls back to lexicographic row ranking (the packed
    key overflows int64 for 3D meshes above ~2M nodes)."""
    from navier_stokes_tpu.mesh.mesh import _facet_ids

    rng = np.random.default_rng(7)
    big_n = 3_000_000  # (big_n+1)**3 > 2**62 -> triggers the fallback for k=3
    cf = rng.integers(0, big_n, size=(500, 3))
    bf = np.concatenate([cf[::7][:, ::-1], rng.integers(0, big_n, size=(30, 3))])

    assert (big_n + 1) ** 3 >= 2**62  # the packed path WOULD overflow
    cfi, bfi = _facet_ids(cf, bf, big_n)

    # oracle: row-sorted tuple comparison
    def rows(a):
        return {tuple(sorted(r)) for r in a.tolist()}

    for i in range(len(bf)):
        in_cf_ids = bfi[i] in set(cfi.tolist())
        in_cf_rows = tuple(sorted(bf[i].tolist())) in rows(cf)
        assert in_cf_ids == in_cf_rows

    # small-mesh packed path agrees with the fallback on the same data
    small = cf % 1000
    small_b = bf % 1000
    cfa, bfa = _facet_ids(small, small_b, 999)  # packed
    allf = np.sort(np.concatenate([small, small_b]), axis=1)
    _, inv = np.unique(allf, axis=0, return_inverse=True)
    cfb, bfb = inv[: len(small)], inv[len(small):]
    # same equivalence classes: equal keys <-> equal ranks
    both = np.stack([np.concatenate([cfa, bfa]), np.concatenate([cfb, bfb])])
    assert len(np.unique(both[0])) == len(np.unique(both[1])) == len(
        np.unique(both, axis=1).T
    )


def test_refine_snap_boundary_circle(ref_mesh_dir):
    """snap_boundary (deal.II-manifold equivalent): refined cylinder
    vertices land ON the circle, not on the old chords."""
    from navier_stokes_tpu.mesh.mesh import circle_projector, extract_cells, retag_boundary

    m = read_msh(os.path.join(ref_mesh_dir, "mesh_poli.msh"))
    vr = np.linalg.norm(m.coords, axis=1)
    m = extract_cells(m, vr[m.cells].max(axis=1) > 0.05 + 1e-9)

    def tags(mid):
        t = np.full(len(mid), 12, dtype=np.int32)
        t[np.linalg.norm(mid, axis=1) < 0.09] = 13
        return t

    m = retag_boundary(m, tags)
    r = refine_uniform(m, 1, snap_boundary={13: circle_projector((0.0, 0.0), 0.05)})
    cyl_v = np.unique(r.boundary_facets[r.boundary_tags == 13])
    rad = np.linalg.norm(r.coords[cyl_v], axis=1)
    np.testing.assert_allclose(rad, 0.05, rtol=1e-12)
    assert len(cyl_v) == 64
    # no inverted cells after snapping
    geo = cell_geometry(r, gauss_simplex(2, 1))
    assert np.all(geo.detJ > 0)
    # without snapping, midpoints stay on the chords (strictly inside)
    r0 = refine_uniform(m, 1)
    rad0 = np.linalg.norm(r0.coords[np.unique(r0.boundary_facets[r0.boundary_tags == 13])], axis=1)
    assert rad0.min() < 0.05 - 1e-5
