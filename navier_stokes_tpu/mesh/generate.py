"""Structured simplex mesh generators (host-side, numpy).

The reference repo generates its square mesh with gmsh
(``/root/reference/mesh/mesh-square.geo``: structured-extrusion unit square
with physical lines 0..3 and physical surface 10).  These generators produce
the same tag conventions without needing gmsh, and add a 3D box for the
backward-step-style scaling configs.

Tag convention (matching mesh-square.geo physical groups):
  2D unit square: 0 = x=0 (inlet), 1 = x=1 (outlet), 2 = y=0, 3 = y=1 (walls)
  3D box: 0 = x=x0, 1 = x=x1, 2..5 = lateral walls
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

__all__ = ["unit_square", "rectangle", "box"]


def rectangle(nx: int, ny: int, x0=0.0, x1=1.0, y0=0.0, y1=1.0, name="rect") -> Mesh:
    """Structured triangulation of [x0,x1]x[y0,y1] with 2*nx*ny triangles."""
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i * (ny + 1) + j

    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    i, j = i.ravel(), j.ravel()
    v00, v10, v01, v11 = vid(i, j), vid(i + 1, j), vid(i, j + 1), vid(i + 1, j + 1)
    cells = np.concatenate(
        [np.stack([v00, v10, v11], 1), np.stack([v00, v11, v01], 1)], axis=0
    )

    bf, bt = [], []
    for jj in range(ny):  # x = x0 -> tag 0 ; x = x1 -> tag 1
        bf.append((vid(0, jj), vid(0, jj + 1)))
        bt.append(0)
        bf.append((vid(nx, jj), vid(nx, jj + 1)))
        bt.append(1)
    for ii in range(nx):  # y = y0 -> tag 2 ; y = y1 -> tag 3
        bf.append((vid(ii, 0), vid(ii + 1, 0)))
        bt.append(2)
        bf.append((vid(ii, ny), vid(ii + 1, ny)))
        bt.append(3)

    return Mesh(
        coords=coords,
        cells=cells.astype(np.int32),
        boundary_facets=np.array(bf, dtype=np.int32),
        boundary_tags=np.array(bt, dtype=np.int32),
        name=name,
    )


def unit_square(n: int, name: str | None = None) -> Mesh:
    return rectangle(n, n, name=name or f"unit_square_{n}")


def box(nx: int, ny: int, nz: int, x0=0.0, x1=1.0, y0=0.0, y1=1.0, z0=0.0, z1=1.0, name="box") -> Mesh:
    """Structured tetrahedralization (6 tets per hex) of a 3D box."""
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    zs = np.linspace(z0, z1, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    i, j, k = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    c = {}
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                c[(di, dj, dk)] = vid(i + di, j + dj, k + dk)
    # Kuhn triangulation of the cube: 6 tets sharing diagonal (0,0,0)-(1,1,1)
    paths = [
        ((1, 0, 0), (1, 1, 0)),
        ((1, 0, 0), (1, 0, 1)),
        ((0, 1, 0), (1, 1, 0)),
        ((0, 1, 0), (0, 1, 1)),
        ((0, 0, 1), (1, 0, 1)),
        ((0, 0, 1), (0, 1, 1)),
    ]
    cells = np.concatenate(
        [np.stack([c[(0, 0, 0)], c[p], c[q], c[(1, 1, 1)]], 1) for p, q in paths], axis=0
    )

    bf, bt = [], []

    def add_quad(a, b, cc, d, tag):
        bf.append((a, b, cc))
        bf.append((a, cc, d))
        bt.extend([tag, tag])

    for jj in range(ny):
        for kk in range(nz):
            add_quad(vid(0, jj, kk), vid(0, jj + 1, kk), vid(0, jj + 1, kk + 1), vid(0, jj, kk + 1), 0)
            add_quad(vid(nx, jj, kk), vid(nx, jj + 1, kk), vid(nx, jj + 1, kk + 1), vid(nx, jj, kk + 1), 1)
    for ii in range(nx):
        for kk in range(nz):
            add_quad(vid(ii, 0, kk), vid(ii + 1, 0, kk), vid(ii + 1, 0, kk + 1), vid(ii, 0, kk + 1), 2)
            add_quad(vid(ii, ny, kk), vid(ii + 1, ny, kk), vid(ii + 1, ny, kk + 1), vid(ii, ny, kk + 1), 3)
    for ii in range(nx):
        for jj in range(ny):
            add_quad(vid(ii, jj, 0), vid(ii + 1, jj, 0), vid(ii + 1, jj + 1, 0), vid(ii, jj + 1, 0), 4)
            add_quad(vid(ii, jj, nz), vid(ii + 1, jj, nz), vid(ii + 1, jj + 1, nz), vid(ii, jj + 1, nz), 5)

    return Mesh(
        coords=coords,
        cells=cells.astype(np.int32),
        boundary_facets=np.array(bf, dtype=np.int32),
        boundary_tags=np.array(bt, dtype=np.int32),
        name=name,
    )
