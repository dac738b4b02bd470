"""DoF management for Taylor-Hood spaces on simplex meshes.

TPU-native replacement for deal.II ``DoFHandler`` + ``DoFRenumbering::
component_wise`` + block IndexSets (``/root/reference/src/
NavierStokesSolver.cpp:60-97``).  deal.II's dynamic DoF distribution becomes a
one-shot host computation producing int32 index arrays; the global layout is
planar component blocks

    [ u_x (n_vs) | u_y (n_vs) | (u_z) | p (n_ps) ]

which makes the velocity/pressure blocks of the saddle-point system plain
slices (the role of the reference's ``block_owned_dofs`` views, cpp:86-91).
Scalar velocity DoFs are mesh vertices followed by mesh edges (P2); pressure
DoFs are mesh vertices (P1).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

from ..mesh.mesh import Mesh
from .reference_element import EDGES, TaylorHood, taylor_hood

__all__ = ["scalar_dof_map", "TaylorHoodDofs", "make_dofs"]


def scalar_dof_map(mesh: Mesh, degree: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n_dofs, cell_dofs [nc, n_basis], support coords [n_dofs, dim]).

    Local order matches reference_element support points: vertices, then edges.
    """
    if degree == 1:
        return mesh.n_nodes, mesh.cells.copy(), mesh.coords.copy()
    if degree == 2:
        cell_dofs = np.concatenate(
            [mesh.cells, mesh.n_nodes + mesh.cell_edges], axis=1
        ).astype(np.int32)
        mid = 0.5 * (mesh.coords[mesh.edges[:, 0]] + mesh.coords[mesh.edges[:, 1]])
        coords = np.vstack([mesh.coords, mid])
        return mesh.n_nodes + mesh.n_edges, cell_dofs, coords
    raise NotImplementedError(f"P{degree} scalar dof map")


@dataclass
class TaylorHoodDofs:
    mesh: Mesh
    element: TaylorHood
    n_vs: int  # scalar velocity dofs
    n_ps: int  # scalar pressure dofs
    cell_vdofs: np.ndarray  # [nc, n_vb] scalar velocity dof per cell
    cell_pdofs: np.ndarray  # [nc, n_pb]
    v_coords: np.ndarray  # [n_vs, dim]
    p_coords: np.ndarray  # [n_ps, dim]

    @property
    def dim(self) -> int:
        return self.element.dim

    @property
    def n_u(self) -> int:
        return self.dim * self.n_vs

    @property
    def n_p(self) -> int:
        return self.n_ps

    @property
    def n_total(self) -> int:
        return self.n_u + self.n_p

    @cached_property
    def cell_dofs(self) -> np.ndarray:
        """Full mixed-system map [nc, dofs_per_cell], local order
        [u_x | u_y | (u_z) | p] matching TaylorHood's local layout."""
        blocks = [self.cell_vdofs + c * self.n_vs for c in range(self.dim)]
        blocks.append(self.n_u + self.cell_pdofs)
        return np.concatenate(blocks, axis=1).astype(np.int32)

    # -- boundary queries ---------------------------------------------------

    def boundary_scalar_vdofs(self, tags) -> np.ndarray:
        """Sorted unique scalar-velocity DoFs lying on facets with these tags.

        Equivalent of deal.II interpolate_boundary_values' DoF collection
        (cpp:349-373): facet vertices plus (P2) facet edge midpoints.
        """
        tags = np.atleast_1d(np.asarray(tags))
        sel = np.isin(self.mesh.boundary_tags, tags)
        facets = self.mesh.boundary_facets[sel]
        ids = [facets.ravel()]
        if self.element.velocity.degree >= 2:
            ids.append(self.n_vs - self.mesh.n_edges + self._facet_edge_ids(facets))
        return np.unique(np.concatenate(ids)).astype(np.int32)

    def _facet_edge_ids(self, facets: np.ndarray) -> np.ndarray:
        """Global edge indices of all edges of the given facets."""
        dim = self.dim
        if dim == 2:
            pairs = facets[:, [0, 1]].reshape(-1, 2)
        else:
            pairs = facets[:, [[0, 1], [1, 2], [2, 0]]].reshape(-1, 2)
        key = np.sort(pairs.astype(np.int64), axis=1)
        edges = self.mesh.edges.astype(np.int64)
        mult = self.mesh.n_nodes + 1
        ekey = edges[:, 0] * mult + edges[:, 1]
        fkey = key[:, 0] * mult + key[:, 1]
        order = np.argsort(ekey)
        pos = np.searchsorted(ekey[order], fkey)
        eid = order[np.clip(pos, 0, len(order) - 1)]
        if not np.array_equal(ekey[eid], fkey):
            raise ValueError("facet edge not found in mesh edges")
        return eid

    def summary(self) -> str:
        return (
            f"  Number of DoFs:\n    velocity = {self.n_u}\n"
            f"    pressure = {self.n_p}\n    total    = {self.n_total}"
        )


def make_dofs(mesh: Mesh, degree_velocity: int = 2, degree_pressure: int = 1) -> TaylorHoodDofs:
    elem = taylor_hood(mesh.dim, degree_velocity, degree_pressure)
    n_vs, cell_vdofs, v_coords = scalar_dof_map(mesh, degree_velocity)
    n_ps, cell_pdofs, p_coords = scalar_dof_map(mesh, degree_pressure)
    return TaylorHoodDofs(
        mesh=mesh,
        element=elem,
        n_vs=n_vs,
        n_ps=n_ps,
        cell_vdofs=cell_vdofs,
        cell_pdofs=cell_pdofs,
        v_coords=v_coords,
        p_coords=p_coords,
    )
