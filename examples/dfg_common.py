"""Shared DFG (Schaefer-Turek) benchmark geometry: the corrected fluid
domain from the shipped ``mesh_poli.msh`` plus the 2D-1/2D-2 tag convention.

One copy of the domain-correction logic for both the steady (2D-1) and
unsteady (2D-2) examples — the extraction predicate, tag thresholds, and
circle snap must stay in sync or the two examples silently validate against
different domains.
"""

import numpy as np

from navier_stokes_tpu.mesh.mesh import (
    circle_projector, extract_cells, refine_uniform, retag_boundary)
from navier_stokes_tpu.mesh.msh_io import read_msh

D = 0.1   # cylinder diameter
H = 0.41  # channel height

MESH_PATH = "/root/reference/mesh/mesh_poli.msh"


def tag_fn(mid):
    """Geometric boundary retag: 11=inlet, 10=outlet, 12=walls, 13=cylinder."""
    tags = np.full(len(mid), 12, dtype=np.int32)  # walls
    tags[np.isclose(mid[:, 0], -0.2, atol=1e-6)] = 11  # inlet
    tags[np.isclose(mid[:, 0], 2.0, atol=1e-6)] = 10   # outlet
    r = np.linalg.norm(mid, axis=1)
    tags[r < 0.09] = 13  # cylinder
    return tags


def load_dfg_mesh(refine: int):
    """mesh_poli.msh -> true DFG fluid domain.

    The shipped mesh_poli* meshes mesh the cylinder INTERIOR (212 live cells
    inside r=0.05, the circle is an internal facet loop): solved as-is, the
    trapped interior fluid pins a near-constant pressure onto the circle
    nodes, wiping out the front/back pressure difference (measured Cd 2.95 /
    dP 0.027 vs published 5.58 / 0.1175 on DFG 2D-1).  Extract the exterior
    cells, retag geometrically, and refine with new cylinder vertices SNAPPED
    onto the circle (deal.II-manifold equivalent; without it the cylinder
    stays the original 32-gon at every refinement level)."""
    mesh = read_msh(MESH_PATH)
    vr = np.linalg.norm(mesh.coords, axis=1)
    mesh = extract_cells(mesh, vr[mesh.cells].max(axis=1) > 0.05 + 1e-9)
    mesh = retag_boundary(mesh, tag_fn)
    if refine:
        mesh = refine_uniform(
            mesh, refine, snap_boundary={13: circle_projector((0.0, 0.0), 0.05)}
        )
    return mesh
