"""Native C++ meshkit must be bit-identical to the numpy reference path."""

import os

import numpy as np
import pytest

from navier_stokes_tpu.mesh import meshkit
from navier_stokes_tpu.mesh.mesh import extract_edges
from navier_stokes_tpu.mesh.msh_io import read_msh_bytes

pytestmark = pytest.mark.skipif(
    not meshkit.available(), reason="libmeshkit.so not built (make -C csrc)"
)

MESHES = [
    "correct_mesh_yt.msh",      # v2.2 2D
    "mesh_poli.msh",            # v2.2 2D big
    "mesh-square-h0.012500.msh",  # v4.1 2D
    "mesh2d.msh",               # v4.1 with parametric nodes
    "mesh-step-5.msh",          # v4.1 3D tet
]


@pytest.mark.parametrize("name", MESHES)
def test_native_matches_python(ref_mesh_dir, name):
    path = os.path.join(ref_mesh_dir, name)
    mn = meshkit.read_msh_native(path)
    with open(path, "rb") as f:
        mp = read_msh_bytes(f.read())
    assert mn.dim == mp.dim
    np.testing.assert_allclose(mn.coords, mp.coords)
    np.testing.assert_array_equal(mn.cells, mp.cells)
    # facets compared as sorted sets (orientation may differ)
    def facet_set(m):
        return {tuple(sorted(f)) + (t,) for f, t in zip(m.boundary_facets, m.boundary_tags)}
    assert facet_set(mn) == facet_set(mp)


@pytest.mark.parametrize("name", MESHES)
def test_native_edges_match(ref_mesh_dir, name):
    path = os.path.join(ref_mesh_dir, name)
    m = meshkit.read_msh_native(path)
    en, cen = meshkit.extract_edges_native(m.cells, m.dim)
    ep, cep = extract_edges(m.cells, m.dim)
    np.testing.assert_array_equal(en, ep)
    np.testing.assert_array_equal(cen, cep)


def test_surface_mesh_rejected_native(ref_mesh_dir):
    with pytest.raises(NotImplementedError):
        meshkit.read_msh_native(os.path.join(ref_mesh_dir, "mesh_gg.msh"))
