"""ctypes bindings for the native meshkit library (csrc/meshkit.cpp).

The native component of the host runtime (the role deal.II's C++ mesh stack
plays for the reference): fast gmsh parsing and edge/topology extraction for
10M-DoF-scale setup.  Falls back transparently to the numpy implementations
when the shared library has not been built (``make -C csrc``).

Drop-in equivalence with the numpy path is guaranteed by tests: edges are
re-sorted lexicographically to match ``np.unique`` ordering, so DoF numbering
is bit-identical across backends.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _build(csrc_dir: str) -> bool:
    """Build libmeshkit.so on first use (the binary is not committed)."""
    import subprocess

    try:
        r = subprocess.run(
            ["make", "-C", csrc_dir, "-s"],
            capture_output=True, timeout=120,
        )
        return r.returncode == 0
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    csrc = os.path.join(here, "csrc")
    path = os.path.join(csrc, "libmeshkit.so")
    if not os.path.exists(path) and not (_build(csrc) and os.path.exists(path)):
        return None
    lib = ctypes.CDLL(path)
    lib.meshkit_parse.restype = ctypes.c_void_p
    lib.meshkit_parse.argtypes = [ctypes.c_char_p]
    lib.meshkit_error.restype = ctypes.c_char_p
    lib.meshkit_error.argtypes = [ctypes.c_void_p]
    for name in ("meshkit_dim",):
        getattr(lib, name).restype = ctypes.c_int32
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("meshkit_n_nodes", "meshkit_n_cells", "meshkit_n_bfacets"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.meshkit_coords.restype = ctypes.POINTER(ctypes.c_double)
    lib.meshkit_coords.argtypes = [ctypes.c_void_p]
    for name in ("meshkit_cells", "meshkit_cell_tags", "meshkit_bfacets", "meshkit_btags"):
        getattr(lib, name).restype = ctypes.POINTER(ctypes.c_int32)
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.meshkit_free.argtypes = [ctypes.c_void_p]
    lib.meshkit_edges.restype = ctypes.c_int64
    lib.meshkit_edges.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_msh_native(path: str, name: str | None = None):
    """Parse a .msh with the native library; returns a Mesh (or raises)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmeshkit.so not built (run: make -C csrc)")
    h = lib.meshkit_parse(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        err = lib.meshkit_error(h)
        if err:
            raise ValueError(f"meshkit: {err.decode()}")
        dim = lib.meshkit_dim(h)
        nn = lib.meshkit_n_nodes(h)
        nc = lib.meshkit_n_cells(h)
        nb = lib.meshkit_n_bfacets(h)
        npc = 4 if dim == 3 else 3
        coords3 = np.ctypeslib.as_array(lib.meshkit_coords(h), shape=(nn, 3)).copy()
        cells = np.ctypeslib.as_array(lib.meshkit_cells(h), shape=(nc, npc)).copy()
        cell_tags = np.ctypeslib.as_array(lib.meshkit_cell_tags(h), shape=(nc,)).copy()
        bf = np.ctypeslib.as_array(lib.meshkit_bfacets(h), shape=(nb, npc - 1)).copy()
        bt = np.ctypeslib.as_array(lib.meshkit_btags(h), shape=(nb,)).copy()
    finally:
        lib.meshkit_free(h)

    if dim == 2:
        zspan = coords3[:, 2].max() - coords3[:, 2].min() if nn else 0.0
        if zspan > 1e-12 * max(1.0, np.abs(coords3).max()):
            raise NotImplementedError(f"{path}: surface mesh not supported")

    from .mesh import Mesh
    from .msh_io import _delete_unused_vertices

    coords, cells64, bf64 = _delete_unused_vertices(
        coords3[:, :dim], cells.astype(np.int64), bf.astype(np.int64)
    )
    return Mesh(
        coords=coords,
        cells=cells64.astype(np.int32),
        boundary_facets=bf64.astype(np.int32),
        boundary_tags=bt,
        name=name or path,
        cell_tags=cell_tags,
    )


def extract_edges_native(cells: np.ndarray, dim: int):
    """Native unique-edge extraction, reordered to match np.unique ordering."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmeshkit.so not built")
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc, npc = cells.shape
    epc = 6 if npc == 4 else 3
    cap = nc * epc
    edges = np.empty((cap, 2), dtype=np.int32)
    cell_edges = np.empty((nc, epc), dtype=np.int32)
    n = lib.meshkit_edges(
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nc,
        npc,
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
        cell_edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        raise RuntimeError("meshkit_edges capacity exceeded")
    edges = edges[:n]
    # match numpy extract_edges (np.unique lexicographic order)
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    inv = np.empty(n, dtype=np.int32)
    inv[order] = np.arange(n, dtype=np.int32)
    return edges[order].copy(), inv[cell_edges]
