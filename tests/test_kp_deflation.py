"""Weakly-pinned Kp machinery: the f64 pinning probe, Schur-paired
outer-FGMRES deflation rows, and the AUTO Kp-coarse decision
(KrylovConfig.cc_coarse_agg = -1 / kp_deflate).

Mesh classes (calibration in fem/windowed_assembly.py):
  * long thin channel, outlet = one SHORT edge -> weakly pinned: near-null
    modes kept, paired with velocity responses; coarse auto-decision uses
    the measured amplification.
  * enclosed cavity (no Neumann tag) -> unpinned: probe skipped, no modes,
    coarse off (the exact constant nullspace is shift-handled instead).
"""

import numpy as np
import pytest

from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.mesh.generate import rectangle
from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
from navier_stokes_tpu.utils.logging import RunLog


def _solver(neumann, inlet=(0,), walls=(2, 3), nx=48, ny=6, x1=4.0, y1=0.4,
            **kryl):
    cfg = SolverConfig(inlet_tags=inlet, neumann_tags=neumann, wall_tags=walls,
                       nu=0.001, dt=0.05)
    cfg.krylov.matvec = "windowed"
    cfg.krylov.cells_per_block = 64
    cfg.krylov.preconditioner = "cahouet_chabard"
    for k, v in kryl.items():
        setattr(cfg.krylov, k, v)
    s = NavierStokesSolver(rectangle(nx, ny, 0, x1, 0, y1), cfg,
                           log=RunLog(verbose=False))
    s.setup()
    return s


def test_weakly_pinned_channel_gets_paired_modes():
    """A long channel pinned through one short edge must yield kept modes,
    each PAIRED with a velocity-response row (zero pressure part)."""
    s = _solver(neumann=(1,), kp_deflate=2)
    wa = s._wassembly
    assert wa.kp_modes is not None
    m = np.asarray(wa.kp_modes)
    assert m.shape[0] in (2, 4) and m.shape[0] % 2 == 0
    n_u = s.dofs.n_u
    # rows alternate (0, w) / (u_w, 0)
    for i in range(0, m.shape[0], 2):
        assert np.linalg.norm(m[i, :n_u]) == 0.0
        assert np.linalg.norm(m[i, n_u:]) > 0.9
        assert np.linalg.norm(m[i + 1, n_u:]) == 0.0
        assert np.linalg.norm(m[i + 1, :n_u]) > 0.9
    # rows are ~unit
    np.testing.assert_allclose(np.linalg.norm(m, axis=1), 1.0, rtol=1e-5)


def test_unpinned_cavity_skips_deflation_and_coarse():
    """No Neumann tag -> unpinned Kp: probe skipped (exact nullspace is
    shift-handled), no deflation rows, auto coarse resolves OFF."""
    s = _solver(neumann=(), inlet=(), walls=(0, 1, 2, 3), nx=12, ny=12,
                x1=1.0, y1=1.0, kp_deflate=2, cc_coarse_agg=-1)
    wa = s._wassembly
    assert wa.kp_modes is None
    assert wa.coarse_inv is None


def test_kp_deflate_zero_disables_rows():
    s = _solver(neumann=(1,), kp_deflate=0, cc_coarse_agg=0)
    assert s._wassembly.kp_modes is None


def test_explicit_coarse_agg_overrides_auto():
    """cc_coarse_agg = N > 0 forces the coarse space on regardless of the
    pinning probe."""
    s = _solver(neumann=(1,), kp_deflate=0, cc_coarse_agg=16)
    assert s._wassembly.coarse_inv is not None
