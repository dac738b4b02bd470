"""DFG 2D-1 steady validation (Re=20): Cd/Cl/dP vs published benchmark bands.

Schaefer-Turek 2D-1: parabolic inflow U_m=0.3 (u_mean=0.2), Re = u_mean*D/nu
= 20, STEADY flow.  Published reference intervals (Turek's benchmark site):
    Cd in [5.5700, 5.5900]   (reference value 5.57953523384)
    Cl in [0.0104, 0.0110]   (reference value 0.010618948146)
    dP in [0.1172, 0.1176]   (reference value 0.11752016697)

This is the cheap ground-truth check for the whole force pipeline: it
exercises the same mesh, retagging, assembly, windowed matvec, Schur
preconditioner, Newton, and BoundaryForce as the unsteady Re=100 flagship,
but the target is a STEADY state with published 4-digit reference values —
any discretization or force-evaluation bias shows up directly, with no
transient/damping ambiguity.

Steady state is reached by implicit-Euler time marching with a moderate dt
from a Stokes initial guess (the reference's designed-but-dead path,
cpp:636-644, made live).  dt must stay moderate: at dt >~ 10 the A00 block
is convection-dominated (non-SPD) and the Schur preconditioners' inner CG
solves are invalid -> GMRES stalls.  dt=2 keeps the mass term dominant while
reaching steady state (channel transit time ~ 11 s) in ~20 steps.

Usage: python examples/dfg_steady_re20.py [refine] [dt] [nsteps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

import navier_stokes_tpu as ns
from navier_stokes_tpu.mesh.mesh import (
    circle_projector, extract_cells, refine_uniform, retag_boundary)
from navier_stokes_tpu.models.functionals import BoundaryForce

D = 0.1
H = 0.41


def tag_fn(mid):
    tags = np.full(len(mid), 12, dtype=np.int32)
    tags[np.isclose(mid[:, 0], -0.2, atol=1e-6)] = 11
    tags[np.isclose(mid[:, 0], 2.0, atol=1e-6)] = 10
    r = np.linalg.norm(mid, axis=1)
    tags[r < 0.09] = 13
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
    import navier_stokes_tpu as ns

    mesh = ns.read_msh("/root/reference/mesh/mesh_poli.msh")
    vr = np.linalg.norm(mesh.coords, axis=1)
    mesh = extract_cells(mesh, vr[mesh.cells].max(axis=1) > 0.05 + 1e-9)
    mesh = retag_boundary(mesh, tag_fn)
    if refine:
        mesh = refine_uniform(
            mesh, refine, snap_boundary={13: circle_projector((0.0, 0.0), 0.05)}
        )
    return mesh


def main():
    refine = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dt = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    u_mean = 0.2
    u_m = 1.5 * u_mean  # 0.3
    nu = u_mean * D / 20.0  # 0.001

    def inflow(x, t=0.0):
        v = np.zeros_like(x)
        y = x[:, 1] + 0.2
        v[:, 0] = u_m * 4.0 * y * (H - y) / H**2
        return v

    mesh = load_dfg_mesh(refine)

    cfg = ns.SolverConfig(T=dt * nsteps, dt=dt, nu=nu, rho=1.0, p_out=0.0)
    cfg.convection_form = "standard"
    cfg.include_continuity_residual = True
    cfg.jacobian_mass_rho = True
    cfg.time_scheme = "bdf1"
    cfg.initial_guess = "stokes"
    cfg.newton.tol = 1e-6
    cfg.newton.max_iters = 8
    cfg.krylov.rel_tol = 1e-4
    cfg.krylov.max_iters = 300
    cfg.krylov.matvec = "windowed"
    cfg.krylov.preconditioner = "cahouet_chabard"

    log = ns.RunLog(verbose=True)
    solver = ns.NavierStokesSolver(mesh, cfg, log=log, inlet=inflow)
    solver.setup()
    force = BoundaryForce(solver.dofs, tags=(13,), nu=cfg.nu, rho=cfg.rho)

    t0 = time.time()
    sol = solver.solve()
    wall = time.time() - t0

    cd, cl = force.coefficients(sol, u_mean=u_mean, length=D)
    # pressure difference p(front) - p(back): nearest pressure nodes to
    # (-0.05, 0) and (0.05, 0) (polygon vertices lie on the circle)
    p = solver.pressure(real_only=True)
    pc = solver.dofs.p_coords
    if getattr(solver.dofs, "p_mask", None) is not None:
        pc = pc[solver.dofs.p_mask]
    ia = int(np.argmin(np.linalg.norm(pc - np.array([-0.05, 0.0]), axis=1)))
    ib = int(np.argmin(np.linalg.norm(pc - np.array([0.05, 0.0]), axis=1)))
    dp = float(p[ia] - p[ib])

    print(f"\nDFG 2D-1 (Re=20, refine={refine}, {solver.dofs.n_total} DoF, {wall:.1f}s):")
    print(f"  Cd = {cd:.5f}   (published 5.5795, band [5.5700, 5.5900])")
    print(f"  Cl = {cl:+.5f}  (published 0.01062, band [0.0104, 0.0110])")
    print(f"  dP = {dp:+.5f}  (published 0.11752, band [0.1172, 0.1176])"
          f"  [front node {pc[ia]}, back node {pc[ib]}]")


if __name__ == "__main__":
    main()
