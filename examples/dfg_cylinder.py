"""DFG flow-past-a-cylinder benchmark (Re=100) with Cd/Cl tracking.

BASELINE.json config #3/#4: the shipped DFG channel mesh (mesh_poli.msh,
2.2 x 0.41 channel offset to [-0.2, 2.0] x [-0.2, 0.21], cylinder r=0.05 at
the origin), parabolic inflow with mean velocity 1 -> Re = u_mean*D/nu = 100.

The shipped mesh carries no physical groups (all boundary tag 0 — the
reference's hardcoded ids 10-13 could never have matched it), so boundaries
are retagged geometrically to the reference's id convention.  Runs with the
CORRECTED formulation flags (standard convection + continuity residual): the
quirk-faithful variant is for trajectory parity, not physics.

Usage: python examples/dfg_cylinder.py [outdir] [T] [dt]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import navier_stokes_tpu as ns
from navier_stokes_tpu.mesh.mesh import retag_boundary
from navier_stokes_tpu.models.functionals import BoundaryForce, strouhal_number

D = 0.1          # cylinder diameter
H = 0.41         # channel height
U_MEAN = 1.0     # mean inflow -> Re = 100 at nu = 1e-3
U_M = 1.5 * U_MEAN


def tag_fn(mid):
    tags = np.full(len(mid), 12, dtype=np.int32)  # walls
    tags[np.isclose(mid[:, 0], -0.2, atol=1e-6)] = 11  # inlet
    tags[np.isclose(mid[:, 0], 2.0, atol=1e-6)] = 10   # outlet
    r = np.linalg.norm(mid, axis=1)
    tags[r < 0.09] = 13  # cylinder
    return tags


def inflow(x, t=0.0):
    v = np.zeros_like(x)
    y = x[:, 1] + 0.2  # channel occupies y in [-0.2, 0.21]
    v[:, 0] = 4.0 * U_M * y * (H - y) / H**2
    return v


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "dfg_out"
    T = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    dt = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
    os.makedirs(outdir, exist_ok=True)

    mesh = retag_boundary(
        ns.read_msh("/root/reference/mesh/mesh_poli.msh"), tag_fn
    )
    cfg = ns.SolverConfig(T=T, dt=dt, nu=1e-3, rho=1.0, p_out=0.0)
    cfg.convection_form = "standard"
    cfg.include_continuity_residual = True
    cfg.jacobian_mass_rho = True
    cfg.krylov.max_iters = 3000
    cfg.krylov.matvec = "windowed"
    cfg.newton.max_iters = 30  # full-step Newton can crawl in fast transients

    log = ns.RunLog()
    solver = ns.NavierStokesSolver(mesh, cfg, log=log, inlet=inflow)
    solver.setup()
    force = BoundaryForce(solver.dofs, tags=(13,), nu=cfg.nu, rho=cfg.rho)

    series = []

    def track(step, t, sol):
        cd, cl = force.coefficients(sol, u_mean=U_MEAN, length=D)
        series.append({"step": step, "t": t, "cd": cd, "cl": cl})
        log.print(f"  Cd = {cd:+.5f}   Cl = {cl:+.5f}")

    solver.output_hooks.append(track)
    t0 = time.time()
    solver.solve()
    wall = time.time() - t0

    st = strouhal_number([s["cl"] for s in series], dt, D, U_MEAN)
    with open(os.path.join(outdir, "cd_cl_series.json"), "w") as f:
        json.dump({"re": 100, "wall_seconds": wall, "strouhal": st, "series": series}, f, indent=1)
    print(f"\nRe=100 cylinder: {len(series)} steps in {wall:.1f}s; "
          f"final Cd={series[-1]['cd']:.4f} Cl={series[-1]['cl']:+.4f} St={st:.3f}")


if __name__ == "__main__":
    main()
