"""Tune the Cahouet-Chabard inner sweeps for the refine=1 DFG 2D-2 run.

At refine=1 (388k DoF) the refine=0 sweet spot (cc_iters_ap=4, outer cap 150)
stalls: the pressure-Laplacian condition number grows as h^-2, the outer
FGMRES hits its cap every sweep, and the Newton residual drifts up instead of
converging.  This probe runs a few settings back-to-back in ONE process (the
axon tunnel allows one TPU client at a time) over a short T and reports the
per-step GMRES work and the post-Newton residual, so the full 3200-step run
is launched with a setting known to converge.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r1_precond.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

import navier_stokes_tpu as ns

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
from dfg_cylinder import D, H, load_dfg_mesh  # noqa: E402

SETTINGS = [
    # (cc_iters_a00, cc_iters_ap, outer cap, precond_passes)
    (a00, ap, cap, pp)
    for spec in os.environ.get(
        "PROBE_SETTINGS", "2:10:300:1,2:16:300:1,4:10:300:1"
    ).split(",")
    for a00, ap, cap, pp in [tuple(int(x) for x in spec.split(":"))]
]
T_PROBE = float(os.environ.get("PROBE_T", "0.1"))
DT = 0.0025
RE = 100.0


def run_one(mesh, a00, ap, cap, pp=1):
    u_mean, u_m = 1.0, 1.5
    nu = u_mean * D / RE

    def inflow(x, t=0.0):
        v = np.zeros_like(x)
        y = x[:, 1] + 0.2
        prof = 4.0 * y * (H - y) / H**2
        v[:, 0] = u_m * prof
        if t < 2.0:
            v[:, 1] = 0.15 * u_m * np.sin(2.0 * np.pi * 3.0 * t) * prof
        return v

    cfg = ns.SolverConfig(T=T_PROBE, dt=DT, nu=nu, rho=1.0, p_out=0.0)
    cfg.convection_form = "standard"
    cfg.include_continuity_residual = True
    cfg.jacobian_mass_rho = True
    cfg.time_scheme = "bdf2"
    cfg.newton.tol = 1e-4
    cfg.newton.min_iters = 1
    cfg.newton.max_iters = 8
    cfg.krylov.rel_tol = 1e-4
    cfg.krylov.max_iters = cap
    cfg.krylov.matvec = "windowed"
    cfg.krylov.preconditioner = "cahouet_chabard"
    cfg.krylov.cc_iters_a00 = a00
    cfg.krylov.cc_iters_ap = ap
    cfg.krylov.precond_passes = pp

    solver = ns.NavierStokesSolver(
        mesh, cfg, log=ns.RunLog(verbose=False), inlet=inflow
    )
    solver.setup()

    rows = []

    def progress(step, t, f_chunk, res=None, iters=None):
        r = float(np.asarray(res)[-1]) if res is not None else float("nan")
        it = float(np.mean(iters)) if iters is not None else float("nan")
        rows.append((step, r, it))
        print(f"  step {step:4d} t={t:.3f} |r|={r:.2e} gmres/step={it:.0f}",
              flush=True)

    t0 = time.time()
    solver.solve_scanned(chunk=10, newton_iters=2, progress=progress)
    wall = time.time() - t0
    tail = rows[-2:]
    print(
        f"SETTING a00={a00} ap={ap} cap={cap} pp={pp}: wall={wall:.1f}s "
        f"final |r|={tail[-1][1]:.2e} gmres/step={np.mean([r[2] for r in tail]):.0f}",
        flush=True,
    )


def main():
    mesh = load_dfg_mesh(int(os.environ.get("DFG_REFINE", "1")))
    print(f"mesh: {mesh.n_cells} cells", flush=True)
    for a00, ap, cap, pp in SETTINGS:
        print(f"\n=== probing cc_iters_a00={a00} cc_iters_ap={ap} cap={cap} "
              f"pp={pp} ===", flush=True)
        run_one(mesh, a00, ap, cap, pp)


if __name__ == "__main__":
    main()
