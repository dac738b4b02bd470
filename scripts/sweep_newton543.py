"""Newton-step knob sweep at the bench headline size (543k DoF cylinder).

VERDICT r3 #6: cut the Cahouet-Chabard apply toward 2 ms and the Newton step
toward <=220 ms at 543k without growing the outer iteration count.  This
sweeps the inner-cycle composition (additive vs V(1,1)), sweep lengths, and
the FGMRES restart window (CGS2 cost scales with the FULL [restart+1, n]
buffer every iteration, not the filled prefix), timing whole forced Newton
steps exactly like bench.py's newton leg (distinct random states per launch
to defeat the axon repeat cache).

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/sweep_newton543.py

Measured (TPU v5e, 2026-08-20, one process — cross-process comparisons carry
20-60 ms launch-overhead variance):
    default(add,a2cg,ap8,r60)    newton 220.6 ms  iters 21
    ap-vcycle4                   newton 255.5 ms  iters 21
    ap-vcycle2                   newton 293.2 ms  iters 33
    both-vcycle,a1,ap2           newton 371.4 ms  iters 34-35
    r30                          newton 209.8 ms  iters 19-21
    ap-vcycle2,r30               newton 410.3 ms  iters 36-39
    ap-vcycle4,r30               newton 264.0 ms  iters 21
Conclusions: the restart window is the one free lever (CGS2 streams the full
[restart+1, n] buffer every iteration, so r30 saves ~5% at unchanged
convergence); the V(1,1) compositions LOSE at this size — each apply's two
extra bf16 block matvecs cost more than the outer iterations they save
(vcycle4 holds 21 iters but adds 35 ms; shorter sweeps degrade iterations
outright).  Defaults stay additive/r60: the restarted window must still
cover the 3D leg's ~40-iteration solves and the production examples' longer
weakly-pinned solves, where a short window forces extra restart cycles.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("SWEEP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SWEEP_PLATFORM"])

REFINE = int(os.environ.get("SWEEP_REFINE", "2"))

COMBOS = [
    # (label, dict of KrylovConfig overrides)
    ("default(add,a2cg,ap8,r60)", {}),
    ("ap-vcycle4", {"cc_cycle_ap": "vcycle", "cc_iters_ap": 4}),
    ("ap-vcycle2", {"cc_cycle_ap": "vcycle", "cc_iters_ap": 2}),
    ("both-vcycle,a1,ap2", {"cc_cycle_ap": "vcycle", "cc_cycle_a00": "vcycle",
                            "cc_iters_a00": 1, "cc_iters_ap": 2}),
    ("r30", {"restart": 30}),
    ("ap-vcycle2,r30", {"cc_cycle_ap": "vcycle", "cc_iters_ap": 2,
                        "restart": 30}),
]


def main():
    from navier_stokes_tpu.config import SolverConfig
    from navier_stokes_tpu.mesh.mesh import refine_uniform
    from navier_stokes_tpu.mesh.msh_io import read_msh
    from navier_stokes_tpu.models.navier_stokes import NavierStokesSolver
    from navier_stokes_tpu.utils.logging import RunLog

    mesh = refine_uniform(
        read_msh("/root/reference/mesh/correct_mesh_yt.msh"), REFINE
    )
    rng = np.random.default_rng(0)
    for label, over in COMBOS:
        cfg = SolverConfig()
        cfg.dtype = "float32"
        cfg.krylov.matvec = "windowed"
        cfg.krylov.preconditioner = "cahouet_chabard"
        cfg.krylov.max_iters = 300
        for k, v in over.items():
            setattr(cfg.krylov, k, v)
        s = NavierStokesSolver(mesh, cfg, log=RunLog(verbose=False))
        s.setup()
        n = s.dofs.n_total
        uo = s.solution_old
        bv = jnp.asarray(s.dirichlet.values(cfg.dt), dtype=uo.dtype)

        def u_rand():
            return jnp.asarray(0.05 * rng.standard_normal(n), dtype=uo.dtype)

        out = s._newton_iteration(u_rand(), uo, bv, cfg.dt, True)
        jax.block_until_ready(out[0])  # compile
        ts, its = [], []
        for _ in range(4):
            u = u_rand()
            t0 = time.perf_counter()
            out = s._newton_iteration(u, uo, bv, cfg.dt, True)
            float(np.asarray(out[0][0]))
            ts.append(time.perf_counter() - t0)
            its.append(int(out[2]))
        print(
            f"{label:28s} newton {np.median(ts)*1e3:6.1f} ms  iters={its}  "
            f"conv={bool(out[3])}",
            flush=True,
        )
        del s


if __name__ == "__main__":
    main()
