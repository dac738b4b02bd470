"""Checkpoint / resume: solution + time + step state to HDF5.

The reference has NO restart capability — its HDF5 output is visualization
only (SURVEY §5: "a run cannot resume").  Added here because multi-chip runs
at 10M DoF need it.  The checkpoint stores the full Taylor-Hood coefficient
vector, the previous-step solution (needed by the implicit-Euler time term,
cpp:666), scalar time state, and the config dict for validation.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(
    path, *, solution, solution_old, time, step, config=None, solution_old2=None
):
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("solution", data=np.asarray(solution, dtype=np.float64))
        f.create_dataset("solution_old", data=np.asarray(solution_old, dtype=np.float64))
        if solution_old2 is not None:  # BDF2 second history level
            f.create_dataset(
                "solution_old2", data=np.asarray(solution_old2, dtype=np.float64)
            )
        f.attrs["time"] = float(time)
        f.attrs["step"] = int(step)
        if config is not None:
            f.attrs["config"] = json.dumps(config)
    return path


def load_checkpoint(path):
    import h5py

    with h5py.File(path, "r") as f:
        out = {
            "solution": f["solution"][:],
            "solution_old": f["solution_old"][:],
            "time": float(f.attrs["time"]),
            "step": int(f.attrs["step"]),
        }
        if "solution_old2" in f:
            out["solution_old2"] = f["solution_old2"][:]
        if "config" in f.attrs:
            out["config"] = json.loads(f.attrs["config"])
    return out
