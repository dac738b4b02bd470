"""CLI driver smoke tests (in-process) and utils coverage."""

import json
import os

import numpy as np
import pytest

from navier_stokes_tpu.__main__ import main as cli_main
from navier_stokes_tpu.config import SolverConfig
from navier_stokes_tpu.utils.timers import PhaseTimers


def test_cli_info(capsys, ref_mesh_dir):
    rc = cli_main(["info", "--mesh", os.path.join(ref_mesh_dir, "mesh-square-h0.100000.msh")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "nodes=121" in out and '"n_total": 1003' in out


def test_cli_run(tmp_path, capsys):
    cfg = {
        "inlet_tags": [0], "neumann_tags": [1], "wall_tags": [2, 3],
        "nu": 0.04, "p_out": 10.0, "T": 0.05, "dt": 0.05,
        "krylov": {"max_iters": 500},
    }
    cfgfile = tmp_path / "cfg.json"
    cfgfile.write_text(json.dumps(cfg))
    rc = cli_main([
        "run",
        "--mesh", "/root/reference/mesh/mesh-square-h0.100000.msh",
        "--config", str(cfgfile),
        "--output-dir", str(tmp_path / "out"),
        "--log-json", str(tmp_path / "log.json"),
    ])
    assert rc == 0
    assert (tmp_path / "out" / "output-0001.h5").exists()
    records = json.loads((tmp_path / "log.json").read_text())
    assert any(r.get("event") == "newton" for r in records)
    out = capsys.readouterr().out
    assert "Newton iteration" in out


def test_cli_stokes(tmp_path):
    rc = cli_main([
        "stokes",
        "--mesh", "/root/reference/mesh/mesh-square-h0.100000.msh",
        "--output-dir", str(tmp_path),
        "--log-json", str(tmp_path / "log.json"),
    ])
    assert rc == 0
    assert (tmp_path / "output-0000.h5").exists()
    records = json.loads((tmp_path / "log.json").read_text())
    assert any(r.get("event") == "gmres" for r in records)


def test_config_roundtrip(tmp_path):
    cfg = SolverConfig()
    cfg.krylov.matvec = "windowed"
    d = cfg.to_dict()
    cfg2 = SolverConfig.from_dict(d)
    assert cfg2.krylov.matvec == "windowed"
    assert cfg2.inlet_tags == (11,)
    f = tmp_path / "c.json"
    f.write_text(json.dumps(d))
    cfg3 = SolverConfig.from_file(str(f))
    assert cfg3.nu == cfg.nu and cfg3.newton.tol == cfg.newton.tol


def test_phase_timers():
    import jax.numpy as jnp

    t = PhaseTimers()
    with t("work", jnp.zeros(10)):
        x = jnp.ones(1000).sum()
    with t("work"):
        float(x)
    assert t.counts["work"] == 2
    assert t.totals["work"] > 0
    assert "work" in t.report()
    assert t.as_dict()["work"]["calls"] == 2
