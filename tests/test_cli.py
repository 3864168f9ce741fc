"""CLI smoke tests (scripts/run_sim.py, scripts/make_demo_ic.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ,
       "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}


def run(args, timeout=420):
    return subprocess.run([sys.executable] + args, cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=timeout)


def test_run_sim_model_cli(tmp_path):
    r = run(["scripts/run_sim.py", "--model", "lcdm", "--steps", "2",
             "--n-part", "512", "--cpu", "--engine", "pm"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "photoNs-TPU" in r.stdout
    assert "done in" in r.stdout


def test_run_sim_paramfile_cli(tmp_path):
    ic = tmp_path / "ic.gdt2"
    r = run(["scripts/make_demo_ic.py", str(ic), "--n-side", "8"])
    assert r.returncode == 0, r.stderr[-800:]
    param = tmp_path / "t.run"
    param.write_text(f"""CodeProj clitest
InputPath {ic}
SnapFormat 2
OutputPath {tmp_path}
OutputName cli
OPENANGLE 0.4
MaxPackage 16
NumMeshSide 16
""")
    r = run(["scripts/run_sim.py", str(param), "--steps", "2", "--cpu",
             "--engine", "pm"])
    assert r.returncode == 0, r.stderr[-800:]
    assert any(f.name.startswith("cli_") for f in tmp_path.iterdir())


def test_run_sim_bad_paramfile(tmp_path):
    bad = tmp_path / "bad.run"
    bad.write_text("Bogus 1\n")
    r = run(["scripts/run_sim.py", str(bad), "--cpu"])
    assert r.returncode != 0
    assert "unknown parameter" in (r.stderr + r.stdout)
