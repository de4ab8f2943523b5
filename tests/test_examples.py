"""Smoke-run the cheap example scripts (the reference runs its examples in a
dedicated CI lane, `examples_CI.yml` — SURVEY §4). Executed in-process so
the conftest's CPU backend applies; the heavy global examples
(`soil_heat_global.py`, `land_global.py`) are exercised on the real chip
instead (they also power the benchmark configs).
"""
import pathlib
import runpy
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"


@pytest.mark.parametrize("script,argv", [
    ("extending_linear_heat.py", []),
    ("esm_coupling.py", []),
    ("extending_snow_ddm.py", ["--days", "1"]),
    ("extending_exp_growth.py", []),
    ("land_snow_winter.py", ["--days-per-season", "2"]),
    ("soil_heat_global_era5.py", ["--days", "1", "--nz", "8"]),
    ("budget_tracking.py", []),
])
def test_example_runs(script, argv, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # scripts may write output files
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(str(EXAMPLES / script), run_name="__main__")
