"""Run-driver integration: CLI-level end-to-end + restart continuation.

Parity model: the reference driver flow (mpas_subdriver) + the compass
restart_test genre applied through the real entry point."""

import os
import subprocess
import sys

import numpy as np
import pytest

from mpas_tpu.io.netcdf import read_netcdf


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "mpas_tpu"] + args,
                          cwd=cwd, capture_output=True, text=True,
                          timeout=500, env=env)


@pytest.mark.slow
def test_sw_cli_run_and_restart(tmp_path):
    r = _run(["sw", "--duration", "0:30:00", "--dt", "180", "--x64", "--mesh", "icos:8"],
             str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(os.listdir(tmp_path))
    outs = [f for f in files if f.startswith("output.sw.")]
    rsts = [f for f in files if f.startswith("restart.sw.")]
    assert len(outs) >= 2 and len(rsts) >= 1
    assert "restart_timestamp" in files

    ts = open(tmp_path / "restart_timestamp").read().strip()
    # continue the run from the restart and compare against a longer run
    nml = tmp_path / "namelist.sw"
    nml.write_text(f"""&sw_model
   config_dt = 180.0
   config_start_time = '{ts}'
   config_run_duration = '0:30:00'
   config_do_restart = .true.
/
""")
    r2 = _run(["sw", "-n", "namelist.sw", "--x64", "--mesh", "icos:8"],
              str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    log = open(tmp_path / "log.sw.0000.out").read()
    assert "Restarted from restart stream" in log

    # fresh 1h run must match run(30min)+restart(30min) bitwise
    fresh = tmp_path / "fresh"
    fresh.mkdir()
    r3 = _run(["sw", "--duration", "1:00:00", "--dt", "180", "--x64", "--mesh", "icos:8"],
              str(fresh))
    assert r3.returncode == 0, r3.stderr[-2000:]
    out_a = sorted(f for f in os.listdir(tmp_path)
                   if f.startswith("output.sw."))[-1]
    out_b = sorted(f for f in os.listdir(fresh)
                   if f.startswith("output.sw."))[-1]
    assert out_a == out_b            # same final timestamped filename
    da, _, _ = read_netcdf(str(tmp_path / out_a))
    db, _, _ = read_netcdf(str(fresh / out_b))
    assert np.array_equal(da["h"], db["h"])
    assert np.array_equal(da["u"], db["u"])
