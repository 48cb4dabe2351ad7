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


class TestDebugChecks:
    """ref: MPAS_DEBUG / -ffpe-trap debug builds (SURVEY §5.2) as a
    host-side post-chunk NaN sweep with CRIT abort."""

    def test_clean_run_passes(self, tmp_path):
        from mpas_tpu.cores.sw.hooks import HOOKS
        from mpas_tpu.cores.sw.config import SWConfig
        from mpas_tpu.framework.driver import Driver
        cfg = SWConfig(config_dt=600.0, config_test_case=5,
                       config_run_duration="0:30:00",
                       config_debug_checks=True)
        d = Driver(HOOKS, cfg, run_dir=str(tmp_path), mesh_spec="icos:4")
        d.init()
        d.run()

    def test_nan_state_aborts(self, tmp_path):
        import dataclasses
        import jax
        import jax.numpy as jnp
        from mpas_tpu.cores.sw.hooks import HOOKS
        from mpas_tpu.cores.sw.config import SWConfig
        from mpas_tpu.framework.driver import Driver
        from mpas_tpu.framework.log import MPASLogError
        cfg = SWConfig(config_dt=600.0, config_test_case=5,
                       config_run_duration="0:30:00",
                       config_debug_checks=True)
        def poison(st, n):
            run = HOOKS.step_chunk(st, n)
            bad = run.state.replace(h=run.state.h * jnp.nan)
            return dataclasses.replace(run, state=bad)

        bad_hooks = dataclasses.replace(HOOKS, step_chunk=poison)
        d = Driver(bad_hooks, cfg, run_dir=str(tmp_path), mesh_spec="icos:4")
        d.init()
        with pytest.raises(MPASLogError, match="non-finite"):
            d.run()
