"""Frozen-trajectory parity tests: any dycore-term change fails these.

Golden-data model (BASELINE.md requires allclose vs MPAS v7.0 outputs; the
Fortran reference is NOT buildable in this environment — no gfortran, no
MPI/PIO/netCDF-Fortran toolchain — so reference-generated netCDF cannot be
produced here). The strongest available substitute, and the VERDICT round-1
"Done" criterion, is a vendored trajectory snapshot: a JW baroclinic-wave
run and an SW TC5 run on fixed small meshes, in float64 on CPU, compared
field-by-field against committed .npz goldens at near-roundoff tolerance.
Any change to any tendency term, operator weight, or integrator coefficient
moves the trajectory far beyond 1e-9 relative and fails.

Regenerate (ONLY after an intentional, adjudicated dycore change):
    python tests/test_parity_dycore.py --regenerate
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
JW_STEPS = 24
SW_STEPS = 48
RTOL = 1e-9
ATOL = 1e-11


def _jw_trajectory():
    from mpas_tpu.cores.atmosphere.config import AtmConfig
    from mpas_tpu.cores.atmosphere.init_jw import init_jw
    from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                            run_steps)
    from mpas_tpu.mesh.sphere import icosahedral_mesh
    mesh = icosahedral_mesh(8, lloyd_iters=2)
    cfg = AtmConfig(config_nvertlevels=10, config_len_disp=960000.0,
                    config_dt=1200.0, config_number_of_sub_steps=2)
    grid, state, diag = init_jw(mesh, cfg, case=2)
    grid = jax.tree.map(jnp.asarray, grid)
    carry = init_carry(grid, cfg, jax.tree.map(jnp.asarray, state),
                       jax.tree.map(jnp.asarray, diag), cfg.config_dt)
    out = run_steps(grid, cfg, carry, cfg.config_dt, JW_STEPS)
    return {"u": np.asarray(out.state.u), "w": np.asarray(out.state.w),
            "theta_m": np.asarray(out.state.theta_m),
            "rho_zz": np.asarray(out.state.rho_zz)}


def _sw_trajectory():
    from mpas_tpu.cores.sw import test_cases as tc
    from mpas_tpu.cores.sw.config import SWConfig
    from mpas_tpu.cores.sw.time_integration import run_steps as sw_run
    from mpas_tpu.mesh.mesh import to_device
    from mpas_tpu.mesh.sphere import icosahedral_mesh
    mesh = icosahedral_mesh(8, lloyd_iters=2)
    mesh_s, state, h_s = tc.SETUPS[5](mesh)
    cfg = SWConfig(config_dt=900.0, config_test_case=5)
    out = sw_run(to_device(mesh_s), cfg, jax.tree.map(jnp.asarray, state),
                 jnp.asarray(h_s), SW_STEPS)
    return {"u": np.asarray(out.u), "h": np.asarray(out.h)}


_CASES = {"jw_case2": _jw_trajectory, "sw_tc5": _sw_trajectory}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_frozen_trajectory(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"golden file {path} missing — run "
        "`python tests/test_parity_dycore.py --regenerate`")
    golden = np.load(path)
    got = _CASES[name]()
    for key in golden.files:
        g, v = golden[key], got[key]
        assert g.shape == v.shape, (name, key, g.shape, v.shape)
        err = np.abs(v - g)
        tol = ATOL + RTOL * np.abs(g)
        worst = float((err / np.maximum(tol, 1e-300)).max())
        assert (err <= tol).all(), (
            f"{name}/{key}: trajectory deviates from golden "
            f"(worst err/tol ratio {worst:.3g}) — a dycore term changed. "
            "If the change is intentional and adjudicated, regenerate via "
            "`python tests/test_parity_dycore.py --regenerate`.")


if __name__ == "__main__":
    import sys
    if "--regenerate" in sys.argv:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in _CASES.items():
            out = fn()
            np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                                **out)
            print(f"wrote {name}.npz:",
                  {k: v.shape for k, v in out.items()})
    else:
        print(__doc__)


@pytest.mark.slow
def test_jw_baroclinic_wave_physical_benchmark():
    """Published-physics anchor (the non-self-referential parity check the
    frozen goldens cannot give): the Jablonowski & Williamson (2006, QJRMS)
    baroclinic wave grows slowly for ~6 days and then deepens rapidly —
    in their Fig. 6/7 the surface-pressure minimum stays flat
    through day 4 and then deepens rapidly (~25-40 hPa between days 8
    and 10 at high resolution; coarse grids deepen later). Asserted here
    on the 480-km mesh via the relative deepening of the minimum MSLP:
    quiet start, near-quiet day 8, and > 15 hPa breaking by day 10."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mpas_tpu.cores.atmosphere.config import AtmConfig
    from mpas_tpu.cores.atmosphere.diagnostics.isobaric import mslp
    from mpas_tpu.cores.atmosphere.init_jw import init_jw
    from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                            run_steps)
    from mpas_tpu.constants import cp, p0, rgas
    from mpas_tpu.mesh.cache import cached
    from mpas_tpu.mesh.sphere import icosahedral_mesh

    mesh = cached("icos16_l4", lambda: icosahedral_mesh(16, lloyd_iters=4))
    cfg = AtmConfig(config_nvertlevels=26, config_dt=1200.0,
                    config_len_disp=480000.0)
    grid, state, diag = init_jw(mesh, cfg, case=2)
    gj = jax.tree.map(jnp.asarray, grid)
    carry = init_carry(gj, cfg, jax.tree.map(jnp.asarray, state),
                       jax.tree.map(jnp.asarray, diag), cfg.config_dt)

    def min_ps(c):
        p = p0 * np.asarray(c.diag.exner) ** (cp / rgas)
        t = np.asarray(c.state.theta_m * c.diag.exner)
        z_sfc = np.asarray(gj.zgrid)[:, 0]
        ps = np.asarray(mslp(jnp.asarray(p[:, 0]), jnp.asarray(t[:, 0]),
                             jnp.asarray(z_sfc)))
        return float(ps.min()) / 100.0

    steps_per_day = int(86400 / cfg.config_dt)
    mins = {0: min_ps(carry)}
    for day in (4, 8, 10):
        prev = max(d for d in mins if d < day)
        carry = run_steps(gj, cfg, carry, cfg.config_dt,
                          (day - prev) * steps_per_day)
        mins[day] = min_ps(carry)
        assert np.isfinite(np.asarray(carry.state.u)).all(), day

    # JW06 growth timing, resolution-aware (their Section 4c: coarse
    # grids delay the breaking by ~1-2 days and weaken it): the flow is
    # quiet through day 4 (pressure-minimum drift < 2 hPa), stays
    # near-quiet at day 8 on this 480-km mesh, and the wave has broken by
    # day 10 with the minimum deepened by > 15 hPa — the published rapid
    # day-8-to-10 deepening phase (JW06 Fig. 7 shows ~25-40 hPa at high
    # resolution).
    assert abs(mins[4] - mins[0]) < 2.0, mins
    assert mins[8] < mins[0] + 2.0, mins
    assert mins[10] < mins[8] - 5.0, mins
    assert mins[10] < mins[0] - 15.0, mins
