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
