"""Shallow-water core correctness: conservation, steadiness, stability.

Parity model: the reference validates the SW core through Williamson test
cases + global diagnostics (ref: mpas_sw_global_diagnostics.F, SURVEY.md
§3.3); decisive invariants here are the TRiSK conservation properties and
TC2's analytic steady state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.mesh import to_device
from mpas_tpu.cores.sw import test_cases as tc
from mpas_tpu.cores.sw.config import SWConfig
from mpas_tpu.cores.sw.global_diagnostics import global_diagnostics
from mpas_tpu.cores.sw.time_integration import rk4_step, run_steps


def _setup(mesh, case, dt):
    mesh_s, state, h_s = tc.SETUPS[case](mesh)
    return (to_device(mesh_s), jax.tree.map(jnp.asarray, state),
            jnp.asarray(h_s), SWConfig(config_dt=dt, config_test_case=case))


@pytest.fixture(scope="module")
def tc2_day(sphere_mesh_small):
    mesh, state, h_s, cfg = _setup(sphere_mesh_small, 2, 600.0)
    final = run_steps(mesh, cfg, state, h_s, 144)
    return mesh, state, h_s, cfg, final


class TestTC2SteadyState:
    def test_h_stays_steady(self, tc2_day):
        mesh, state, h_s, cfg, final = tc2_day
        err = float(jnp.linalg.norm(final.h - state.h)
                    / jnp.linalg.norm(state.h))
        assert err < 5e-3

    def test_u_stays_steady(self, tc2_day):
        mesh, state, h_s, cfg, final = tc2_day
        err = float(jnp.linalg.norm(final.u - state.u)
                    / jnp.linalg.norm(state.u))
        assert err < 3e-2

    def test_mass_conserved_to_roundoff(self, tc2_day):
        mesh, state, h_s, cfg, final = tc2_day
        m0 = float(jnp.sum(state.h * mesh.areaCell))
        m1 = float(jnp.sum(final.h * mesh.areaCell))
        assert abs(m1 - m0) / m0 < 1e-12

    def test_energy_conserved(self, tc2_day):
        mesh, state, h_s, cfg, final = tc2_day
        d0 = global_diagnostics(mesh, state, h_s, cfg.config_dt)
        d1 = global_diagnostics(mesh, final, h_s, cfg.config_dt)
        rel = abs(float(d1["total_energy"] - d0["total_energy"])
                  / float(d0["total_energy"]))
        assert rel < 1e-9  # TRiSK conserves energy; RK4 drift only


class TestTC5Mountain:
    def test_stable_and_conservative(self, sphere_mesh_small):
        mesh, state, h_s, cfg = _setup(sphere_mesh_small, 5, 900.0)
        final = run_steps(mesh, cfg, state, h_s, 96)  # 1 day
        assert bool(jnp.all(jnp.isfinite(final.h)))
        assert bool(jnp.all(jnp.isfinite(final.u)))
        assert bool(jnp.all(final.h > 0.0))
        m0 = float(jnp.sum(state.h * mesh.areaCell))
        m1 = float(jnp.sum(final.h * mesh.areaCell))
        assert abs(m1 - m0) / m0 < 1e-12

    def test_tracer_mass_conserved(self, sphere_mesh_small):
        mesh, state, h_s, cfg = _setup(sphere_mesh_small, 5, 900.0)
        final = run_steps(mesh, cfg, state, h_s, 48)
        t0 = float(jnp.sum(state.tracers[:, 0] * state.h * mesh.areaCell))
        t1 = float(jnp.sum(final.tracers[:, 0] * final.h * mesh.areaCell))
        assert abs(t1 - t0) / abs(t0) < 1e-12


class TestTC6RossbyHaurwitz:
    def test_stable(self, sphere_mesh_small):
        mesh, state, h_s, cfg = _setup(sphere_mesh_small, 6, 600.0)
        final = run_steps(mesh, cfg, state, h_s, 72)
        assert bool(jnp.all(jnp.isfinite(final.h)))
        assert float(jnp.max(final.h)) < 12000.0  # wave stays bounded
        assert float(jnp.min(final.h)) > 5000.0


class TestNumericsProperties:
    def test_single_step_deterministic(self, sphere_mesh_small):
        mesh, state, h_s, cfg = _setup(sphere_mesh_small, 5, 900.0)
        a = rk4_step(mesh, cfg, state, h_s, cfg.config_dt)
        b = rk4_step(mesh, cfg, state, h_s, cfg.config_dt)
        assert np.array_equal(np.asarray(a.h), np.asarray(b.h))
        assert np.array_equal(np.asarray(a.u), np.asarray(b.u))

    @pytest.mark.slow
    def test_resolution_convergence_tc2(self, sphere_mesh_small,
                                        sphere_mesh_medium):
        """TC2 steady-state error decreases with resolution."""
        errs = []
        for m, dt, n in ((sphere_mesh_small, 600.0, 36),
                         (sphere_mesh_medium, 300.0, 72)):
            mesh, state, h_s, cfg = _setup(m, 2, dt)
            final = run_steps(mesh, cfg, state, h_s, n)  # 6 hours
            errs.append(float(jnp.linalg.norm(final.h - state.h)
                              / jnp.linalg.norm(state.h)))
        assert errs[1] < errs[0]


class TestFusedPath:
    def test_fused_matches_generic(self, sphere_mesh_small):
        """The gather-batched fused stage must reproduce the operator-built
        tendencies to roundoff."""
        from mpas_tpu.mesh.mesh import to_device
        from mpas_tpu.cores.sw import test_cases as tc
        from mpas_tpu.cores.sw.dynamics import (compute_scalar_tend,
                                                compute_tend,
                                                solve_diagnostics)
        from mpas_tpu.cores.sw.fused import stage_tendencies

        mesh, state, h_s = tc.test_case_5(sphere_mesh_small)
        cfg = SWConfig(config_dt=900.0, config_test_case=5,
                       config_h_mom_eddy_visc2=1.0e4)
        md = to_device(mesh)
        s = jax.tree.map(jnp.asarray, state)
        hs = jnp.asarray(h_s)
        dt = jnp.asarray(900.0)

        diag = solve_diagnostics(md, cfg, s, dt, hs)
        tu_ref, th_ref = compute_tend(md, cfg, s, diag, hs)
        tct_ref = compute_scalar_tend(md, cfg, s, diag,
                                      s.tracers * s.h[:, None])
        tu, th, tct = stage_tendencies(md, cfg, s, dt, hs)

        def close(a, b):
            scale = np.max(np.abs(np.asarray(b))) + 1e-30
            return np.max(np.abs(np.asarray(a) - np.asarray(b))) / scale

        assert close(tu, tu_ref) < 1e-13
        assert close(th, th_ref) < 1e-13
        assert close(tct, tct_ref) < 1e-13
