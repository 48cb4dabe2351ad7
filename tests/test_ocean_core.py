"""Ocean core: baroclinic channel stability + conservation.

Parity model: the compass baroclinic_channel test group (default/restart/
decomp genres; SURVEY §4) — here the decisive invariants are volume/heat
conservation and bounded frontal spin-up."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.core import (OcnConfig, equation_of_state_linear,
                                       run_steps)
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(8, 26, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    return (jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state))


class TestChannel:
    def test_mesh_has_walls(self):
        m = channel_hex_mesh(8, 10, 10000.0)
        assert int(np.sum(np.asarray(m.boundaryEdge))) == 2 * 8 * 2

    def test_spinup_stable_and_conservative(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_dt=30.0)
        area = grid.mesh.areaCell[:, None]
        vol0 = float(jnp.sum(state.layerThickness * area))
        heat0 = float(jnp.sum(state.layerThickness
                              * state.tracers[..., 0] * area))
        out = run_steps(grid, cfg, state, 240)      # 2 h
        assert bool(jnp.all(jnp.isfinite(out.u)))
        vol1 = float(jnp.sum(out.layerThickness * area))
        heat1 = float(jnp.sum(out.layerThickness
                              * out.tracers[..., 0] * area))
        assert abs(vol1 - vol0) / vol0 < 1e-12
        assert abs(heat1 - heat0) / abs(heat0) < 1e-12
        # frontal jet spins up but stays oceanic
        umax = float(jnp.max(jnp.abs(out.u)))
        assert 0.01 < umax < 3.0

    def test_no_flow_through_walls(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_dt=30.0)
        out = run_steps(grid, cfg, state, 120)
        bnd = grid.mesh.boundaryEdge > 0
        assert float(jnp.max(jnp.abs(out.u[bnd]))) == 0.0

    def test_salinity_inert(self, channel):
        """Uniform salinity must stay uniform (advection constancy)."""
        grid, state = channel
        cfg = OcnConfig(config_dt=30.0)
        out = run_steps(grid, cfg, state, 120)
        s = out.tracers[..., 1]
        assert float(jnp.max(jnp.abs(s - 35.0))) < 1e-9

    def test_rest_stays_at_rest(self, channel):
        """Uniform-T ocean at rest has no pressure gradients."""
        grid, state = channel
        state = state.replace(tracers=state.tracers.at[..., 0].set(10.0))
        cfg = OcnConfig(config_dt=30.0)
        out = run_steps(grid, cfg, state, 60)
        assert float(jnp.max(jnp.abs(out.u))) < 1e-10


class TestEOS:
    def test_linear_eos(self):
        cfg = OcnConfig()
        rho = equation_of_state_linear(cfg, jnp.asarray(5.0), jnp.asarray(35.0))
        assert abs(float(rho) - 1000.0) < 1e-12
        rho2 = equation_of_state_linear(cfg, jnp.asarray(6.0), jnp.asarray(35.0))
        assert float(rho2) == pytest.approx(999.8)


class TestSplitExplicit:
    """ref: ocn_time_integrator_split (mpas_ocn_time_integration_split.F:82);
    the split integrator must be stable at timesteps far beyond the
    barotropic CFL limit of the unsplit RK4 path and agree with it on
    resolved (slow) dynamics."""

    def test_stable_beyond_barotropic_cfl(self, channel):
        # dt=300 s: barotropic Courant ~3 — unsplit RK4 blows up here
        grid, state = channel
        cfg = OcnConfig(config_dt=300.0,
                        config_time_integrator="split_explicit")
        s = run_steps(grid, cfg, state, 144)      # 12 hours
        u = np.asarray(s.u)
        assert np.isfinite(u).all()
        assert np.abs(u).max() < 3.0
        ssh = np.asarray(jnp.sum(s.layerThickness, -1) - grid.bottomDepth)
        assert np.abs(ssh).max() < 1.0

    def test_matches_rk4_on_slow_dynamics(self, channel):
        grid, state = channel
        s_split = run_steps(grid, OcnConfig(config_dt=300.0), state, 36)
        s_rk4 = run_steps(
            grid, OcnConfig(config_dt=30.0, config_time_integrator="RK4"),
            state, 360)
        du = np.abs(np.asarray(s_split.u) - np.asarray(s_rk4.u)).max()
        uscale = float(jnp.abs(s_rk4.u).max())
        assert du < 0.02 * max(uscale, 0.1)
        dT = np.abs(np.asarray(s_split.tracers[..., 0])
                    - np.asarray(s_rk4.tracers[..., 0])).max()
        assert dT < 0.01

    def test_volume_conserved(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_dt=300.0)
        area = grid.mesh.areaCell[:, None]
        vol0 = float(jnp.sum(state.layerThickness * area))
        s = run_steps(grid, cfg, state, 72)
        vol1 = float(jnp.sum(s.layerThickness * area))
        assert abs(vol1 - vol0) / vol0 < 1e-10

    def test_unknown_integrator_raises(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_time_integrator="leapfrog")
        with pytest.raises(ValueError, match="config_time_integrator"):
            run_steps(grid, cfg, state, 1)
