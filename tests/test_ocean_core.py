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
