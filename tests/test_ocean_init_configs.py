"""Ocean init-mode configurations: overflow, internal waves, cosine bell.

Parity model: the compass test groups for these configurations
(overflow default, internal_waves default, cosine bell transport)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.mesh.sphere import icosahedral_mesh
from mpas_tpu.cores.ocean.core import OcnConfig, run_steps
from mpas_tpu.cores.ocean.init_configs import (init_cosine_bell,
                                               init_internal_waves,
                                               init_overflow)


def _dev(grid, state):
    return jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state)


class TestOverflow:
    def test_dense_plume_sinks_and_conserves(self):
        m = channel_hex_mesh(6, 16, 5000.0)
        grid, state = init_overflow(m, nz=12)
        grid, state = _dev(grid, state)
        cfg = OcnConfig(config_dt=20.0, config_vert_mix_scheme="cvmix")
        area = grid.mesh.areaCell[:, None]
        vol0 = float(jnp.sum(state.layerThickness * area))
        out = run_steps(grid, cfg, state, 90)    # 30 min
        vol1 = float(jnp.sum(out.layerThickness * area))
        assert vol1 == pytest.approx(vol0, rel=1e-12)
        assert bool(jnp.all(jnp.isfinite(out.u)))
        # gravity current spins up
        assert float(jnp.max(jnp.abs(out.u))) > 0.01


class TestInternalWaves:
    def test_waves_oscillate_stably(self):
        m = channel_hex_mesh(6, 20, 5000.0)
        grid, state = init_internal_waves(m, nz=12)
        grid, state = _dev(grid, state)
        cfg = OcnConfig(config_dt=30.0)
        heat0 = float(jnp.sum(state.layerThickness * state.tracers[..., 0]
                              * grid.mesh.areaCell[:, None]))
        out = run_steps(grid, cfg, state, 120)
        heat1 = float(jnp.sum(out.layerThickness * out.tracers[..., 0]
                              * grid.mesh.areaCell[:, None]))
        assert heat1 == pytest.approx(heat0, rel=1e-12)
        umax = float(jnp.max(jnp.abs(out.u)))
        assert 1e-4 < umax < 1.0        # waves radiate, nothing blows up

    def test_interface_is_displaced(self):
        m = channel_hex_mesh(6, 20, 5000.0)
        grid, state = init_internal_waves(m, nz=12)
        t = np.asarray(state.tracers[..., 0])
        y = np.asarray(m.yCell)
        mid = np.argmin(np.abs(y - 0.5 * (y.min() + y.max())))
        edge = np.argmin(y)
        # interface raised in the center => cold water lifted => the center
        # column is colder at mid depth than the channel edge
        k = 7
        assert t[mid, k] < t[edge, k] - 0.5


class TestCosineBell:
    def test_bell_advects_and_stays_bounded(self):
        mesh = icosahedral_mesh(12, lloyd_iters=2).scaled(6371000.0)
        grid, state = init_cosine_bell(mesh, nz=3)
        grid, state = _dev(grid, state)
        cfg = OcnConfig(config_dt=600.0, config_time_integrator="RK4",
                        config_mom_del2=0.0, config_tracer_del2=0.0,
                        config_bottom_drag_coeff=0.0)
        area = grid.mesh.areaCell[:, None]
        bell0 = state.tracers[..., 2]
        mass0 = float(jnp.sum(bell0 * state.layerThickness * area))
        com0 = float(jnp.sum(grid.mesh.lonCell[:, None] * bell0 * area))
        out = run_steps(grid, cfg, state, 72)    # 12 h of rotation
        bell = out.tracers[..., 2]
        mass1 = float(jnp.sum(bell * out.layerThickness * area))
        assert mass1 == pytest.approx(mass0, rel=1e-10)
        assert float(jnp.min(bell)) > -0.2      # bounded undershoot
        assert float(jnp.max(bell)) < 1.2
        # the bell moved eastward: lon center of mass increased
        com1 = float(jnp.sum(grid.mesh.lonCell[:, None] * bell * area))
        assert com1 != pytest.approx(com0, rel=1e-6)
