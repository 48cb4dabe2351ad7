"""Ocean surface forcing: wind stress, shortwave absorption, restoring.

Parity model: mpas_ocn_vel_forcing_surface_stress.F /
mpas_ocn_tracer_short_wave_absorption.F (Jerlov) /
mpas_ocn_tracer_surface_restoring.F behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.core import OcnConfig, run_steps
from mpas_tpu.cores.ocean.forcing import (OcnSurfaceForcing,
                                          shortwave_heating,
                                          surface_stress_tend,
                                          zero_forcing)
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(8, 16, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    return (jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state))


def test_wind_stress_accelerates_surface_only(channel):
    grid, state = channel
    cfg = OcnConfig()
    frc = zero_forcing(grid.mesh.nCells).replace(
        windStressZonal=jnp.full(grid.mesh.nCells, 0.1))
    du = np.asarray(surface_stress_tend(grid, cfg, frc,
                                        state.layerThickness))
    assert np.all(du[:, 1:] == 0.0)
    # zonal stress projects onto +east edges
    ne = np.cos(np.asarray(grid.mesh.angleEdge))
    interior = np.asarray(grid.mesh.boundaryEdge) == 0
    assert np.allclose(np.sign(du[interior, 0]),
                       np.sign(ne[interior]), atol=1e-12)
    # magnitude ~ tau/(rho0 h) = 0.1/(1026*100) ~ 1e-6
    assert du[interior, 0].max() == pytest.approx(
        0.1 / (cfg.config_density0 * 100.0), rel=0.05)


def test_jerlov_profile_decays_and_sums_to_less_than_flux(channel):
    grid, state = channel
    cfg = OcnConfig()
    frc = zero_forcing(grid.mesh.nCells).replace(
        shortwaveFlux=jnp.full(grid.mesh.nCells, 200.0))
    q = np.asarray(shortwave_heating(cfg, frc, state.layerThickness))
    assert np.all(q >= 0.0)
    assert np.all(np.diff(q, axis=1) <= 1e-15)    # decays downward
    # column integral <= total incoming converted to K m/s
    total = q.sum(axis=1) * cfg.config_density0 * 3996.0
    assert np.all(total <= 200.0 + 1e-9)
    assert np.all(total > 100.0)                  # most absorbed in column


def test_restoring_pulls_sst_and_run_remains_conservative_without_fluxes(
        channel):
    grid, state = channel
    cfg = OcnConfig(config_dt=30.0)
    sst0 = float(jnp.mean(state.tracers[:, 0, 0]))
    frc = zero_forcing(grid.mesh.nCells).replace(
        sstRestore=jnp.full(grid.mesh.nCells, sst0 + 5.0),
        sssRestore=state.tracers[:, 0, 1])
    out = run_steps(grid, cfg, state, 120, frc)
    sst1 = float(jnp.mean(out.tracers[:, 0, 0]))
    assert sst1 > sst0 + 0.001
    assert bool(jnp.all(jnp.isfinite(out.u)))


def test_wind_driven_spinup(channel):
    grid, state = channel
    cfg = OcnConfig(config_dt=30.0)
    frc = zero_forcing(grid.mesh.nCells).replace(
        windStressZonal=jnp.full(grid.mesh.nCells, 0.1),
        sstRestore=state.tracers[:, 0, 0],
        sssRestore=state.tracers[:, 0, 1])
    out = run_steps(grid, cfg, state, 120)
    out_f = run_steps(grid, cfg, state, 120, frc)
    # forced run develops stronger surface current than unforced
    assert float(jnp.max(jnp.abs(out_f.u[:, 0]))) \
        > float(jnp.max(jnp.abs(out.u[:, 0])))
