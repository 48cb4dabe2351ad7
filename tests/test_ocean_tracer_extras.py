"""Ideal-age / exponential-decay tracers and frazil formation.

Parity model: mpas_ocn_tracer_ideal_age.F, _exponential_decay.F,
mpas_ocn_frazil_forcing.F capabilities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.core import OcnConfig, ocn_timestep
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
from mpas_tpu.cores.ocean import tracer_extras as tx


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(6, 10, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=8)
    grid = jax.tree.map(jnp.asarray, grid)
    state = jax.tree.map(jnp.asarray, state)
    # append an age tracer initialized to zero
    age = jnp.zeros(state.tracers.shape[:-1] + (1,))
    return grid, state.replace(
        tracers=jnp.concatenate([state.tracers, age], axis=-1))


def test_ideal_age_ages_interior_resets_surface(channel):
    grid, state = channel
    tr = state.tracers
    for _ in range(3):
        tr = tx.ideal_age_step(tr, 2, 600.0)
    age = np.asarray(tr[..., 2])
    assert np.allclose(age[:, 0], 0.0)          # surface reset
    assert np.allclose(age[:, 1:], 1800.0)      # interior aged 3 steps


def test_exponential_decay_halflife(channel):
    grid, state = channel
    tr = state.tracers.at[..., 2].set(1.0)
    efold = 86400.0
    tr = tx.exponential_decay_step(tr, 2, efold, efold)
    np.testing.assert_allclose(np.asarray(tr[..., 2]),
                               np.exp(-1.0), rtol=1e-12)


def test_frazil_restores_to_freezing_and_makes_ice(channel):
    grid, state = channel
    cfg = OcnConfig()
    # supercool the top two layers by 0.5 K below freezing
    S = state.tracers[..., 1]
    t_freeze = tx.freezing_temperature(S)
    T = state.tracers[..., 0]
    T = T.at[:, :2].set(t_freeze[:, :2] - 0.5)
    st = state.replace(tracers=state.tracers.at[..., 0].set(T))
    out, frazil = tx.frazil_adjustment(cfg, st, 600.0)
    T1 = np.asarray(out.tracers[..., 0])
    tf = np.asarray(t_freeze)
    np.testing.assert_allclose(T1[:, :2], tf[:, :2], atol=1e-10)
    assert np.all(np.asarray(frazil) > 0.0)
    # energy consistency: ice volume = heat deficit / (rho_i L)
    h = np.asarray(st.layerThickness)
    expect = (cfg.config_density0 * tx.CP_SW * 0.5 * h[:, :2].sum(1)
              / (tx.RHO_ICE * tx.LATENT_FUSION))
    np.testing.assert_allclose(np.asarray(frazil), expect, rtol=1e-10)
    # brine rejection raises salinity where ice formed
    assert np.all(np.asarray(out.tracers[..., 1])[:, 0]
                  >= np.asarray(st.tracers[..., 1])[:, 0])


def test_wired_into_timestep(channel):
    grid, state = channel
    cfg = OcnConfig(config_time_integrator="RK4", config_dt=60.0,
                    config_use_ideal_age=True, config_use_frazil=True)
    out = ocn_timestep(grid, cfg, state, 60.0)
    assert np.all(np.isfinite(np.asarray(out.tracers)))
    age = np.asarray(out.tracers[..., 2])
    assert np.allclose(age[:, 0], 0.0)
    assert age[:, 1:].max() > 0.0
