"""GM bolus transport + Redi isoneutral mixing.

Parity model: mpas_ocn_gm.F invariants — bolus velocity is divergence-free
in the column integral (Psi = 0 at top/bottom), flattens isopycnals, and
Redi enhances vertical diffusion by kappa*S^2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.core import OcnConfig, equation_of_state, run_steps
from mpas_tpu.cores.ocean.gm import (bolus_velocity, isoneutral_slope,
                                     redi_vertical_enhancement)
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(8, 16, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    return (jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state))


def test_slope_sign_and_clip(channel):
    grid, state = channel
    cfg = OcnConfig(config_use_gm=True)
    rho = equation_of_state(cfg, state.tracers[..., 0],
                            state.tracers[..., 1])
    s = np.asarray(isoneutral_slope(grid, cfg, rho,
                                    state.layerThickness))
    assert np.all(np.abs(s) <= cfg.config_max_relative_slope + 1e-15)
    # the baroclinic channel has a front => nonzero slopes somewhere
    assert np.max(np.abs(s)) > 1e-5


def test_bolus_column_integral_vanishes(channel):
    """Psi = 0 at surface & bottom => sum_k u*_k h_k = 0 per edge."""
    grid, state = channel
    cfg = OcnConfig(config_use_gm=True)
    h = state.layerThickness
    rho = equation_of_state(cfg, state.tracers[..., 0],
                            state.tracers[..., 1])
    ub = bolus_velocity(grid, cfg, rho, h)
    m = grid.mesh
    c1, c2 = m.cellsOnEdge[:, 0], m.cellsOnEdge[:, 1]
    h_edge = 0.5 * (h[c1] + h[c2])
    colint = np.asarray(jnp.sum(ub * h_edge, axis=1))
    assert np.max(np.abs(colint)) < 1e-10 * float(jnp.max(jnp.abs(ub * h_edge)) + 1e-30)


def test_gm_run_conserves_and_flattens(channel):
    grid, state = channel
    cfg = OcnConfig(config_dt=30.0, config_use_gm=True,
                    config_gm_constant_kappa=900.0)
    area = grid.mesh.areaCell[:, None]
    heat0 = float(jnp.sum(state.layerThickness * state.tracers[..., 0]
                          * area))
    out = run_steps(grid, cfg, state, 120)
    heat1 = float(jnp.sum(out.layerThickness * out.tracers[..., 0] * area))
    assert heat1 == pytest.approx(heat0, rel=1e-12)
    assert bool(jnp.all(jnp.isfinite(out.u)))


def test_redi_enhancement_positive_where_sloped(channel):
    grid, state = channel
    cfg = OcnConfig(config_use_redi=True, config_redi_kappa=400.0)
    rho = equation_of_state(cfg, state.tracers[..., 0],
                            state.tracers[..., 1])
    enh = np.asarray(redi_vertical_enhancement(grid, cfg, rho,
                                               state.layerThickness))
    assert np.all(enh >= 0.0)
    assert np.max(enh) > 0.0
    assert np.max(enh) <= cfg.config_redi_kappa \
        * cfg.config_max_relative_slope ** 2 + 1e-12


def test_redi_run_stable(channel):
    grid, state = channel
    cfg = OcnConfig(config_dt=30.0, config_use_redi=True)
    out = run_steps(grid, cfg, state, 60)
    assert bool(jnp.all(jnp.isfinite(out.tracers)))
