"""KPP (CVMix-class) ocean boundary-layer mixing.

Parity model: mpas_ocn_vmix_cvmix.F KPP path — Large et al. (1994)
properties: OBL deepens under destabilizing forcing, velocity scales
reduce under stable forcing, shape function vanishes at the endpoints,
nonlocal transport only under convection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.core import (OcnConfig, implicit_vertical_mix,
                                       run_steps)
from mpas_tpu.cores.ocean.forcing import zero_forcing
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
from mpas_tpu.cores.ocean import kpp


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(8, 16, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    return (jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state))


def test_w_scales_stable_vs_unstable():
    """Unstable (convective) velocity scales exceed neutral exceed stable."""
    sigma = jnp.full((1, 5), 0.5)
    hbl = jnp.asarray([50.0])
    ustar = jnp.asarray([0.01])
    _, ws_unstable = kpp._w_scales(sigma, hbl, ustar, jnp.asarray([1e-7]))
    _, ws_neutral = kpp._w_scales(sigma, hbl, ustar, jnp.asarray([0.0]))
    _, ws_stable = kpp._w_scales(sigma, hbl, ustar, jnp.asarray([-1e-7]))
    assert float(ws_unstable[0, 0]) > float(ws_neutral[0, 0]) > \
        float(ws_stable[0, 0])
    # neutral limit: kappa * u*
    assert float(ws_neutral[0, 0]) == pytest.approx(0.4 * 0.01, rel=1e-3)


def test_obl_depth_deepens_with_destabilization(channel):
    grid, state = channel
    cfg = OcnConfig()
    from mpas_tpu.cores.ocean.core import equation_of_state
    rho = equation_of_state(cfg, state.tracers[..., 0],
                            state.tracers[..., 1])
    n = grid.mesh.nCells
    ustar = jnp.full((n,), 0.01)
    h_weak = kpp.boundary_layer_depth(grid, cfg, state.u,
                                      state.layerThickness, rho, ustar,
                                      jnp.full((n,), -1e-8))
    h_strong = kpp.boundary_layer_depth(grid, cfg, state.u,
                                        state.layerThickness, rho, ustar,
                                        jnp.full((n,), 3e-7))
    assert np.all(np.asarray(h_strong) >= np.asarray(h_weak) - 1e-9)
    assert np.mean(np.asarray(h_strong)) > np.mean(np.asarray(h_weak))
    col = np.asarray(jnp.sum(state.layerThickness, axis=-1))
    assert np.all(np.asarray(h_strong) <= col + 1e-6)


def test_coefs_kpp_shapes_and_positive(channel):
    grid, state = channel
    cfg = OcnConfig(config_vert_mix_scheme="kpp")
    # unstratified column: convection mixes to the bottom, so the OBL
    # spans interior interfaces and the boundary-layer profile is active
    state = state.replace(tracers=state.tracers.at[..., 0].set(10.0))
    from mpas_tpu.cores.ocean.core import equation_of_state
    rho = equation_of_state(cfg, state.tracers[..., 0],
                            state.tracers[..., 1])
    f = zero_forcing(grid.mesh.nCells)
    f = f.replace(windStressZonal=jnp.full((grid.mesh.nCells,), 0.1),
                  sensibleHeatFlux=jnp.full((grid.mesh.nCells,), -200.0))
    visc, diff, nl, hbl = kpp.coefs_kpp(grid, cfg, state.u,
                                        state.layerThickness, rho,
                                        forcing=f, tracers=state.tracers)
    nz = state.layerThickness.shape[-1]
    assert visc.shape == (grid.mesh.nEdges, nz - 1)
    assert diff.shape == (grid.mesh.nCells, nz - 1)
    assert np.all(np.asarray(visc) >= 0.0)
    assert np.all(np.asarray(diff) >= 0.0)
    assert np.all(np.isfinite(np.asarray(hbl)))
    # cooling => convection => nonlocal transport active in the OBL
    assert float(jnp.max(nl)) > 0.0
    # boundary-layer diffusivity well above background within the OBL
    assert float(jnp.max(diff)) > 10.0 * cfg.config_vert_diff


def test_nonlocal_zero_when_stable(channel):
    grid, state = channel
    cfg = OcnConfig(config_vert_mix_scheme="kpp")
    from mpas_tpu.cores.ocean.core import equation_of_state
    rho = equation_of_state(cfg, state.tracers[..., 0],
                            state.tracers[..., 1])
    f = zero_forcing(grid.mesh.nCells)
    f = f.replace(windStressZonal=jnp.full((grid.mesh.nCells,), 0.1),
                  sensibleHeatFlux=jnp.full((grid.mesh.nCells,), +200.0))
    _, _, nl, _ = kpp.coefs_kpp(grid, cfg, state.u, state.layerThickness,
                                rho, forcing=f, tracers=state.tracers)
    assert float(jnp.max(jnp.abs(nl))) == 0.0


def test_kpp_in_integrator_conserves_heat(channel):
    """Vertical mixing redistributes but conserves column heat when the
    only forcing is the (nonlocal-redistributed) zero net surface flux."""
    grid, state = channel
    cfg = OcnConfig(config_vert_mix_scheme="kpp")
    f = zero_forcing(grid.mesh.nCells)
    f = f.replace(windStressZonal=jnp.full((grid.mesh.nCells,), 0.05))
    out = implicit_vertical_mix(grid, cfg, state, 600.0, forcing=f)
    h = state.layerThickness
    heat0 = float(jnp.sum(state.tracers[..., 0] * h))
    heat1 = float(jnp.sum(out.tracers[..., 0] * out.layerThickness))
    assert heat1 == pytest.approx(heat0, rel=1e-9)
    assert np.all(np.isfinite(np.asarray(out.u)))


def test_kpp_channel_steps_stable(channel):
    """A few RK4 steps with KPP + surface cooling stay finite and mix the
    surface layer (reduced top-to-second-layer temperature contrast)."""
    grid, state = channel
    cfg = OcnConfig(config_vert_mix_scheme="kpp", config_dt=60.0,
                    config_time_integrator="RK4")
    n = grid.mesh.nCells
    f = zero_forcing(n)
    f = f.replace(windStressZonal=jnp.full((n,), 0.1),
                  sensibleHeatFlux=jnp.full((n,), -400.0))
    out = run_steps(grid, cfg, state, 5, forcing=f)
    t = np.asarray(out.tracers[..., 0])
    assert np.all(np.isfinite(t))
    # cooled at the surface
    assert t[:, 0].mean() < float(state.tracers[:, 0, 0].mean())
