"""Land-ice--ocean flux coupling (three-equation melt).

Parity model: mpas_ocn_surface_land_ice_fluxes.F standalone flux mode —
warm cavity water melts (cooling and freshening the top layer), the
interface sits at the pressure-depressed freezing point, and no flux
leaks outside the cavity mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.ocean.core import OcnConfig, run_steps
from mpas_tpu.cores.ocean.init_configs import init_isomip
from mpas_tpu.cores.ocean.land_ice_flux import (LAM1, LAM2, LAM3,
                                                apply_land_ice_fluxes,
                                                three_equation_melt)
from mpas_tpu.mesh.planar import channel_hex_mesh


@pytest.mark.slow
def test_three_equation_consistency():
    n = 5
    t_o = jnp.asarray([2.0, 0.0, -1.0, -1.9, 1.0])
    s_o = jnp.full((n,), 34.5)
    p = jnp.full((n,), 918.0 * 9.81 * 500.0)      # ~500 m draft
    mask = jnp.asarray([True, True, True, True, False])
    fx = three_equation_melt(t_o, s_o, p, mask)
    tb, sb = np.asarray(fx.t_boundary), np.asarray(fx.s_boundary)
    # interface at the freezing point of its own salinity/pressure
    expect = LAM1 * sb + LAM2 + LAM3 * np.asarray(p)
    assert np.allclose(tb[:4], expect[:4], atol=1e-8)
    m = np.asarray(fx.melt_rate)
    assert (m[:3] > 0.0).all()                    # warm water melts
    assert m[0] > m[2]                            # warmer -> faster
    assert m[4] == 0.0                            # outside the cavity
    assert np.asarray(fx.heat_flux)[0] < 0.0      # ocean loses heat


@pytest.mark.slow
def test_cavity_run_melts_and_freshens():
    m = channel_hex_mesh(6, 12, 10000.0)
    grid, state, extras = init_isomip(m, nz=10)
    grid = jax.tree.map(jnp.asarray, grid)
    state = jax.tree.map(jnp.asarray, state)
    # warm the cavity so it melts
    state = state.replace(tracers=state.tracers.at[..., 0].add(2.5))
    draft = jnp.asarray(extras["landIceDraft"])
    press = jnp.asarray(extras["landIcePressure"])
    cfg = OcnConfig(config_dt=60.0)
    s = state
    s0_sal = float(jnp.mean(s.tracers[:, 0, 1]))
    s0_tmp = float(jnp.mean(s.tracers[:, 0, 0]))
    vol0 = float(jnp.sum(s.layerThickness * grid.cellMask
                         * grid.mesh.areaCell[:, None]))
    melt_total = 0.0
    for _ in range(10):
        s = run_steps(grid, cfg, s, 3)
        s, fx = apply_land_ice_fluxes(grid, cfg, s, press, draft,
                                      3 * cfg.config_dt)
        melt_total += float(jnp.sum(fx.melt_rate))
    assert np.isfinite(np.asarray(s.u)).all()
    assert melt_total > 0.0
    assert float(jnp.mean(s.tracers[:, 0, 0])) < s0_tmp   # cooled
    assert float(jnp.mean(s.tracers[:, 0, 1])) < s0_sal   # freshened
    vol1 = float(jnp.sum(s.layerThickness * grid.cellMask
                         * grid.mesh.areaCell[:, None]))
    assert vol1 > vol0                                    # meltwater added
