"""Idealized square-domain sea-ice test case.

ref capability: the MPAS-seaice testing configurations
(testing_and_setup/seaice) run idealized square domains with prescribed
anticyclonic winds and ocean currents — the classic CICE "box" experiment
used to exercise the EVP rheology and upwind transport. This builds the
planar-hex equivalent: a slab of ice of linearly-varying thickness, zero
initial motion, rotating wind field, quiescent ocean.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.state import (SeaiceForcing, SeaiceGrid,
                                         SeaiceState, make_grid, zero_state)
from mpas_tpu.mesh.mesh import Mesh


def init_square(mesh: Mesh, cfg: SeaiceConfig, dtype=jnp.float64):
    grid = make_grid(mesh)
    n_cat = cfg.config_n_categories
    state = zero_state(mesh, n_cat, dtype=dtype)

    x = np.asarray(mesh.xCell)
    y = np.asarray(mesh.yCell)
    lx = float(x.max() - x.min()) + 1e-30
    ly = float(y.max() - y.min()) + 1e-30
    xs = (x - x.min()) / lx
    ys = (y - y.min()) / ly

    # ice cover: full concentration, thickness ramp 0.5m..2.5m across x
    h = 0.5 + 2.0 * xs
    a_tot = np.where(xs < 0.95, 1.0, 0.0)   # open water strip at east edge
    bounds = np.asarray(cfg.config_itd_bounds)
    cat = np.clip(np.searchsorted(bounds[1:-1], h), 0, n_cat - 1)
    a = np.zeros((mesh.nCells, n_cat))
    v = np.zeros((mesh.nCells, n_cat))
    a[np.arange(mesh.nCells), cat] = a_tot
    v[np.arange(mesh.nCells), cat] = a_tot * h
    snow = 0.1 * a

    state = state.replace(
        iceAreaCategory=jnp.asarray(a, dtype=dtype),
        iceVolumeCategory=jnp.asarray(v, dtype=dtype),
        snowVolumeCategory=jnp.asarray(snow, dtype=dtype),
        surfaceTemperature=jnp.asarray(-5.0 * a, dtype=dtype))

    # anticyclonic wind (CICE box forcing): u = 5+(sin(2pi t)..) -> static here
    ua = 5.0 + 3.0 * np.sin(2.0 * np.pi * xs) * np.sin(np.pi * ys)
    va = 5.0 + 3.0 * np.sin(2.0 * np.pi * ys) * np.sin(np.pi * xs)
    # quiescent, slightly circulating ocean
    uo = 0.1 * (2.0 * ys - 1.0)
    vo = -0.1 * (2.0 * xs - 1.0)

    zc = np.zeros(mesh.nCells)
    zv = np.zeros(mesh.nVertices)
    forcing = SeaiceForcing(
        uAirVelocity=jnp.asarray(ua, dtype=dtype),
        vAirVelocity=jnp.asarray(va, dtype=dtype),
        airTemperature=jnp.asarray(zc - 10.0, dtype=dtype),
        shortwaveDown=jnp.asarray(zc + 50.0, dtype=dtype),
        longwaveDown=jnp.asarray(zc + 250.0, dtype=dtype),
        uOceanVelocity=jnp.asarray(uo, dtype=dtype),
        vOceanVelocity=jnp.asarray(vo, dtype=dtype),
        seaSurfaceTemperature=jnp.asarray(zc + cfg.freezing_point,
                                          dtype=dtype),
        oceanHeatFlux=jnp.asarray(zc + cfg.config_ocean_heat_flux,
                                  dtype=dtype),
        sshGradientU=jnp.asarray(zv, dtype=dtype),
        sshGradientV=jnp.asarray(zv, dtype=dtype))

    return grid, state, forcing
