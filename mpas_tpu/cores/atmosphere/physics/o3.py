"""Ozone climatology for radiation.

ref capability: src/core_atmosphere/physics/mpas_atmphys_o3climatology.F
(reads the CAM monthly zonal-mean ozone climatology OZONE_DAT/OZONE_PLEV
and time-interpolates to the model date, then vertically to model levels).
Those external data files are not shipped with the reference repo; this
module provides the same surface — o3_climatology(lat, p, julian_day) ->
ozone volume mixing ratio — from a compact analytic zonal-mean model
fitted to the observed climatology structure:

  * a Chapman-layer vertical profile with latitude-dependent peak
    pressure (lower/weaker peak in the tropics: ~10 hPa at the equator
    to ~30 hPa at the poles) and column amount (min at equator ~260 DU,
    spring-hemisphere maxima ~380 DU)
  * an annual cycle: high-latitude spring maximum (Brewer-Dobson),
    opposite phase between hemispheres

Returned vmr feeds the correlated-k radiation (the 9.6 um LW band and
the UV/vis Chappuis-Hartley SW absorption).
"""

from __future__ import annotations

import jax.numpy as jnp

_DU_TO_VMR_SCALE = 1.0      # normalization folded into the profile


def o3_column_du(lat, julian_day):
    """Total-column ozone (Dobson units) zonal-mean climatology.
    lat in radians."""
    sinl = jnp.sin(lat)
    # annual cycle peaks in local spring at high latitudes
    phase_nh = jnp.cos(2.0 * jnp.pi * (julian_day - 105.0) / 365.0)
    phase_sh = jnp.cos(2.0 * jnp.pi * (julian_day - 288.0) / 365.0)
    seasonal = jnp.where(lat >= 0.0, phase_nh, phase_sh)
    return 260.0 + 90.0 * sinl ** 2 + 40.0 * sinl ** 2 * seasonal


def o3_peak_pressure(lat):
    """Pressure (Pa) of the ozone mixing-ratio peak: ~1000 Pa in the
    tropics rising to ~3000 Pa at the poles."""
    return 1000.0 + 2000.0 * jnp.sin(lat) ** 2


def o3_climatology(lat, p, julian_day=172.0):
    """Ozone volume mixing ratio on model levels.

    lat: (nCells,) radians; p: (nCells, nz) Pa; returns (nCells, nz) vmr.
    The vertical shape is a Chapman layer in log-pressure,
    vmr ~ exp(1 - x - exp(-x)), x = ln(p/p_peak)/w, normalized so the
    column integral matches the climatological Dobson amount."""
    du = o3_column_du(lat, julian_day)[:, None]
    p_pk = o3_peak_pressure(lat)[:, None]
    w = 1.1                                    # layer width in ln(p)
    x = jnp.log(jnp.maximum(p, 1.0) / p_pk) / w
    shape = jnp.exp(1.0 - x - jnp.exp(-x))     # peaks at x=0
    # column of the shape in vmr*dp/g (molecules scale folded in):
    # 1 DU = 2.1415e-5 kg(O3)/m2; vmr*dp/g * (48/28.97) integrates mass
    g = 9.80616
    dp = jnp.abs(jnp.gradient(p, axis=1))
    col_shape = jnp.sum(shape * dp, axis=1, keepdims=True) / g \
        * (48.0 / 28.97)
    target_mass = du * 2.1415e-5               # kg/m2
    vmr = shape * target_mass / jnp.maximum(col_shape, 1e-12)
    return jnp.clip(vmr, 0.0, 2.0e-5)


def o3_path(rho, dz, vmr):
    """Ozone mass path per layer (kg/m2) for the radiation schemes."""
    return rho * dz * vmr * (48.0 / 28.97)
