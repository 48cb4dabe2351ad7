"""Broadband two-stream radiation (LW + SW drivers).

ref capability: src/core_atmosphere/physics/mpas_atmphys_driver_radiation_
{lw,sw}.F dispatching to RRTMG/CAM (physics_wrf/module_ra_rrtmg_*.F).
This module provides the driver-level capability — called on the radiation
alarm interval, producing theta tendencies and surface SW/LW fluxes — with
a broadband emissivity LW scheme and a Beer-Lambert + cloud-albedo SW
scheme in place of the k-distribution spectral integration (an RRTMG-class
k-distribution port is a later milestone; interfaces are identical).

All column scans are cumulative ops over the static level dimension.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_SB = 5.67e-8
_S0 = 1361.0
# broadband mass absorption coefficients (m2/kg)
_K_LW_VAP = 0.1
_K_LW_CLD = 120.0
_K_SW_VAP = 0.002
_K_SW_CLD = 80.0


def cos_zenith(lat, lon, gmt_hours, julian_day):
    """Solar zenith cosine (ref: mpas_atmphys_manager.F zenith geometry)."""
    decl = 0.409 * jnp.cos(2.0 * jnp.pi * (julian_day - 173.0) / 365.25)
    hour_angle = 2.0 * jnp.pi * (gmt_hours / 24.0) + lon - jnp.pi
    mu = (jnp.sin(lat) * jnp.sin(decl)
          + jnp.cos(lat) * jnp.cos(decl) * jnp.cos(hour_angle))
    return jnp.maximum(mu, 0.0)


def radiation_lw(t, qv, qc, rho, dz, tsk, emiss_sfc=0.985):
    """Two-stream broadband longwave.

    Returns (theta tendency contribution dT/dt [K/s], downward LW at the
    surface GLW [W/m2], outgoing OLR [W/m2]). k=0 is the lowest level.
    """
    path = rho * dz
    emis = 1.0 - jnp.exp(-(_K_LW_VAP * qv + _K_LW_CLD * qc) * path)
    b = _SB * t ** 4

    nC, nz = t.shape
    # downward flux at layer TOPS computed scanning from TOA (k=nz-1) down:
    # F_down[k_top of layer k] with transmission through layers above
    def scan_down():
        fd = jnp.zeros((nC,))
        fds = []
        for k in range(nz - 1, -1, -1):
            fds.append(fd)                     # flux entering layer k's top
            fd = fd * (1.0 - emis[:, k]) + emis[:, k] * b[:, k]
        fds.append(fd)                         # at the surface
        return jnp.stack(fds[::-1], axis=1)    # (nC, nz+1) index 0 = sfc

    f_down = scan_down()
    glw = f_down[:, 0]

    sfc_up = emiss_sfc * _SB * tsk ** 4 + (1.0 - emiss_sfc) * glw

    def scan_up():
        fu = sfc_up
        fus = [fu]
        for k in range(nz):
            fu = fu * (1.0 - emis[:, k]) + emis[:, k] * b[:, k]
            fus.append(fu)
        return jnp.stack(fus, axis=1)          # (nC, nz+1) index 0 = sfc

    f_up = scan_up()
    olr = f_up[:, -1]

    net = f_up - f_down                        # positive upward, (nC, nz+1)
    dtdt = -(net[:, 1:] - net[:, :-1]) / (rho * dz * cp)
    return dtdt, glw, olr


def radiation_sw(qv, qc, rho, dz, mu, albedo=0.2):
    """Beer-Lambert shortwave with a bulk cloud albedo.

    Returns (dT/dt [K/s], surface downward SW GSW [W/m2])."""
    path = rho * dz / jnp.maximum(mu, 0.05)[:, None]
    tau = _K_SW_VAP * qv * path
    # cloud reflection from liquid water path (Stephens 1978-style)
    lwp = jnp.sum(qc * rho * dz, axis=1)
    cld_alb = lwp / (lwp + 0.02)
    toa = _S0 * mu * (1.0 - cld_alb)

    trans = jnp.exp(-tau)
    # cumulative transmission from TOA down through each layer
    cum_above = jnp.cumprod(trans[:, ::-1], axis=1)[:, ::-1]  # at layer bottoms
    f_bot = toa[:, None] * cum_above                          # (nC, nz)
    f_top = jnp.concatenate(
        [f_bot[:, 1:], toa[:, None]], axis=1)
    absorbed = f_top - f_bot
    dtdt = absorbed / (rho * dz * cp)
    gsw = f_bot[:, 0] * (1.0 - albedo)
    return dtdt, gsw
