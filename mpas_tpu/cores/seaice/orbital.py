"""Orbital/solar geometry: cosine solar zenith angle.

ref: src/core_seaice/column/ice_orbital.F90:35-96 (compute_coszen with
the shr_orb_decl solar declination) — coszen drives the delta-Eddington
shortwave's diurnal cycle. The declination here is the standard Berger
low-order solution the CESM share code evaluates: true solar longitude
from the mean longitude via the eccentricity expansion, then
decl = arcsin(sin(obliq) sin(lambda)).
"""

from __future__ import annotations

import jax.numpy as jnp

# present-day orbital parameters (ref: ice_constants_colpkg eccen etc.)
ECCEN = 0.0167
OBLIQ = jnp.deg2rad(23.4441)
# mean longitude of perihelion + 180 (mvelpp analogue), radians
MVELPP = jnp.deg2rad(102.93 + 180.0)
LAMBM0 = -0.032437                     # mean long. of vernal equinox ref
SECDAY = 86400.0


def solar_declination(yday):
    """Solar declination (radians) for day-of-year yday (Berger genre,
    ref: shr_orb_decl as called by compute_coszen)."""
    ve = 80.5                         # vernal equinox day (Mar 21.5)
    lambm = LAMBM0 + (yday - ve) * 2.0 * jnp.pi / 365.0
    lmm = lambm - MVELPP
    # eccentricity expansion of the equation of center
    lamb = lambm + ECCEN * (2.0 * jnp.sin(lmm)
                            + ECCEN * 1.25 * jnp.sin(2.0 * lmm))
    return jnp.arcsin(jnp.sin(OBLIQ) * jnp.sin(lamb))


def compute_coszen(lat, lon, yday, sec, dt=0.0):
    """Cosine of the solar zenith angle at (lat, lon) radians for
    day-of-year yday at sec elapsed seconds UTC; negative = sun below
    the horizon (ref: compute_coszen, ice_orbital.F90:35-96 — the
    ydayp1 = yday + sec/secday convention and the
    cos((sec/secday - 0.5) 2 pi + lon) hour angle)."""
    ydayp1 = yday + (sec + 0.5 * dt) / SECDAY
    decl = solar_declination(ydayp1)
    hour_angle = ((sec + 0.5 * dt) / SECDAY - 0.5) * 2.0 * jnp.pi + lon
    return (jnp.sin(lat) * jnp.sin(decl)
            + jnp.cos(lat) * jnp.cos(decl) * jnp.cos(hour_angle))


def diurnal_shortwave(sw_daily_mean, lat, lon, yday, sec, dt=0.0):
    """Scale a daily-mean downward shortwave onto the instantaneous
    diurnal cycle: sw = sw_mean * max(coszen, 0) / daily_mean(coszen)
    (the standalone-forcing analogue of the reference coupler's
    coszen-weighted shortwave)."""
    cz = jnp.maximum(compute_coszen(lat, lon, yday, sec, dt), 0.0)
    # daily mean of max(coszen, 0) by 24-point quadrature
    secs = jnp.arange(24.0) * 3600.0
    cz_all = jnp.maximum(
        compute_coszen(lat[..., None], lon[..., None], yday,
                       secs[None, :]), 0.0)
    mean_cz = jnp.maximum(jnp.mean(cz_all, axis=-1), 1e-6)
    return sw_daily_mean * cz / mean_cz
