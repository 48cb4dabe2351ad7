"""Slab land-surface model + orographic gravity-wave drag.

ref capability:
  LSM  — src/core_atmosphere/physics/mpas_atmphys_driver_lsm.F + Noah
         (physics_wrf/module_sf_noahdrv.F). Here: a force-restore slab —
         surface energy balance for skin temperature with ground heat flux
         to a deep reservoir, plus a moisture-availability beta for
         evaporation (Noah's full 4-layer soil/snow/vegetation column is a
         later milestone; the coupling surface is identical: tsk, qsfc).
  GWDO — mpas_atmphys_driver_gwdo.F + physics_wrf/module_bl_gwdo.F
         (Kim & Arakawa): surface stress from subgrid orography variance,
         deposited over the lowest levels.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_SB = 5.67e-8
_LV = 2.5e6
_T0 = 273.15


def _qsat(t, p):
    es = 611.2 * jnp.exp(17.67 * (t - _T0) / (t - 29.65))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def slab_lsm(tsk, t_deep, gsw, glw, hfx, lh, dt,
             c_slab=8.0e4, tau_deep=86400.0, emiss=0.985):
    """Advance skin temperature: C dT/dt = SW + LW_dn - eps sig T^4 - H - LE
    - G, with force-restore G = C/tau (tsk - t_deep).
    Returns (tsk_new, ground heat flux)."""
    lw_up = emiss * _SB * tsk ** 4
    g_flux = c_slab / tau_deep * (tsk - t_deep)
    net = gsw + emiss * glw - lw_up - hfx - lh - g_flux
    tsk_new = tsk + dt * net / c_slab
    return tsk_new, g_flux


def surface_moisture(tsk, p_sfc, beta=0.3):
    """Surface saturation mixing ratio scaled by moisture availability
    (ref: Noah's beta-method branch)."""
    return beta * _qsat(tsk, p_sfc)


def gwdo(u, v, rho, dz, n_bv, var2d, dt, kmax_frac=0.25):
    """Orographic gravity-wave drag on the lowest kmax levels.

    ref: module_bl_gwdo.F (Kim & Arakawa 1995): surface wave stress
    tau = E rho U N h'^2 deposited upward; here a fixed linear deposition
    profile over the lowest quarter of the column."""
    spd = jnp.sqrt(u[:, 0] ** 2 + v[:, 0] ** 2)
    tau_s = 5.0e-6 * rho[:, 0] * spd * n_bv * var2d       # N/m2
    nz = u.shape[1]
    kmax = max(int(nz * kmax_frac), 1)
    w = jnp.zeros((nz,)).at[:kmax].set(
        jnp.linspace(1.0, 0.0, kmax, endpoint=False))
    w = w / jnp.maximum(jnp.sum(w), 1e-9)
    dtau = tau_s[:, None] * w[None, :]                    # (nC, nz)
    accel = dtau / (rho * dz)
    frac_u = u / jnp.maximum(spd, 0.1)[:, None]
    frac_v = v / jnp.maximum(spd, 0.1)[:, None]
    u_new = u - dt * accel * frac_u
    v_new = v - dt * accel * frac_v
    return u_new, v_new
