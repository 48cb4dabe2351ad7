"""Ocean biogeochemistry tracer tendencies (ecosys-class NPZD + DMS).

ref capability: src/core_ocean/shared/mpas_ocn_tracer_ecosys.F +
mpas_ocn_tracer_DMS.F + mpas_ocn_tracer_MacroMolecules.F — the reference
couples the MARBL/ecosys library through per-tracer interior tendencies
plus surface gas-exchange fluxes, evaluated operator-split in the tracer
update. The full MARBL chemistry lives in an external library not
vendored with the reference; this module provides the same coupling
surface with a self-contained NPZD-class model:

  N  nutrient        P  phytoplankton     Z  zooplankton
  D  detritus        (+ optional DMS with production/ventilation)

Column processes (all elementwise, vmapped over cells with depth in
lanes): light-limited Michaelis-Menten uptake with self-shading
attenuation, grazing (Holling II), linear+quadratic mortalities,
detritus sinking and remineralization, and air-sea DMS ventilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BgcParams(NamedTuple):
    mu_max: float = 2.0 / 86400.0      # max phyto growth (1/s)
    k_n: float = 0.5                   # nutrient half-saturation (mmol/m3)
    alpha_light: float = 0.04          # light-limitation slope (1/(W/m2))
    kw: float = 0.04                   # water light attenuation (1/m)
    kc: float = 0.03                   # self-shading (1/m per mmol/m3)
    graze_max: float = 1.0 / 86400.0   # max grazing (1/s)
    k_p: float = 1.0                   # grazing half-saturation
    assim: float = 0.7                 # zooplankton assimilation
    m_p: float = 0.05 / 86400.0        # phyto linear mortality
    m_z: float = 0.2 / 86400.0         # zoo quadratic mortality (1/s per X)
    remin: float = 0.1 / 86400.0       # detritus remineralization
    w_sink: float = 5.0 / 86400.0      # detritus sinking (m/s)
    dms_yield: float = 0.02            # DMS produced per grazing loss
    dms_decay: float = 1.0 / (3.0 * 86400.0)
    piston_dms: float = 3.0e-5         # surface ventilation (m/s)


def bgc_tendencies(h, sw_surface, n, p_phy, z, d, params: BgcParams,
                   dms=None):
    """Interior NPZD(+DMS) tendencies (per second).

    h: (nC, nz) layer thickness; sw_surface: (nC,) surface shortwave W/m2;
    tracers (nC, nz) in mmol/m3. Returns (dN, dP, dZ, dD[, dDMS])."""
    pr = params
    # light profile with self-shading (cumulative attenuation to layer mid)
    tau = (pr.kw + pr.kc * jnp.maximum(p_phy, 0.0)) * h
    cum = jnp.cumsum(tau, axis=-1) - 0.5 * tau
    light = sw_surface[:, None] * jnp.exp(-cum)
    f_light = 1.0 - jnp.exp(-pr.alpha_light * jnp.maximum(light, 0.0))
    f_nut = jnp.maximum(n, 0.0) / (pr.k_n + jnp.maximum(n, 0.0))
    growth = pr.mu_max * f_light * f_nut * jnp.maximum(p_phy, 0.0)
    graze = pr.graze_max * jnp.maximum(p_phy, 0.0) \
        / (pr.k_p + jnp.maximum(p_phy, 0.0)) * jnp.maximum(z, 0.0)
    mort_p = pr.m_p * jnp.maximum(p_phy, 0.0)
    mort_z = pr.m_z * jnp.maximum(z, 0.0) ** 2
    remin = pr.remin * jnp.maximum(d, 0.0)

    dn = -growth + remin
    dp = growth - graze - mort_p
    dz = pr.assim * graze - mort_z
    dd = (1.0 - pr.assim) * graze + mort_p + mort_z - remin

    out = (dn, dp, dz, dd)
    if dms is not None:
        ddms = pr.dms_yield * graze - pr.dms_decay * jnp.maximum(dms, 0.0)
        # surface ventilation to the atmosphere
        vent = pr.piston_dms * jnp.maximum(dms[:, 0], 0.0) / h[:, 0]
        ddms = ddms.at[:, 0].add(-vent)
        out = out + (ddms,)
    return out


def sink_detritus(d, h, w_sink, dt):
    """Upstream sinking of detritus (ref: the sinking term of ecosys
    particulate pools). k=0 is the surface; material leaving the bottom
    live layer is removed (export to sediment)."""
    cfl = jnp.minimum(w_sink * dt / h, 0.9)
    out = d * cfl
    inflow = jnp.concatenate([jnp.zeros_like(d[:, :1]),
                              (out * h)[:, :-1]], axis=-1) / h
    return d - out + inflow


def bgc_step(state, grid, dt, sw_surface, params: BgcParams = BgcParams(),
             index0: int = 2, with_dms: bool = False):
    """Operator-split BGC update on tracers [index0 .. index0+3(+1)] =
    (N, P, Z, D[, DMS]) (the reference evaluates ecosys tendencies inside
    the tracer update; split here like the other column physics)."""
    tr = state.tracers
    h = state.layerThickness
    n = tr[..., index0]
    p_phy = tr[..., index0 + 1]
    z = tr[..., index0 + 2]
    d = tr[..., index0 + 3]
    dms = tr[..., index0 + 4] if with_dms else None
    tends = bgc_tendencies(h, sw_surface, n, p_phy, z, d, params, dms=dms)
    n = jnp.maximum(n + dt * tends[0], 0.0)
    p_phy = jnp.maximum(p_phy + dt * tends[1], 0.0)
    z = jnp.maximum(z + dt * tends[2], 0.0)
    d = jnp.maximum(d + dt * tends[3], 0.0)
    d = sink_detritus(d, h, params.w_sink, dt)
    tr = tr.at[..., index0].set(n)
    tr = tr.at[..., index0 + 1].set(p_phy)
    tr = tr.at[..., index0 + 2].set(z)
    tr = tr.at[..., index0 + 3].set(d)
    if with_dms:
        dms = jnp.maximum(dms + dt * tends[4], 0.0)
        tr = tr.at[..., index0 + 4].set(dms)
    return state.replace(tracers=tr)
