"""Area/volume ice tracers: age, first-year area, level-ice, aerosols.

ref capability: src/core_seaice/column/ice_age.F90 (increment_age),
ice_firstyear.F90 (update_FYarea), ice_colpkg_tracers.F90 (alvl/vlvl
level-ice tracers fed by ridging), ice_aerosol.F90 (update_aerosol:
deposition into the snow surface layer, meltwater scavenging between
snow/ice surface+interior layers, loss to ocean).

All tracers are per-cell-per-category lanes; updates are elementwise.
"""

from __future__ import annotations

import jax.numpy as jnp


def increment_age(age, a, dt, puny=1.0e-11):
    """Ice age in seconds, area-weighted (ref ice_age.F90:increment_age:
    iage = iage + dt on every cell that carries ice)."""
    return jnp.where(a > puny, age + dt, 0.0)


def update_first_year_area(fy_area, a, frozen_season, puny=1.0e-11):
    """First-year ice area fraction (ref ice_firstyear.F90 update_FYarea):
    reset to the full category area at the start of the freezing season
    (Sept 15 NH / March 15 SH — the caller passes the season flag), decays
    with the ice otherwise."""
    fy = jnp.where(frozen_season, jnp.clip(a, 0.0, 1.0),
                   jnp.minimum(fy_area, a))
    return jnp.where(a > puny, fy, 0.0)


def ridging_level_ice_update(alvl, vlvl, a, v, a_new, v_new,
                             puny=1.0e-11):
    """Level-ice tracers after ridging: ridging converts level ice to
    deformed ice — the level fraction can only shrink when area is lost to
    ridging (ref ice_colpkg_tracers: alvl participates via ardg/vrdg).
    alvl is the level fraction of the category area; approximate the
    reference bookkeeping by attributing all net area/volume loss in a
    category to ridging of its level ice."""
    da = jnp.maximum(a - a_new, 0.0)            # area lost to ridging
    lvl_area = alvl * a
    lvl_area_new = jnp.maximum(lvl_area - da, 0.0)
    alvl2 = jnp.where(a_new > puny,
                      jnp.clip(lvl_area_new / jnp.maximum(a_new, puny),
                               0.0, 1.0), 0.0)
    dv = jnp.maximum(v - v_new, 0.0)
    lvl_vol = vlvl * v
    vlvl2 = jnp.where(v_new > puny,
                      jnp.clip(jnp.maximum(lvl_vol - dv, 0.0)
                               / jnp.maximum(v_new, puny), 0.0, 1.0), 0.0)
    return alvl2, vlvl2


def update_aerosol(aero_snow_ssl, aero_snow_int, aero_ice_ssl,
                   aero_ice_int, a, h_snow, h_ice,
                   flux_deposit, melt_s, melt_i, growth_b, dt,
                   hs_ssl=0.04, hi_ssl=0.05, kscav=(1.0, 1.0, 0.03, 0.03),
                   puny=1.0e-11):
    """Aerosol-in-ice transport (ref ice_aerosol.F90 update_aerosol).

    Four reservoirs per species (kg/m2 of category area): snow surface
    layer (ssl), snow interior, ice ssl, ice interior.
      * atmospheric deposition enters the snow ssl (ice ssl if snowless)
      * surface snow melt scavenges ssl mass to the ocean with efficiency
        kscav and pushes the ssl/interior boundary down
      * snow gone -> snow reservoirs merge into the ice ssl
      * surface ice melt scavenges the ice ssl; basal growth dilutes the
        interior (new clean ice)
    Shapes: all (..., nSpecies) with broadcastable leading dims."""
    has_snow = h_snow[..., None] > puny
    has_ice = h_ice[..., None] > puny

    dep = flux_deposit * dt
    aero_snow_ssl = aero_snow_ssl + jnp.where(has_snow, dep, 0.0)
    aero_ice_ssl = aero_ice_ssl + jnp.where(~has_snow & has_ice, dep, 0.0)

    ks = jnp.asarray(kscav)
    # snow melt: fraction of the ssl removed this step
    f_melt_s = jnp.clip(melt_s * dt / jnp.maximum(h_snow, puny),
                        0.0, 1.0)[..., None]
    lost_s = aero_snow_ssl * f_melt_s * ks[0]
    # the melted ssl's unscavenged mass stays, exposing interior mass:
    # promote a matching fraction of the interior into the ssl
    promote_s = aero_snow_int * f_melt_s
    aero_snow_ssl = aero_snow_ssl - lost_s + promote_s
    aero_snow_int = aero_snow_int - promote_s

    # snow fully melted -> dump snow reservoirs into the ice ssl
    snow_gone = ~has_snow
    aero_ice_ssl = aero_ice_ssl + jnp.where(
        snow_gone, aero_snow_ssl + aero_snow_int, 0.0)
    aero_snow_ssl = jnp.where(snow_gone, 0.0, aero_snow_ssl)
    aero_snow_int = jnp.where(snow_gone, 0.0, aero_snow_int)

    # ice surface melt
    f_melt_i = jnp.clip(melt_i * dt / jnp.maximum(h_ice, puny),
                        0.0, 1.0)[..., None]
    lost_i = aero_ice_ssl * f_melt_i * ks[2]
    promote_i = aero_ice_int * f_melt_i
    aero_ice_ssl = aero_ice_ssl - lost_i + promote_i
    aero_ice_int = aero_ice_int - promote_i

    # everything zero where there is no ice
    z = ~has_ice
    flux_ocean = (lost_s + lost_i) / dt + jnp.where(
        z, (aero_snow_ssl + aero_snow_int + aero_ice_ssl + aero_ice_int)
        / dt, 0.0)
    aero_snow_ssl = jnp.where(z, 0.0, aero_snow_ssl)
    aero_snow_int = jnp.where(z, 0.0, aero_snow_int)
    aero_ice_ssl = jnp.where(z, 0.0, aero_ice_ssl)
    aero_ice_int = jnp.where(z, 0.0, aero_ice_int)
    return (aero_snow_ssl, aero_snow_int, aero_ice_ssl, aero_ice_int,
            flux_ocean)
