"""Sea-ice biogeochemistry: brine height dynamics + bottom-ice algae.

ref capability: src/core_seaice/column/ice_brine.F90 (preflushing_changes
/ compute_microS_mushy genre: the brine-height tracer hbrine tracking the
brine surface relative to the ice bottom, relaxing toward hydrostatic sea
level through Darcy flow) and ice_algae.F90 (z-layer / skeletal-layer
algal model: nitrate + silicate limited growth in the bottom ice layer,
light limitation from transmitted shortwave, linear mortality, entrainment
of ocean nutrients into growing ice and release on melt).

State per cell per category (lanes):
  brineHeight  hbrine (m, measured from the ice bottom)
  algaeIce     bottom-layer algal N concentration (mmol N/m2)
  nitrateIce   bottom-layer NO3 (mmol N/m2)
  silicateIce  bottom-layer SiO3 (mmol Si/m2)
"""

from __future__ import annotations

import jax.numpy as jnp

# algal parameters (skeletal-layer model defaults, ice_algae.F90 genre)
MU_MAX = 1.44 / 86400.0      # 1/s max specific growth (1.44/day)
MORT = 0.03 / 86400.0        # 1/s linear mortality
K_NO3 = 1.0                  # mmol/m3 half-saturation
K_SIO3 = 4.0
ALPHA_LIGHT = 0.8            # light-limitation scale (W/m2)^-1
SK_DEPTH = 0.03              # m, skeletal layer thickness
R_SI_N = 1.8                 # Si:N uptake ratio
EXCH_RATE = 0.5 / 86400.0    # 1/s nutrient exchange with the mixed layer


def brine_height_update(hbrine, h_ice, h_snow, rho_ice, rho_snow,
                        rho_sea, dt, darcy_tau=8.64e4, puny=1.0e-11):
    """Relax the brine surface toward hydrostatic sea level through Darcy
    flow (ref ice_brine.F90 update_hbrine genre).

    Sea level measured from the ice bottom: h_sl = draft =
    (rho_i h_i + rho_s h_s)/rho_w.  hbrine -> h_sl with timescale
    darcy_tau; capped inside [0, h_i]."""
    has = h_ice > puny
    h_sl = (rho_ice * h_ice + rho_snow * h_snow) / rho_sea
    f = 1.0 - jnp.exp(-dt / darcy_tau)
    hb = hbrine + f * (h_sl - hbrine)
    hb = jnp.clip(hb, 0.0, h_ice)
    # fresh ice initializes the brine surface at sea level
    hb = jnp.where(has & (hbrine <= puny), jnp.minimum(h_sl, h_ice), hb)
    return jnp.where(has, hb, 0.0)


def algae_step(algae, no3, sio3, h_ice, sw_through, t_bot,
               ocean_no3, ocean_sio3, growth_bot, melt_bot, dt,
               puny=1.0e-11):
    """Skeletal-layer algal growth (ref ice_algae.F90 algal_dyn genre).

    algae/no3/sio3: (..., ) areal concentrations in the bottom skeletal
    layer (mmol/m2); sw_through: W/m2 PAR reaching the ice bottom;
    growth_bot/melt_bot: m/s basal congelation growth and melt rates;
    ocean_*: mixed-layer nutrient concentrations (mmol/m3).
    Returns (algae, no3, sio3, flux_algae_to_ocean)."""
    has = h_ice > puny
    # volumetric concentrations in the skeletal layer
    no3_c = no3 / SK_DEPTH
    sio3_c = sio3 / SK_DEPTH

    lim_no3 = no3_c / (K_NO3 + jnp.maximum(no3_c, 0.0))
    lim_sio3 = sio3_c / (K_SIO3 + jnp.maximum(sio3_c, 0.0))
    lim_light = 1.0 - jnp.exp(-ALPHA_LIGHT * jnp.maximum(sw_through, 0.0))
    # temperature response (Eppley-like, t_bot in deg C near freezing)
    f_t = jnp.exp(0.0633 * jnp.minimum(t_bot, 0.0))
    mu = MU_MAX * f_t * lim_light * jnp.minimum(lim_no3, lim_sio3)

    growth = mu * algae * dt
    death = MORT * algae * dt
    growth = jnp.minimum(growth, 0.9 * no3)      # can't overdraw nutrients
    algae2 = jnp.maximum(algae + growth - death, 0.0)
    no3_2 = jnp.maximum(no3 - growth + 0.5 * death, 0.0)   # remin. half
    sio3_2 = jnp.maximum(sio3 - R_SI_N * growth, 0.0)

    # nutrient exchange with the ocean: entrainment with congelation
    # growth, diffusive relaxation toward the mixed layer otherwise
    entrain = jnp.maximum(growth_bot, 0.0) * dt
    no3_2 = no3_2 + entrain * ocean_no3 \
        + EXCH_RATE * dt * (ocean_no3 * SK_DEPTH - no3_2)
    sio3_2 = sio3_2 + entrain * ocean_sio3 \
        + EXCH_RATE * dt * (ocean_sio3 * SK_DEPTH - sio3_2)

    # basal melt releases a matching fraction of the skeletal layer
    f_melt = jnp.clip(jnp.maximum(melt_bot, 0.0) * dt / SK_DEPTH, 0.0, 1.0)
    flux_out = f_melt * algae2 / jnp.maximum(dt, 1.0)
    algae2 = algae2 * (1.0 - f_melt)

    algae2 = jnp.where(has, algae2, 0.0)
    no3_2 = jnp.where(has, jnp.maximum(no3_2, 0.0), 0.0)
    sio3_2 = jnp.where(has, jnp.maximum(sio3_2, 0.0), 0.0)
    flux_out = jnp.where(has, flux_out, algae / jnp.maximum(dt, 1.0))
    return algae2, no3_2, sio3_2, flux_out


# ---------------------------------------------------------------------------
# Multi-group algal dynamics (ref ice_algae.F90 algal_dyn :1425-1900)
# ---------------------------------------------------------------------------
# per-group parameters (diatoms, small plankton, Phaeocystis) — the
# reference Registry defaults (Registry.xml config_* bgc block)
MU_MAX_G = (1.44 / 86400.0, 0.41 / 86400.0, 0.63 / 86400.0)   # 1/s
MORT_G = (0.007 / 86400.0,) * 3                                # 1/s
GRAZED_G = (0.0, 0.7, 0.7)          # grazed fraction of growth
K_NO3_G = (1.0, 1.0, 1.0)           # mmol/m3
K_NH4_G = (0.3, 0.3, 0.3)
K_SIO3_G = (4.0, 0.0, 0.0)          # 0 = no Si requirement
ALPHA_G = (0.3, 0.2, 0.17)          # light limitation 1/(W/m2)
BETA_G = (0.001, 0.001, 0.04)       # light inhibition 1/(W/m2)
TDEP_G = (0.06, 0.06, 0.06)         # 1/degC growth T-dependence
FR_RESP = 0.05                      # respiration fraction of growth
FR_DON = 0.6                        # mortality fraction spilled to DON
K_DON = 0.03 / 86400.0              # 1/s DON degradation -> NH4
K_NITRIF = 0.0                      # 1/s nitrification (Registry default)
R_SI_N_DIAT = 1.8


def algal_dyn(algae3, no3, nh4, sio3, don, sw_par, t_bot, dt):
    """Three-group algal source/sink dynamics in a brine layer
    (ref ice_algae.F90 algal_dyn :1425-1900 with the Registry default
    parameter set): per-group light limitation with photoinhibition
    (1 - exp(-alpha I)) exp(-beta I), Michaelis-Menten NO3/NH4/SiO3
    uptake with NH4 preference, Eppley temperature dependence,
    respiration, mortality split to DON and NH4, grazing removal, DON
    degradation to NH4, optional nitrification.

    algae3: (..., 3) algal N [mmol/m3]; nutrient pools (...,) [mmol/m3].
    Returns (algae3, no3, nh4, sio3, don, grow_net (..., 3))."""
    f_t = jnp.exp(TDEP_G[0] * jnp.minimum(t_bot, 0.0))[..., None]
    I = jnp.maximum(sw_par, 0.0)[..., None]
    alpha = jnp.asarray(ALPHA_G)
    beta = jnp.asarray(BETA_G)
    lim_light = (1.0 - jnp.exp(-alpha * I)) * jnp.exp(-beta * I)

    no3e = jnp.maximum(no3, 0.0)[..., None]
    nh4e = jnp.maximum(nh4, 0.0)[..., None]
    sio3e = jnp.maximum(sio3, 0.0)[..., None]
    k_no3 = jnp.asarray(K_NO3_G)
    k_nh4 = jnp.asarray(K_NH4_G)
    k_si = jnp.asarray(K_SIO3_G)
    lim_no3 = no3e / (k_no3 + no3e)
    lim_nh4 = nh4e / (k_nh4 + nh4e)
    # NH4 preference: N limitation is the combined saturation, NH4 first
    lim_n = jnp.minimum(lim_no3 + lim_nh4, 1.0)
    lim_si = jnp.where(k_si > 0.0, sio3e / (k_si + sio3e), 1.0)
    mu = jnp.asarray(MU_MAX_G) * f_t * lim_light \
        * jnp.minimum(lim_n, lim_si)

    grow = mu * jnp.maximum(algae3, 0.0) * dt        # gross, mmol N/m3
    # nutrient-availability cap across groups (no overdraw)
    need_n = jnp.sum(grow, axis=-1)
    avail_n = 0.9 * (no3e[..., 0] + nh4e[..., 0])
    scale_n = jnp.minimum(avail_n / jnp.maximum(need_n, 1e-30), 1.0)
    grow = grow * scale_n[..., None]
    need_si = R_SI_N_DIAT * grow[..., 0]
    scale_si = jnp.minimum(0.9 * sio3e[..., 0]
                           / jnp.maximum(need_si, 1e-30), 1.0)
    grow = grow.at[..., 0].mul(scale_si)

    # uptake split: NH4 first by preference ratio
    pref_nh4 = lim_nh4 / jnp.maximum(lim_no3 + lim_nh4, 1e-10)
    up_nh4 = jnp.sum(grow * pref_nh4, axis=-1)
    up_nh4 = jnp.minimum(up_nh4, 0.9 * nh4e[..., 0])
    up_no3 = jnp.maximum(jnp.sum(grow, axis=-1) - up_nh4, 0.0)

    resp = FR_RESP * grow
    grazed = jnp.asarray(GRAZED_G) * grow
    mort = jnp.asarray(MORT_G) * jnp.maximum(algae3, 0.0) * dt
    net = grow - resp - grazed - mort
    algae_new = jnp.maximum(algae3 + net, 0.0)

    mort_tot = jnp.sum(mort + resp, axis=-1)
    don_new = jnp.maximum(don + FR_DON * mort_tot
                          - K_DON * dt * jnp.maximum(don, 0.0), 0.0)
    nh4_new = jnp.maximum(
        nh4 - up_nh4 + (1.0 - FR_DON) * mort_tot
        + K_DON * dt * jnp.maximum(don, 0.0)
        - K_NITRIF * dt * jnp.maximum(nh4, 0.0), 0.0)
    no3_new = jnp.maximum(no3 - up_no3
                          + K_NITRIF * dt * jnp.maximum(nh4, 0.0), 0.0)
    sio3_new = jnp.maximum(sio3 - R_SI_N_DIAT * grow[..., 0], 0.0)
    return algae_new, no3_new, nh4_new, sio3_new, don_new, grow
