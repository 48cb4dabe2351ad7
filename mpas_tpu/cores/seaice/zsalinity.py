"""Vertical (z-level) prognostic ice salinity: gravity drainage,
growth entrapment, and surface flushing.

ref capability: src/core_seaice/column/ice_zsalinity.F90 (zsalinity /
solve_zsalinity / solve_S_dt — brine advection-diffusion on the bio grid
with Darcy velocities and a Rayleigh-number gravity-drainage criterion)
and the mushy-layer gravity drainage of ice_therm_mushy.F90
(Turner, Hunke & Jeffery 2013: fast convective mode when the local mush
Rayleigh number exceeds critical + slow diffusive mode). This module
evolves the per-layer bulk salinity tracer (iceSalinity, psu) with those
processes in compressed form:

  - growth entrapment: new bottom ice traps a keff fraction of seawater
    salinity (ref: S_bot/frazil salt entrapment of solve_S_dt)
  - gravity drainage, fast mode: layers whose local Rayleigh number
    Ra(k) = g beta (S(k) - S_bot_ref) (h - z_k) Pi / (kappa nu) exceeds
    Ra_c drain toward the stable profile at rate_fast (ref:
    ice_therm_mushy.F90 gravity_drainage; Ra gating of solve_zsalinity
    via Rayleigh_criteria)
  - slow mode: relaxation toward the BL99 stable shape everywhere
  - flushing: surface meltwater percolates through permeable ice
    (brine_permeability phi^3 law shared with ponds.py), desalinating
    the column top-down
  - min_salin floor and the salt flux to the ocean from every removal
    (ref: fzsal/fzsal_g outputs)

All arrays are (nCells, nCat, nIceLayers) with layers in lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.seaice.config import SeaiceConfig

MIN_SALIN = 0.1          # ref: min_salin, ice_colpkg_shared.F90
KEFF_GROWTH = 0.26       # effective segregation coefficient (Cox & Weeks)
RA_C = 10.0              # critical mush Rayleigh number (Turner 2013)
RATE_FAST = 1.0e-3       # 1/s fast-drainage relaxation when Ra > Ra_c
RATE_SLOW = 1.0e-7       # 1/s slow mode
KAPPA_NU = 6.8e-3        # thermal diffusivity x kinematic viscosity scale
BETA_S = 0.8             # kg/m3 per psu haline density coefficient
PERM0 = 3.0e-8           # m2 permeability scale (phi^3 law)


def stable_profile(nilyr: int) -> np.ndarray:
    """BL99/CICE stable bulk-salinity shape (psu) at layer midpoints."""
    z = (np.arange(nilyr) + 0.5) / nilyr
    return 1.6 * (1.0 - np.cos(np.pi * z ** (0.407 / (z + 0.573))))


def local_rayleigh(S, h_ice, sss):
    """Mush Rayleigh number per layer (compressed Turner 2013 form):
    density contrast of the layer's brine vs the basal brine times the
    distance to the bottom, over the dissipative scale."""
    nilyr = S.shape[-1]
    z_above = (jnp.arange(nilyr) + 0.5) / nilyr       # 0 top -> 1 bottom
    dist_bot = h_ice[..., None] * (1.0 - z_above)
    drho = BETA_S * jnp.maximum(S - MIN_SALIN, 0.0)
    perm = PERM0 * jnp.clip(S / jnp.maximum(sss[..., None, None], 1.0),
                            0.0, 1.0) ** 3
    return 9.81 * drho * dist_bot * perm / KAPPA_NU


def zsalinity_step(cfg: SeaiceConfig, S, h_ice, growth_b, melt_s,
                   sss, dt):
    """One salinity step. S: (nC, nCat, nilyr) psu; h_ice (nC, nCat) m;
    growth_b (nC, nCat) basal growth rate m/s; melt_s (nC, nCat) m of
    surface (snow+ice) melt this step; sss (nC,) ocean salinity.

    Returns (S_new, fzsal) with fzsal (nC,) the salt flux to the ocean
    in kg/m2 of salt over the step (positive = into the ocean), the sum
    of drainage, flushing, and growth-entrapment rejection — the
    reference's fzsal + fzsal_g pair."""
    nC, nCat, nilyr = S.shape
    sssb = sss[:, None, None]
    has = (h_ice > 1.0e-3)[..., None]

    # --- growth entrapment at the bottom layer --------------------------
    # mass of new ice this step distributed into the bottom layer
    dh_new = growth_b * dt                               # (nC, nCat)
    layer_h = jnp.maximum(h_ice, 1e-6) / nilyr
    f_new = jnp.clip(dh_new / jnp.maximum(layer_h, 1e-9), 0.0, 1.0)
    S_entrap = KEFF_GROWTH * sssb[..., 0]
    S_bot = S[..., -1] * (1.0 - f_new) + S_entrap * f_new
    S1 = S.at[..., -1].set(jnp.where(has[..., 0], S_bot, S[..., -1]))
    # salt rejected by the growth (the (1-keff) fraction of seawater salt)
    rej = (1.0 - KEFF_GROWTH) * sss[:, None] * dh_new * 0.917  # kg-scaled

    # --- gravity drainage: fast mode where Ra > Ra_c --------------------
    ra = local_rayleigh(S1, h_ice, sss)
    stable = jnp.asarray(stable_profile(nilyr), dtype=S.dtype)
    excess = jnp.maximum(S1 - stable[None, None, :], 0.0)
    fast = jnp.where(ra > RA_C, RATE_FAST, 0.0)
    dS_drain = (fast + RATE_SLOW) * dt * excess
    dS_drain = jnp.minimum(dS_drain, jnp.maximum(S1 - MIN_SALIN, 0.0))
    S2 = S1 - jnp.where(has, dS_drain, 0.0)

    # --- flushing: surface melt through permeable ice -------------------
    perm = jnp.clip(jnp.mean(S2, axis=-1)
                    / jnp.maximum(sss[:, None], 1.0), 0.0, 1.0) ** 3
    flush = jnp.clip(melt_s * perm * 5.0, 0.0, 0.5)      # fraction
    dS_flush = flush[..., None] * jnp.maximum(S2 - MIN_SALIN, 0.0)
    S3 = S2 - jnp.where(has, dS_flush, 0.0)
    S3 = jnp.clip(S3, MIN_SALIN, 35.0)

    # --- salt flux to ocean (kg salt / m2): rho_i * h_layer * dS/1000 ---
    rho_i = cfg.rho_ice
    dS_tot = jnp.where(has, dS_drain + dS_flush, 0.0)
    fz_cat = rho_i * layer_h[..., None] * dS_tot / 1000.0
    fzsal = jnp.sum(fz_cat, axis=(-1, -2)) + jnp.sum(rej / 1000.0, axis=-1)
    return S3, fzsal


def mushy_liquid_fraction(S, T):
    """Mush liquid fraction phi = S / S_br(T) with the liquidus
    S_br = -T/mu (ref: ice_mushy_physics.F90 liquid_fraction)."""
    s_br = jnp.maximum(-T / 0.054, MIN_SALIN)
    return jnp.clip(S / s_br, 0.0, 1.0)
