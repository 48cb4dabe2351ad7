"""Land-ice (ice-shelf) -- ocean flux coupling.

ref: src/core_ocean/shared/mpas_ocn_surface_land_ice_fluxes.F (tracer,
velocity, thickness flux assembly :81-341; melt-rate arrays :357+) with
the ISOMIP-genre three-equation melt parameterization
(config_land_ice_flux_mode = 'standalone'/'coupled';
config_land_ice_flux_ISOMIP_gammaT):

  T_b = lam1 S_b + lam2 + lam3 p_b            (in-situ freezing point)
  rho cp gammaT (T_o - T_b) = m L + m cp_i (T_b - T_i)   (heat balance)
  m S_b = gammaS rho (S_o - S_b)              (salt balance, virtual)

Solved per cavity cell for (T_b, S_b, melt rate m); the resulting
heat/salt/freshwater fluxes enter the top layer of the sub-shelf water
column, and the melt adds a surface thickness flux.

All elementwise per cell -> jittable; the cavity mask comes from
landIceDraft < 0 (init_isomip / init_sub_ice_shelf_2d extras).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

# freezing-point coefficients (ref: the linear ISOMIP EOS-freezing law)
LAM1 = -0.0573        # deg C / (g/kg)
LAM2 = 0.0832         # deg C
LAM3 = -7.53e-8       # deg C / Pa
LATENT_HEAT = 3.34e5  # J/kg
CP_OCEAN = 3974.0     # J/kg/K
CP_ICE = 2009.0
RHO0 = 1026.0
GAMMA_T = 1.0e-4      # m/s (ref config_land_ice_flux_ISOMIP_gammaT genre)
GAMMA_S = GAMMA_T / 35.0
T_ICE = -20.0         # deg C interior shelf temperature


class LandIceFluxes(NamedTuple):
    melt_rate: Any        # (nCells,) m/s of freshwater (positive = melt)
    heat_flux: Any        # (nCells,) W/m2 into the ocean (negative cools)
    freshwater_flux: Any  # (nCells,) kg/m2/s into the ocean
    salt_flux: Any        # (nCells,) (g/kg)(kg/m2/s) virtual salt flux
    t_boundary: Any       # (nCells,) deg C at the interface
    s_boundary: Any       # (nCells,)


def three_equation_melt(t_ocean, s_ocean, land_ice_pressure, cavity_mask):
    """Solve the three-equation system per cavity cell.

    With the linear freezing law the system reduces to a quadratic in
    S_b; the physical (positive) root is taken (ref: the standalone
    flux-mode solve in mpas_ocn_surface_land_ice_fluxes.F:357+)."""
    tf_const = LAM2 + LAM3 * land_ice_pressure
    # melt m from heat balance with T_b = lam1 S_b + tf_const:
    #   rho cp gT (T_o - T_b) = m (L + cp_i (T_b - T_ice))
    # salt: m S_b = rho gS (S_o - S_b)
    # eliminate m: quadratic a2 S_b^2 + a1 S_b + a0 = 0
    ct = RHO0 * CP_OCEAN * GAMMA_T
    cs = RHO0 * GAMMA_S
    # approximate the latent+sensible-into-ice term with T_b ~ tf(S_o)
    # for the effective latent heat (standard ISOMIP simplification)
    l_eff = LATENT_HEAT + CP_ICE * (LAM1 * s_ocean + tf_const - T_ICE)
    a2 = -ct * LAM1
    a1 = ct * (t_ocean - tf_const) + cs * l_eff
    a0 = -cs * l_eff * s_ocean
    disc = jnp.maximum(a1 * a1 - 4.0 * a2 * a0, 0.0)
    s_b = jnp.where(jnp.abs(a2) > 1e-12,
                    (-a1 + jnp.sqrt(disc)) / (2.0 * a2 + 1e-30),
                    -a0 / jnp.where(jnp.abs(a1) > 1e-30, a1, 1e-30))
    s_b = jnp.clip(s_b, 1.0, 60.0)
    t_b = LAM1 * s_b + tf_const
    melt = cs * (s_ocean - s_b) / jnp.maximum(s_b, 1.0)   # kg/m2/s
    melt = jnp.where(cavity_mask, melt, 0.0)
    t_b = jnp.where(cavity_mask, t_b, 0.0)
    s_b = jnp.where(cavity_mask, s_b, s_ocean)
    heat = -melt * l_eff                                  # W/m2 (cooling)
    fresh = melt                                          # kg/m2/s
    salt = -melt * s_b                                    # virtual salt
    return LandIceFluxes(melt_rate=melt / RHO0, heat_flux=heat,
                         freshwater_flux=fresh, salt_flux=salt,
                         t_boundary=t_b, s_boundary=s_b)


def apply_land_ice_fluxes(grid, cfg, state, land_ice_pressure,
                          land_ice_draft, dt):
    """Apply the melt fluxes to the top (sub-shelf) layer tracers and
    thickness (ref: ocn_surface_land_ice_fluxes_{active_tracers,thick}).
    Returns (state', LandIceFluxes)."""
    cavity = land_ice_draft < -1.0e-3
    t_o = state.tracers[:, 0, 0]
    s_o = state.tracers[:, 0, 1]
    fx = three_equation_melt(t_o, s_o, land_ice_pressure, cavity)
    h_top = state.layerThickness[:, 0]
    dh = dt * fx.freshwater_flux / RHO0      # meltwater layer added (m)
    h_new = h_top + dh
    # conservative mixing: meltwater carries zero salt and enters at the
    # interface temperature; the interfacial heat flux (latent + into-ice
    # conduction) cools the blended layer
    t_new = (t_o * h_top + fx.t_boundary * dh) / h_new \
        + dt * fx.heat_flux / (RHO0 * CP_OCEAN * h_new)
    s_new = s_o * h_top / h_new
    tr = state.tracers.at[:, 0, 0].set(t_new)
    tr = tr.at[:, 0, 1].set(s_new)
    h = state.layerThickness.at[:, 0].set(h_new)
    return state.replace(tracers=tr, layerThickness=h), fx
