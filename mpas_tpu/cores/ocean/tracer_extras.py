"""Auxiliary ocean tracer groups: ideal age, exponential decay, frazil.

ref capabilities:
  * mpas_ocn_tracer_ideal_age.F (168 LoC): ageing source of +dt per step
    in the interior, reset to zero in the surface layer;
  * mpas_ocn_tracer_exponential_decay.F (166 LoC): first-order decay of a
    tracer with a prescribed e-folding time (radio-tracer capability);
  * mpas_ocn_frazil_forcing.F capability: where the column is below the
    salinity-dependent freezing point, the heat deficit is converted to
    frazil ice production and the water is warmed back to freezing;
    the produced ice volume is exported as a coupling flux (-> sea ice).

All are column-local elementwise updates, applied operator-split after
the dynamics step (matching the reference tendency ordering).
"""

from __future__ import annotations

import jax.numpy as jnp

# linear freezing point (ref: ocn_freezing_temperature coefficients)
FREEZE_DTDS = -0.0573        # degC / psu
FREEZE_T0 = 0.0832           # degC
LATENT_FUSION = 3.337e5      # J/kg
RHO_ICE = 918.0
CP_SW = 3996.0


def freezing_temperature(S):
    """ref: ocn_freezing_temperature (linear in salinity)."""
    return FREEZE_T0 + FREEZE_DTDS * S


def ideal_age_step(tracers, age_index: int, dt):
    """Advance the ideal-age tracer: +dt everywhere, zero at the surface.
    ref: ocn_tracer_ideal_age_compute."""
    age = tracers[..., age_index] + dt
    age = age.at[:, 0].set(0.0)
    return tracers.at[..., age_index].set(age)


def exponential_decay_step(tracers, index: int, dt, efolding_s: float):
    """First-order decay with e-folding time (ref:
    ocn_tracer_exponential_decay_compute)."""
    lam = 1.0 / efolding_s
    val = tracers[..., index] * jnp.exp(-lam * dt)
    return tracers.at[..., index].set(val)


def frazil_adjustment(cfg, state, dt):
    """Frazil ice formation: restore sub-freezing water to the freezing
    point; the removed heat deficit becomes frazil ice volume.

    Returns (new_state, frazil_ice_volume (nCells,) m of ice produced this
    step, per unit area) — the coupling flux the sea-ice core consumes.
    ref capability: mpas_ocn_frazil_forcing.F build_frazil_diagnostics /
    frazil formation in ocn_time_integrator_split stage 3.
    """
    T = state.tracers[..., 0]
    S = state.tracers[..., 1]
    h = state.layerThickness
    t_freeze = freezing_temperature(S)
    deficit = jnp.maximum(t_freeze - T, 0.0)          # K below freezing
    # energy to warm back to freezing, per layer (J/m2)
    energy = cfg.config_density0 * CP_SW * deficit * h
    dv_ice = energy / (RHO_ICE * LATENT_FUSION)       # m of new ice
    T_new = jnp.where(deficit > 0.0, t_freeze, T)
    # brine rejection: salt from the frozen freshwater stays in the layer
    # (keeps bulk salinity mass: dS = S * dv_ice*rho_i/rho0 / h)
    dS = S * dv_ice * (RHO_ICE / cfg.config_density0) / jnp.maximum(h, 1e-3)
    tr = state.tracers.at[..., 0].set(T_new)
    tr = tr.at[..., 1].add(dS)
    frazil_total = jnp.sum(dv_ice, axis=-1)
    return state.replace(tracers=tr), frazil_total
