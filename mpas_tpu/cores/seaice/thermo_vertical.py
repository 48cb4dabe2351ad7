"""Multilayer vertical sea-ice thermodynamics (BL99 + mushy-class).

ref capability: src/core_seaice/column/ice_therm_bl99.F90 (1,504 LoC,
Bitz & Lipscomb 1999 salinity-dependent heat equation),
ice_therm_mushy.F90 (3,515 LoC, mushy-layer enthalpy formulation),
ice_therm_vertical.F90 (growth/melt + enthalpy-conserving layer remap),
driven from shared/mpas_seaice_column.F.

TPU-first design: every column (cell x category) is independent, so the
whole scheme is a batched solve with the vertical-node dimension in lanes:

  * prognostic per-layer enthalpy q (J/m3, <= 0) for nIceLayers ice layers
    and nSnowLayers snow layers, plus skin temperature Ts;
  * heat equation solved implicitly: a single coupled tridiagonal system
    over nodes [Ts, snow..., ice...] per column (Thomas algorithm over the
    trailing axis, `ops.matrix.tridiagonal_solve`), with a fixed number of
    Picard passes updating the T-dependent conductivity/heat capacity and
    the linearized surface energy balance (static under jit);
  * the melting-surface case (Ts clamped to 0 C) is handled by a second
    masked solve with a Dirichlet surface row — branch-free, two solves
    always, selected per column with `where`;
  * basal growth/melt from the conductive-flux/ocean-flux imbalance, using
    the enthalpy of new ice at the basal liquidus; surface melt of snow
    then ice from the residual surface flux;
  * enthalpy-conserving remap back to equal-thickness sigma layers via a
    static (nlyr x nlyr) overlap matrix (exact piecewise-constant remap).

Two thermodynamic closures, selected by `config_thermo_type`:
  "bl99": q(T) from the Bitz-Lipscomb brine-pocket form with the fixed
          CICE salinity profile; k(T,S) = k0 + beta S / T.
  "mushy": mush enthalpy q = phi rho_w c_w T + (1-phi)(rho_i c_i T -
          rho_i L), liquid fraction phi = S / S_br(T) on the liquidus
          S_br = -T/mu; conductivity blends brine/ice by phi. (Gravity
          drainage/flushing of the full mushy scheme is represented by the
          fixed bulk-salinity profile; prognostic salinity: later round.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.ops.matrix import tridiagonal_solve

_T0 = 273.15
CP_ICE = 2106.0       # J/kg/K   (ref ice_constants_colpkg.F90 cp_ice)
CP_OCN = 4218.0       # J/kg/K   (cp_ocn)
LFRESH = 3.34e5       # J/kg     (Lfresh)
MU = 0.054            # liquidus slope, degC / (g/kg)  (depressT/mu)
KICE0 = 2.03          # W/m/K    fresh-ice conductivity
BETA_K = 0.13         # W/m/(kg/m3?) BL99 salinity conductivity coefficient
KSNOW = 0.30
RHOW = 1026.0
MIN_K = 0.1


def bl99_salinity_profile(nilyr: int) -> np.ndarray:
    """Prescribed CICE/BL99 salinity at layer midpoints (g/kg).
    ref: ice_therm_bl99.F90 salinity profile s(z) =
    0.5 smax (1 - cos(pi z^(a/(z+b)))), a=0.407, b=0.573, smax=3.2."""
    z = (np.arange(nilyr) + 0.5) / nilyr
    smax, a, b = 3.2, 0.407, 0.573
    return 0.5 * smax * (1.0 - np.cos(np.pi * z ** (a / (z + b))))


# ---------------------------------------------------------------------------
# enthalpy <-> temperature relations
# ---------------------------------------------------------------------------

def enthalpy_ice_bl99(cfg: SeaiceConfig, T, S):
    """q(T,S) J/m3 (<=0), BL99 brine-pocket form.
    ref: ice_therm_shared.F90 enthalpy_ice."""
    Tm = -MU * S
    T = jnp.minimum(T, Tm - 1e-6)
    return -cfg.rho_ice * (CP_ICE * (Tm - T)
                           + LFRESH * (1.0 - Tm / T) - CP_OCN * Tm)


def temperature_ice_bl99(cfg: SeaiceConfig, q, S):
    """Invert BL99 enthalpy: quadratic closed form.
    ref: ice_therm_shared.F90 calculate_Tin_from_qin."""
    Tm = -MU * S
    a = CP_ICE
    b = (CP_OCN - CP_ICE) * Tm - q / cfg.rho_ice - LFRESH
    c = LFRESH * Tm
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    T = (-b - jnp.sqrt(disc)) / (2.0 * a)
    return jnp.minimum(T, Tm)


def enthalpy_mush(cfg: SeaiceConfig, T, S):
    """Mush enthalpy: phi rho_w c_w T + (1-phi)(rho_i c_i T - rho_i L).
    phi = S/S_br(T), S_br = -T/mu (linear liquidus).
    ref capability: ice_mushy_physics.F90 enthalpy_mush/liquid_fraction."""
    Sbr = jnp.maximum(-T / MU, 1e-12)
    phi = jnp.clip(S / Sbr, 0.0, 1.0)
    return (phi * RHOW * CP_OCN * T
            + (1.0 - phi) * (cfg.rho_ice * CP_ICE * T
                             - cfg.rho_ice * LFRESH))


def temperature_mush(cfg: SeaiceConfig, q, S):
    """Invert mush enthalpy for T (quadratic in T when phi<1).
    ref capability: ice_mushy_physics.F90 temperature_mush."""
    # fully frozen branch: q = rho_i c_i T - rho_i L
    T_fr = (q + cfg.rho_ice * LFRESH) / (cfg.rho_ice * CP_ICE)
    # mush branch: phi = -mu S / T ->
    #   q T = -mu S rho_w c_w T + (T + mu S)(rho_i c_i T - rho_i L)
    # => quadratic a T^2 + b T + c = 0 with
    a = cfg.rho_ice * CP_ICE
    b = (cfg.rho_ice * CP_ICE - RHOW * CP_OCN) * MU * S \
        - cfg.rho_ice * LFRESH - q
    c = -cfg.rho_ice * LFRESH * MU * S
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    T_mu = (-b - jnp.sqrt(disc)) / (2.0 * a)
    # mush branch applies while the implied liquid fraction is positive,
    # i.e. whenever the frozen-branch T would sit above the full-solidus
    phi_mu = jnp.clip(S / jnp.maximum(-T_mu / MU, 1e-12), 0.0, 1.0)
    T = jnp.where(phi_mu > 1e-6, T_mu, T_fr)
    return jnp.minimum(T, -MU * S)


def enthalpy_snow(cfg: SeaiceConfig, T):
    """ref: ice_therm_shared.F90 enthalpy_snow: -rho_s (L - c_i T)."""
    return -cfg.rho_snow * (LFRESH - CP_ICE * T)


def temperature_snow(cfg: SeaiceConfig, q):
    return jnp.minimum((LFRESH + q / cfg.rho_snow) / CP_ICE, 0.0)


def conductivity_ice(cfg: SeaiceConfig, T, S, mushy: bool):
    if mushy:
        Sbr = jnp.maximum(-T / MU, 1e-12)
        phi = jnp.clip(S / Sbr, 0.0, 1.0)
        k = (1.0 - phi) * KICE0 + phi * 0.56   # brine conductivity
    else:
        k = KICE0 + BETA_K * S / jnp.minimum(T, -0.02)
    return jnp.maximum(k, MIN_K)


def heat_capacity_ice(cfg: SeaiceConfig, T, S):
    """Effective volumetric heat capacity rho c_eff = dq/dT (J/m3/K);
    BL99 form c = c0 + L mu S / T^2 is also a good mush approximation."""
    T = jnp.minimum(T, -0.02)
    return cfg.rho_ice * (CP_ICE + LFRESH * MU * S / (T * T))


# ---------------------------------------------------------------------------
# implicit vertical heat solve
# ---------------------------------------------------------------------------

def _solve_heat(cfg: SeaiceConfig, T_s, T_sn, T_in, S_in, h_i, h_s,
                surf_fn, sw_ice, dt, mushy):
    """One column heat solve, batched over leading dims.

    Nodes: [surface skin, snow (nslyr), ice (nilyr)]; bottom Dirichlet at
    the basal liquidus. surf_fn(Ts) -> (f, df/dTs): surface energy balance
    re-linearized at each Picard pass. sw_ice: absorbed shortwave per ice
    layer (W/m2). Returns (T_s, T_sn, T_in, kh0, kh_bot).
    ref: ice_therm_bl99.F90 temperature_changes tridiagonal assembly."""
    nslyr = T_sn.shape[-1]
    nilyr = T_in.shape[-1]
    n = 1 + nslyr + nilyr
    dz_i = jnp.maximum(h_i, 1e-3)[..., None] / nilyr
    # vanished snow -> thermally-thin 1 mm contact layer (branch-free;
    # negligible resistance and heat capacity, handled implicitly)
    dz_s = jnp.maximum(h_s, 1e-3)[..., None] / nslyr
    T_bot = -MU * S_in[..., -1:]

    for _ in range(4):   # Picard passes (static)
        f0, dfdt = surf_fn(T_s)
        k_in = conductivity_ice(cfg, T_in, S_in, mushy)
        rc_i = heat_capacity_ice(cfg, T_in, S_in)
        rc_s = jnp.full_like(T_sn, cfg.rho_snow * CP_ICE)
        k_sn = jnp.full_like(T_sn, KSNOW)

        # node thicknesses / conductivities stacked: snow then ice
        dz = jnp.concatenate([jnp.broadcast_to(dz_s, T_sn.shape),
                              jnp.broadcast_to(dz_i, T_in.shape)], axis=-1)
        kk = jnp.concatenate([k_sn, k_in], axis=-1)
        rc = jnp.concatenate([rc_s, rc_i], axis=-1)

        # interface conductances between node j and j+1 (n-2 interior)
        dz_half = 0.5 * dz
        kh_int = kk[..., :-1] * kk[..., 1:] / jnp.maximum(
            kk[..., :-1] * dz_half[..., 1:] + kk[..., 1:] * dz_half[..., :-1],
            1e-12)                                   # (.., n-2)
        kh0 = kk[..., 0] / jnp.maximum(dz_half[..., 0], 1e-6)
        kh_bot = kk[..., -1] / jnp.maximum(dz_half[..., -1], 1e-6)

        eta = dt / jnp.maximum(rc * dz, 1e-12 * jnp.ones_like(rc))

        sw_lyr = jnp.concatenate(
            [jnp.zeros_like(T_sn), sw_ice], axis=-1)
        T_old = jnp.concatenate([T_sn, T_in], axis=-1)

        # assemble tridiagonal of size n = 1 + (n-1) layer nodes
        a = jnp.zeros(T_old.shape[:-1] + (n,))
        b = jnp.zeros_like(a)
        c = jnp.zeros_like(a)
        d = jnp.zeros_like(a)

        # surface row: (dfdt - kh0) Ts + kh0 T1 = -f0 + dfdt Ts
        b = b.at[..., 0].set(dfdt - kh0)
        c = c.at[..., 0].set(kh0)
        d = d.at[..., 0].set(-f0 + dfdt * T_s)

        # layer rows j = 1..n-1  (layer index l = j-1)
        kh_up = jnp.concatenate([kh0[..., None], kh_int], axis=-1)  # n-1
        kh_dn = jnp.concatenate([kh_int, kh_bot[..., None]], axis=-1)

        a = a.at[..., 1:].set(-eta * kh_up)
        b = b.at[..., 1:].set(1.0 + eta * (kh_up + kh_dn))
        c = c.at[..., 1:].set(
            jnp.concatenate([-eta[..., :-1] * kh_dn[..., :-1],
                             jnp.zeros_like(eta[..., :1])], axis=-1))
        rhs = T_old + eta * sw_lyr
        rhs = rhs.at[..., -1].add(eta[..., -1] * kh_bot * T_bot[..., 0])
        d = d.at[..., 1:].set(rhs)

        sol = tridiagonal_solve(a, b, c, d)
        T_s_new = jnp.minimum(sol[..., 0], 0.0)

        # melting columns: Dirichlet Ts = 0 resolve (branch-free re-solve)
        melting = sol[..., 0] > 0.0
        b0 = jnp.where(melting, 1.0, b[..., 0])
        c0 = jnp.where(melting, 0.0, c[..., 0])
        d0 = jnp.where(melting, 0.0, d[..., 0])
        sol2 = tridiagonal_solve(a, b.at[..., 0].set(b0),
                                 c.at[..., 0].set(c0),
                                 d.at[..., 0].set(d0))
        sol = jnp.where(melting[..., None], sol2, sol)
        T_s = jnp.where(melting, 0.0, T_s_new)
        T_sn = jnp.minimum(sol[..., 1:1 + nslyr], 0.0)
        Tm_in = -MU * S_in
        T_in = jnp.minimum(sol[..., 1 + nslyr:], Tm_in - 1e-4)

    return T_s, T_sn, T_in, kh0, kh_bot


def thermo_multilayer(cfg: SeaiceConfig, a, vi, vs, T_s, q_i, q_s,
                      sw_down, lw_down, t_air, f_ocean, dt,
                      sw_abs_lyr=None, albedo=None, sw_through=None,
                      salinity=None):
    """Full multilayer vertical thermodynamics for (nCells, nCat) columns.

    Returns updated (a, vi, vs, T_s, q_i, q_s) plus diagnostics dict.
    ref: ice_therm_vertical.F90 thermo_vertical call sequence.

    salinity: optional prognostic per-layer bulk salinity
    (nCells, nCat, nilyr) from the zsalinity tracer — when given, the
    conductivity and mush liquidus use the EVOLVING profile instead of
    the fixed BL99 shape (the prognostic-salinity coupling of
    ice_therm_mushy.F90's temperature/conductivity dependence on Sin)."""
    mushy = cfg.config_thermo_type == "mushy"
    nilyr = q_i.shape[-1]
    nslyr = q_s.shape[-1]
    if salinity is not None and salinity.shape == q_i.shape:
        S = salinity.astype(q_i.dtype)
    else:
        S = jnp.asarray(bl99_salinity_profile(nilyr), dtype=q_i.dtype)
        S = jnp.broadcast_to(S, q_i.shape)

    has_ice = a > cfg.puny
    h_i = jnp.where(has_ice, vi / jnp.maximum(a, cfg.puny), 0.0)
    h_s = jnp.where(has_ice, vs / jnp.maximum(a, cfg.puny), 0.0)

    if mushy:
        T_in = temperature_mush(cfg, q_i, S)
    else:
        T_in = temperature_ice_bl99(cfg, q_i, S)
    T_sn = temperature_snow(cfg, q_s)

    # surface energy balance linearization
    if sw_abs_lyr is None:
        # CCSM3-style band albedos + Beer's-law interior absorption
        if albedo is None:
            albedo = jnp.where(h_s > 0.01, 0.80, 0.60)
        i0 = jnp.where(h_s > 1e-4, 0.0, 0.17)   # penetrating fraction
        sw_net = (1.0 - albedo) * sw_down
        sw_surf = (1.0 - i0) * sw_net
        kap = 1.4                                 # 1/m
        zif = (jnp.arange(nilyr + 1) / nilyr)[None, None, :] \
            * h_i[..., None]
        tr = jnp.exp(-kap * zif)
        sw_pen = i0 * sw_net
        sw_abs_lyr = sw_pen[..., None] * (tr[..., :-1] - tr[..., 1:])
        sw_ocean_thru = sw_pen * tr[..., -1]
    else:
        # delta-Eddington supplied per-layer absorption (W/m2); surface
        # absorption = net minus interior minus transmitted
        sw_ocean_thru = (jnp.zeros_like(sw_down) if sw_through is None
                         else sw_through)
        sw_net = (1.0 - albedo) * sw_down
        sw_surf = jnp.maximum(
            sw_net - jnp.sum(sw_abs_lyr, axis=-1) - sw_ocean_thru, 0.0)

    c_sens = 10.0

    def surf_fn(ts):
        tk = ts + _T0
        f = (sw_surf + lw_down
             - cfg.emissivity * cfg.stefan_boltzmann * tk ** 4
             - c_sens * (ts - t_air))
        df = (-4.0 * cfg.emissivity * cfg.stefan_boltzmann * tk ** 3
              - c_sens)
        return f, df

    T_s2, T_sn2, T_in2, kh0, kh_bot = _solve_heat(
        cfg, T_s, T_sn, T_in, S, h_i, h_s, surf_fn, sw_abs_lyr, dt, mushy)

    # post-solve layer enthalpies (used for melt energies and the remap)
    q_i = enthalpy_fn(cfg, mushy)(T_in2, S)
    q_s = enthalpy_snow(cfg, T_sn2)

    # --- growth / melt ---------------------------------------------------
    T_bot = -MU * S[..., -1]
    f_cond_bot = kh_bot * (T_bot - T_in2[..., -1])   # upward conduction
    # enthalpy of new basal ice at (T_bot, S_bot)
    if mushy:
        q_bot = enthalpy_mush(cfg, T_bot - 0.5, S[..., -1])
    else:
        q_bot = enthalpy_ice_bl99(cfg, T_bot - 0.5, S[..., -1])
    grow = jnp.maximum(f_cond_bot - f_ocean, 0.0)
    dh_grow = dt * grow / jnp.maximum(-q_bot, 1e3)
    melt_b = jnp.maximum(f_ocean - f_cond_bot, 0.0)
    dh_melt_bot = dt * melt_b / jnp.maximum(-q_i[..., -1], 1e3)
    dh_melt_bot = jnp.minimum(dh_melt_bot, h_i)

    # surface melt: residual of the balance at Ts=0 beyond what conducts in
    f_cond_top = kh0 * (T_s2 - T_sn2[..., 0])
    tk2 = T_s2 + _T0
    f_surf = (sw_surf + lw_down
              - cfg.emissivity * cfg.stefan_boltzmann * tk2 ** 4
              - c_sens * (T_s2 - t_air))
    f_melt = jnp.maximum(f_surf - f_cond_top, 0.0) * (T_s2 >= -1e-6)
    dh_snow_melt = jnp.minimum(dt * f_melt / jnp.maximum(-q_s[..., 0], 1e3),
                               h_s)
    used = dh_snow_melt * (-q_s[..., 0]) / dt
    dh_ice_surf_melt = jnp.minimum(
        dt * jnp.maximum(f_melt - used, 0.0)
        / jnp.maximum(-q_i[..., 0], 1e3), h_i)

    h_i_new = jnp.maximum(h_i + dh_grow - dh_melt_bot - dh_ice_surf_melt,
                          0.0)
    h_s_new = jnp.maximum(h_s - dh_snow_melt, 0.0)

    # --- enthalpy remap to sigma layers ----------------------------------
    # The post-change column = [post-solve column shaved at both ends][new
    # basal slab of q_bot]; remap that piecewise-constant profile
    # conservatively onto nilyr equal sigma layers (ref: adjust_enthalpy).
    nl = nilyr
    # old layer interfaces in original coordinates, clipped to the
    # retained span [dh_surf_melt, h_i - dh_melt_bot], shifted so the
    # retained column starts at 0 (fully-melted layers collapse to zero
    # width and drop out of the overlap weights)
    zo_orig = (jnp.arange(nl + 1) / nl)[None, None, :] * h_i[..., None]
    lo_clip = dh_ice_surf_melt[..., None]
    hi_clip = (h_i - dh_melt_bot)[..., None]
    zo = jnp.clip(zo_orig, lo_clip, jnp.maximum(hi_clip, lo_clip)) - lo_clip
    # append the growth slab as one extra pseudo-layer
    zo_g = zo[..., -1:] + dh_grow[..., None]
    zo_all = jnp.concatenate([zo, zo_g], axis=-1)      # nl+2 interfaces
    q_all = jnp.concatenate([q_i, q_bot[..., None]], axis=-1)
    h_new = jnp.maximum(h_i_new, 1e-12)
    zn = (jnp.arange(nl + 1) / nl)[None, None, :] * h_new[..., None]
    lo = jnp.maximum(zo_all[..., None, :-1], zn[..., :-1, None])
    hi_ = jnp.minimum(zo_all[..., None, 1:], zn[..., 1:, None])
    w = jnp.maximum(hi_ - lo, 0.0)
    q_i_new = jnp.einsum("...jk,...k->...j", w, q_all) / jnp.maximum(
        jnp.sum(w, axis=-1), 1e-12)
    q_i_new = jnp.where(h_i_new[..., None] > cfg.puny, q_i_new,
                        enthalpy_fn(cfg, mushy)(-5.0 * jnp.ones_like(q_i),
                                                S))
    q_s_new = jnp.where(h_s_new[..., None] > cfg.puny,
                        enthalpy_snow(cfg, T_sn2), enthalpy_snow(
                            cfg, jnp.zeros_like(T_sn2)))

    gone = (h_i_new <= cfg.puny) | ~has_ice
    a_new = jnp.where(gone, 0.0, a)
    vi_new = a_new * h_i_new
    vs_new = jnp.where(gone, 0.0, a_new * h_s_new)
    T_s_out = jnp.where(gone, 0.0, T_s2)

    diags = {
        "basalGrowth": jnp.sum(a * dh_grow, axis=-1) / dt,
        "basalMelt": jnp.sum(a * dh_melt_bot, axis=-1) / dt,
        "surfaceMelt": jnp.sum(a * (dh_ice_surf_melt + dh_snow_melt),
                               axis=-1) / dt,
        "shortwaveThroughOcean": jnp.sum(a * sw_ocean_thru, axis=-1),
        "congelation": jnp.sum(a * dh_grow, axis=-1),
    }
    return a_new, vi_new, vs_new, T_s_out, q_i_new, q_s_new, diags


def enthalpy_fn(cfg: SeaiceConfig, mushy: bool):
    if mushy:
        return lambda T, S: enthalpy_mush(cfg, T, S)
    return lambda T, S: enthalpy_ice_bl99(cfg, T, S)


def init_enthalpy(cfg: SeaiceConfig, n_cells: int, n_cat: int,
                  nilyr: int = 7, nslyr: int = 1, T_init: float = -5.0,
                  dtype=jnp.float64):
    """Cold-start per-layer enthalpies at a uniform temperature."""
    S = jnp.asarray(bl99_salinity_profile(nilyr), dtype=dtype)
    T = jnp.full((n_cells, n_cat, nilyr), T_init, dtype=dtype)
    mushy = cfg.config_thermo_type == "mushy"
    q_i = enthalpy_fn(cfg, mushy)(T, jnp.broadcast_to(S, T.shape))
    q_s = enthalpy_snow(cfg, jnp.full((n_cells, n_cat, nslyr), T_init,
                                      dtype=dtype))
    return q_i, q_s


def column_energy(cfg: SeaiceConfig, a, vi, vs, q_i, q_s):
    """Total column energy (J/m2 of grid area) for conservation checks."""
    nilyr = q_i.shape[-1]
    nslyr = q_s.shape[-1]
    e_i = jnp.sum(q_i, axis=-1) * vi / nilyr
    e_s = jnp.sum(q_s, axis=-1) * vs / nslyr
    return jnp.sum(e_i + e_s, axis=-1)
