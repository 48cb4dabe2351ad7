"""Column physics: thermodynamic growth/melt, ITD remapping, ridging.

ref: src/core_seaice/column/ (33,306 LoC Icepack-equivalent) wrapped by
shared/mpas_seaice_column.F. This module provides the v1 capability set:

  * zero-layer (Semtner 0) thermodynamics per category: surface energy
    balance with Newton iterations for the surface temperature, conductive
    flux through the slab, basal growth/melt against the ocean heat flux,
    surface melt, frazil ice formation in open water
    (ref capability: ice_therm_vertical / ice_therm_shared in column/)
  * ITD category remapping: rebin categories whose mean thickness crossed a
    category boundary (ref capability: ice_itd.F90 linear remapping —
    here conservative rebinning)
  * mechanical ridging when dynamics compresses total area above 1
    (ref capability: ice_mechred.F90 — here area-reduction at conserved
    volume)

All of it is elementwise/per-column -> trivially vmapped over cells with the
category dimension in lanes; no communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.state import SeaiceForcing, SeaiceState

_T0 = 273.15


def surface_temperature_solve(cfg: SeaiceConfig, t_s, h_ice, h_snow,
                              sw_abs, lw_down, t_air, t_bot):
    """Newton solve of the surface energy balance for slab ice.

    F(Ts) = sw_abs + lw_down - eps*sigma*Ts^4 - F_sens(Ts) + k_eff*(Tb-Ts)/h
    with a bulk sensible flux ~ c_t*(Ts - Ta). 4 fixed Newton iterations
    (static under jit)."""
    k_eff = 1.0 / (jnp.maximum(h_ice, 0.01) / cfg.ice_conductivity
                   + jnp.maximum(h_snow, 0.0) / cfg.snow_conductivity)
    c_sens = 10.0  # bulk transfer W/m2/K

    def body(i, t):
        tk = t + _T0
        f = (sw_abs + lw_down
             - cfg.emissivity * cfg.stefan_boltzmann * tk ** 4
             - c_sens * (t - t_air) + k_eff * (t_bot - t))
        dfdt = (-4.0 * cfg.emissivity * cfg.stefan_boltzmann * tk ** 3
                - c_sens - k_eff)
        return t - f / dfdt

    t_s = jax.lax.fori_loop(0, 4, body, t_s)
    t_s = jnp.minimum(t_s, 0.0)          # melting cap
    f_cond = k_eff * (t_bot - t_s)       # conductive flux up through slab
    tk = t_s + _T0
    f_net_surf = (sw_abs + lw_down
                  - cfg.emissivity * cfg.stefan_boltzmann * tk ** 4
                  - c_sens * (t_s - t_air))
    return t_s, f_cond, f_net_surf


def thermodynamics(cfg: SeaiceConfig, state: SeaiceState,
                   forcing: SeaiceForcing, dt) -> SeaiceState:
    """Vertical thermodynamics for every cell x category."""
    a = state.iceAreaCategory
    vi = state.iceVolumeCategory
    vs = state.snowVolumeCategory
    t_s = state.surfaceTemperature
    rhoL = cfg.rho_ice * cfg.latent_heat_fusion

    has_ice = a > cfg.puny
    h_i = jnp.where(has_ice, vi / jnp.maximum(a, cfg.puny), 0.0)
    h_s = jnp.where(has_ice, vs / jnp.maximum(a, cfg.puny), 0.0)

    alb = jnp.where(h_s > 0.01, 0.80, 0.60)   # crude snow/ice albedo
    sw_abs = (1.0 - alb) * forcing.shortwaveDown[:, None]
    lw_down = forcing.longwaveDown[:, None]
    t_air = forcing.airTemperature[:, None]
    t_bot = jnp.full_like(h_i, cfg.freezing_point)

    t_s_new, f_cond, f_net_surf = surface_temperature_solve(
        cfg, t_s, h_i, h_s, sw_abs, lw_down, t_air, t_bot)

    # basal growth (+) / melt (-): conductive heat out vs ocean heat in
    f_ocean = forcing.oceanHeatFlux[:, None]
    dh_bot = dt * (f_cond - f_ocean) / rhoL

    # surface melt when the balance at Ts=0 is positive
    melt_flux = jnp.maximum(f_net_surf - f_cond, 0.0) * (t_s_new >= 0.0)
    dh_surf_snow = -jnp.minimum(
        dt * melt_flux / (cfg.rho_snow * cfg.latent_heat_fusion), h_s)
    used = -dh_surf_snow * cfg.rho_snow * cfg.latent_heat_fusion / dt
    dh_surf_ice = -dt * jnp.maximum(melt_flux - used, 0.0) / rhoL

    h_i_new = jnp.maximum(h_i + dh_bot + dh_surf_ice, 0.0)
    h_s_new = jnp.maximum(h_s + dh_surf_snow, 0.0)

    gone = h_i_new <= cfg.puny
    a_new = jnp.where(gone, 0.0, a)
    vi_new = a_new * h_i_new
    vs_new = jnp.where(gone, 0.0, a_new * h_s_new)
    t_s_new = jnp.where(has_ice, t_s_new, 0.0)

    # frazil: open-water ocean heat loss forms new ice in category 0
    # (ref capability: ice_therm_itd frazil)
    open_frac = jnp.clip(1.0 - jnp.sum(a_new, axis=-1), 0.0, 1.0)
    freeze = jnp.maximum(-forcing.oceanHeatFlux, 0.0) * open_frac
    dv_frazil = dt * freeze / rhoL
    h_frazil = 0.05
    vi_new = vi_new.at[:, 0].add(dv_frazil)
    a_new = a_new.at[:, 0].add(dv_frazil / h_frazil)

    return state.replace(iceAreaCategory=a_new, iceVolumeCategory=vi_new,
                         snowVolumeCategory=vs_new,
                         surfaceTemperature=t_s_new)


def itd_remap(cfg: SeaiceConfig, state: SeaiceState) -> SeaiceState:
    """Rebin every category into the fixed thickness bounds (conservative).
    ref capability: column/ice_itd.F90 (linear remapping between category
    boundaries; here a one-shot conservative rebin of (a, v, vs, a*T))."""
    bounds = jnp.asarray(cfg.config_itd_bounds)
    n_cat = cfg.config_n_categories
    a, vi, vs = (state.iceAreaCategory, state.iceVolumeCategory,
                 state.snowVolumeCategory)
    aT = a * state.surfaceTemperature
    h = jnp.where(a > cfg.puny, vi / jnp.maximum(a, cfg.puny), 0.0)
    # destination category of each source category (static bounds)
    dest = jnp.sum(h[..., None] >= bounds[None, None, 1:-1], axis=-1)
    dest = jnp.minimum(dest, n_cat - 1)   # thickest bin is open-ended
    onehot = jax.nn.one_hot(dest, n_cat, dtype=a.dtype)  # (nC, nCat, nCat)

    def rebin(x):
        return jnp.einsum("ck,ckn->cn", x, onehot)

    a2, vi2, vs2, aT2 = rebin(a), rebin(vi), rebin(vs), rebin(aT)
    T2 = jnp.where(a2 > cfg.puny, aT2 / jnp.maximum(a2, cfg.puny), 0.0)
    out = state.replace(iceAreaCategory=a2, iceVolumeCategory=vi2,
                        snowVolumeCategory=vs2, surfaceTemperature=T2)
    # enthalpy tracers ride on volume (conserved quantity = q * v / nlyr)
    if state.iceEnthalpy is not None:
        def rebin_q(q, v, v2):
            qv = jnp.einsum("ckl,ckn->cnl", q * v[..., None], onehot)
            return jnp.where(v2[..., None] > cfg.puny,
                             qv / jnp.maximum(v2[..., None], cfg.puny), q)
        out = out.replace(
            iceEnthalpy=rebin_q(state.iceEnthalpy, vi, vi2),
            snowEnthalpy=rebin_q(state.snowEnthalpy, vs, vs2))
    return out


def ridge(cfg: SeaiceConfig, state: SeaiceState, dt: float = 3600.0,
          closing_rate=None) -> SeaiceState:
    """Mechanical redistribution (ref: column/ice_mechred.F90): the
    Thorndike participation / exponential redistribution scheme of
    ridging.ridge_step — thin ice participating in closing piles into
    ridges 2-25x its thickness, conserving ice volume and enthalpy while
    shedding area (and (1-fsnowrdg) of the ridged snow to the ocean)."""
    from mpas_tpu.cores.seaice.ridging import ridge_step
    a, v, vs, ts, qi, qs, _ = ridge_step(
        cfg, state.iceAreaCategory, state.iceVolumeCategory,
        state.snowVolumeCategory, state.surfaceTemperature, dt,
        q_ice=state.iceEnthalpy, q_snow=state.snowEnthalpy,
        closing_rate=closing_rate)
    return state.replace(iceAreaCategory=a, iceVolumeCategory=v,
                         snowVolumeCategory=vs, surfaceTemperature=ts,
                         iceEnthalpy=qi, snowEnthalpy=qs)


def thermodynamics_multilayer(cfg: SeaiceConfig, state: SeaiceState,
                              forcing: SeaiceForcing, dt) -> SeaiceState:
    """BL99/mushy multilayer vertical thermodynamics (+ optional
    delta-Eddington shortwave); ref ice_therm_{bl99,mushy}.F90 via
    mpas_seaice_column.F column_vertical_thermodynamics."""
    from mpas_tpu.cores.seaice.thermo_vertical import thermo_multilayer

    a = state.iceAreaCategory
    has_ice = a > cfg.puny
    h_i = jnp.where(has_ice,
                    state.iceVolumeCategory / jnp.maximum(a, cfg.puny), 0.0)
    h_s = jnp.where(has_ice,
                    state.snowVolumeCategory / jnp.maximum(a, cfg.puny), 0.0)

    sw_abs_lyr = albedo = sw_through = None
    if cfg.config_shortwave_type == "dedd":
        from mpas_tpu.cores.seaice.shortwave_dedd import dedd_shortwave
        sw = forcing.shortwaveDown[:, None]
        albedo, frac_abs, frac_thru = dedd_shortwave(
            cfg, h_i, h_s, state.iceEnthalpy.shape[-1])
        sw_abs_lyr = frac_abs * sw[..., None]
        sw_through = frac_thru * sw

    a2, vi2, vs2, ts2, qi2, qs2, _ = thermo_multilayer(
        cfg, a, state.iceVolumeCategory, state.snowVolumeCategory,
        state.surfaceTemperature, state.iceEnthalpy, state.snowEnthalpy,
        forcing.shortwaveDown[:, None], forcing.longwaveDown[:, None],
        forcing.airTemperature[:, None], forcing.oceanHeatFlux[:, None],
        dt, sw_abs_lyr=sw_abs_lyr, albedo=albedo, sw_through=sw_through,
        salinity=(state.iceSalinity if cfg.config_use_zsalinity
                  else None))
    # frazil in open water (same capability as the zero-layer path)
    rhoL = cfg.rho_ice * cfg.latent_heat_fusion
    open_frac = jnp.clip(1.0 - jnp.sum(a2, axis=-1), 0.0, 1.0)
    freeze = jnp.maximum(-forcing.oceanHeatFlux, 0.0) * open_frac
    dv_frazil = dt * freeze / rhoL
    vi2 = vi2.at[:, 0].add(dv_frazil)
    a2 = a2.at[:, 0].add(dv_frazil / 0.05)
    return state.replace(iceAreaCategory=a2, iceVolumeCategory=vi2,
                         snowVolumeCategory=vs2, surfaceTemperature=ts2,
                         iceEnthalpy=qi2, snowEnthalpy=qs2)


def _mean_thickness(cfg, a, v):
    return jnp.where(a > cfg.puny, v / jnp.maximum(a, cfg.puny), 0.0)


def _tracer_packages_step(cfg: SeaiceConfig, state: SeaiceState,
                          forcing: SeaiceForcing, pre: SeaiceState,
                          dt) -> SeaiceState:
    """Pond / age / brine / algae / snow tracer updates after the vertical
    thermodynamics, driven by the melt/growth diagnostics obtained by
    differencing category thickness before (pre) and after (state) thermo.
    ref ordering: mpas_seaice_column.F column_*_tracers after
    seaice_column_vertical_thermodynamics."""
    a = state.iceAreaCategory
    h_i = _mean_thickness(cfg, a, state.iceVolumeCategory)
    h_s = _mean_thickness(cfg, a, state.snowVolumeCategory)
    h_i0 = _mean_thickness(cfg, pre.iceAreaCategory, pre.iceVolumeCategory)
    h_s0 = _mean_thickness(cfg, pre.iceAreaCategory,
                           pre.snowVolumeCategory)
    melt_i = jnp.maximum(h_i0 - h_i, 0.0)       # m of ice melted this step
    melt_s = jnp.maximum(h_s0 - h_s, 0.0)
    growth_b = jnp.maximum(h_i - h_i0, 0.0) / dt
    melt_b = melt_i / dt
    t_s = state.surfaceTemperature
    rain = (forcing.rainfallRate[:, None] / 1000.0
            if forcing.rainfallRate is not None else jnp.zeros_like(a))
    snowfall = (forcing.snowfallRate[:, None]
                if forcing.snowfallRate is not None else jnp.zeros_like(a))
    wind = jnp.sqrt(forcing.uAirVelocity ** 2
                    + forcing.vAirVelocity ** 2)[:, None]

    upd = {}
    if cfg.config_pond_scheme != "off" and state.pondArea is not None:
        from mpas_tpu.cores.seaice import ponds
        if cfg.config_pond_scheme == "cesm":
            ap, hp = ponds.ponds_cesm(cfg, a, h_i, t_s, state.pondArea,
                                      state.pondDepth, melt_i, melt_s,
                                      rain, dt)
            upd.update(pondArea=ap, pondDepth=hp)
        elif cfg.config_pond_scheme == "lvl":
            alvl = (state.levelIceArea if state.levelIceArea is not None
                    else jnp.ones_like(a))
            ap, hp, ip = ponds.ponds_lvl(
                cfg, a, h_i, t_s, state.pondArea, state.pondDepth,
                state.pondLid if state.pondLid is not None
                else jnp.zeros_like(a), alvl, melt_i, melt_s, rain, dt)
            upd.update(pondArea=ap, pondDepth=hp, pondLid=ip)
        else:  # topo
            ap, hp = ponds.ponds_topo(cfg, a, h_i, h_s, t_s,
                                      state.pondArea, state.pondDepth,
                                      melt_i, melt_s, rain, dt)
            upd.update(pondArea=ap, pondDepth=hp)
    if cfg.config_use_ice_age and state.iceAge is not None:
        from mpas_tpu.cores.seaice.tracers import increment_age
        upd["iceAge"] = increment_age(state.iceAge, a, dt, cfg.puny)
    if cfg.config_use_brine and state.brineHeight is not None:
        from mpas_tpu.cores.seaice.bgc import brine_height_update
        upd["brineHeight"] = brine_height_update(
            state.brineHeight, h_i, h_s, cfg.rho_ice, cfg.rho_snow,
            cfg.rho_seawater, dt, puny=cfg.puny)
    if cfg.config_use_zsalinity and state.iceSalinity is not None:
        sss = (forcing.seaSurfaceSalinity
               if getattr(forcing, "seaSurfaceSalinity", None) is not None
               else jnp.full(a.shape[0], 34.0, dtype=a.dtype))
        if cfg.config_thermo_type == "mushy" \
                and state.iceEnthalpy is not None:
            # full Turner-2013 mushy brine dynamics: two-mode gravity
            # drainage + pond flushing, coupled to temperature through
            # the enthalpy (ref ice_therm_mushy.F90 picard machinery)
            from mpas_tpu.cores.seaice import mushy as mushy_mod
            from mpas_tpu.cores.seaice.thermo_vertical import \
                temperature_mush
            S_now = state.iceSalinity
            T_lyr = temperature_mush(cfg, state.iceEnthalpy, S_now)
            Tbot = mushy_mod.liquidus_temperature(sss)[:, None]
            ap_now = upd.get("pondArea", state.pondArea)
            hp_now = upd.get("pondDepth", state.pondDepth)
            if ap_now is None:
                ap_now = jnp.zeros_like(h_i)
                hp_now = jnp.zeros_like(h_i)
            qocn = mushy_mod.enthalpy_brine(Tbot)
            T2, S2, fzsal, _fadv = mushy_mod.mushy_coupled_step(
                T_lyr, S_now, t_s, Tbot * jnp.ones_like(t_s), h_i, h_s,
                hp_now, ap_now, sss[:, None], qocn, dt, n_picard=2)
            from mpas_tpu.cores.seaice.thermo_vertical import enthalpy_fn
            upd["iceSalinity"] = S2
            upd["iceEnthalpy"] = jnp.where(
                (h_i > cfg.puny)[..., None],
                enthalpy_fn(cfg, True)(T2, S2), state.iceEnthalpy)
        else:
            from mpas_tpu.cores.seaice.zsalinity import zsalinity_step
            S2, _fzsal = zsalinity_step(cfg, state.iceSalinity, h_i,
                                        growth_b, melt_s + melt_i, sss,
                                        dt)
            upd["iceSalinity"] = S2
    if cfg.config_use_algae and state.algaeIce is not None:
        from mpas_tpu.cores.seaice.bgc import algae_step
        sw_thru = forcing.shortwaveDown[:, None] * jnp.exp(
            -1.5 * jnp.maximum(h_i, 0.0) - 20.0 * jnp.maximum(h_s, 0.0))
        alg, no3, sio3, _ = algae_step(
            state.algaeIce, state.nitrateIce, state.silicateIce, h_i,
            sw_thru, jnp.full_like(h_i, cfg.freezing_point),
            cfg.config_ocean_nitrate, cfg.config_ocean_silicate,
            growth_b, melt_b, dt, puny=cfg.puny)
        upd.update(algaeIce=alg, nitrateIce=no3, silicateIce=sio3)
    if cfg.config_use_snow_metamorphism \
            and state.snowGrainRadius is not None:
        from mpas_tpu.cores.seaice.snow import snow_metamorphism
        r, rho = snow_metamorphism(
            state.snowGrainRadius, t_s,
            jnp.full_like(t_s, cfg.freezing_point), h_s, snowfall, wind,
            state.snowDensity if state.snowDensity is not None
            else jnp.full_like(t_s, cfg.rho_snow), dt, puny=cfg.puny)
        upd.update(snowGrainRadius=r, snowDensity=rho)
    return state.replace(**upd) if upd else state


def column_physics_step(cfg: SeaiceConfig, state: SeaiceState,
                        forcing: SeaiceForcing, dt) -> SeaiceState:
    """ref ordering: seaice_column_* called after dynamics/advection
    (mpas_seaice_time_integration.F:42-174)."""
    pre_ridge = state
    state = ridge(cfg, state, dt)
    if state.levelIceArea is not None:
        from mpas_tpu.cores.seaice.tracers import ridging_level_ice_update
        alvl, vlvl = ridging_level_ice_update(
            pre_ridge.levelIceArea,
            pre_ridge.levelIceVolume
            if pre_ridge.levelIceVolume is not None
            else pre_ridge.levelIceArea,
            pre_ridge.iceAreaCategory, pre_ridge.iceVolumeCategory,
            state.iceAreaCategory, state.iceVolumeCategory, cfg.puny)
        state = state.replace(levelIceArea=alvl, levelIceVolume=vlvl)
    pre = state
    if cfg.config_thermo_type in ("bl99", "mushy"):
        state = thermodynamics_multilayer(cfg, state, forcing, dt)
    else:
        state = thermodynamics(cfg, state, forcing, dt)
    state = _tracer_packages_step(cfg, state, forcing, pre, dt)
    if cfg.config_itd_remap_type == "linear":
        from mpas_tpu.cores.seaice.itd import linear_remap
        at_names = [n for n in ("pondArea", "pondDepth", "pondLid",
                                "levelIceArea", "iceAge", "firstYearArea",
                                "brineHeight", "algaeIce", "nitrateIce",
                                "silicateIce")
                    if getattr(state, n) is not None]
        a2, vi2, vs2, ts2, qi2, qs2, at2, _ = linear_remap(
            cfg, state.iceAreaCategory, state.iceVolumeCategory,
            state.snowVolumeCategory, state.surfaceTemperature,
            q_ice=state.iceEnthalpy, q_snow=state.snowEnthalpy,
            area_tracers=tuple(getattr(state, n) for n in at_names))
        state = state.replace(
            iceAreaCategory=a2, iceVolumeCategory=vi2,
            snowVolumeCategory=vs2, surfaceTemperature=ts2,
            iceEnthalpy=qi2, snowEnthalpy=qs2,
            **dict(zip(at_names, at2)))
    else:
        state = itd_remap(cfg, state)
    return state
