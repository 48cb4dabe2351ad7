"""Noah-class 4-layer land-surface model.

ref capability: src/core_atmosphere/physics/mpas_atmphys_driver_lsm.F +
physics_wrf/module_sf_noahdrv.F / module_sf_noahlsm.F (Noah: 4 soil
layers at 0.10/0.30/0.60/1.00 m, prognostic soil temperature and
moisture, snowpack, beta-method evapotranspiration, skin temperature from
the linearized surface energy balance).

TPU-first: all columns independent; the 4-layer soil heat diffusion is a
tiny batched tridiagonal solve (Thomas over the 4-lane soil dimension);
moisture transport is diffusion + gravity drainage, implicit-free at the
LSM timestep. Snow is a single bulk layer (SWE) with melt closure.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.ops.matrix import tridiagonal_solve

_SB = 5.67e-8
_LV = 2.5e6
_LF = 3.34e5
_T0 = 273.15

# soil layer thicknesses (m), Noah standard
DZS = (0.10, 0.30, 0.60, 1.00)
# loam-like soil hydraulic/thermal parameters (Noah SOILPARM genre)
SMCMAX = 0.439        # porosity
SMCREF = 0.329        # field capacity (transpiration reference)
SMCWLT = 0.066        # wilting point
DKSAT = 3.38e-6       # saturated hydraulic conductivity m/s
BEXP = 5.25           # Clapp-Hornberger b
QUARTZ = 0.35
CSOIL = 2.0e6         # soil heat capacity J/m3/K


def _qsat(t, p):
    es = 611.2 * jnp.exp(17.67 * (t - _T0) / (t - 29.65))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def soil_conductivity(smois):
    """Johansen-style thermal conductivity as a function of wetness
    (ref: module_sf_noahlsm TDFCND)."""
    sr = jnp.clip(smois / SMCMAX, 0.05, 1.0)
    k_dry = 0.25
    k_sat = 2.0
    kersten = jnp.maximum(jnp.log10(sr) + 1.0, 0.0)
    return k_dry + (k_sat - k_dry) * kersten


def noah_lsm(tsk, tslb, smois, swe, gsw, glw, hfx, lh, precip_rate, dt,
             emiss=0.985, veg_frac=0.5, isltyp=None, ivgtyp=None):
    """One LSM step for every column.

    tsk: (nC,) skin temperature; tslb: (nC,4) soil temperature;
    smois: (nC,4) volumetric soil moisture; swe: (nC,) snow water
    equivalent (m); gsw/glw: surface radiation (W/m2); hfx/lh: sensible /
    latent heat flux from the surface-layer scheme (W/m2, positive up);
    precip_rate: liquid-equivalent precip reaching the ground (m/s).

    isltyp/ivgtyp: optional per-cell STATSGO soil (1-19) and USGS
    vegetation (1-24) class indices — activates the vendored
    SOILPARM/VEGPARM tables (noah_tables.py; ref: module_sf_noahlsm.F
    SOILPARM/VEGPARM blocks). Without them the loam + prescribed
    veg_frac defaults apply (backward compatible).

    Returns dict(tsk, tslb, smois, swe, beta, g_flux, snow_melt).
    ref call chain: SFLX -> SHFLX (soil heat) / SMFLX (soil moisture) /
    SNOPAC-SNOWPACK (snow).
    """
    dzs = jnp.asarray(DZS, dtype=tslb.dtype)
    if isltyp is not None:
        from mpas_tpu.cores.atmosphere.physics.noah_tables import \
            soil_params
        sp = soil_params(isltyp)
        smcmax = sp["smcmax"][:, None]
        smcref = sp["smcref"]
        smcwlt = sp["smcwlt"]
        bexp = sp["bb"][:, None]
        dksat = sp["satdk"][:, None]
        # Johansen-genre conductivity: quartz-rich soils conduct more
        k_dry = 0.15 + 0.25 * sp["qtz"][:, None]
    else:
        smcmax, smcref, smcwlt = SMCMAX, SMCREF, SMCWLT
        bexp, dksat = BEXP, DKSAT
        k_dry = None
    if ivgtyp is not None:
        from mpas_tpu.cores.atmosphere.physics.noah_tables import \
            veg_params
        vp = veg_params(ivgtyp)
        veg_frac = vp["shdfac"]
        # stomatal limitation: transpiration efficiency ~ LAI/(LAI+rsmin/50)
        stoma = vp["lai"] / (vp["lai"] + vp["rsmin"] / 50.0 + 1e-6)
        veg_frac = veg_frac * jnp.clip(stoma * 2.0, 0.2, 1.0)
    kt = soil_conductivity(smois)                            # (nC,4)
    if k_dry is not None:
        sr_k = jnp.clip(smois / smcmax, 0.05, 1.0)
        kt = k_dry + (2.0 - k_dry) * sr_k     # quartz-aware Johansen form

    # --- skin temperature: linearized energy balance --------------------
    # Rnet - H - LE - G = 0, G = k1 (tsk - T1) / (dz1/2)
    snow_cover = jnp.clip(swe / 0.02, 0.0, 1.0)
    emiss_eff = emiss * (1.0 - 0.02 * snow_cover)
    kg = kt[:, 0] / (0.5 * dzs[0])
    f = (gsw + emiss_eff * glw - emiss_eff * _SB * tsk ** 4
         - hfx - lh - kg * (tsk - tslb[:, 0]))
    dfdt = -4.0 * emiss_eff * _SB * tsk ** 3 - kg
    tsk_new = tsk - f / dfdt
    # snow caps the skin at freezing; the residual energy melts snow
    has_snow = swe > 1e-6
    tsk_capped = jnp.where(has_snow, jnp.minimum(tsk_new, _T0), tsk_new)
    melt_energy = jnp.where(has_snow & (tsk_new > _T0),
                            jnp.maximum(gsw + emiss_eff * glw
                                        - emiss_eff * _SB * _T0 ** 4
                                        - hfx - lh
                                        - kg * (_T0 - tslb[:, 0]), 0.0),
                            0.0)
    snow_melt = jnp.minimum(dt * melt_energy / (_LF * 1000.0), swe)  # m SWE
    g_flux = kg * (tsk_capped - tslb[:, 0])

    # --- soil heat diffusion (implicit tridiagonal over 4 layers) -------
    # interface conductance between layer i and i+1
    kh = 2.0 * kt[:, :-1] * kt[:, 1:] / jnp.maximum(
        kt[:, :-1] * dzs[1:] + kt[:, 1:] * dzs[:-1], 1e-9)   # (nC,3)
    eta = dt / (CSOIL * dzs)[None, :]
    zero = jnp.zeros_like(kh[:, :1])
    kh_up = jnp.concatenate([zero, kh], axis=1)              # (nC,4)
    kh_dn = jnp.concatenate([kh, zero], axis=1)
    a = -eta * kh_up
    c = -eta * kh_dn
    b = 1.0 - a - c
    d = tslb + eta * jnp.concatenate(
        [g_flux[:, None], jnp.zeros_like(kh)], axis=1)
    # bottom boundary: zero flux (deep climate handled by layer 4 inertia)
    tslb_new = tridiagonal_solve(a, b, c, d)

    # --- soil moisture -------------------------------------------------
    infiltration = precip_rate + snow_melt / jnp.maximum(dt, 1e-9)
    # beta-method evapotranspiration from the root zone (layers 1-3)
    root_sm = (smois[:, 0] * dzs[0] + smois[:, 1] * dzs[1]
               + smois[:, 2] * dzs[2]) / (dzs[0] + dzs[1] + dzs[2])
    beta = jnp.clip((root_sm - smcwlt) / (smcref - smcwlt + 1e-9),
                    0.0, 1.0)
    et_rate = jnp.maximum(lh, 0.0) / (_LV * 1000.0)          # m/s of water
    # diffusion between layers (soil water diffusivity from C-H relations)
    sr = jnp.clip(smois / smcmax, 0.05, 1.0)
    dwdif = dksat * bexp * sr ** (bexp + 2.0) * 0.5          # m2/s scaled
    flux_int = dwdif[:, :-1] * (smois[:, :-1] - smois[:, 1:]) \
        / (0.5 * (dzs[:-1] + dzs[1:]))[None, :]              # (nC,3) down +
    drain = (dksat * sr ** (2.0 * bexp + 3.0))[:, -1] \
        if hasattr(dksat, 'ndim') and getattr(dksat, 'ndim', 0) \
        else DKSAT * sr[:, -1] ** (2.0 * BEXP + 3.0)         # bottom drain
    dsm = jnp.zeros_like(smois)
    dsm = dsm.at[:, 0].add(
        (infiltration - et_rate * veg_frac - flux_int[:, 0]) / dzs[0])
    dsm = dsm.at[:, 1].add((flux_int[:, 0] - flux_int[:, 1]) / dzs[1])
    dsm = dsm.at[:, 2].add((flux_int[:, 1] - flux_int[:, 2]) / dzs[2])
    dsm = dsm.at[:, 3].add((flux_int[:, 2] - drain) / dzs[3])
    smois_new = jnp.clip(smois + dt * dsm, 0.02, smcmax)

    swe_new = jnp.maximum(swe - snow_melt, 0.0)

    return {
        "tsk": tsk_capped, "tslb": tslb_new, "smois": smois_new,
        "swe": swe_new, "beta": beta, "g_flux": g_flux,
        "snow_melt": snow_melt,
    }


def noah_surface_moisture(tsk, p_sfc, beta):
    """qsfc for the surface-layer scheme: beta-scaled saturation
    (ref: Noah beta-method evaporation)."""
    return beta * _qsat(tsk, p_sfc)


# sea-ice slab properties (module_sf_noah_seaice.F genre)
DZI = (0.10, 0.30, 0.60, 1.00)     # ice "soil" layers
K_ICE = 2.2                        # W/m/K
C_ICE = 1.88e6                     # J/m3/K
T_SEAWATER = 271.36                # K, bottom boundary (-1.79 C)


def _slab_column_step(tsk, tlayers, swe, gsw, glw, hfx, lh, dt,
                      k_cond, c_heat, t_bottom=None, emiss=0.98):
    """Shared 4-layer slab (ice/firn) heat column: linearized skin energy
    balance, implicit tridiagonal interior diffusion, snow melt capping.
    t_bottom: fixed Dirichlet bottom temperature (None = zero flux)."""
    dzs = jnp.asarray(DZI, dtype=tlayers.dtype)
    kg = k_cond / (0.5 * dzs[0])
    f = (gsw + emiss * glw - emiss * _SB * tsk ** 4
         - hfx - lh - kg * (tsk - tlayers[:, 0]))
    dfdt = -4.0 * emiss * _SB * tsk ** 3 - kg
    tsk_new = tsk - f / dfdt
    # ice/snow surfaces melt at 0 C; residual energy melts snow then ice
    tsk_capped = jnp.minimum(tsk_new, _T0)
    melt_energy = jnp.where(
        tsk_new > _T0,
        jnp.maximum(gsw + emiss * glw - emiss * _SB * _T0 ** 4
                    - hfx - lh - kg * (_T0 - tlayers[:, 0]), 0.0), 0.0)
    snow_melt = jnp.minimum(dt * melt_energy / (_LF * 1000.0), swe)
    g_flux = kg * (tsk_capped - tlayers[:, 0])

    kh_val = k_cond / (0.5 * (dzs[:-1] + dzs[1:]))           # (3,)
    kh = jnp.broadcast_to(kh_val[None, :], (tlayers.shape[0], 3))
    eta = dt / (c_heat * dzs)[None, :]
    zero = jnp.zeros_like(kh[:, :1])
    a = -eta * jnp.concatenate([zero, kh], axis=1)
    c = -eta * jnp.concatenate([kh, zero], axis=1)
    b = 1.0 - a - c
    d = tlayers.at[:, 0].add(eta[:, 0] * g_flux)
    if t_bottom is not None:
        # Dirichlet bottom: conductive coupling to fixed seawater temp
        kb = k_cond / (0.5 * dzs[-1])
        b = b.at[:, -1].add(eta[:, -1] * kb)
        d = d.at[:, -1].add(eta[:, -1] * kb * t_bottom)
    t_new = tridiagonal_solve(a, b, c, d)
    return tsk_capped, t_new, jnp.maximum(swe - snow_melt, 0.0), \
        g_flux, snow_melt


def noah_seaice(tsk, tslb, swe, gsw, glw, hfx, lh, dt):
    """Noah sea-ice surface (ref: module_sf_noah_seaice.F SFLX_SEAICE):
    a 4-layer ice slab with fixed seawater temperature at the base,
    snow-on-ice melt, skin capped at freezing.  Returns dict(tsk, tslb,
    swe, g_flux, snow_melt, basal_flux)."""
    tsk2, t2, swe2, g, melt = _slab_column_step(
        tsk, tslb, swe, gsw, glw, hfx, lh, dt, K_ICE, C_ICE,
        t_bottom=T_SEAWATER)
    dzs = jnp.asarray(DZI, dtype=tslb.dtype)
    basal = K_ICE / (0.5 * dzs[-1]) * (T_SEAWATER - t2[:, -1])
    return {"tsk": tsk2, "tslb": t2, "swe": swe2, "g_flux": g,
            "snow_melt": melt, "basal_flux": basal}


def noah_glacial(tsk, tslb, swe, gsw, glw, hfx, lh, dt):
    """Noah glacial-land surface (ref: the glacial/XICE branches of
    module_sf_noahdrv.F SFLX calls over permanent land ice): firn column
    (reduced conductivity/heat capacity), zero-flux base, melt water runs
    off (no soil moisture).  Returns dict(tsk, tslb, swe, g_flux,
    snow_melt, runoff)."""
    k_firn, c_firn = 1.0, 1.5e6
    tsk2, t2, swe2, g, melt = _slab_column_step(
        tsk, tslb, swe, gsw, glw, hfx, lh, dt, k_firn, c_firn,
        t_bottom=None)
    return {"tsk": tsk2, "tslb": t2, "swe": swe2, "g_flux": g,
            "snow_melt": melt, "runoff": melt}
