"""Tiedtke-class mass-flux convection.

ref capability: src/core_atmosphere/physics/physics_wrf/
module_cu_tiedtke.F / module_cu_ntiedtke.F (Tiedtke 1989 + the "new
Tiedtke" updates): bulk entraining/detraining updraft plume launched from
the lifting level, cloud-base mass flux from a CAPE-relaxation closure
(nTiedtke genre), environmental compensating subsidence heating/drying,
and convective precipitation.

Distinct from the KF-style scheme (convection.py): this one is a true
mass-flux formulation — tendencies come from M_u * d(phi_u - phi_env)/dz
subsidence terms rather than a reference-profile relaxation.

All column math, fully batched; the plume ascent is a static scan over
levels.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_LV = 2.5e6
_RV = 461.5
_T0 = 273.15
ENTR = 1.0e-4          # fractional entrainment (1/m), deep updraft
TAU_CAPE = 3600.0      # CAPE relaxation timescale (s)
MB_MAX = 0.1           # cloud-base mass flux cap (kg/m2/s)


def _qsat(t, p):
    es = 611.2 * jnp.exp(17.67 * (t - _T0) / (t - 29.65))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def tiedtke(th, qv, p, rho, z_mid, dz, exner, dt):
    """One mass-flux convection step on (nCells, nz) columns.

    Returns (th_new, qv_new, rain_conv [m], cape). ref driver:
    mpas_atmphys_driver_convection.F `cu_ntiedtke` branch.
    """
    nC, nz = th.shape
    t = th * exner

    # --- updraft plume ascent from level 0 (static level scan) ----------
    # parcel: moist static energy h = cp T + g z + Lv qv, entraining
    h_env = cp * t + gravity * z_mid + _LV * qv
    qs_env = _qsat(t, p)
    h_sat = cp * t + gravity * z_mid + _LV * qs_env

    h_u = [h_env[:, 0]]
    q_u = [qv[:, 0]]
    cond = [jnp.zeros((nC,))]
    for k in range(1, nz):
        dzk = z_mid[:, k] - z_mid[:, k - 1]
        ent = ENTR * dzk
        h_k = (h_u[-1] + ent * h_env[:, k]) / (1.0 + ent)
        q_k = (q_u[-1] + ent * qv[:, k]) / (1.0 + ent)
        # condensation: excess over saturation at the parcel temperature
        t_k = (h_k - gravity * z_mid[:, k] - _LV * q_k) / cp
        qs_k = _qsat(t_k, p[:, k])
        c_k = jnp.maximum(q_k - qs_k, 0.0)
        q_k = q_k - c_k
        h_u.append(h_k)
        q_u.append(q_k)
        cond.append(c_k)
    h_u = jnp.stack(h_u, axis=1)
    q_u = jnp.stack(q_u, axis=1)
    cond = jnp.stack(cond, axis=1)

    # buoyancy: parcel h vs saturated environment h (moist-adiabatic test)
    buoy = (h_u - h_sat) / cp                      # K excess proxy
    pos = buoy > 0.0
    cape = jnp.sum(jnp.where(pos, gravity * buoy / jnp.maximum(t, 200.0)
                             * dz, 0.0), axis=1)

    # cloud base = first buoyant level; cloud top = last buoyant level
    any_pos = jnp.any(pos, axis=1)
    k_base = jnp.argmax(pos, axis=1)
    k_top = nz - 1 - jnp.argmax(pos[:, ::-1], axis=1)
    active = any_pos & (k_top > k_base) & (cape > 50.0)

    # --- CAPE-relaxation closure for cloud-base mass flux ----------------
    # M_b such that CAPE is removed over TAU_CAPE (ref nTiedtke closure)
    mb = jnp.clip(cape / (TAU_CAPE * gravity) * 0.1, 0.0, MB_MAX)
    mb = jnp.where(active, mb, 0.0)

    # normalized mass-flux profile: linear growth base->top (entrainment)
    ks = jnp.arange(nz)[None, :]
    in_cloud = (ks >= k_base[:, None]) & (ks <= k_top[:, None])
    depth = jnp.maximum((k_top - k_base)[:, None], 1)
    mf_norm = jnp.where(in_cloud,
                        1.0 + 0.5 * (ks - k_base[:, None]) / depth, 0.0)
    m_u = mb[:, None] * mf_norm                      # (nC, nz) kg/m2/s

    # --- environment tendencies: compensating subsidence ----------------
    # d(phi)/dt = g M_u d(phi)/dz  (downward advection of environment)
    dth_dz = jnp.concatenate(
        [(th[:, 1:] - th[:, :-1]) / (z_mid[:, 1:] - z_mid[:, :-1]),
         jnp.zeros((nC, 1))], axis=1)
    dqv_dz = jnp.concatenate(
        [(qv[:, 1:] - qv[:, :-1]) / (z_mid[:, 1:] - z_mid[:, :-1]),
         jnp.zeros((nC, 1))], axis=1)
    th_tend = m_u / rho * dth_dz
    qv_tend = m_u / rho * dqv_dz

    # detrainment of cloud water at the top -> moistening/evaporative
    # cooling spread over the top two levels (simplified ref detrainment)
    precip_flux = jnp.sum(m_u * cond, axis=1)        # kg/m2/s
    rain = dt * precip_flux / 1000.0                 # m

    # condensation heating in the cloud layer distributed by m_u*cond
    heat = _LV / cp * m_u * cond / (rho * dz)
    th_new = th + dt * (th_tend + heat / jnp.maximum(exner, 0.1))
    qv_new = jnp.maximum(qv + dt * (qv_tend - m_u * cond / (rho * dz)),
                         0.0)
    return th_new, qv_new, rain, cape
