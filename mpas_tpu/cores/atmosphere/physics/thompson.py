"""Thompson-class partially two-moment microphysics.

ref capability: src/core_atmosphere/physics/physics_wrf/
module_mp_thompson.F (Thompson et al. 2008): 6 hydrometeor classes
(qv, qc, qr, qi, qs, qg) with PROGNOSTIC NUMBER concentrations for rain
(nr) and cloud ice (ni) — the defining difference from WSM6's
single-moment closure. Size-distribution-dependent process rates: the
rain/ice mean diameters from (q, n) control autoconversion, evaporation,
and number-weighted sedimentation velocities (rain number falls slower
than rain mass, sharpening drizzle vs. rain separation).

This implementation keeps WSM6's process graph (wsm6.py) and upgrades the
rain/ice closures to two-moment: gamma-distribution mean sizes, separate
mass/number fall speeds, number sources/sinks for each process. The
size-distribution integrals (mass/number-weighted fall speeds,
evaporation ventilation, cloud accretion kernel, Bigg freezing) come
from VENDORED LOOKUP TABLES (physics/data/thompson_k.npz) built offline
by numerical integration over the exponential DSD with the Thompson
power-law fall speeds — the analogue of the reference's init-time table
builds (ref: mpas_atmphys_build_tables_thompson.F:1-145,
module_mp_thompson.F qr_acr_qg/freezeH2O tables); interpolated at
runtime on the log mean-volume-diameter grid.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

from mpas_tpu.constants import cp
from mpas_tpu.cores.atmosphere.physics.wsm6 import (_qsat_ice, _qsat_liq,
                                                    _sediment)


@functools.cache
def _tables():
    path = os.path.join(os.path.dirname(__file__), "data",
                        "thompson_k.npz")
    return {k: np.asarray(v) for k, v in np.load(path).items()}


def _interp_log(x, xg, yg):
    """Interpolate y(x) on a log-spaced grid xg (clipped at the ends)."""
    lx = jnp.log(jnp.clip(x, float(xg[0]), float(xg[-1])))
    return jnp.interp(lx, jnp.asarray(np.log(xg)), jnp.asarray(yg))

_LV = 2.5e6
_LF = 3.34e5
_LS = _LV + _LF
_RV = 461.5
_T0 = 273.15
RHO_W = 1000.0
RHO_I = 890.0
# number-concentration bounds (1/kg)
NR_MIN, NR_MAX = 1.0e-2, 1.0e8
NI_MIN, NI_MAX = 1.0e-2, 1.0e8
N0_RAIN_DEFAULT = 8.0e6      # Marshall-Palmer intercept fallback
NC_CLOUD = 1.0e8             # prescribed droplet number (1/kg)


def _rain_diameter(qr, nr, rho):
    """Mass-mean rain diameter from (q, n) (exponential distribution)."""
    m = rho * jnp.maximum(qr, 1e-12)
    n = rho * jnp.clip(nr, NR_MIN, NR_MAX)
    d = (6.0 * m / (jnp.pi * RHO_W * jnp.maximum(n, 1.0))) ** (1.0 / 3.0)
    return jnp.clip(d, 20.0e-6, 6.0e-3)


def _ice_diameter(qi, ni, rho):
    m = rho * jnp.maximum(qi, 1e-12)
    n = rho * jnp.clip(ni, NI_MIN, NI_MAX)
    d = (6.0 * m / (jnp.pi * RHO_I * jnp.maximum(n, 1.0))) ** (1.0 / 3.0)
    return jnp.clip(d, 5.0e-6, 1.0e-3)


def thompson(th, qv, qc, qr, qi, qs, qg, nr, ni, rho, exner, p, dz, dt):
    """One Thompson step on (nCells, nz) columns.
    Returns (th, qv, qc, qr, qi, qs, qg, nr, ni, rain_total_m)."""
    t = th * exner

    # --- saturation adjustment (as WSM6; activation sets cloud number) ---
    qsl = _qsat_liq(t, p)
    cond = (qv - qsl) / (1.0 + _LV ** 2 * qsl / (cp * _RV * t * t))
    cond = jnp.maximum(cond, -qc)
    warm = t > _T0 - 40.0
    cond = jnp.where(warm, cond, 0.0)
    qv = qv - cond
    qc = qc + cond
    t = t + _LV / cp * cond

    qsi = _qsat_ice(t, p)
    cold = t < _T0
    dep = (qv - qsi) / (1.0 + _LS ** 2 * qsi / (cp * _RV * t * t))
    dep = jnp.where(cold, jnp.maximum(dep, -qi), 0.0)
    dep = jnp.where(t < _T0 - 40.0, jnp.maximum(dep, 0.0), dep * 0.5)
    # ice nucleation number source (Cooper 1986 activation)
    n_nuc = jnp.where((dep > 0.0) & cold,
                      jnp.minimum(5.0 * jnp.exp(0.304 * (_T0 - t)), 1e5)
                      / jnp.maximum(rho, 0.1), 0.0)
    ni = jnp.where(dep > 0.0, jnp.maximum(ni, n_nuc), ni)
    qv = qv - dep
    qi = qi + dep
    t = t + _LS / cp * dep

    # --- warm rain, two-moment (Berry-Reinhardt-style autoconversion) ---
    # autoconversion rate grows with droplet size (qc/Nc)
    rc = (3.0 * rho * jnp.maximum(qc, 0.0)
          / (4.0 * jnp.pi * RHO_W * NC_CLOUD * rho + 1e-6)) ** (1.0 / 3.0)
    auto_on = (rc > 6.0e-6).astype(qc.dtype)
    praut = auto_on * jnp.minimum(dt * 1.0e-3 * jnp.maximum(
        qc - 2.0e-4, 0.0), qc)
    # autoconversion creates drops of ~50 micron
    m_drop50 = jnp.pi / 6.0 * RHO_W * (50.0e-6) ** 3
    nraut = praut * rho / m_drop50 / rho

    tab = _tables()
    d_r = _rain_diameter(qr, nr, rho)
    # cloud accretion by rain: number-normalized swept-volume kernel from
    # the DSD integral table x rain number (ref: the qr_acr_qc moment of
    # module_mp_thompson.F; table acc_rain)
    acc_k = _interp_log(d_r, tab["d_rain"], tab["acc_rain"])   # m3/s per drop
    pracw = jnp.minimum(dt * acc_k * rho * jnp.clip(nr, NR_MIN, NR_MAX)
                        * qc, jnp.maximum(qc - praut, 0.0))
    pracw = jnp.maximum(pracw, 0.0)
    qc = qc - praut - pracw
    qr = qr + praut + pracw
    nr = nr + nraut

    # rain evaporation: ventilation DSD integral from the table (the
    # reference's tpi ventilation moments)
    qsl = _qsat_liq(t, p)
    sub = jnp.maximum(1.0 - qv / jnp.maximum(qsl, 1e-12), 0.0)
    vent = _interp_log(d_r, tab["d_rain"], tab["vent_rain"]) \
        / jnp.maximum(d_r, 1e-6)
    prevp = jnp.minimum(dt * 1.0e-3 * sub * vent * 2.0e-3
                        * (rho * jnp.maximum(qr, 0.0)) ** 0.65, qr)
    qr = qr - prevp
    qv = qv + prevp
    t = t - _LV / cp * prevp
    # number reduction proportional to mass evaporated
    nr = nr * (1.0 - 0.8 * prevp / jnp.maximum(qr + prevp, 1e-12))

    # --- ice phase (WSM6 graph + number bookkeeping) ---------------------
    d_i = _ice_diameter(qi, ni, rho)
    psaut = jnp.where(cold & (d_i > 100.0e-6),
                      jnp.maximum(qi - 1.0e-4, 0.0)
                      * (1.0 - jnp.exp(-dt / 1000.0)), 0.0)
    ni = ni * (1.0 - psaut / jnp.maximum(qi, 1e-12))
    qi = qi - psaut
    qs = qs + psaut

    psacw = jnp.where(cold, jnp.minimum(
        dt * 1.5 * qc * (rho * jnp.maximum(qs, 0.0)) ** 0.75, qc), 0.0)
    to_g = 0.5 * psacw * (qs > 1.0e-4)
    qc = qc - psacw
    qs = qs + psacw - to_g
    qg = qg + to_g
    t = t + _LF / cp * psacw

    # Bigg immersion freezing from the tabulated supercooling integral
    # (ref: the freezeH2O table build, module_mp_thompson.F)
    bigg = jnp.interp(jnp.clip(_T0 - t, 0.0, 40.0),
                      jnp.asarray(tab["dT_freeze"]),
                      jnp.asarray(tab["bigg_rate"]))
    d_r3 = d_r ** 3
    pgfrz = jnp.where(t < _T0, jnp.minimum(dt * bigg * d_r3
                                           * rho * qr * 1.0e6, qr), 0.0)
    nr = nr * (1.0 - pgfrz / jnp.maximum(qr, 1e-12))
    qr = qr - pgfrz
    qg = qg + pgfrz
    t = t + _LF / cp * pgfrz

    melt_rate = jnp.where(t > _T0, (t - _T0) * 2.0e-4, 0.0)
    psmlt = jnp.minimum(dt * melt_rate * 5.0, qs)
    pgmlt = jnp.minimum(dt * melt_rate, qg)
    qs = qs - psmlt
    qg = qg - pgmlt
    qr = qr + psmlt + pgmlt
    # melting snow/graupel adds large drops (1 mm)
    m_drop1mm = jnp.pi / 6.0 * RHO_W * (1.0e-3) ** 3
    nr = nr + (psmlt + pgmlt) / m_drop1mm * 1.0e-3
    t = t - _LF / cp * (psmlt + pgmlt)

    pimlt = jnp.where(t > _T0, qi, 0.0)
    ni = jnp.where(t > _T0, NI_MIN * jnp.ones_like(ni), ni)
    qi = qi - pimlt
    qc = qc + pimlt
    t = t - _LF / cp * pimlt

    # --- sedimentation: mass- and number-weighted DSD fall speeds from
    # the tables (ref: the sedimentation moments of module_mp_thompson.F)
    d_r = _rain_diameter(qr, nr, rho)
    vr_m = _interp_log(d_r, tab["d_rain"], tab["vr_mass"])
    vr_n = _interp_log(d_r, tab["d_rain"], tab["vr_num"])
    d_i = _ice_diameter(qi, ni, rho)
    vi_m = _interp_log(d_i, tab["d_ice"], tab["vi_mass"])
    vs = jnp.minimum(11.72 * (rho * jnp.maximum(qs, 0.0)) ** 0.25 * 0.1,
                     2.5)
    vg = jnp.minimum(19.3 * (rho * jnp.maximum(qg, 0.0)) ** 0.37 * 0.1,
                     5.0)
    vi_n = _interp_log(d_i, tab["d_ice"], tab["vi_num"])
    qr, rain = _sediment(qr, rho, dz, vr_m, dt)
    nr, _ = _sediment(nr, rho, dz, vr_n, dt)
    qi, ice_sfc = _sediment(qi, rho, dz, vi_m, dt)
    ni, _ = _sediment(ni, rho, dz, vi_n, dt)
    qs, snow = _sediment(qs, rho, dz, vs, dt)
    qg, graup = _sediment(qg, rho, dz, vg, dt)

    th_new = t / exner
    rain_total = (rain + snow + graup + ice_sfc) / 1000.0
    return (th_new, jnp.maximum(qv, 0.0), jnp.maximum(qc, 0.0),
            jnp.maximum(qr, 0.0), jnp.maximum(qi, 0.0),
            jnp.maximum(qs, 0.0), jnp.maximum(qg, 0.0),
            jnp.clip(nr, NR_MIN, NR_MAX), jnp.clip(ni, NI_MIN, NI_MAX),
            rain_total)
