"""Mass-flux cumulus parameterization dispatch (Kain-Fritsch entry).

ref capability: src/core_atmosphere/physics/mpas_atmphys_driver_convection.F
dispatching to {Kain-Fritsch (module_cu_kfeta.F), Tiedtke, New-Tiedtke,
Grell-Freitas}. kf_convection dispatches to the full KF-eta scheme in
physics/kfeta.py (trigger, buoyancy-sorting updraft, downdraft,
iterative CAPE-removal closure). parcel_cape below is the simple
entraining-parcel CAPE used by the convective diagnostics
(diagnostics/convective.py), independent of the scheme.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_LV = 2.5e6
_RD = 287.0
_T0 = 273.15
_TAU_CU = 1800.0          # convective adjustment timescale (ref KF)
_CAPE_MIN = 100.0         # J/kg trigger


def _qsat(t, p):
    es = 611.2 * jnp.exp(17.67 * (t - _T0) / (t - 29.65))
    return 0.622 * es / jnp.maximum(p - es, 100.0)


def parcel_cape(t, qv, p, z):
    """Pseudo-adiabatic parcel CAPE from a mixed near-surface parcel.
    Returns (cape, parcel Tv excess profile). (nCells, nz) inputs."""
    tp0 = t[:, 0] + 0.5                      # slightly buoyant start
    qp0 = qv[:, 0]
    nz = t.shape[1]
    tv_env = t * (1.0 + 0.61 * qv)

    tp, qp = tp0, qp0
    buoy = []
    ent = 1.0e-4                             # entrainment rate (1/m)
    for k in range(nz):
        if k > 0:
            dz = z[:, k] - z[:, k - 1]
            # dry ascent then condense to saturation
            tp = tp - gravity / cp * dz
            # entrainment relaxes the parcel to the environment
            f = jnp.exp(-ent * dz)
            tp = f * tp + (1.0 - f) * t[:, k]
            qp = f * qp + (1.0 - f) * qv[:, k]
            qs = _qsat(tp, p[:, k])
            cond = jnp.maximum(qp - qs, 0.0) / (
                1.0 + _LV ** 2 * qs / (cp * 461.5 * tp * tp))
            qp = qp - cond
            tp = tp + _LV / cp * cond
        tvp = tp * (1.0 + 0.61 * qp)
        buoy.append(gravity * (tvp - tv_env[:, k]) / tv_env[:, k])
    buoy = jnp.stack(buoy, axis=1)           # (nCells, nz)
    dz_l = jnp.diff(z, axis=1, prepend=z[:, :1] * 0.0)
    cape = jnp.sum(jnp.maximum(buoy, 0.0) * dz_l, axis=1)
    return cape, buoy


def kf_convection(th, qv, p, rho, z_mid, dz, exner, dt,
                  w0avg=None, u=None, v=None, dx=25.0e3):
    """One convection call dispatching to the full KF-eta scheme
    (physics/kfeta.py; ref module_cu_kfeta.F:1-2986). Returns
    (th, qv, conv_rain_m, cape) — the legacy 4-tuple used by the manager
    and the column tests; use kf_convection_full for the detrained
    condensate and diagnostics."""
    out = kf_convection_full(th, qv, p, rho, z_mid, dz, exner, dt,
                             w0avg=w0avg, u=u, v=v, dx=dx)
    return out["th"], out["qv"], out["raincv_m"], out["cape"]


def kf_convection_full(th, qv, p, rho, z_mid, dz, exner, dt,
                       w0avg=None, u=None, v=None, dx=25.0e3):
    """Full KF-eta step: returns the kfeta output dict (th, qv, qc_detr,
    qi_detr, raincv_m, cape, timec, ainc, ishall, peff, ltop, klcl)."""
    from mpas_tpu.cores.atmosphere.physics.kfeta import kf_eta
    return kf_eta(th, qv, p, rho, z_mid, dz, exner, dt,
                  w0avg=w0avg, u=u, v=v, dx=dx)
