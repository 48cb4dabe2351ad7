"""Microphysics coupling driver: dycore variables <-> column scheme.

ref: src/core_atmosphere/physics/mpas_atmphys_driver_microphysics.F
(driver_microphysics, called inside atm_srk3 after scalar transport) and
mpas_atmphys_interface.F:536-560 (microphysics_from_MPAS) / :695-717
(microphysics_to_MPAS). Unlike the reference there is no (i,k,j) re-tiling
layer: state arrays are already (nCells, nz) with levels in lanes.

Scalar layout convention (ref: Registry.xml index_qv/index_qc/index_qr):
scalars[..., 0] = qv, [..., 1] = qc, [..., 2] = qr.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, p0, rgas, rvord
from mpas_tpu.cores.atmosphere.physics.kessler import kessler

IDX_QV, IDX_QC, IDX_QR = 0, 1, 2
IDX_QI, IDX_QS, IDX_QG = 3, 4, 5
IDX_NR, IDX_NI = 6, 7        # Thompson number concentrations
RCV = rgas / (cp - rgas)


def microphysics_step(grid, theta_m, rho_zz, scalars, exner, dt):
    """Apply Kessler microphysics to one model state.

    Returns (theta_m, scalars, rtheta_p, exner, pressure_p,
    rt_diabatic_tend, rain_m).

    Follows microphysics_from_MPAS / microphysics_to_MPAS: the scheme sees
    dry density rho = zz*rho_zz (interface.F:548), dry potential temperature
    th = theta_m/(1+Rv/Rd qv) (:549), and the Exner function; afterwards
    theta_m, rtheta_p, exner, pressure_p are rebuilt (:704-717) and the
    diabatic theta_m tendency is returned for the next dynamics step's
    rt_diabatic_tend coupling (:703-706).
    """
    qv = jnp.maximum(scalars[..., IDX_QV], 0.0)
    qc = jnp.maximum(scalars[..., IDX_QC], 0.0)
    qr = jnp.maximum(scalars[..., IDX_QR], 0.0)
    rho_dry = grid.zz * rho_zz
    th = theta_m / (1.0 + rvord * qv)
    dz = grid.zgrid[:, 1:] - grid.zgrid[:, :-1]

    th, qv, qc, qr, rain = kessler(th, qv, qc, qr, rho_dry, exner, dz, dt)

    theta_m_new = th * (1.0 + rvord * qv)
    rt_diabatic_tend = (theta_m_new - theta_m) / dt
    scalars = scalars.at[..., IDX_QV].set(qv) \
                     .at[..., IDX_QC].set(qc) \
                     .at[..., IDX_QR].set(qr)

    rtheta_p = rho_zz * theta_m_new - grid.rtheta_base
    exner_new = (grid.zz * (rgas / p0)
                 * (rtheta_p + grid.rtheta_base)) ** RCV
    pressure_p = grid.zz * rgas * (exner_new * rtheta_p
                                   + (exner_new - grid.exner_base)
                                   * grid.rtheta_base)
    return (theta_m_new, scalars, rtheta_p, exner_new, pressure_p,
            rt_diabatic_tend, rain)


def microphysics_step_thompson(grid, theta_m, rho_zz, scalars, exner, dt):
    """Thompson partially-two-moment microphysics (same coupling contract;
    ref: driver_microphysics dispatch on config_microp_scheme =
    'mp_thompson'). Requires scalars (qv,qc,qr,qi,qs,qg,nr,ni)."""
    from mpas_tpu.cores.atmosphere.physics.thompson import thompson

    qv = jnp.maximum(scalars[..., IDX_QV], 0.0)
    qc = jnp.maximum(scalars[..., IDX_QC], 0.0)
    qr = jnp.maximum(scalars[..., IDX_QR], 0.0)
    qi = jnp.maximum(scalars[..., IDX_QI], 0.0)
    qs = jnp.maximum(scalars[..., IDX_QS], 0.0)
    qg = jnp.maximum(scalars[..., IDX_QG], 0.0)
    nr = scalars[..., IDX_NR]
    ni = scalars[..., IDX_NI]
    rho_dry = grid.zz * rho_zz
    th = theta_m / (1.0 + rvord * qv)
    dz = grid.zgrid[:, 1:] - grid.zgrid[:, :-1]
    p = p0 * exner ** (cp / rgas)

    th, qv, qc, qr, qi, qs, qg, nr, ni, rain = thompson(
        th, qv, qc, qr, qi, qs, qg, nr, ni, rho_dry, exner, p, dz, dt)

    theta_m_new = th * (1.0 + rvord * qv)
    rt_diabatic_tend = (theta_m_new - theta_m) / dt
    scalars = scalars.at[..., IDX_QV].set(qv) \
                     .at[..., IDX_QC].set(qc) \
                     .at[..., IDX_QR].set(qr) \
                     .at[..., IDX_QI].set(qi) \
                     .at[..., IDX_QS].set(qs) \
                     .at[..., IDX_QG].set(qg) \
                     .at[..., IDX_NR].set(nr) \
                     .at[..., IDX_NI].set(ni)

    rtheta_p = rho_zz * theta_m_new - grid.rtheta_base
    exner_new = (grid.zz * (rgas / p0)
                 * (rtheta_p + grid.rtheta_base)) ** RCV
    pressure_p = grid.zz * rgas * (exner_new * rtheta_p
                                   + (exner_new - grid.exner_base)
                                   * grid.rtheta_base)
    return (theta_m_new, scalars, rtheta_p, exner_new, pressure_p,
            rt_diabatic_tend, rain)


def microphysics_step_wsm6(grid, theta_m, rho_zz, scalars, exner, dt):
    """Apply WSM6-class 6-category microphysics (same coupling contract as
    microphysics_step; ref: driver_microphysics dispatch on
    config_microp_scheme='mp_wsm6', mpas_atmphys_driver_microphysics.F).
    Requires scalars (qv, qc, qr, qi, qs, qg)."""
    from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6

    qv = jnp.maximum(scalars[..., IDX_QV], 0.0)
    qc = jnp.maximum(scalars[..., IDX_QC], 0.0)
    qr = jnp.maximum(scalars[..., IDX_QR], 0.0)
    qi = jnp.maximum(scalars[..., IDX_QI], 0.0)
    qs = jnp.maximum(scalars[..., IDX_QS], 0.0)
    qg = jnp.maximum(scalars[..., IDX_QG], 0.0)
    rho_dry = grid.zz * rho_zz
    th = theta_m / (1.0 + rvord * qv)
    dz = grid.zgrid[:, 1:] - grid.zgrid[:, :-1]
    p = p0 * exner ** (cp / rgas)

    th, qv, qc, qr, qi, qs, qg, rain = wsm6(
        th, qv, qc, qr, qi, qs, qg, rho_dry, exner, p, dz, dt)

    theta_m_new = th * (1.0 + rvord * qv)
    rt_diabatic_tend = (theta_m_new - theta_m) / dt
    scalars = scalars.at[..., IDX_QV].set(qv) \
                     .at[..., IDX_QC].set(qc) \
                     .at[..., IDX_QR].set(qr) \
                     .at[..., IDX_QI].set(qi) \
                     .at[..., IDX_QS].set(qs) \
                     .at[..., IDX_QG].set(qg)

    rtheta_p = rho_zz * theta_m_new - grid.rtheta_base
    exner_new = (grid.zz * (rgas / p0)
                 * (rtheta_p + grid.rtheta_base)) ** RCV
    pressure_p = grid.zz * rgas * (exner_new * rtheta_p
                                   + (exner_new - grid.exner_base)
                                   * grid.rtheta_base)
    return (theta_m_new, scalars, rtheta_p, exner_new, pressure_p,
            rt_diabatic_tend, rain)
