"""Kessler warm-rain microphysics.

Behavioral spec: ref src/core_atmosphere/physics/physics_wrf/
module_mp_kessler.F:8-240 (COMMAS-derived scheme): rain sedimentation with
upstream fluxes and Courant-limited time splitting, autoconversion +
accretion of cloud to rain, saturation adjustment (condensation /
evaporation) with latent heating.

TPU design: the whole scheme is a column operation — batched over cells with
vertical levels in the minor (lane) dimension. The reference adapts the
sedimentation sub-step count per column (`nfall`, module_mp_kessler.F:125);
here one global Courant-limited `dtfall` is chosen per sub-step via a
`lax.while_loop` (max over all columns), which is the same upwind scheme with
an equally or more conservative step — data-dependent per-column trip counts
do not map to SIMD lanes.

Deliberate deviations from the reference, documented:
  * global (not per-column) sedimentation sub-stepping, as above;
  * the reference recomputes the terminal velocity only when re-adapting
    `nfall`; here it is recomputed every sub-step (strictly more accurate).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mpas_tpu.constants import cp as CP

# Scheme constants (ref: module_mp_kessler.F:24-29 and the values passed from
# mpas_atmphys_constants.F:44-65 via mpas_atmphys_driver_microphysics.F:326).
C1 = 0.001          # autoconversion rate [s-1]
C2 = 0.001          # autoconversion threshold [kg kg-1]
C3 = 2.2            # accretion rate coefficient
C4 = 0.875          # accretion exponent
XLV = 2.50e6        # latent heat of vaporization [J kg-1]
EP2 = 287.0 / 461.6  # R_d / R_v
SVP1, SVP2, SVP3, SVPT0 = 0.6112, 17.67, 29.65, 273.15
RHOWATER = 1000.0
MAX_CR_SED = 0.75   # sedimentation Courant limit (:78)


def _terminal_velocity(qr, rho, vtden):
    """vt = 36.34 (rho qr in g/m3)^0.1364 * sqrt(rho_sfc/rho)  (:113-117)."""
    qrr = jnp.maximum(0.0, qr * 0.001 * rho)
    return 36.34 * qrr ** 0.1364 * vtden


def sediment_rain(qr, rho, dz, dt):
    """Courant-split upstream sedimentation of rain.

    qr, rho, dz: (nCells, nz), level 0 = surface. Returns (qr_new, rain_m)
    with rain_m the accumulated surface rain depth [m] over dt
    (ref :135-196).
    """
    nz = qr.shape[-1]
    vtden = jnp.sqrt(rho[:, :1] / rho)
    # rdzk: 1/dz per layer, with the reference's top-layer quirk of reusing
    # the thickness of the layer below (:120-123).
    rdzk = jnp.concatenate([1.0 / dz[:, : nz - 1], 1.0 / dz[:, nz - 2:nz - 1]],
                           axis=-1)

    def cond(carry):
        _, _, t_left = carry
        return jnp.any(t_left > 1e-12)

    def body(carry):
        qr_c, rain, t_left = carry
        vt = _terminal_velocity(qr_c, rho, vtden)
        # per-COLUMN sedimentation CFL, exactly the reference's loop
        # structure (each column substeps at its own dtfall, :135-196);
        # column-local also makes the split decomposition-invariant and
        # keeps a padded dead-slot column (rho = 0 on sharded local
        # meshes) from poisoning its neighbours' substep count
        crk = vt * rdzk
        cr = jnp.max(jnp.where(jnp.isfinite(crk), crk, 0.0), axis=-1)
        dtfall = jnp.minimum(t_left, MAX_CR_SED / jnp.maximum(cr, 1e-12))
        # surface rain out of the bottom layer (:142-147); *1000 → mm, /1000
        # back to metres here so callers accumulate SI depth.
        rain = rain + rho[:, 0] * qr_c[:, 0] * vt[:, 0] * dtfall / RHOWATER
        flux = rho * qr_c * vt                       # downward flux rho*qr*vt
        flux_above = jnp.concatenate(
            [flux[:, 1:], jnp.zeros_like(flux[:, :1])], axis=-1)
        qr_new = qr_c - dtfall[:, None] * rdzk / rho * (flux - flux_above)
        return qr_new, rain, t_left - dtfall

    qr_out, rain, _ = lax.while_loop(
        cond, body, (qr, jnp.zeros(qr.shape[0], qr.dtype),
                     jnp.full((qr.shape[0],), dt, qr.dtype)))
    return qr_out, rain


def kessler(theta, qv, qc, qr, rho, pii, dz, dt):
    """One Kessler step on (nCells, nz) columns.

    theta: dry potential temperature; qv/qc/qr: mixing ratios; rho: dry air
    density [kg m-3]; pii: Exner function; dz: layer thickness. Returns
    (theta, qv, qc, qr, rain_m).
    """
    qr_sed, rain = sediment_rain(qr, rho, dz, dt)

    # autoconversion + accretion (:202-209); factorn uses pre-sedimentation
    # rain as in the reference.
    factorn = 1.0 / (1.0 + C3 * dt * jnp.maximum(0.0, qr) ** C4)
    qrprod = qc * (1.0 - factorn) \
        + factorn * C1 * dt * jnp.maximum(qc - C2, 0.0)
    qc = jnp.maximum(qc - qrprod, 0.0)
    qr = jnp.maximum(qr_sed + qrprod, 0.0)

    # saturation adjustment (:211-236). The 1004/287 constants are baked into
    # the reference scheme (:220-222) independent of the model-wide cp.
    temp = pii * theta
    pressure = 1.0e5 * pii ** (1004.0 / 287.0)
    gam = XLV / (1004.0 * pii)
    f5 = SVP2 * (SVPT0 - SVP3) * XLV / CP
    es = 1000.0 * SVP1 * jnp.exp(SVP2 * (temp - SVPT0) / (temp - SVP3))
    qvs = EP2 * es / (pressure - es)
    prod = (qv - qvs) / (1.0 + pressure / (pressure - es) * qvs * f5
                         / (temp - SVP3) ** 2)
    rcgs = 0.001 * rho
    ern = jnp.minimum(
        dt * (((1.6 + 124.9 * (rcgs * qr) ** 0.2046)
               * (rcgs * qr) ** 0.525)
              / (2.55e8 / (pressure * qvs) + 5.4e5))
        * (jnp.maximum(qvs - qv, 0.0) / (rcgs * qvs)),
        jnp.minimum(jnp.maximum(-prod - qc, 0.0), qr))

    product = jnp.maximum(prod, -qc)
    theta = theta + gam * (product - ern)
    qv = jnp.maximum(qv - product + ern, 0.0)
    qc = qc + product
    qr = qr - ern
    return theta, qv, qc, qr, rain
