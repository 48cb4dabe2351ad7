"""Correlated-k (RRTMG-class) spectral radiation.

ref capability: src/core_atmosphere/physics/physics_wrf/
module_ra_rrtmg_lw.F / module_ra_rrtmg_sw.F (k-distribution spectral
integration over bands x g-points with H2O/CO2/O3 absorbers, two-stream
per g-point, cloud optical properties) as dispatched by
mpas_atmphys_driver_radiation_{lw,sw}.F.

This is the k-distribution *machinery* with compact fitted coefficient
tables (exponential-sum fits of band-mean absorption, not the RRTMG data
tables): LW = 6 bands x 3 g-points with Planck band fractions computed by
numerical Planck integration over the band edges; SW = 3 bands x 2
g-points with Rayleigh scattering, H2O/O3 absorption, and delta-two-stream
cloud scattering. Interfaces match radiation.py's broadband drivers so the
suite manager can select either (`config_radiation_scheme`).

TPU notes: the band x g loop is a short static unroll; each g-point is an
elementwise column scan (cumulative transmissions), everything batched
over cells with levels in lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.constants import cp

_SB = 5.67e-8
_S0 = 1361.0
_H = 6.62607015e-34
_C = 2.99792458e8
_KB = 1.380649e-23

# ---------------------------------------------------------------------------
# LW band structure: wavenumber edges (cm^-1) and per-band k-distributions
# band list follows the RRTMG-LW grouping coarsened to 6 bands.
# Each band: 3 g-points (weight, k_h2o m2/kg, k_co2 m2/kg per unit ppv)
# ---------------------------------------------------------------------------
LW_BANDS = (
    # (nu1, nu2), ((w, kH2O, kCO2), ...)
    ((10.0, 350.0),    ((0.55, 1.5e-1, 0.0), (0.35, 2.5e0, 0.0),
                        (0.10, 5.0e1, 0.0))),       # rotational H2O
    ((350.0, 630.0),   ((0.55, 3.0e-2, 1.0e-3), (0.35, 6.0e-1, 2.0e-2),
                        (0.10, 1.5e1, 4.0e-1))),    # H2O window edge
    ((630.0, 800.0),   ((0.45, 5.0e-3, 2.0e0), (0.40, 5.0e-2, 3.0e1),
                        (0.15, 5.0e-1, 5.0e2))),    # CO2 15um
    ((800.0, 1000.0),  ((0.70, 2.0e-3, 0.0), (0.25, 3.0e-2, 0.0),
                        (0.05, 8.0e-1, 0.0))),      # window
    ((1000.0, 1400.0), ((0.60, 8.0e-3, 1.0e-2), (0.30, 2.0e-1, 1.0e-1),
                        (0.10, 4.0e0, 1.0e0))),     # O3/CH4 region proxy
    ((1400.0, 3000.0), ((0.50, 5.0e-1, 0.0), (0.35, 8.0e0, 0.0),
                        (0.15, 1.2e2, 0.0))),       # vibrational H2O
)
CO2_PPV = 400.0e-6
K_LW_CLD = 140.0      # gray cloud LW mass absorption (m2/kg)
DIFFUSIVITY = 1.66    # diffusivity factor for LW fluxes


def _planck_band_fraction(t, nu1, nu2, n_quad=8):
    """Fraction of sigma T^4 emitted in [nu1, nu2] cm^-1 by numerical
    integration of the Planck function (vectorized over t)."""
    nu = jnp.linspace(nu1, nu2, n_quad) * 100.0          # -> 1/m
    dnu = (nu2 - nu1) * 100.0 / (n_quad - 1)
    # B_nu(T) = 2 h c^2 nu^3 / (exp(h c nu / kB T) - 1)
    x = _H * _C * nu[None, :] / (_KB * jnp.maximum(t[..., None], 120.0))
    b = 2.0 * _H * _C ** 2 * nu[None, :] ** 3 / jnp.expm1(x)
    # trapezoid weights
    w = jnp.ones((n_quad,)).at[0].set(0.5).at[-1].set(0.5)
    integral = jnp.pi * jnp.sum(b * w[None, :], axis=-1) * dnu
    return integral / (_SB * jnp.maximum(t, 120.0) ** 4)


K_LW_O3 = 1.1e2       # 9.6 um band O3 mass absorption proxy (m2/kg)


def rrtmg_lw(t, qv, qc, rho, dz, tsk, emiss_sfc=0.985, co2_ppv=CO2_PPV,
             o3_vmr=None):
    """k-distribution longwave. Returns (dT/dt, GLW, OLR); k=0 lowest.
    ref capability: rrtmg_lw two-stream absorption/emission per g-point.
    o3_vmr: optional (nC, nz) ozone vmr (physics/o3.o3_climatology) —
    adds the 9.6 um O3 band to the 1000-1400 cm^-1 group (ref:
    mpas_atmphys_o3climatology.F feeding rrtmg_lw's band 7)."""
    nC, nz = t.shape
    path_v = rho * dz * qv                     # water vapor path kg/m2
    path_a = rho * dz                          # air path
    path_c = rho * dz * qc                     # cloud water path
    path_o3 = None
    if o3_vmr is not None:
        from mpas_tpu.cores.atmosphere.physics.o3 import o3_path
        path_o3 = o3_path(rho, dz, o3_vmr)

    f_up_tot = jnp.zeros((nC, nz + 1))
    f_dn_tot = jnp.zeros((nC, nz + 1))

    for (nu1, nu2), gpts in LW_BANDS:
        frac_lyr = _planck_band_fraction(t, nu1, nu2)         # (nC, nz)
        frac_sfc = _planck_band_fraction(tsk, nu1, nu2)       # (nC,)
        b_lyr = frac_lyr * _SB * t ** 4
        b_sfc = frac_sfc * _SB * tsk ** 4
        for (w, k_h2o, k_co2) in gpts:
            tau = (k_h2o * path_v + k_co2 * co2_ppv * path_a * 1.52
                   + K_LW_CLD * path_c)
            if path_o3 is not None and nu1 == 1000.0:
                tau = tau + K_LW_O3 * path_o3   # 9.6 um O3 band
            emis = 1.0 - jnp.exp(-DIFFUSIVITY * tau)

            # downward pass from TOA
            fd = jnp.zeros((nC,))
            fds = []
            for k in range(nz - 1, -1, -1):
                fds.append(fd)
                fd = fd * (1.0 - emis[:, k]) + emis[:, k] * b_lyr[:, k]
            fds.append(fd)
            f_dn = jnp.stack(fds[::-1], axis=1)               # (nC, nz+1)

            # upward pass from surface
            fu = emiss_sfc * b_sfc + (1.0 - emiss_sfc) * f_dn[:, 0]
            fus = [fu]
            for k in range(nz):
                fu = fu * (1.0 - emis[:, k]) + emis[:, k] * b_lyr[:, k]
                fus.append(fu)
            f_up = jnp.stack(fus, axis=1)

            f_up_tot = f_up_tot + w * f_up
            f_dn_tot = f_dn_tot + w * f_dn

    glw = f_dn_tot[:, 0]
    olr = f_up_tot[:, -1]
    net = f_up_tot - f_dn_tot
    dtdt = -(net[:, 1:] - net[:, :-1]) / (rho * dz * cp)
    return dtdt, glw, olr


# ---------------------------------------------------------------------------
# SW bands: (fraction of S0, ((w, k_h2o, k_o3, rayleigh tau/airpath), ...))
# UV/vis + 2 near-IR bands (RRTMG-SW grouping coarsened)
# ---------------------------------------------------------------------------
SW_BANDS = (
    # Rayleigh: total vis column tau ~0.1 over ~1e4 kg/m2 air -> ~1e-5
    (0.46, ((0.95, 0.0, 6.0e0, 1.0e-5), (0.05, 0.0, 2.5e2, 1.0e-5))),
    (0.32, ((0.80, 1.0e-3, 0.0, 1.5e-6), (0.20, 8.0e-2, 0.0, 1.5e-6))),
    (0.22, ((0.60, 2.0e-2, 0.0, 2.0e-7), (0.40, 1.5e0, 0.0, 2.0e-7))),
)
O3_COLUMN = 6.5e-6     # kg/kg-scaled proxy for a midlat column distribution


def rrtmg_sw(qv, qc, rho, dz, mu, albedo=0.2, o3_vmr=None):
    """k-distribution shortwave with cloud delta-two-stream.
    Returns (dT/dt, GSW absorbed at surface). k=0 lowest level.
    ref capability: rrtmg_sw spectral loop + cloud optics.
    o3_vmr: optional (nC, nz) ozone vmr from the o3 climatology (ref:
    mpas_atmphys_o3climatology.F); None falls back to a fixed
    top-quarter column proxy."""
    nC, nz = qv.shape
    mu_s = jnp.maximum(mu, 0.05)
    sec = 1.0 / mu_s
    path_v = rho * dz * qv
    path_a = rho * dz
    if o3_vmr is not None:
        from mpas_tpu.cores.atmosphere.physics.o3 import o3_path
        path_o3 = o3_path(rho, dz, o3_vmr)
    else:
        # simple O3 proxy profile: concentrated in the top quarter
        o3_w = jnp.zeros((nz,)).at[3 * nz // 4:].set(1.0)
        o3_w = o3_w / jnp.maximum(jnp.sum(o3_w), 1.0)
        path_o3 = O3_COLUMN * o3_w[None, :] * jnp.ones((nC, 1))

    # cloud optics: tau = 3/2 LWP / (rho_w r_e)
    r_eff = 10.0e-6
    tau_cld = 1.5 * (qc * rho * dz) / (1000.0 * r_eff)
    g_cld = 0.85
    # delta scaling
    f = g_cld * g_cld
    tau_cld_s = (1.0 - 0.9994 * f) * tau_cld

    # cloud reflection per layer (two-stream reflectance approx) and the
    # absorbing part of the cloud extinction (single-scatter albedo 0.9994:
    # nearly all cloud extinction is scattering, not absorption)
    refl = (1.0 - g_cld) * tau_cld_s / (1.0 + (1.0 - g_cld) * tau_cld_s)
    ssa_cld = 0.9994
    tau_cld_abs = (1.0 - ssa_cld) * tau_cld_s

    heat_tot = jnp.zeros((nC, nz))
    gsw = jnp.zeros((nC,))
    for band_frac, gpts in SW_BANDS:
        for (w, k_h2o, k_o3, ray) in gpts:
            toa = _S0 * mu * band_frac * w
            # absorption vs total extinction along the beam: Rayleigh and
            # cloud scattering deplete the direct beam but must NOT heat the
            # layer — scattered/reflected flux exits to space
            tau_abs = k_h2o * path_v + k_o3 * path_o3 + tau_cld_abs
            tau = tau_abs + ray * path_a + (tau_cld_s - tau_cld_abs)
            trans = jnp.exp(-sec[:, None] * tau)
            eff_trans = trans * (1.0 - refl)
            # cumulative transmission from TOA down to each interface:
            # cum[:, i] = prod_{k=i..nz-1} eff_trans[:, k]  (log-cumsum form)
            log_step = jnp.log(jnp.maximum(eff_trans, 1e-30))
            cum_log = jnp.cumsum(log_step[:, ::-1], axis=1)[:, ::-1]
            cum = jnp.exp(jnp.pad(cum_log, ((0, 0), (0, 1))))   # (nC, nz+1)
            f_dn = toa[:, None] * cum
            gsw = gsw + f_dn[:, 0] * (1.0 - albedo)
            # layer heating: of the extinguished beam, only the gas/cloud
            # absorption fraction heats; reflection is a loss to space
            f_in = f_dn[:, 1:]
            heat_tot = heat_tot + f_in * (1.0 - trans) \
                * tau_abs / jnp.maximum(tau, 1e-12)
    dtdt = heat_tot / (rho * dz * cp)
    return dtdt, gsw
