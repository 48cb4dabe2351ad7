"""Correlated-k (RRTMG-structure) spectral radiation.

ref capability: src/core_atmosphere/physics/physics_wrf/
module_ra_rrtmg_lw.F / module_ra_rrtmg_sw.F (k-distribution spectral
integration over bands x g-points with H2O/CO2/O3/N2O/CH4 absorbers,
two-stream per g-point, cloud optical properties) as dispatched by
mpas_atmphys_driver_radiation_{lw,sw}.F.

Structure matches the reference at full spectral resolution:
  LW: the 16 RRTMG-LW bands (10-3250 cm^-1) at the reduced 140-g-point
      quadrature (per-band counts 10,12,16,...  — module_ra_rrtmg_lw.F's
      ngb/ngs tables), per-band active absorbers incl. N2O/CH4, per-band
      Planck fractions by numerical Planck integration, two-stream
      absorption/emission per g-point with the 1.66 diffusivity.
  SW: the 14 RRTMG-SW bands (820-50000 cm^-1) at the reduced 112-g-point
      quadrature, per-band Rayleigh coefficients (~nu^4), Chappuis/
      Huggins/Hartley O3, per-band solar fractions from a 5777-K Planck
      weighting, delta-two-stream cloud scattering.

Coefficients: vendored k-tables (physics/data/rrtmg_k.npz, built by
tools/gen_rrtmg_tables.py — the analogue of the reference's vendored
RRTMG_LW_DATA) holding Malkmus-band-model k-quantiles per (band, gas)
with per-gas pressure/temperature power-law scaling. These are fitted
band parameters, not HITRAN line-by-line reductions — column anchors in
tests/test_physics_column_anchors.py state the accuracy contract.

TPU notes: a static 16/14-band python loop; within a band all g-points
batch into the lane dimension and the vertical recurrences run as a
single lax.scan over levels with an (nC, ng) carry — peak memory stays
(nC, max_ng, nz), never (nC, 140, nz).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.constants import cp

_SB = 5.67e-8
_S0 = 1361.0
_H = 6.62607015e-34
_C = 2.99792458e8
_KB = 1.380649e-23

DIFFUSIVITY = 1.66    # LW flux diffusivity factor (ref: rrtmg secdiff)
GASES = ("h2o", "co2", "o3", "n2o", "ch4", "h2oc")
# default well-mixed volume mixing ratios (ref: mpas_atmphys_rrtmg_lwinit
# co2vmr/n2ovmr/ch4vmr)
CO2_PPV = 400.0e-6
N2O_PPV = 320.0e-9
CH4_PPV = 1.8e-6
# mass mixing conversion (M_gas / M_air)
_MW = dict(h2o=18.016 / 28.966, co2=44.01 / 28.966, o3=48.0 / 28.966,
           n2o=44.013 / 28.966, ch4=16.043 / 28.966)
_PREF = 1.0e5
_TREF = 250.0

# per-band LW cloud mass absorption (m2/kg liquid water): window bands
# (~800-1200 cm^-1) near the geometric-optics limit, far-IR reduced
_K_CLD_LW = {1: 60.0, 2: 90.0, 3: 110.0, 4: 120.0, 5: 130.0, 6: 140.0,
             7: 140.0, 8: 140.0, 9: 130.0, 10: 120.0, 11: 110.0,
             12: 100.0, 13: 90.0, 14: 90.0, 15: 80.0, 16: 80.0}


@functools.cache
def _tables():
    path = os.path.join(os.path.dirname(__file__), "data", "rrtmg_k.npz")
    raw = dict(np.load(path))
    t = {"lw": [], "sw": [], "p_exp": raw["p_exp"],
         "t_exp_lw": raw["t_exp_lw"], "t_exp_sw": raw["t_exp_sw"]}
    lw_edges = raw["lw_edges"]
    for b in range(1, 17):
        t["lw"].append({
            "nu": (float(lw_edges[b - 1]), float(lw_edges[b])),
            "w": raw[f"lw_w_{b}"],
            "k": np.stack([raw[f"lw_k_{b}_{g}"] for g in GASES],
                          axis=1),
            "k_cld": _K_CLD_LW[b],
        })
    sw_edges = raw["sw_edges"]
    # per-band solar fraction: Planck(5777 K) integral over the band
    fracs = []
    for b in range(1, 15):
        if b <= 13:
            nu1, nu2 = float(sw_edges[b - 1]), float(sw_edges[b])
        else:
            nu1, nu2 = float(sw_edges[14]), float(sw_edges[15])
        fracs.append(_planck_fraction_np(5777.0, nu1, nu2))
    fracs = np.asarray(fracs)
    fracs = fracs / fracs.sum()
    for b in range(1, 15):
        if b <= 13:
            nu1, nu2 = float(sw_edges[b - 1]), float(sw_edges[b])
        else:
            nu1, nu2 = float(sw_edges[14]), float(sw_edges[15])
        t["sw"].append({
            "nu": (nu1, nu2),
            "w": raw[f"sw_w_{b}"],
            "k": np.stack([raw[f"sw_k_{b}_{g}"]
                           for g in ("h2o", "co2", "o3")], axis=1),
            "ray": float(raw[f"sw_ray_{b}"]),
            "solar_frac": float(fracs[b - 1]),
        })
    return t


def _planck_fraction_np(t, nu1, nu2, n_quad=32):
    nu = np.linspace(nu1, nu2, n_quad) * 100.0
    dnu = (nu2 - nu1) * 100.0 / (n_quad - 1)
    x = _H * _C * nu / (_KB * max(t, 120.0))
    b = 2.0 * _H * _C ** 2 * nu ** 3 / np.expm1(x)
    w = np.ones(n_quad)
    w[0] = w[-1] = 0.5
    return float(np.pi * np.sum(b * w) * dnu / (_SB * max(t, 120.0) ** 4))


def _planck_band_fraction(t, nu1, nu2, n_quad=8):
    """Fraction of sigma T^4 emitted in [nu1, nu2] cm^-1 (vectorized)."""
    nu = jnp.linspace(nu1, nu2, n_quad) * 100.0
    dnu = (nu2 - nu1) * 100.0 / (n_quad - 1)
    x = _H * _C * nu[None, :] / (_KB * jnp.maximum(t[..., None], 120.0))
    b = 2.0 * _H * _C ** 2 * nu[None, :] ** 3 / jnp.expm1(x)
    w = jnp.ones((n_quad,)).at[0].set(0.5).at[-1].set(0.5)
    integral = jnp.pi * jnp.sum(b * w[None, :], axis=-1) * dnu
    return integral / (_SB * jnp.maximum(t, 120.0) ** 4)


def _gas_paths(t, qv, rho, dz, co2_ppv, o3_vmr):
    """Per-gas mass paths (kg/m2 per layer) + (p, T) scaling factors."""
    nC, nz = qv.shape
    path_a = rho * dz
    paths = {"h2o": path_a * qv,
             "co2": path_a * co2_ppv * _MW["co2"],
             "n2o": path_a * N2O_PPV * _MW["n2o"],
             "ch4": path_a * CH4_PPV * _MW["ch4"]}
    # H2O self-continuum: effective path = h2o path x (e / 10 hPa), e the
    # vapor partial pressure (CKD self-continuum quadratic-in-vapor
    # behavior; ref: the selfref/forref continuum tables of
    # module_ra_rrtmg_lw.F taumol)
    p_tmp = rho * 287.0 * t
    paths["h2oc"] = path_a * qv * (qv * p_tmp / 0.622 / 1000.0)
    if o3_vmr is not None:
        from mpas_tpu.cores.atmosphere.physics.o3 import o3_path
        paths["o3"] = o3_path(rho, dz, o3_vmr)
    else:
        # fallback midlatitude column proxy concentrated aloft
        o3_w = jnp.zeros((nz,)).at[3 * nz // 4:].set(1.0)
        o3_w = o3_w / jnp.maximum(jnp.sum(o3_w), 1.0)
        paths["o3"] = 6.5e-6 * o3_w[None, :] * jnp.ones((nC, 1))
    p = rho * 287.0 * t
    return paths, p


def _scaled_tau(tab, paths, p, t, t_exp, k_row):
    """Optical depth for one g-point row: sum over gases of
    k(g, gas) * (p/pref)^a * (T/Tref)^b * path_gas.
    k_row: (ng, nGas). Returns (nC, ng, nz)."""
    pe = tab["p_exp"]
    out = 0.0
    pf = p / _PREF
    tf = t / _TREF
    for gi, gas in enumerate(GASES[:k_row.shape[1]]):
        kg = k_row[:, gi]
        if not np.any(kg > 0):
            continue
        if gas == "h2oc":
            # vapor-pressure factor already in the path; continuum T
            # dependence ~ (296/T)^4 (CKD self-continuum genre)
            scale = (296.0 / t) ** 4
        else:
            scale = pf ** float(pe[gi]) * tf ** float(t_exp[gi])
        out = out + kg[None, :, None] * (paths[gas] * scale)[:, None, :]
    return out


def rrtmg_lw(t, qv, qc, rho, dz, tsk, emiss_sfc=0.985, co2_ppv=CO2_PPV,
             o3_vmr=None):
    """16-band x 140-g-point longwave. Returns (dT/dt, GLW, OLR);
    k=0 lowest. ref: module_ra_rrtmg_lw.F rrtmg_lw (taumol + rtrnmc)."""
    nC, nz = t.shape
    tab = _tables()
    paths, p = _gas_paths(t, qv, rho, dz, co2_ppv, o3_vmr)
    path_c = rho * dz * qc

    f_up_tot = jnp.zeros((nC, nz + 1))
    f_dn_tot = jnp.zeros((nC, nz + 1))

    for band in tab["lw"]:
        nu1, nu2 = band["nu"]
        w = jnp.asarray(band["w"])                        # (ng,)
        frac_lyr = _planck_band_fraction(t, nu1, nu2)     # (nC, nz)
        frac_sfc = _planck_band_fraction(tsk, nu1, nu2)   # (nC,)
        b_lyr = frac_lyr * _SB * t ** 4
        b_sfc = frac_sfc * _SB * tsk ** 4

        tau = _scaled_tau(tab, paths, p, t, tab["t_exp_lw"], band["k"])
        tau = tau + band["k_cld"] * path_c[:, None, :]    # (nC, ng, nz)
        emis = 1.0 - jnp.exp(-DIFFUSIVITY * tau)
        emis_r = jnp.moveaxis(emis, 2, 0)                 # (nz, nC, ng)

        # downward pass (TOA -> sfc) over levels, all g-points batched
        ng = emis.shape[1]
        b_r = jnp.moveaxis(b_lyr[:, None, :] * jnp.ones((1, ng, 1)), 2, 0)

        def dn_body2(fd, inputs):
            e_k, b_k = inputs
            return fd * (1.0 - e_k) + e_k * b_k, fd
        fd_end, fd_hist = jax.lax.scan(
            dn_body2, jnp.zeros((nC, ng)), (emis_r[::-1], b_r[::-1]))
        # fd_hist[i] = flux at interface ABOVE level (nz-1-i); rebuild
        # interface array 0..nz (0 = surface)
        f_dn_g = jnp.concatenate(
            [fd_end[None], fd_hist[::-1]], axis=0)        # (nz+1, nC, ng)

        # upward pass (sfc -> TOA)
        fu0 = emiss_sfc * b_sfc[:, None] + (1.0 - emiss_sfc) * f_dn_g[0]

        def up_body(fu, inputs):
            e_k, b_k = inputs
            return fu * (1.0 - e_k) + e_k * b_k, fu
        fu_end, fu_hist = jax.lax.scan(up_body, fu0, (emis_r, b_r))
        f_up_g = jnp.concatenate([fu_hist, fu_end[None]], axis=0)

        f_dn_tot = f_dn_tot + jnp.moveaxis(
            jnp.sum(f_dn_g * w[None, None, :], axis=2), 0, 1)
        f_up_tot = f_up_tot + jnp.moveaxis(
            jnp.sum(f_up_g * w[None, None, :], axis=2), 0, 1)

    glw = f_dn_tot[:, 0]
    olr = f_up_tot[:, -1]
    net = f_up_tot - f_dn_tot
    dtdt = -(net[:, 1:] - net[:, :-1]) / (rho * dz * cp)
    return dtdt, glw, olr


def rrtmg_sw(qv, qc, rho, dz, mu, albedo=0.2, o3_vmr=None,
             co2_ppv=CO2_PPV, t=None):
    """14-band x 112-g-point shortwave with delta-two-stream clouds.
    Returns (dT/dt, GSW absorbed at surface). k=0 lowest level.
    ref: module_ra_rrtmg_sw.F rrtmg_sw (taumol_sw + spcvmc)."""
    nC, nz = qv.shape
    tab = _tables()
    if t is None:
        t = jnp.full_like(qv, _TREF)
    paths, p = _gas_paths(t, qv, rho, dz, co2_ppv, o3_vmr)
    path_a = rho * dz
    mu_s = jnp.maximum(mu, 0.05)
    sec = 1.0 / mu_s

    # cloud optics: tau = 3/2 LWP / (rho_w r_e), delta-scaled
    r_eff = 10.0e-6
    tau_cld = 1.5 * (qc * rho * dz) / (1000.0 * r_eff)
    g_cld = 0.85
    f = g_cld * g_cld
    tau_cld_s = (1.0 - 0.9994 * f) * tau_cld
    refl = (1.0 - g_cld) * tau_cld_s / (1.0 + (1.0 - g_cld) * tau_cld_s)
    ssa_cld = 0.9994
    tau_cld_abs = (1.0 - ssa_cld) * tau_cld_s

    heat_tot = jnp.zeros((nC, nz))
    gsw = jnp.zeros((nC,))
    for band in tab["sw"]:
        w = jnp.asarray(band["w"])                        # (ng,)
        ng = w.shape[0]
        toa_band = _S0 * mu * band["solar_frac"]
        tau_gas = _scaled_tau(tab, paths, p, t, tab["t_exp_sw"],
                              band["k"])                  # (nC, ng, nz)
        tau_abs = tau_gas + tau_cld_abs[:, None, :]
        tau = tau_abs + band["ray"] * path_a[:, None, :] \
            + (tau_cld_s - tau_cld_abs)[:, None, :]
        trans = jnp.exp(-sec[:, None, None] * tau)
        eff_trans = trans * (1.0 - refl[:, None, :])
        log_step = jnp.log(jnp.maximum(eff_trans, 1e-30))
        cum_log = jnp.cumsum(log_step[:, :, ::-1], axis=2)[:, :, ::-1]
        cum = jnp.exp(jnp.pad(cum_log, ((0, 0), (0, 0), (0, 1))))
        f_dn = toa_band[:, None, None] * cum              # (nC, ng, nz+1)
        gsw = gsw + jnp.sum(f_dn[:, :, 0] * w[None, :], axis=1) \
            * (1.0 - albedo)
        f_in = f_dn[:, :, 1:]
        heat = f_in * (1.0 - trans) * tau_abs / jnp.maximum(tau, 1e-12)
        heat_tot = heat_tot + jnp.sum(heat * w[None, :, None], axis=1)
    dtdt = heat_tot / (rho * dz * cp)
    return dtdt, gsw
