"""CAM radiation: driver-facing adapters over the CAM3 engine (cam3.py).

ref capability: physics_wrf/module_ra_cam.F (7,876 LoC) +
module_ra_cam_support.F (3,905) — the CAM3 radiation package the reference
selects with config_radt_{lw,sw}_scheme = 'cam_{lw,sw}'
(mpas_atmphys_driver_radiation_{lw,sw}.F). The engine (cam3.py) implements
radcswmx at the full 19-spectral-interval fidelity (Slingo/Ebert-Curry
cloud optics, delta-Eddington + adding over maximum-overlap cloud
configurations) and radclwmx's exchange integral with exact
Kiehl-Briegleb CO2, Ramanathan-Dickinson O3, and the full trace-gas band
system; see the cam3.py docstring for the H2O table-vs-analytic note.

These adapters keep the historical (t, qv, qc, rho, dz, ...) call shape
used by the physics manager: they build hydrostatic interface pressures
from rho*dz (so that column energy closure is exact against the
cp*rho*dz integral), diagnose cloud fraction/water paths and effective
radii from qc and t (reltab/reitab), supply a climatological ozone
profile, and flip between the dycore's bottom-up layout and the engine's
top-down internals.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.cores.atmosphere.physics import cam3

_SB = 5.670374e-8
CP = cam3.CP
G = cam3.GRAV_SI
CO2_PPV = 3.79e-4

_delta_eddington_doc = """Delta-Eddington layer properties (legacy entry).
Exact raddedmx statement-function forms; f = g**2 (pure forward peak)."""


def _delta_eddington(tau, w0, g_asym, mu0):
    r = cam3._sw_layer_props(tau, w0, g_asym, g_asym ** 2, mu0)
    return r


_delta_eddington.__doc__ = _delta_eddington_doc


def _o3_profile(p_mid_pa):
    """Climatological ozone mass mixing ratio vs pressure: a two-lobe fit
    to the midlatitude profile (peak ~10 ppmv near 10 hPa, ~0.03 ppmv in
    the lower troposphere); stands in for the reference's oznint monthly
    climatology ingest (module_ra_cam.F:973, radozn)."""
    p_hpa = p_mid_pa / 100.0
    strat = 10.0e-6 * jnp.exp(-0.5 * (jnp.log(jnp.maximum(p_hpa, 1e-3)
                                              / 12.0) / 1.0) ** 2)
    trop = 0.04e-6 * jnp.ones_like(p_hpa)
    vmr = strat + trop
    return vmr * 48.0 / 28.9644


def _columns_from_rho_dz(t, qv, qc, rho, dz):
    """Hydrostatic interface/mid pressures (TOP-DOWN) + cloud fields from
    the legacy bottom-up (t, qv, qc, rho, dz) description."""
    nC, nz = t.shape
    dp = rho * dz * G                                   # (nC, nz) bottom-up
    dp_td = dp[:, ::-1]
    ptop = jnp.maximum(0.25 * dp_td[:, :1], 100.0)
    pint = jnp.concatenate([ptop, ptop + jnp.cumsum(dp_td, -1)], -1)
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t_td = t[:, ::-1]
    qv_td = jnp.maximum(qv[:, ::-1], 1e-9)
    qc_td = jnp.maximum(qc[:, ::-1], 0.0)
    rho_td = rho[:, ::-1]
    dz_td = dz[:, ::-1]

    cld = jnp.where(qc_td > 1e-8, 0.99, 0.0)
    gwp = qc_td * rho_td * dz_td * 1000.0               # g/m2 grid-mean
    incwp = gwp / jnp.maximum(cld, 0.01)
    fice = jnp.clip((263.16 - t_td) / 20.0, 0.0, 1.0)
    cliqwp = incwp * (1.0 - fice)
    cicewp = incwp * fice
    rel = cam3.reltab(t_td, landfrac=jnp.zeros(nC, t.dtype))
    rei = cam3.reitab(t_td)
    o3 = _o3_profile(pmid)
    return pint, pmid, t_td, qv_td, o3, cld, cliqwp, cicewp, fice, rel, rei


def cam_lw(t, qv, qc, rho, dz, tsk, emiss_sfc=0.985, co2_ppv=CO2_PPV):
    """CAM longwave (ref: radclwmx). Bottom-up arrays; returns
    (tend (nC, nz) K/s, glw surface downward (nC,), olr (nC,))."""
    (pint, pmid, t_td, qv_td, o3, cld, cliqwp, cicewp, fice,
     rel, rei) = _columns_from_rho_dz(t, qv, qc, rho, dz)
    cwp = cliqwp + cicewp
    lwups = emiss_sfc * _SB * tsk ** 4
    out = cam3.radclwmx(pint, pmid, t_td, qv_td, o3, cld, cwp, fice, rei,
                        lwups, co2vmr=co2_ppv)
    tend = out["qrl"][:, ::-1]
    return tend, out["flwds"], out["flut"]


def cam_sw(qv, qc, rho, dz, mu0, albedo=0.2, t=None, solcon=1361.0,
           co2_ppv=CO2_PPV):
    """CAM shortwave (ref: radcswmx). Bottom-up arrays; returns
    (tend (nC, nz) K/s, gsw net absorbed at surface (nC,))."""
    if t is None:
        # legacy call shape carries no temperature: reconstruct a
        # dry-adiabatic-ish profile from the hydrostatic pressure (only
        # effective radii and the ice fraction depend on it)
        p_proxy = jnp.cumsum((rho * dz * G)[:, ::-1], -1)[:, ::-1]
        t = jnp.maximum(180.0, 288.0 * (jnp.maximum(p_proxy, 1e2)
                                        / jnp.maximum(
                                            p_proxy[:, :1], 1e2)) ** 0.19)
    (pint, pmid, t_td, qv_td, o3, cld, cliqwp, cicewp, fice,
     rel, rei) = _columns_from_rho_dz(t, qv, qc, rho, dz)
    alb = jnp.broadcast_to(jnp.asarray(albedo, qv.dtype), (qv.shape[0],))
    out = cam3.radcswmx(pint, pmid, t_td, qv_td, o3, cld, cliqwp, cicewp,
                        rel, rei, mu0, alb, alb, alb, alb,
                        solcon=solcon, co2vmr=co2_ppv)
    tend = out["qrs"][:, ::-1]
    return tend, out["fsns"]
