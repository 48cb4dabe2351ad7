#!/usr/bin/env python
"""Offline generator of the Thompson microphysics lookup tables.

ref: the reference builds its collision/ventilation/freezing tables at
init (src/core_atmosphere/physics/mpas_atmphys_build_tables_thompson.F,
module_mp_thompson.F qr_acr_qg/qr_acr_qs/freezeH2O table builders) and
ships them as a binary. Here the same table capability is produced by
direct numerical integration over gamma size distributions with the
Thompson power-law fall speeds, written to physics/data/thompson_k.npz
and interpolated by thompson.py at runtime.

Tables (all on a log-spaced mean-volume-diameter grid for rain/ice):
  rain: mass- & number-weighted fall speeds, ventilation integral
        (evaporation), cloud-accretion kernel integral
  ice:  mass- & number-weighted fall speeds
  rain freezing: Bigg (1953) volume-freezing integral over temperature

DSDs: exponential in D (mu=0, the Thompson rain/ice default):
  N(D) = N0 exp(-lam D), lam from (q, n):
  q = N0 rho_x pi/6 Gamma(4)/lam^4,  n = N0/lam  ->  lam = (pi rho_x n
  Gamma(4) / (6 q))^(1/3)  -> D_mv = (6 q /(pi rho_x n))^(1/3).
Fall speeds (module_mp_thompson.F):
  rain: v(D) = av_r D^bv_r exp(-fv_r D), av_r=4854, bv_r=1, fv_r=195
  ice:  v(D) = av_i D^bv_i, av_i=1847, bv_i=1
"""

import os

import numpy as np
from scipy.special import gamma as G

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "mpas_tpu", "cores", "atmosphere",
                   "physics", "data", "thompson_k.npz")

AV_R, BV_R, FV_R = 4854.0, 1.0, 195.0
AV_I, BV_I = 1847.0, 1.0
RHO_W = 1000.0
RHO_I = 890.0
NU_AIR = 1.5e-5
SC13 = 0.709**0.3333   # Schmidt^(1/3)
ND = 64                # table size


def _dsd_integrals(d_mv, rho_x, av, bv, fv):
    """Integrals over an exponential DSD with mass-mean-volume diameter
    d_mv: returns (v_mass, v_num, vent, acc_kernel)."""
    # lam from D_mv: D_mv^3 = Gamma(4)/lam^3 * ... for expo DSD the
    # mean-volume diameter D_mv = (Gamma(4))^(1/3)/lam = 6^(1/3)... use
    # q/n = rho_x pi/6 * Gamma(4)/lam^3 -> D_mv = (Gamma(4))^(1/3)/lam
    lam = G(4.0) ** (1.0 / 3.0) / d_mv
    D = np.linspace(1e-6, 40.0 / lam, 4000)
    dD = D[1] - D[0]
    n = np.exp(-lam * D)
    v = av * D ** bv * np.exp(-fv * D)
    m = D ** 3
    v_mass = np.sum(v * m * n) / np.sum(m * n)
    v_num = np.sum(v * n) / np.sum(n)
    # ventilation: per-number mean of (0.78 + 0.308 Sc^(1/3) Re^(1/2)) D
    re = v * D / NU_AIR
    vent = np.sum((0.78 + 0.308 * SC13 * np.sqrt(np.maximum(re, 0.0)))
                  * D * n) * dD * lam  # normalized by 1/lam (number)
    # accretion kernel: number-normalized swept volume pi/4 D^2 v(D)
    acc = np.sum(0.25 * np.pi * D * D * v * n) * dD * lam
    return v_mass, v_num, vent, acc


def build():
    out = {}
    d_r = np.logspace(np.log10(20e-6), np.log10(6e-3), ND)
    vr_m = np.empty(ND); vr_n = np.empty(ND)
    vent_r = np.empty(ND); acc_r = np.empty(ND)
    for i, d in enumerate(d_r):
        vr_m[i], vr_n[i], vent_r[i], acc_r[i] = _dsd_integrals(
            d, RHO_W, AV_R, BV_R, FV_R)
    out["d_rain"] = d_r
    out["vr_mass"] = vr_m
    out["vr_num"] = vr_n
    out["vent_rain"] = vent_r
    out["acc_rain"] = acc_r

    d_i = np.logspace(np.log10(5e-6), np.log10(1e-3), ND)
    vi_m = np.empty(ND); vi_n = np.empty(ND)
    for i, d in enumerate(d_i):
        vi_m[i], vi_n[i], _, _ = _dsd_integrals(d, RHO_I, AV_I, BV_I, 0.0)
    out["d_ice"] = d_i
    out["vi_mass"] = np.minimum(vi_m, 1.5)
    out["vi_num"] = np.minimum(vi_n, 1.5)

    # Bigg (1953) immersion freezing: rate per unit rain mass
    # J = B' [exp(A (T0-T)) - 1] * (drop volume), integrated over the DSD
    # -> per-mass rate coefficient as a function of supercooling
    dT = np.linspace(0.0, 40.0, 81)
    A_BIGG, B_BIGG = 0.66, 100.0
    out["dT_freeze"] = dT
    out["bigg_rate"] = B_BIGG * (np.exp(A_BIGG * dT) - 1.0) * 1.0e-9
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} tables")


if __name__ == "__main__":
    build()
