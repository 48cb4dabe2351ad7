"""Orographic gravity-wave drag + flow-blocking (Kim & Arakawa / Kim & Doyle).

ref: src/core_atmosphere/physics/physics_wrf/module_bl_gwdo.F (gwdo2d
:205-745) driven by mpas_atmphys_driver_gwdo.F. Processes, in reference
order: reference-level (2*sigma_h) PBL averages, wind-direction-dependent
orographic asymmetry/effective length selection, base-level wave stress
(Kim & Arakawa 1995 enhancement/sheltering factors), vertical stress
profile under the Lindzen (1981) saturation hypothesis with the Shutts
minimum-Richardson criterion, Kim & Doyle (2005) flow-blocking drag, and
a critical-line time-step limiter.

Inputs use the subgrid orography statistics produced by
init_atmosphere's GWD stage (mpas_tpu/cores/init_atmosphere/gwd.py:
var2d, con, oa1-4, ol1-4 — ref mpas_init_atm_gwd.F).

TPU redesign: one fused column pass over (nCells, nz) with the only
sequential part — the upward stress-saturation recurrence — as a
lax.scan over nz; reference-level selection and the flow-blocking layer
search are masked argmax reductions, not loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity, rgas

# scheme constants (ref module_bl_gwdo.F:283-296)
_RIC = 0.25
_DW2MIN = 1.0
_RIMIN = -100.0
_BNV2MIN = 1.0e-5
_EFMIN, _EFMAX = 0.0, 10.0
_VELEPS = 1.0
_FRC = 1.0
_CE = 0.8
_CG = 0.5
_GMAX = 1.0
_FRMAX = 10.0
_OLMIN = 1.0e-5
_ODMIN, _ODMAX = 0.1, 10.0
_KPBLMIN = 1          # 0-based (ref kpblmin = 2, 1-based)
_FV = 0.6077          # rv/rd - 1 (ref fv_)

# nwd lookup: wind sector -> oa/ol direction slot (ref :327 data nwdir)
_NWDIR = jnp.asarray([6, 7, 5, 8, 2, 3, 1, 4])


def gwdo(u, v, t, qv, p_mid, z_mid, dz, var2d, oc1, oa4, ol4,
         dx, dt, kpblmax=None):
    """One GWDO step.

    u, v, t, qv, p_mid, z_mid, dz: (nC, nz), k=0 the lowest level.
    var2d, oc1: (nC,); oa4, ol4: (nC, 4); dx: (nC,) grid length [m].
    Returns (dudt, dvdt, dusfc, dvsfc) — wind tendencies (nC, nz) and
    integrated surface stress (nC,) (ref gwdo2d outputs)."""
    nc, nz = u.shape
    if kpblmax is None:
        kpblmax = nz // 2
    karr = jnp.arange(nz)

    # virtual temperatures and density (ref :395-401)
    vtj = t * (1.0 + _FV * qv)
    exner = (p_mid / 1.0e5) ** (rgas / cp)
    vtk = vtj / exner
    rho = p_mid / (rgas * vtj)

    # hydrostatic layer mass (Pa) and interface pressures
    delp = rho * gravity * dz
    p_int0 = p_mid[:, 0] + 0.5 * delp[:, 0]
    prsi = jnp.concatenate(
        [p_int0[:, None],
         p_int0[:, None] - jnp.cumsum(delp, axis=1)], axis=1)  # (nC, nz+1)

    # reference level: first level 2*var above the surface (ref :403-426)
    zl = z_mid
    zrel = zl - zl[:, :1]
    above = zrel >= (2.0 * var2d)[:, None]
    above = above.at[:, 0].set(False)
    kfound = jnp.argmax(above, axis=1)        # first k with zrel >= 2 var
    any_above = jnp.any(above, axis=1)
    klowtop = jnp.where(any_above, kfound + 1, 0)
    kbl = jnp.clip(klowtop, _KPBLMIN, kpblmax)        # 0-based exclusive-ish

    below = karr[None, :] < kbl[:, None]              # k < kbl mask
    delks = 1.0 / (prsi[:, 0] - prsi[jnp.arange(nc), kbl])
    delks1 = 1.0 / (p_mid[:, 0] - p_mid[jnp.arange(nc), kbl])

    # PBL mass-weighted means (ref :437-447)
    wdel = jnp.where(below, delp, 0.0)
    ubar = jnp.sum(wdel * u, 1) * delks
    vbar = jnp.sum(wdel * v, 1) * delks
    rhobar = jnp.sum(wdel * rho, 1) * delks

    # wind-direction-dependent asymmetry/length selection (ref :449-480)
    wdir = jnp.arctan2(ubar, vbar) + jnp.pi
    fdir = 8.0 / (2.0 * jnp.pi)
    idir = jnp.mod(jnp.round(fdir * wdir).astype(jnp.int32), 8)
    nwd = _NWDIR[idir]                                 # 1..8
    slot = jnp.mod(nwd - 1, 4)                         # 0..3
    oa = (1 - 2 * ((nwd - 1) // 4)).astype(u.dtype) \
        * jnp.take_along_axis(oa4, slot[:, None], 1)[:, 0]
    ol = jnp.take_along_axis(ol4, slot[:, None], 1)[:, 0]
    ol4p = ol4[:, jnp.asarray([1, 0, 3, 2])]
    olp = jnp.take_along_axis(ol4p, slot[:, None], 1)[:, 0]
    od = jnp.clip(olp / jnp.maximum(ol, _OLMIN), _ODMIN, _ODMAX)
    sq2 = jnp.sqrt(jnp.asarray(2.0, u.dtype))
    dxy4 = jnp.stack([dx, dx, sq2 * dx, sq2 * dx], 1)
    dxy4p = dxy4[:, jnp.asarray([1, 0, 3, 2])]
    dxy = jnp.take_along_axis(dxy4, slot[:, None], 1)[:, 0]
    dxyp = jnp.take_along_axis(dxy4p, slot[:, None], 1)[:, 0]
    cleff = dx

    # Richardson number and N^2 between levels k, k+1 (ref :482-496)
    ti = 2.0 / (t[:, :-1] + t[:, 1:])
    rdz = 1.0 / (zl[:, 1:] - zl[:, :-1])
    dw2 = (u[:, :-1] - u[:, 1:]) ** 2 + (v[:, :-1] - v[:, 1:]) ** 2
    shr2 = jnp.maximum(dw2, _DW2MIN) * rdz * rdz
    bvf2 = gravity * (gravity / cp + rdz * (vtj[:, 1:] - vtj[:, :-1])) * ti
    usqj = jnp.maximum(bvf2 / shr2, _RIMIN)            # (nC, nz-1)
    bnv2 = 2.0 * gravity * rdz * (vtk[:, 1:] - vtk[:, :-1]) \
        / (vtk[:, 1:] + vtk[:, :-1])

    # low-level wind and its projection profile (ref :498-516)
    ulow = jnp.maximum(jnp.sqrt(ubar ** 2 + vbar ** 2), 1.0)
    rulow = 1.0 / ulow
    velco = 0.5 * ((u[:, :-1] + u[:, 1:]) * ubar[:, None]
                   + (v[:, :-1] + v[:, 1:]) * vbar[:, None]) * rulow[:, None]
    velco = jnp.where((velco < _VELEPS) & (velco > 0.0), _VELEPS, velco)

    # drag-off conditions (ref :518-560)
    km1 = jnp.arange(nz - 1)
    low_crit = (km1[None, :] < kbl[:, None]) & (velco <= 0.0)
    ldrag = (velco[:, 0] <= 0.0) | jnp.any(low_crit, axis=1)

    # mass-weighted low-level Ri and N^2 (ref :529-548)
    wt = jnp.where(km1[None, :] < kbl[:, None],
                   (p_mid[:, :-1] - p_mid[:, 1:]) * delks1[:, None], 0.0)
    bnvl2 = jnp.sum(wt * bnv2, 1)
    usqj_ll = jnp.sum(wt * usqj, 1)
    ldrag = ldrag | (bnvl2 <= 0.0) | (ulow == 1.0) | (var2d <= 0.0)
    usqj = jnp.where(km1[None, :] < kbl[:, None], usqj_ll[:, None], usqj)

    # base-level stress (ref :562-597)
    bnv = jnp.sqrt(jnp.maximum(bnvl2, 0.0))
    fr = jnp.minimum(bnv * rulow * var2d * od, _FRMAX)
    xn = ubar * rulow
    yn = vbar * rulow
    efact = jnp.clip((oa + 2.0) ** (_CE * fr / _FRC), _EFMIN, _EFMAX)
    coefm = (1.0 + ol) ** (oa + 1.0)
    xlinv = coefm / cleff
    tem = fr * fr * oc1
    gfobnv = _GMAX * tem / ((tem + _CG) * jnp.maximum(bnv, 1e-10))
    taub = jnp.where(ldrag, 0.0,
                     xlinv * rhobar * ulow ** 3 * gfobnv * efact)
    xn = jnp.where(ldrag, 0.0, xn)
    yn = jnp.where(ldrag, 0.0, yn)

    # vertical stress profile: Lindzen saturation above kbl (ref :599-652).
    # taup lives on nz+1 interfaces; taup[k] = taub for k <= kbl.
    brvf = jnp.sqrt(jnp.maximum(bnv2, _BNV2MIN))       # (nC, nz-1)

    def stress_level(carry, k):
        taup_k, icrilv = carry
        active = k >= kbl                              # (nC,)
        icrilv_new = icrilv | ((usqj[:, k] < _RIC) | (velco[:, k] <= 0.0))
        icrilv = jnp.where(active, icrilv_new, icrilv)
        temv = 1.0 / jnp.where(velco[:, k] != 0.0, velco[:, k], 1e30)
        tem1 = coefm / dxy * (rho[:, k + 1] + rho[:, k]) \
            * brvf[:, k] * velco[:, k] * 0.5
        hd = jnp.sqrt(jnp.maximum(taup_k, 0.0)
                      / jnp.maximum(tem1, 1e-30))
        fro = brvf[:, k] * hd * temv
        tem2 = jnp.sqrt(jnp.maximum(usqj[:, k], 0.0))
        t1r = 1.0 + tem2 * fro
        rim = usqj[:, k] * (1.0 - fro) / (t1r * t1r)
        # saturation hypothesis (ref :633-641)
        temc = 2.0 + 1.0 / jnp.maximum(tem2, 1e-10)
        hd_sat = velco[:, k] * (2.0 * jnp.sqrt(temc) - temc) / brvf[:, k]
        taup_sat = tem1 * hd_sat * hd_sat
        apply_sat = (rim <= _RIC) & ((oa <= 0.0) | (k + 1 >= _KPBLMIN))
        taup_next = jnp.where(apply_sat, taup_sat, taup_k)
        ok = active & (~ldrag) & (~icrilv) & (taup_k > 0.0)
        # below kbl the profile stays at taub; above, failed conditions
        # leave the initialization value 0 (ref taup init :380)
        taup_kp1 = jnp.where(ok, taup_next,
                             jnp.where(active, 0.0, taub))
        return (taup_kp1, icrilv), taup_kp1

    icrilv0 = jnp.zeros((nc,), bool)
    (_, _), taup_rest = jax.lax.scan(
        stress_level, (taub, icrilv0), jnp.arange(_KPBLMIN, nz - 1))
    # interfaces 0.._KPBLMIN hold taub; then the scan outputs
    taup = jnp.concatenate(
        [jnp.tile(taub[:, None], (1, _KPBLMIN + 1)),
         jnp.moveaxis(taup_rest, 0, 1),
         jnp.moveaxis(taup_rest[-1:], 0, 1)], axis=1)   # (nC, nz+1)

    # flow-blocking drag (Kim & Doyle 2005; ref :654-700)
    zkbl = zl[jnp.arange(nc), kbl]
    contrib = jnp.where(below,
                        bnv2_full(bnv2, nz) * (zkbl[:, None] - zl)
                        * delp / gravity / rho, 0.0)
    # cumulative PE integrating downward from kbl (ref loop k=kte..1,-1)
    pe_below = jnp.cumsum(contrib[:, ::-1], axis=1)[:, ::-1]
    fbdke = 0.5 * (u ** 2 + v ** 2)
    blocked = below & (pe_below >= fbdke)
    kblk = jnp.argmax(jnp.where(blocked, karr[None, :], -1), axis=1)
    has_blk = jnp.any(blocked, axis=1) & (~ldrag)
    zblk = jnp.where(has_blk, zl[jnp.arange(nc), kblk] - zl[:, 0], 0.0)
    fbdcd = jnp.maximum(2.0 - 1.0 / od, 0.0)
    taufb0 = jnp.where(
        has_blk,
        0.5 * rhobar * coefm / jnp.maximum(dx, 1.0) ** 2 * fbdcd * dxyp
        * olp * zblk * ulow ** 2, 0.0)
    # linear decrease from taufb0 at the surface to 0 at kblk (ref :685-688)
    kint = jnp.arange(nz + 1)
    fracfb = jnp.clip(1.0 - kint[None, :]
                      / jnp.maximum(kblk[:, None], 1).astype(u.dtype),
                      0.0, 1.0)
    taup = taup + taufb0[:, None] * fracfb

    # deceleration: -g dtau/dp with critical-line limiter (ref :702-743)
    taud = (taup[:, 1:] - taup[:, :-1]) * gravity / delp
    velco_f = jnp.concatenate([velco, velco[:, -1:]], axis=1)
    lim = jnp.where(below & (taud != 0.0),
                    jnp.abs(velco_f / (dt * jnp.where(taud != 0.0, taud,
                                                      1e30))), jnp.inf)
    dtfac = jnp.minimum(1.0, jnp.min(lim, axis=1))
    taud = taud * dtfac[:, None]
    dudt = taud * xn[:, None]
    dvdt = taud * yn[:, None]
    dusfc = -jnp.sum(dudt * delp, 1) / gravity
    dvsfc = -jnp.sum(dvdt * delp, 1) / gravity
    return dudt, dvdt, dusfc, dvsfc


def bnv2_full(bnv2, nz):
    """Pad the (nC, nz-1) interface N^2 to (nC, nz) by repeating the top
    (the reference indexes bnv2(i,k) with k up to kbl < nz-1)."""
    return jnp.concatenate([bnv2, bnv2[:, -1:]], axis=1)
