"""Squall-line / supercell idealized initialization (moist, planar).

ref: init_atm_case_squall_line, src/core_init_atmosphere/
mpas_init_atm_cases.F:1313-1860 (init cases 4 = squall line, 5 = supercell):
Weisman-Klemp-type analytic sounding with a capped 0.014 kg/kg vapor profile,
sheared zonal wind, a 3 K warm bubble, and two 30-iteration balance solves
(moist hydrostatic base sounding, then non-hydrostatic perturbation pressure
for the bubble). Flat terrain, uniform dz, zt = 20 km, f = 0, doubly periodic
plane.

The horizontally uniform sounding is solved once as a single column and
broadcast (the reference loops identical columns); the bubble perturbation
solve is vectorized over cells exactly as written.
"""

from __future__ import annotations

import numpy as np

from mpas_tpu.constants import cp, cv, gravity, p0, pii, rgas
from mpas_tpu.mesh.mesh import Mesh
from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.setup import (AtmGrid, build_adv_cell_tensors,
                                             build_adv_coefs,
                                             build_adv_factored,
                                             build_cell_fit_matrices,
                                             build_deformation_weights,
                                             build_deriv_two, build_dss,
                                             build_reconstruct_weights,
                                             build_vertical_grid, build_zb)
from mpas_tpu.cores.atmosphere.state import AtmDiag, AtmState

ZT = 20000.0
ZTR = 12000.0      # tropopause height (ref :1592)
THETAR = 343.0     # tropopause theta
TTR = 213.0        # tropopause temperature
THETAS = 300.5     # surface theta floor
DELT = 3.0         # bubble amplitude [K] (ref :1745)
RADX = 10000.0     # bubble horizontal radius
RADZ = 1500.0      # bubble vertical radius
ZCENT = 1500.0     # bubble center height
QV_MAX = 0.014     # vapor cap (ref :1700)

RCP = rgas / cp
RCV = rgas / (cp - rgas)


def _sounding_theta_relhum(zmid):
    """Analytic theta / relative-humidity profiles (ref :1610-1620)."""
    frac = np.minimum(zmid / ZTR, 1.0) ** 1.25
    theta = np.where(zmid > ZTR,
                     THETAR * np.exp(9.8 * (zmid - ZTR) / (1003.0 * TTR)),
                     np.maximum(300.0 + 43.0 * frac, THETAS))
    relhum = np.where(zmid > ZTR, 0.25, 1.0 - 0.75 * frac)
    return theta, relhum


def _hydrostatic_pi_top(t, qv_sfc, qv_top, cqw, zz1d, dzw, dzu):
    """Column-integrated Exner at model top (ref :1654-1668)."""
    nz1 = t.shape[0]
    pitop = 1.0 - 0.5 * dzw[0] * gravity * (1.0 + qv_sfc) / (cp * t[0])
    for k in range(1, nz1):
        pitop -= dzu[k] * gravity / (cp * cqw[k] * 0.5 * (t[k] + t[k - 1]))
    pitop -= 0.5 * dzw[nz1 - 1] * gravity * (1.0 + qv_top) / (cp * t[nz1 - 1])
    return pitop


def _integrate_pi_down(pitop, t, qv_top, cqw, dzw, dzu):
    """Exner from top to bottom (ref :1674-1682); zz == 1 (flat)."""
    nz1 = t.shape[0]
    p = np.zeros(nz1)
    p[nz1 - 1] = pitop + 0.5 * dzw[nz1 - 1] * gravity * (1.0 + qv_top) \
        / (cp * t[nz1 - 1])
    for k in range(nz1 - 2, -1, -1):
        p[k] = p[k + 1] + dzu[k + 1] * gravity \
            / (cp * cqw[k + 1] * 0.5 * (t[k] + t[k + 1]))
    return p


def init_supercell(mesh: Mesh, cfg: AtmConfig, case: int = 5):
    """Build (AtmGrid, AtmState, AtmDiag) on a doubly periodic planar mesh.

    case=4 squall line (um=12, us=10, zts=2500); case=5 supercell
    (um=30, us=15, zts=5000) (ref :1626-1634). Scalars carry (qv, qc, qr).
    """
    assert not mesh.on_sphere, "squall/supercell cases are planar"
    if case == 4:
        um, us, zts = 12.0, 10.0, 2500.0
    else:
        um, us, zts = 30.0, 15.0, 5000.0

    nz1 = cfg.config_nvertlevels
    nz = nz1 + 1
    nC, nE = mesh.nCells, mesh.nEdges

    vg, _, _ = build_vertical_grid(nz1, zt=ZT, stretch=1.0, uniform=True)
    dzw, dzu = vg.dzw, np.concatenate([[0.0], 0.5 * (vg.dzw[1:]
                                                     + vg.dzw[:-1]), [0.0]])
    fzm, fzp = vg.fzm, vg.fzp
    zw = vg.zw
    zmid1d = 0.5 * (zw[:-1] + zw[1:])

    # flat terrain: zgrid uniform, zz = 1, zxu = 0 (ref :1560-1576 with hx=0)
    zgrid = np.broadcast_to(zw, (nC, nz)).copy()
    zz = np.ones((nC, nz1))
    zxu = np.zeros((nE, nz1))

    # ---- base/full sounding, 30-iteration moist balance (ref :1654-1720) ---
    thi1d, relhum1d = _sounding_theta_relhum(zmid1d)
    tbi1d = thi1d.copy()
    qv1d = np.zeros(nz1)
    t1d = thi1d.copy()        # theta_m column
    tb1d = tbi1d.copy()       # base theta_m (dry: qvb = 0, ref :1707)
    cqw1d = np.ones(nz1)
    cqwb1d = np.ones(nz1)
    p1d = np.zeros(nz1)
    pb1d = np.zeros(nz1)
    for _ in range(30):
        pitop = _hydrostatic_pi_top(t1d, qv1d[0], qv1d[-1], cqw1d,
                                    zz[0], dzw, dzu)
        pibtop = _hydrostatic_pi_top(tb1d, 0.0, 0.0, cqwb1d, zz[0], dzw, dzu)
        p1d = _integrate_pi_down(pitop, t1d, qv1d[-1], cqw1d, dzw, dzu)
        pb1d = _integrate_pi_down(pibtop, tb1d, 0.0, cqwb1d, dzw, dzu)
        # vapor from relative humidity at the current state (ref :1694-1700)
        temp = p1d * thi1d
        pres = p0 * p1d ** (1.0 / RCP)
        qvs = 380.0 * np.exp(17.27 * (temp - 273.0) / (temp - 36.0)) / pres
        qv1d = np.minimum(QV_MAX, relhum1d * qvs)
        t1d = thi1d * (1.0 + 1.61 * qv1d)
        cqw1d[1:] = 1.0 / (1.0 + 0.5 * (qv1d[1:] + qv1d[:-1]))

    rb1d = pb1d ** (1.0 / RCV) / ((rgas / p0) * tb1d)
    rtb1d = rb1d * tb1d
    rr1d = p1d ** (1.0 / RCV) / ((rgas / p0) * t1d) - rb1d
    ppb1d = p0 * (rgas * rtb1d / p0) ** (cp / cv)
    ptopb = p0 * pibtop ** (1.0 / RCP)

    # broadcast sounding to all columns
    def bc(col):
        return np.broadcast_to(col, (nC, nz1)).copy()

    thi = bc(thi1d)
    qv = bc(qv1d)
    tb = bc(tb1d)
    rb = bc(rb1d)
    rtb = bc(rtb1d)
    rr = bc(rr1d)
    pb = bc(pb1d)
    p = bc(p1d)
    cqw = bc(cqw1d)

    # ---- warm bubble (ref :1736-1775) --------------------------------------
    x = np.asarray(mesh.xCell, dtype=np.float64)
    y = np.asarray(mesh.yCell, dtype=np.float64)
    xmid = 0.5 * x.max()
    ymid = 0.5 * y.max() if case == 5 else 0.0
    xloc = (x - xmid)[:, None]
    yloc = (y - ymid)[:, None] if case == 5 else np.zeros((nC, 1))
    rad = np.sqrt((xloc / RADX) ** 2 + (yloc / RADX) ** 2
                  + ((zmid1d[None, :] - ZCENT) / RADZ) ** 2)
    thi = thi + np.where(rad < 1.0,
                         DELT * np.cos(0.5 * pii * rad) ** 2, 0.0)
    t = thi * (1.0 + 1.61 * qv)

    # ---- perturbation pressure iteration (ref :1779-1820) ------------------
    # pitop from the unperturbed sounding column (the reference uses cell 1,
    # which lies outside the centered bubble).
    pp = np.zeros((nC, nz1))
    rt = np.zeros((nC, nz1))
    for _ in range(30):
        pitop = _hydrostatic_pi_top(t1d, qv1d[0], qv1d[-1], cqw1d,
                                    zz[0], dzw, dzu)
        ptop = p0 * pitop ** (1.0 / RCP)
        pp[:, nz1 - 1] = ptop - ptopb + 0.5 * dzw[nz1 - 1] * gravity \
            * (rr[:, nz1 - 1] + (rr[:, nz1 - 1] + rb[:, nz1 - 1])
               * qv[:, nz1 - 1])
        for k in range(nz1 - 2, -1, -1):
            pp[:, k] = pp[:, k + 1] + dzu[k + 1] * gravity * (
                fzm[k + 1] * (rb[:, k + 1] * qv[:, k + 1]
                              + rr[:, k + 1] * (1.0 + qv[:, k + 1]))
                + fzp[k + 1] * (rb[:, k] * qv[:, k]
                                + rr[:, k] * (1.0 + qv[:, k])))
        rt = (pp / rgas - rtb * (p - pb)) / p
        p = ((rgas / p0) * (rtb + rt)) ** RCV
        rr = (rt - rb * (t - tb)) / t

    rho_zz = rb + rr

    # ---- winds (ref :1636-1650): sheared zonal profile ---------------------
    coe = np.asarray(mesh.cellsOnEdge)
    c1, c2 = coe[:, 0], coe[:, 1]
    ze = 0.25 * (zgrid[c1, :-1] + zgrid[c1, 1:]
                 + zgrid[c2, :-1] + zgrid[c2, 1:])
    uprof = np.where(ze < zts, um * ze / zts, um)
    angle = np.asarray(mesh.angleEdge, dtype=np.float64)
    u = np.cos(angle)[:, None] * (uprof - us)
    u_init1d = np.where(zmid1d < zts, um * zmid1d / zts, um) - us

    # f = 0 on the plane (ref :1838-1844)
    dtype = np.asarray(mesh.areaCell).dtype
    mesh = mesh.replace(fEdge=np.zeros(nE, dtype=dtype),
                        fVertex=np.zeros(mesh.nVertices, dtype=dtype),
                        fCell=np.zeros(nC, dtype=dtype))

    # ---- static coefficient fields -----------------------------------------
    bmats = build_cell_fit_matrices(mesh)
    deriv_two = build_deriv_two(mesh, bmats)
    advCells, adv_coefs, adv_coefs_3rd, _ = build_adv_coefs(
        mesh, deriv_two, cfg.config_coef_3rd_order)
    d2_bmat, d2w = build_adv_factored(mesh, bmats)
    d2w_own, d2w_opp, s_cp, dv_cell = build_adv_cell_tensors(mesh)
    defc_a, defc_b = build_deformation_weights(mesh)
    recon_zonal, recon_merid = build_reconstruct_weights(mesh)
    zb_cell, zb3_cell = build_zb(mesh, vg, zgrid, deriv_two,
                                 cfg.config_theta_adv_order,
                                 cfg.config_coef_3rd_order)
    dss = build_dss(mesh, zgrid, cfg.config_zd, cfg.config_xnutr)

    # ---- coupled diagnostics (flat: w = rw = 0, ref :1826-1834) ------------
    ru = 0.5 * (rho_zz[c1] + rho_zz[c2]) * u
    w = np.zeros((nC, nz))
    rw = np.zeros((nC, nz))
    exner_b = pb
    pressure_b = p0 * (zz * rgas * rtb / p0) ** (cp / cv)
    pressure_p = zz * rgas * (p * rt + rtb * (p - pb))

    r = lambda a: np.asarray(a, dtype=dtype)
    grid = AtmGrid(
        mesh=mesh, vert=vg.replace(
            zw=r(vg.zw), dzw=r(vg.dzw), rdzw=r(vg.rdzw), rdzu=r(vg.rdzu),
            fzm=r(vg.fzm), fzp=r(vg.fzp)),
        zgrid=r(zgrid), zz=r(zz), zxu=r(zxu), dss=r(dss),
        zb_cell=r(zb_cell), zb3_cell=r(zb3_cell),
        advCellsForEdge=advCells, adv_coefs=r(adv_coefs),
        adv_coefs_3rd=r(adv_coefs_3rd),
        d2_bmat=r(d2_bmat), d2w=r(d2w),
        adv_beta=float(cfg.config_coef_3rd_order),
        d2w_own=r(d2w_own), d2w_opp=r(d2w_opp), adv_sside=r(s_cp),
        dv_cell=r(dv_cell),
        defc_a=r(defc_a), defc_b=r(defc_b),
        recon_zonal=r(recon_zonal), recon_merid=r(recon_merid),
        rho_base=r(rb), theta_base=r(tb), rtheta_base=r(rtb),
        exner_base=r(exner_b), pressure_base=r(pressure_b),
        u_init=r(u_init1d), v_init=r(np.zeros(nz1)), t_init=r(bc(t1d)))

    scalars = np.zeros((nC, nz1, 3))
    scalars[:, :, 0] = qv
    state = AtmState(u=r(u), w=r(w), theta_m=r(t), rho_zz=r(rho_zz),
                     scalars=r(scalars))
    diag = AtmDiag(ru=r(ru), rw=r(rw), rho_p=r(rr), rtheta_p=r(rt),
                   exner=r(p), pressure_p=r(pressure_p),
                   ruAvg=r(np.zeros_like(ru)), wwAvg=r(np.zeros((nC, nz))))
    return grid, state, diag
