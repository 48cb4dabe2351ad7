"""Kain-Fritsch (eta) cumulus parameterization at full closure.

TPU-native re-implementation of the complete KF-eta algorithm
(ref: src/core_atmosphere/physics/physics_wrf/module_cu_kfeta.F:1-2986;
Kain & Fritsch 1990 JAS; Kain 2004 JAM): updraft-source-layer search,
Fritsch-Chappell trigger with grid-scale-w temperature perturbation
(ref :740-810), entraining/detraining updraft with Gaussian
buoyancy-sorting (PROF5, ref :2616-2658), Ogura-Cho precipitation
fallout with condensate loading (CONDLOAD, ref :2543-2613), linear
glaciation between TTFRZ and TBFRZ (ref :900-921), precipitation
efficiency from cloud-layer shear and cloud-base height (ref
:1330-1358), evaporatively-driven downdraft between the LFS and its
descent limit (ref :1370-1520), mass-flux-consistent compensating
subsidence by upstream advection, and the iterative CAPE-removal
closure (STAB=0.95; ref :1680-1995), plus the TKE-scaled shallow-cloud
branch (ref :1634-1672).

TPU-first deviations (all value-level, none structural):
- every per-column i/j loop is a batched array op; level loops are
  lax.scan with static length; the reference's early EXITs are masks
- the KFLUT bilinear saturation-point lookup tables (TPMIX2/TPMIX2DD)
  are replaced by a direct fixed-iteration Newton inversion of the
  theta_e(T, qs(T), p) relation - no tables, same function
- the reference walks updraft source layers bottom-up until one
  triggers; here NUSL candidate source layers are evaluated in parallel
  and the lowest deep-triggering one selected (same selection rule)
- the compensating-subsidence upstream advection uses a static NSTEP
  substep count (the reference picks NSTEP from an omega-CFL bound)
- closure iterations are a static lax.fori loop with convergence masks
- tendencies are returned as rates over TIMEC; the caller applies
  dt-scaled increments each step (the reference freezes them for NCA
  steps - identical time-integrated effect)

All mass fluxes are per unit area (the reference's DXSQ factors drop).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# saturation-vapor constants (ref DATA ALIQ,BLIQ,CLIQ,DLIQ)
ALIQ, BLIQ, CLIQ, DLIQ = 613.3, 17.502, 4780.8, 32.19
G = 9.81
CP = 1004.5
R_D = 287.04
P00 = 1.0e5
T00 = 273.16
TTFRZ, TBFRZ = 268.16, 248.16
XLV0, XLV1 = 3.147e6, 2369.0          # L_v = XLV0 - XLV1*T (ref)
RLF = 3.339e5                          # latent heat of freezing
RATE = 0.03                            # fallout rate 1/m (ref DATA RATE)
DPMIN = 5.0e3                          # min USL depth (Pa)
STAB = 0.95
GDRY = -G / CP
NUSL = 6                               # candidate source layers
NEWTON_ITERS = 4
NSTEP_ADV = 16                         # subsidence advection substeps
NITER_CLOSURE = 7


def esat(t):
    return ALIQ * jnp.exp((BLIQ * t - CLIQ) / (t - DLIQ))


def qsat(t, p):
    es = esat(t)
    return 0.622 * es / jnp.maximum(p - es, 1.0)


def tlcl_bolton(t, q, p):
    """LCL temperature from mixed-parcel T, q, p (ref :723-739: dewpoint
    from vapor pressure, then the empirical TLCL correction)."""
    e = jnp.maximum(q * p / (0.622 + q), 1.0e-3)
    tlog = jnp.log(e / ALIQ)
    tdpt = (CLIQ - DLIQ * tlog) / (BLIQ - tlog)
    tlcl = tdpt - (0.212 + 1.571e-3 * (tdpt - T00)
                   - 4.36e-4 * (t - T00)) * (t - tdpt)
    return jnp.minimum(tlcl, t)


def thetae(t, q, p, tlcl):
    """theta_e (ref ENVIRTHT :2728-2764 / inline :1876)."""
    return t * (P00 / p) ** (0.2854 * (1.0 - 0.28 * q)) \
        * jnp.exp((3374.6525 / tlcl - 2.5403) * q * (1.0 + 0.81 * q))


def _thes_sat(t, p):
    """theta_e of a saturated parcel at (t, p). qs is capped at 0.1
    kg/kg: past the p - es floor (stratospheric p with a warm iterate)
    the uncapped qs blows thetae's exponential to inf and the Newton
    difference to inf - inf = NaN."""
    return thetae(t, jnp.minimum(qsat(t, p), 0.1), p, t)


def wetbulb(p, thes, t_guess=None):
    """Invert thes = thetae(T, qs(T), p) for T (ref TPMIX2DD lookup ->
    Newton iteration here). Returns (T, qs(T,p)).

    The iterate is clamped to [140, 340] K: at stratospheric pressures
    the saturated theta_e exceeds any tropospheric thes and the
    inversion has no root (the reference's lookup table simply saturates
    at its edge, TPMIX2 'OUT OF BOUNDS'); the clamped result is only
    ever consumed where an updraft exists (in-cloud masks / zero draft
    mass flux), but it must stay FINITE — a NaN here reaches the
    tendencies through 0*NaN."""
    t = jnp.full_like(thes, 280.0) if t_guess is None else \
        jnp.clip(t_guess, 140.0, 340.0)
    for _ in range(NEWTON_ITERS):
        f = _thes_sat(t, p) - thes
        dt = 0.5
        df = (_thes_sat(t + dt, p) - _thes_sat(t - dt, p)) / (2 * dt)
        t = jnp.clip(t - f / jnp.maximum(df, 1e-3), 140.0, 340.0)
    return t, jnp.minimum(qsat(t, p), 0.1)


def tpmix(p, thes, qu, qliq, qice, t_guess):
    """Saturation-point adjustment of a parcel at pressure p carrying
    theta_e = thes (ref TPMIX2 :2375-2495). Returns (t, qu, qliq, qice,
    qnewlq) with qnewic = 0 (freezing handled by the caller)."""
    temp, qs = wetbulb(p, thes, t_guess)
    dq = qs - qu
    # supersaturated: condense
    qnew = jnp.where(dq <= 0.0, qu - qs, 0.0)
    qu_sat = jnp.where(dq <= 0.0, qs, qu)
    # subsaturated: evaporate available condensate
    qtot = qliq + qice
    enough = qtot >= dq
    rll = XLV0 - XLV1 * temp
    cpp = CP * (1.0 + 0.89 * qu)
    frac = dq * qliq / (qtot + 1e-10), dq * qice / (qtot + 1e-10)
    t_noc = temp + rll * (dq / (1.0 + dq)) / cpp
    t_some = temp + rll * ((dq - qtot) / (1.0 + dq - qtot)) / cpp
    sub_t = jnp.where(qtot < 1e-10, t_noc, t_some)
    sub_qu = jnp.where(qtot < 1e-10, qu, qu + qtot)
    t_out = jnp.where(dq <= 0.0, temp, jnp.where(enough, temp, sub_t))
    qu_out = jnp.where(dq <= 0.0, qu_sat,
                       jnp.where(enough, qs, sub_qu))
    ql_out = jnp.where(dq <= 0.0, qliq,
                       jnp.where(enough, qliq - frac[0], 0.0))
    qi_out = jnp.where(dq <= 0.0, qice,
                       jnp.where(enough, qice - frac[1], 0.0))
    return t_out, qu_out, ql_out, qi_out, qnew


def prof5(eq):
    """Gaussian buoyancy-sorting integrals (ref PROF5 :2616-2658,
    Abramowitz & Stegun erf approximation). Returns (ee, ud)."""
    sqrt2p, a1, a2, a3 = 2.506628, 0.4361836, -0.1201676, 0.9372980
    pcoef, sigma, fe = 0.33267, 0.166666667, 0.202765151
    x = (eq - 0.5) / sigma
    y = 6.0 * eq - 3.0
    ey = jnp.exp(-0.5 * y * y)
    e45 = jnp.exp(-4.5)
    t2 = 1.0 / (1.0 + pcoef * jnp.abs(y))
    t1 = 0.500498
    c1 = a1 * t1 + a2 * t1 ** 2 + a3 * t1 ** 3
    c2 = a1 * t2 + a2 * t2 ** 2 + a3 * t2 ** 3
    ee_pos = sigma * (0.5 * (sqrt2p - e45 * c1 - ey * c2)
                      + sigma * (e45 - ey)) - e45 * eq * eq / 2.0
    ud_pos = sigma * (0.5 * (ey * c2 - e45 * c1)
                      + sigma * (e45 - ey)) - e45 * (0.5 + eq * eq / 2.0
                                                     - eq)
    ee_neg = sigma * (0.5 * (ey * c2 - e45 * c1)
                      + sigma * (e45 - ey)) - e45 * eq * eq / 2.0
    ud_neg = sigma * (0.5 * (sqrt2p - e45 * c1 - ey * c2)
                      + sigma * (e45 - ey)) - e45 * (0.5 + eq * eq / 2.0
                                                     - eq)
    ee = jnp.where(y >= 0.0, ee_pos, ee_neg) / fe
    ud = jnp.where(y >= 0.0, ud_pos, ud_neg) / fe
    return ee, ud


def dtfrz(tu, p, qu, qfrz):
    """Freezing adjustment (ref DTFRZNEW :2497-2540): latent-heat-of-
    fusion warming, re-saturation, new theta_e."""
    rlc = 2.5e6 - 2369.276 * (tu - 273.16)
    rls = 2833922.0 - 259.532 * (tu - 273.16)
    rlf = rls - rlc
    cpp = CP * (1.0 + 0.89 * qu)
    # warming from freezing qfrz of liquid (vapor deposit adjustment)
    dtfr = rlf * qfrz / cpp
    tu1 = tu + dtfr
    es = esat(tu1)
    qs1 = 0.622 * es / jnp.maximum(p - es, 1.0)
    dqevap = jnp.minimum(qs1 - qu, 0.0)    # ref: may condense a bit more
    tu2 = tu1 - dqevap * rls / cpp
    qu2 = qu + dqevap
    thteu = thetae(tu2, qu2, p, tu2)
    return tu2, qu2, thteu


class _UplState(NamedTuple):
    theteu: jnp.ndarray
    tu: jnp.ndarray
    tvqu: jnp.ndarray       # loaded virtual temp at prev level
    qu: jnp.ndarray
    qliq: jnp.ndarray
    qice: jnp.ndarray
    wtw: jnp.ndarray
    umf: jnp.ndarray
    ee1: jnp.ndarray
    ud1: jnp.ndarray
    abe: jnp.ndarray
    let: jnp.ndarray        # level of equilibrium temperature (int)
    ltop: jnp.ndarray
    alive: jnp.ndarray      # bool: updraft still rising
    ttemp: jnp.ndarray      # glaciation tracker
    trppt: jnp.ndarray
    upold: jnp.ndarray
    dilfrc_prev: jnp.ndarray


def _updraft(p, t, q, z, dp, dz_between, tv_env, theteu0, tlcl, tvlcl,
             zlcl, klcl, kpbl, vmflcl, wlcl, rad, dpthmx, nz, tven):
    """Entraining/detraining updraft ascent (ref updraft: DO loop
    :880-1080). Scans bottom->top; levels below/at klcl are masked.
    Returns per-level (umf, uer, udr, detlq, detic, pptliq, pptice,
    qliq, qice, qdt [qu before dilution], dilfrc) and scalars (abe,
    let, ltop, trppt, wu profile)."""
    nc = p.shape[0]
    ar = jnp.arange(nz)

    def body(s: _UplState, k):
        # k is the DESTINATION level nk1
        pk = p[:, k]
        tk = t[:, k]
        qk = q[:, k]
        tve = tv_env[:, k]
        at_start = k == klcl               # first level above the LCL
        # (ref: the updraft loop starts at K=KLCL-1, so the first
        # destination level NK1 is KLCL itself, ref :1866-1872)
        active = (k >= klcl) & s.alive

        # saturated ascent of the (undiluted-this-step) parcel
        tu1, qu1, ql1, qi1, qnewlq = tpmix(pk, s.theteu, s.qu, s.qliq,
                                           s.qice, s.tu)
        qnewic = jnp.zeros_like(qnewlq)
        # glaciation (ref :900-921)
        frc1 = jnp.where(
            tu1 <= TTFRZ,
            jnp.where(tu1 > TBFRZ,
                      (jnp.minimum(s.ttemp, TTFRZ) - tu1)
                      / (jnp.minimum(s.ttemp, TTFRZ) - TBFRZ), 1.0),
            0.0)
        frc1 = jnp.clip(frc1, 0.0, 1.0)
        qfrz = (ql1 + qnewlq) * frc1
        qnewic = qnewic + qnewlq * frc1
        qnewlq = qnewlq - qnewlq * frc1
        qi1 = qi1 + ql1 * frc1
        ql1 = ql1 - ql1 * frc1
        tu_f, qu_f, theteu_f = dtfrz(tu1, pk, qu1, qfrz)
        do_frz = tu1 <= TTFRZ
        tu1 = jnp.where(do_frz, tu_f, tu1)
        qu1 = jnp.where(do_frz, qu_f, qu1)
        theteu1 = jnp.where(do_frz, theteu_f, s.theteu)
        ttemp_new = jnp.where(do_frz, tu1, s.ttemp)

        tvu1 = tu1 * (1.0 + 0.608 * qu1)
        # vertical velocity + fallout (ref :925-940 + CONDLOAD)
        dzz = jnp.where(at_start, z[:, k] - zlcl, dz_between[:, k])
        tvu_prev = jnp.where(at_start, tvlcl, s.tu * (1.0 + 0.608 * s.qu))
        tve_prev = jnp.where(at_start, tven,
                             tv_env[:, jnp.maximum(k - 1, 0)])
        be = (tvu_prev + tvu1) / (tve_prev + tve) - 1.0
        boterm = 2.0 * dzz * G * be / 1.5
        rei = vmflcl * dp[:, k] * 0.03 / rad
        enterm = 2.0 * rei * s.wtw / jnp.maximum(s.upold, 1e-10)

        # CONDLOAD (ref :2543-2613)
        qtot = ql1 + qi1
        qnew = qnewlq + qnewic
        qest = 0.5 * (qtot + qnew)
        g1 = jnp.maximum(s.wtw + boterm - enterm
                         - 2.0 * G * dzz * qest / 1.5, 0.0)
        wavg = 0.5 * (jnp.sqrt(jnp.maximum(s.wtw, 1e-8)) + jnp.sqrt(g1))
        conv = RATE * dzz / jnp.maximum(wavg, 1e-2)
        ratio3 = qnewlq / (qnew + 1e-8)
        qtot2 = qtot + 0.6 * qnew
        oldq = qtot2
        ratio4 = (0.6 * qnewlq + ql1) / (qtot2 + 1e-8)
        qtot3 = qtot2 * jnp.exp(-conv)
        dq_f = oldq - qtot3
        qlqout = ratio4 * dq_f
        qicout = (1.0 - ratio4) * dq_f
        pptdrg = 0.5 * (oldq + qtot3 - 0.2 * qnew)
        wtw1 = s.wtw + boterm - enterm - 2.0 * G * dzz * pptdrg / 1.5
        wtw1 = jnp.where(jnp.abs(wtw1) < 1e-4, 1e-4, wtw1)
        ql2 = ratio4 * qtot3 + ratio3 * 0.4 * qnew
        qi2 = (1.0 - ratio4) * qtot3 + (1.0 - ratio3) * 0.4 * qnew

        still = wtw1 >= 1e-3
        # env theta_e at this level
        tlcl_e = tlcl_bolton(tk, qk, pk)
        thetee_k = thetae(tk, qk, pk, tlcl_e)

        # CAPE contribution with loading (ref :955-963)
        tvqu1 = tu1 * (1.0 + 0.608 * qu1 - ql2 - qi2)
        tvqu_prev = jnp.where(at_start, tvlcl, s.tvqu)
        dilbe = ((tvqu_prev + tvqu1) / (tve_prev + tve) - 1.0) * dzz
        abe1 = s.abe + jnp.where(dilbe > 0.0, dilbe * G, 0.0)

        # buoyancy sorting (ref :966-1033)
        def mix_tv(f1):
            f2 = 1.0 - f1
            thttmp = f1 * thetee_k + f2 * theteu1
            qtmp = f1 * qk + f2 * qu1
            tml = f2 * ql2
            tmi = f2 * qi2
            tt, qt, ql_, qi_, _ = tpmix(pk, thttmp, qtmp, tml, tmi, tu1)
            return tt * (1.0 + 0.608 * qt - ql_ - qi_)
        tu95 = mix_tv(0.95)
        tu10 = mix_tv(0.10)
        eqfrc = (tve - tvqu1) * 0.10 / jnp.where(
            jnp.abs(tu10 - tvqu1) < 1e-3, 1e-3, tu10 - tvqu1)
        eqfrc = jnp.clip(eqfrc, 0.0, 1.0)
        ee_g, ud_g = prof5(jnp.clip(eqfrc, 1e-3, 1.0 - 1e-3))
        ee2 = jnp.where(tu95 > tve, 1.0,
                        jnp.where(jnp.abs(tu10 - tvqu1) < 1e-3, 1.0,
                                  jnp.where(eqfrc >= 1.0 - 1e-6, 1.0,
                                            jnp.where(eqfrc <= 1e-6, 0.0,
                                                      ee_g))))
        ud2 = jnp.where(tu95 > tve, 0.0,
                        jnp.where(jnp.abs(tu10 - tvqu1) < 1e-3, 0.0,
                                  jnp.where(eqfrc >= 1.0 - 1e-6, 0.0,
                                            jnp.where(eqfrc <= 1e-6, 1.0,
                                                      ud_g))))
        neg_buoy = tvqu1 <= tve
        ee2 = jnp.where(neg_buoy, 0.5, ee2)
        ud2 = jnp.where(neg_buoy, 1.0, ud2)
        let1 = jnp.where(active & still & ~neg_buoy, k, s.let)
        ee2 = jnp.maximum(ee2, 0.5)
        ud2 = 1.5 * ud2
        uer1 = 0.5 * rei * (s.ee1 + ee2)
        udr1 = 0.5 * rei * (s.ud1 + ud2)

        # total-detrainment guard (ref :1036-1055)
        dead = (s.umf - udr1) < 10.0 * vmflcl / jnp.maximum(
            vmflcl, 1e-10) * 1e-3 * vmflcl  # scaled: umf-udr < 1e-3*vmflcl
        dead = (s.umf - udr1) < 1.0e-3 * vmflcl
        abe1 = jnp.where(dead & (dilbe > 0.0), abe1 - dilbe * G, abe1)
        let1 = jnp.where(dead, s.let, let1)

        upold = s.umf - udr1
        upnew = upold + uer1
        dilfrc1 = upnew / jnp.maximum(upold, 1e-10)
        detlq1 = ql2 * udr1
        detic1 = qi2 * udr1
        qdt1 = qu1
        qu2 = (upold * qu1 + uer1 * qk) / jnp.maximum(upnew, 1e-10)
        theteu2 = (theteu1 * upold + thetee_k * uer1) \
            / jnp.maximum(upnew, 1e-10)
        ql3 = ql2 * upold / jnp.maximum(upnew, 1e-10)
        qi3 = qi2 * upold / jnp.maximum(upnew, 1e-10)
        pptliq1 = qlqout * s.umf
        pptice1 = qicout * s.umf
        # source-layer feeding below kpbl (ref :1078)
        feed = (k <= kpbl)
        uer1 = uer1 + jnp.where(feed, vmflcl * dp[:, k] / dpthmx, 0.0)
        upnew = jnp.where(feed, upnew + vmflcl * dp[:, k] / dpthmx, upnew)

        ok = active & still & ~dead
        new = _UplState(
            theteu=jnp.where(ok, theteu2, s.theteu),
            tu=jnp.where(ok, tu1, s.tu),
            tvqu=jnp.where(ok, tvqu1, s.tvqu),
            qu=jnp.where(ok, qu2, s.qu),
            qliq=jnp.where(ok, ql3, s.qliq),
            qice=jnp.where(ok, qi3, s.qice),
            wtw=jnp.where(ok, wtw1, s.wtw),
            umf=jnp.where(ok, upnew, s.umf),
            ee1=jnp.where(ok, ee2, s.ee1),
            ud1=jnp.where(ok, ud2, s.ud1),
            abe=jnp.where(active & still, abe1, s.abe),
            let=jnp.where(active, let1, s.let),
            ltop=jnp.where(active & ~(still & ~dead), jnp.minimum(
                s.ltop, k - 1), jnp.where(active, k, s.ltop)),
            alive=s.alive & jnp.where(active, still & ~dead, True),
            ttemp=jnp.where(ok, ttemp_new, s.ttemp),
            trppt=jnp.where(ok, s.trppt + pptliq1 + pptice1, s.trppt),
            upold=jnp.where(ok, upnew, s.upold),
            dilfrc_prev=jnp.where(ok, dilfrc1, s.dilfrc_prev))
        out = dict(
            umf=jnp.where(ok, upnew, 0.0),
            uer=jnp.where(ok, uer1, 0.0),
            udr=jnp.where(ok, udr1, 0.0),
            detlq=jnp.where(ok, detlq1, 0.0),
            detic=jnp.where(ok, detic1, 0.0),
            pptliq=jnp.where(ok, pptliq1, 0.0),
            pptice=jnp.where(ok, pptice1, 0.0),
            qliq=jnp.where(ok, ql3, 0.0),
            qice=jnp.where(ok, qi3, 0.0),
            qdt=jnp.where(ok, qdt1, 0.0),
            dilfrc=jnp.where(ok, dilfrc1, 1.0),
            wu=jnp.where(ok, jnp.sqrt(jnp.maximum(wtw1, 0.0)), 0.0))
        return new, out

    init = _UplState(
        theteu=theteu0, tu=tlcl, tvqu=tvlcl, qu=jnp.zeros(nc) + 0.0,
        qliq=jnp.zeros(nc), qice=jnp.zeros(nc),
        wtw=wlcl * wlcl, umf=vmflcl, ee1=jnp.ones(nc),
        ud1=jnp.zeros(nc), abe=jnp.zeros(nc),
        let=klcl, ltop=jnp.full(nc, nz - 1), alive=jnp.ones(nc, bool),
        ttemp=jnp.full(nc, TTFRZ), trppt=jnp.zeros(nc),
        upold=vmflcl, dilfrc_prev=jnp.ones(nc))
    return init, body


def _take(a, idx):
    """a[(col), idx(col)] for per-column level index."""
    return jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]


def kf_eta(th, qv, p, rho, z, dz, exner, dt, w0avg=None, u=None, v=None,
           dx=25.0e3):
    """Full KF-eta step. Inputs (nC, nz) bottom-up. Returns dict with
    th_new, qv_new, qc_detr, qi_detr (mixing-ratio increments applied
    over dt), raincv_m (rain depth this step, m), cape, timec, nca."""
    nc, nz = th.shape
    t0 = th * exner
    ar = jnp.arange(nz)

    if w0avg is None:
        # idealized-column default: weak resolved ascent (documented in
        # module docstring); real callers pass the running-mean w
        w0avg = jnp.full((nc, nz), 0.1, t0.dtype)
    if u is None:
        u = jnp.zeros_like(t0)
    if v is None:
        v = jnp.zeros_like(t0)

    dp = rho * G * dz                     # layer pressure depth
    tv0 = t0 * (1.0 + 0.608 * qv)
    dz_between = jnp.concatenate(
        [z[:, :1] * 0.0, z[:, 1:] - z[:, :-1]], axis=1)

    def candidate(lc):
        """Evaluate USL starting at level lc for every column."""
        above = (ar[None, :] >= lc)
        cum = jnp.cumsum(jnp.where(above, dp, 0.0), axis=1)
        usl = above & (cum - dp <= DPMIN) & (ar[None, :] < nz - 4)
        # guard: a candidate starting too high has an empty USL; the
        # trigger can never fire there, but the averages must stay finite
        dpthmx = jnp.maximum(jnp.sum(jnp.where(usl, dp, 0.0), axis=1),
                             1.0)
        kpbl = jnp.sum(usl.astype(jnp.int32), axis=1) - 1 + lc
        wgt = jnp.where(usl, dp, 0.0) / dpthmx[:, None]
        empty = jnp.sum(usl, axis=1) == 0   # candidate starts too high
        tmix = jnp.where(empty, 200.0, jnp.sum(wgt * t0, axis=1))
        qmix = jnp.maximum(jnp.sum(wgt * qv, axis=1), 1e-9)
        pmix = jnp.where(empty, 5.0e4, jnp.sum(wgt * p, axis=1))
        zmix = jnp.sum(wgt * z, axis=1)
        tlcl = tlcl_bolton(tmix, qmix, pmix)
        zlcl = zmix + (tmix - tlcl) * CP / G
        # klcl = first level with z >= zlcl
        above_lcl = z >= zlcl[:, None]
        klcl = jnp.argmax(above_lcl, axis=1)
        klcl = jnp.where(jnp.any(above_lcl, axis=1), klcl, nz - 1)
        klcl = jnp.clip(klcl, 1, nz - 2)
        kbelow = klcl - 1
        zk, zk1 = _take(z, kbelow), _take(z, klcl)
        dlp = jnp.clip((zlcl - zk) / jnp.maximum(zk1 - zk, 1.0), 0.0, 1.0)
        tenv = _take(t0, kbelow) + (_take(t0, klcl)
                                    - _take(t0, kbelow)) * dlp
        qenv = _take(qv, kbelow) + (_take(qv, klcl)
                                    - _take(qv, kbelow)) * dlp
        tven = tenv * (1.0 + 0.608 * qenv)
        plcl = _take(p, kbelow) + (_take(p, klcl)
                                   - _take(p, kbelow)) * dlp

        # trigger (ref :750-800)
        wklcl = jnp.where(zlcl < 2.0e3, 0.02 * zlcl / 2.0e3, 0.02)
        w_k = _take(w0avg, kbelow) + (_take(w0avg, klcl)
                                      - _take(w0avg, kbelow)) * dlp
        wkl = w_k * dx / 25.0e3 - wklcl
        dtlcl = jnp.where(wkl < 1e-4, 0.0,
                          4.64 * jnp.maximum(wkl, 1e-4) ** 0.33)
        trig = (tlcl + dtlcl) > tenv

        gdt = 2.0 * G * jnp.maximum(dtlcl, 0.0) * 500.0 / tven
        wlcl = jnp.minimum(1.0 + 0.5 * jnp.sqrt(jnp.maximum(gdt, 0.0)),
                           3.0)
        tvlcl = tlcl * (1.0 + 0.608 * qmix)
        rholcl = plcl / (R_D * tvlcl)
        vmflcl = rholcl * 0.01 * wlcl * 0.0 + rholcl * wlcl * 0.01
        # per-unit-area: AU0 = 0.01*DXSQ -> 0.01 fractional area
        rad = jnp.where(wkl < 0.0, 1000.0,
                        jnp.where(wkl > 0.1, 2000.0,
                                  1000.0 + 1000.0 * wkl / 0.1))
        theteu0 = thetae(tmix, qmix, pmix, tlcl)

        init, body = _updraft(p, t0, qv, z, dp, dz_between, tv0, theteu0,
                              tlcl, tvlcl, zlcl, klcl, kpbl, vmflcl,
                              wlcl, rad, dpthmx, nz, tven)
        init = init._replace(qu=qmix)
        st, prof = jax.lax.scan(body, init, ar)
        prof = {k: v.T for k, v in prof.items()}   # (nz, nc) -> (nc, nz)
        ltop = jnp.clip(st.ltop, 0, nz - 1)
        cldhgt = _take(z, ltop) - zlcl
        chmin = jnp.where(tlcl > 293.0, 4.0e3,
                          jnp.where(tlcl >= 273.0,
                                    2.0e3 + 100.0 * (tlcl - 273.0),
                                    2.0e3))
        none_ok = (ltop <= klcl) | (ltop <= kpbl) \
            | (jnp.clip(st.let, 0, nz - 1) + 1 <= kpbl) | ~trig \
            | (ltop >= nz - 2)   # cloud would exit the model top
        # (ref :658 'WOULD GO OFF TOP': such columns are rejected —
        # otherwise draft mass flux through the lid leaks column energy)
        deep = ~none_ok & (cldhgt > chmin) & (st.abe > 1.0)
        shallow_ok = ~none_ok & ~deep
        return dict(prof=prof, st=st, deep=deep, shallow=shallow_ok,
                    cldhgt=jnp.where(shallow_ok | deep, cldhgt, 0.0),
                    klcl=klcl, kpbl=kpbl, lc=jnp.full(nc, lc), tlcl=tlcl,
                    tvlcl=tvlcl, zlcl=zlcl, plcl=plcl, tven=tven,
                    vmflcl=vmflcl, wlcl=wlcl, dpthmx=dpthmx, tmix=tmix,
                    qmix=qmix, pmix=pmix, zmix=zmix, theteu0=theteu0,
                    rad=rad)

    cands = [candidate(lc) for lc in range(NUSL)]
    # pick lowest deep candidate; else best (tallest) shallow candidate
    deep_any = jnp.stack([c["deep"] for c in cands])          # (NUSL, nC)
    first_deep = jnp.argmax(deep_any, axis=0)
    has_deep = jnp.any(deep_any, axis=0)
    hgts = jnp.stack([c["cldhgt"] for c in cands])
    best_shal = jnp.argmax(hgts, axis=0)
    has_shal = jnp.any(jnp.stack([c["shallow"] for c in cands]), axis=0)
    pick = jnp.where(has_deep, first_deep, best_shal)
    ishall = ~has_deep & has_shal
    active_col = has_deep | has_shal

    def sel(key, sub=None):
        if sub is None:
            vals = jnp.stack([c[key] for c in cands])
        else:
            vals = jnp.stack([c[key][sub] for c in cands])
        idx = pick[(None,) + (slice(None),) + (None,) * (vals.ndim - 2)]
        return jnp.take_along_axis(vals, idx, axis=0)[0]

    prof = {k: sel("prof", k) for k in cands[0]["prof"]}
    umf, uer, udr = prof["umf"], prof["uer"], prof["udr"]
    detlq, detic = prof["detlq"], prof["detic"]
    pptliq, pptice = prof["pptliq"], prof["pptice"]
    qliq_u, qice_u, qdt = prof["qliq"], prof["qice"], prof["qdt"]
    dilfrc = prof["dilfrc"]
    abe = jnp.take_along_axis(jnp.stack([c["st"].abe for c in cands]),
                              pick[None, :], axis=0)[0]
    let = jnp.take_along_axis(jnp.stack(
        [jnp.clip(c["st"].let, 0, nz - 1) for c in cands]),
        pick[None, :], axis=0)[0]
    ltop = jnp.take_along_axis(jnp.stack(
        [jnp.clip(c["st"].ltop, 0, nz - 1) for c in cands]),
        pick[None, :], axis=0)[0]
    trppt = jnp.take_along_axis(jnp.stack(
        [c["st"].trppt for c in cands]), pick[None, :], axis=0)[0]
    klcl = sel("klcl")
    kpbl = sel("kpbl")
    lc_lev = sel("lc")
    tlcl, tvlcl, zlcl = sel("tlcl"), sel("tvlcl"), sel("zlcl")
    tven, vmflcl, wlcl = sel("tven"), sel("vmflcl"), sel("wlcl")
    dpthmx, tmix, qmix, pmix, zmix = (sel("dpthmx"), sel("tmix"),
                                      sel("qmix"), sel("pmix"),
                                      sel("zmix"))
    let = jnp.where(ishall, jnp.maximum(kpbl, klcl), let)

    lev = ar[None, :]
    in_cloud = (lev >= klcl[:, None]) & (lev <= ltop[:, None])

    # ---- total detrainment between LET and LTOP (ref :1163-1215) -------
    above_let = (lev > let[:, None]) & (lev <= ltop[:, None])
    dptt = jnp.sum(jnp.where(above_let, dp, 0.0), axis=1)
    umf_let = _take(umf, let)
    dumfdp = umf_let / jnp.maximum(dptt, 1.0)
    # linear decrease: umf(k) = umf(let) - cum_dp_above_let * dumfdp
    cum_above = jnp.cumsum(jnp.where(above_let, dp, 0.0), axis=1)
    umf_lin = jnp.maximum(umf_let[:, None] - cum_above * dumfdp[:, None],
                          0.0)
    at_top = lev == ltop[:, None]
    umf_prev = jnp.concatenate([umf[:, :1], umf[:, :-1]], axis=1)
    umf_lin_prev = jnp.concatenate([umf_lin[:, :1] * 0.0
                                    + umf_let[:, None],
                                    umf_lin[:, :-1]], axis=1)
    umf2 = jnp.where(above_let, jnp.where(at_top, 0.0, umf_lin), umf)
    uer2 = jnp.where(above_let,
                     jnp.where(at_top, 0.0,
                               umf_lin * (1.0 - 1.0 / dilfrc)), uer)
    udr2 = jnp.where(above_let,
                     jnp.where(at_top, umf_lin_prev,
                               umf_lin_prev - umf_lin
                               + umf_lin * (1.0 - 1.0 / dilfrc)), udr)
    detlq2 = jnp.where(above_let, udr2 * qliq_u * dilfrc, detlq)
    detic2 = jnp.where(above_let, udr2 * qice_u * dilfrc, detic)
    above_let2 = (lev >= (let + 2)[:, None]) & (lev <= ltop[:, None])
    # pptliq adjust for the detrainment layer
    ratio_ppt = umf_lin_prev / jnp.maximum(umf_prev, 1e-10)
    pptliq2 = jnp.where(above_let2, pptliq * ratio_ppt, pptliq)
    pptice2 = jnp.where(above_let2, pptice * ratio_ppt, pptice)
    trppt = jnp.sum(pptliq2 + pptice2, axis=1)

    # sub-cloud profiles (ref :1221-1260)
    below = lev < klcl[:, None]
    in_usl = (lev >= lc_lev[:, None]) & (lev <= kpbl[:, None])
    umf2 = jnp.where(below,
                     jnp.where(in_usl,
                               vmflcl[:, None]
                               * jnp.cumsum(jnp.where(in_usl, dp, 0.0),
                                            axis=1)
                               / dpthmx[:, None],
                               jnp.where(lev > kpbl[:, None],
                                         vmflcl[:, None], 0.0)),
                     umf2)
    uer2 = jnp.where(below & in_usl,
                     vmflcl[:, None] * dp / dpthmx[:, None],
                     jnp.where(below, 0.0, uer2))
    udr2 = jnp.where(below, 0.0, udr2)
    detlq2 = jnp.where(below, 0.0, detlq2)
    detic2 = jnp.where(below, 0.0, detic2)
    pptliq2 = jnp.where(below, 0.0, pptliq2)
    pptice2 = jnp.where(below, 0.0, pptice2)
    above_top = lev > ltop[:, None]
    umf2 = jnp.where(above_top, 0.0, umf2)
    uer2 = jnp.where(above_top, 0.0, uer2)
    udr2 = jnp.where(above_top, 0.0, udr2)
    detlq2 = jnp.where(above_top, 0.0, detlq2)
    detic2 = jnp.where(above_top, 0.0, detic2)
    pptliq2 = jnp.where(above_top, 0.0, pptliq2)
    pptice2 = jnp.where(above_top, 0.0, pptice2)

    # updraft theta (for feedback; ref THTAU)
    tu_prof = tmix[:, None] + (z - zmix[:, None]) * GDRY
    # in-cloud: recompute from the scan is complex; use moist-adiabat
    # approx via wet-bulb of theteu at each level
    theteu_col = thetae(tmix, qmix, pmix, tlcl)
    tu_cloud, qu_cloud = wetbulb(p, theteu_col[:, None]
                                 * jnp.ones_like(p), t0)
    tu_full = jnp.where(in_cloud, tu_cloud, tu_prof)
    qu_full = jnp.where(in_cloud, qdt, qmix[:, None])
    exn_u = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qu_full))
    thtau = tu_full * exn_u
    exn0 = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qv))
    thta0 = t0 * exn0

    # ---- convective timescale + precipitation efficiency ---------------
    wspd_lcl = jnp.sqrt(_take(u, klcl) ** 2 + _take(v, klcl) ** 2)
    # L5 ~ 500 hPa level: level closest to 500 hPa
    k5 = jnp.argmin(jnp.abs(p - 500.0e2), axis=1)
    wspd_5 = jnp.sqrt(_take(u, k5) ** 2 + _take(v, k5) ** 2)
    vconv = 0.5 * (wspd_lcl + wspd_5)
    timec = jnp.clip(dx / jnp.maximum(vconv, 1.0), 1800.0, 3600.0)
    timec = jnp.where(ishall, 2400.0, timec)

    du = _take(u, ltop) - _take(u, klcl)
    dv = _take(v, ltop) - _take(v, klcl)
    shsign = jnp.where(jnp.sqrt(_take(u, ltop) ** 2
                                + _take(v, ltop) ** 2) > wspd_lcl,
                       1.0, -1.0)
    vws = 1.0e3 * shsign * jnp.sqrt(du * du + dv * dv) \
        / jnp.maximum(_take(z, ltop) - _take(z, klcl), 1.0)
    pef = jnp.clip(1.591 + vws * (-0.639 + vws * (9.53e-2
                                                  - vws * 4.96e-3)),
                   0.2, 0.9)
    cbh = (zlcl - z[:, 0]) * 3.281e-3
    rcbh = jnp.where(
        cbh < 3.0, 0.02,
        0.96729352 + cbh * (-0.70034167 + cbh * (0.162179896 + cbh * (
            -1.2569798e-2 + cbh * (4.2772e-4 - cbh * 5.44e-6)))))
    rcbh = jnp.where(cbh > 25.0, 2.4, rcbh)
    pefcbh = jnp.minimum(1.0 / (1.0 + rcbh), 0.9)
    peff = 0.5 * (pef + pefcbh)

    # ---- downdraft (ref :1370-1560) ------------------------------------
    kstart = kpbl + 1
    # LFS: first level > kstart with p(kstart)-p > 150 hPa, capped LET-1
    dppp = _take(p, kstart)[:, None] - p
    lfs_mask = (lev > kstart[:, None]) & (dppp > 150.0e2)
    klfs = jnp.argmax(lfs_mask, axis=1)
    klfs = jnp.where(jnp.any(lfs_mask, axis=1), klfs, let - 1)
    lfs = jnp.clip(jnp.minimum(klfs, let - 1), 1, nz - 1)
    dd_ok = (_take(p, kstart) - _take(p, lfs)) > 50.0e2
    dd_ok = dd_ok & ~ishall

    # theta_e and wet-bulb at LFS
    tlcl_env = tlcl_bolton(t0, qv, p)
    thetee = thetae(t0, qv, p, tlcl_env)
    rh = qv / jnp.maximum(qsat(t0, p), 1e-10)

    # entrainment descent LFS -> KSTART: mass-weighted theta_e/q mix
    dd_span = (lev >= kstart[:, None]) & (lev <= lfs[:, None])
    dp_dd = jnp.where(dd_span, dp, 0.0)
    w_dd = dp_dd / jnp.maximum(jnp.sum(dp_dd, axis=1, keepdims=True),
                               1.0)
    theted_k = jnp.sum(w_dd * thetee, axis=1)
    qd_k = jnp.sum(w_dd * qv, axis=1)
    rhbar = jnp.sum(w_dd * rh, axis=1)
    dmffrc = 2.0 * (1.0 - rhbar)

    # melting depression at KSTART (ref :1436-1455)
    pptmlt = jnp.sum(jnp.where(in_cloud, pptice2, 0.0), axis=1)
    umf_klcl = jnp.maximum(_take(umf2, klcl), 1e-10)
    t_ml = t0[:, 0] > T00     # melt level exists below cloud
    dtmelt = jnp.where(t_ml, RLF * pptmlt / (CP * umf_klcl), 0.0)
    tz_ks, qss_ks = wetbulb(_take(p, kstart), theted_k)
    tz_ks = tz_ks - dtmelt
    qss_ks = qsat(tz_ks, _take(p, kstart))
    theted_ks = thetae(tz_ks, qss_ks, _take(p, kstart), tz_ks)

    # descent below KSTART with 20%/km RH depression (ref :1460-1520)
    ldt = jnp.minimum(lfs - 1, kstart - 1)
    tz_nd, qs_nd = wetbulb(p, theted_ks[:, None] * jnp.ones_like(p), t0)
    rhh = 1.0 - 0.2e-3 * (_take(z, kstart)[:, None] - z)
    dssdt = (CLIQ - BLIQ * DLIQ) / ((tz_nd - DLIQ) ** 2)
    rl = XLV0 - XLV1 * tz_nd
    dtmp = rl * qs_nd * (1.0 - rhh) / (CP + rl * rhh * qs_nd * dssdt)
    t1rh = tz_nd + jnp.where(rhh < 1.0, dtmp, 0.0)
    qsrh = rhh * qsat(t1rh, p)
    # no negative evaporation
    qsrh = jnp.maximum(qsrh, qd_k[:, None])
    tz_d = jnp.where(rhh < 1.0, tz_nd + (qs_nd - qsrh) * rl / CP, tz_nd)
    qsd = jnp.where(rhh < 1.0, qsrh, qs_nd)
    tvd = tz_d * (1.0 + 0.608 * qsd)
    # LDB: first level (descending) where downdraft gets buoyant
    desc = lev <= ldt[:, None]
    buoyant_d = (tvd > tv0) & desc
    # choose the HIGHEST such level (descent stops there)
    ldb = jnp.where(jnp.any(buoyant_d, axis=1),
                    (nz - 1) - jnp.argmax(buoyant_d[:, ::-1], axis=1), 0)
    dd_depth_ok = (_take(p, ldb) - _take(p, lfs)) > 50.0e2
    dd_ok = dd_ok & dd_depth_ok

    dd_lay = (lev >= ldb[:, None]) & (lev <= ldt[:, None])
    dpdd = jnp.sum(jnp.where(dd_lay, dp, 0.0), axis=1)
    # unit downdraft: DMF(KSTART) = -(1-PEFF) fractional area * rho
    rdd = _take(p, lfs) / (R_D * _take(tvd, lfs))
    a1 = (1.0 - peff) * 0.01 * wlcl
    dmf_lfs = -a1 * rdd
    ddr = jnp.where(dd_lay,
                    -dmf_lfs[:, None] * dp / jnp.maximum(dpdd, 1.0)[:, None],
                    0.0)
    der_span = dd_span
    der = jnp.where(der_span,
                    dmf_lfs[:, None] * dp_dd
                    / jnp.maximum(jnp.sum(dp_dd, axis=1,
                                          keepdims=True), 1.0), 0.0)
    # evaporation in downdraft
    tder_lay = jnp.where(dd_lay, (qsd - qd_k[:, None]) * ddr, 0.0)
    tder = jnp.sum(tder_lay, axis=1)
    dd_ok = dd_ok & (tder > 1e-8)
    tder = jnp.where(dd_ok, tder, 0.0)

    # scale downdraft (ref :1536-1546)
    ddinc = jnp.where(dd_ok,
                      -dmffrc * umf_klcl / jnp.minimum(dmf_lfs, -1e-10),
                      0.0)
    ddinc = jnp.where(tder * ddinc > trppt,
                      trppt / jnp.maximum(tder, 1e-10), ddinc)
    tder = tder * ddinc
    ddr = ddr * ddinc[:, None]
    der = der * ddinc[:, None]
    dmf_prof = jnp.cumsum(der - ddr, axis=1)  # builds downward... see note
    # DMF at level k = sum of (der - ddr) from k upward to LFS: compute
    # via reversed cumsum over the downdraft span
    net = jnp.where(dd_span | dd_lay, der - ddr, 0.0)
    dmf_prof = -(jnp.cumsum(net[:, ::-1], axis=1)[:, ::-1]) * 0.0 + \
        jnp.cumsum(net[:, ::-1], axis=1)[:, ::-1] * 0.0
    # (DMF itself is not needed for the feedback; omega uses der/ddr)

    pptflx = jnp.where(dd_ok, trppt - tder, trppt)
    cpr = trppt

    # downdraft detrained theta/q
    exn_d = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qsd))
    thtad = tz_d * exn_d

    # ---- closure iteration (ref :1680-1995) ----------------------------
    ems = dp / G
    emsd = 1.0 / ems
    # mass-availability bound AINCMX (ref :1600-1612)
    lmax = jnp.maximum(klcl, lfs)
    avail = (lev >= lc_lev[:, None]) & (lev <= lmax[:, None])
    net_in = uer2 - der
    aincm1 = jnp.where(avail & (net_in > 1e-8),
                       ems / jnp.maximum(net_in * timec[:, None], 1e-10),
                       1000.0)
    aincmx = jnp.min(aincm1, axis=1)
    ainc0 = jnp.minimum(1.0, aincmx)
    # shallow closure (ref :1640-1672): EVAC = 0.5*TKEMAX*0.1, TKEMAX=5
    evac = 0.5 * 5.0 * 0.1
    ainc_sh = evac * dpthmx / jnp.maximum(vmflcl * G * timec, 1e-10)

    tu_detr = thtau      # detrained updraft theta
    qd_detr = qdt

    def apply_fluxes(ainc):
        """Compensating subsidence + draft detrainment -> new theta/qv
        (upstream advection, static NSTEP; ref :1694-1772)."""
        uer_s = uer2 * ainc[:, None]
        udr_s = udr2 * ainc[:, None]
        der_s = der * ainc[:, None]
        ddr_s = ddr * ainc[:, None]
        domgdp = -(uer_s - der_s - udr_s - ddr_s) * emsd
        omg = jnp.cumsum(
            jnp.concatenate([jnp.zeros((nc, 1), t0.dtype),
                             -dp[:, :-1] * domgdp[:, :-1]], axis=1),
            axis=1)
        fxm = omg / G
        dtime = timec / NSTEP_ADV

        def sub(carry, _):
            thpa, qpa = carry
            up = -fxm * jnp.concatenate([thpa[:, :1], thpa[:, :-1]],
                                        axis=1)
            dn = fxm * thpa
            thfx = jnp.where(omg <= 0.0, up, dn)
            upq = -fxm * jnp.concatenate([qpa[:, :1], qpa[:, :-1]],
                                         axis=1)
            dnq = fxm * qpa
            qfx = jnp.where(omg <= 0.0, upq, dnq)
            # influx at k comes from the flux at k (bottom face) and the
            # outflux of the level above/below depending on sign
            thfx_in = jnp.where(omg <= 0.0, -fxm * jnp.concatenate(
                [thpa[:, :1], thpa[:, :-1]], axis=1), 0.0)
            thfx_out = jnp.where(omg > 0.0, fxm * thpa, 0.0)
            # face k sits at the BOTTOM of layer k: its transport couples
            # layers k-1 and k
            fx_up_th = jnp.concatenate(
                [thfx_in[:, 1:], jnp.zeros((nc, 1), t0.dtype)], axis=1)
            fx_up_out = jnp.concatenate(
                [thfx_out[:, 1:], jnp.zeros((nc, 1), t0.dtype)], axis=1)
            d_th = (thfx_in - thfx_out + fx_up_out - fx_up_th
                    + udr_s * tu_detr + ddr_s * thtad
                    - (uer_s - der_s) * thta0)
            qfx_in = jnp.where(omg <= 0.0, -fxm * jnp.concatenate(
                [qpa[:, :1], qpa[:, :-1]], axis=1), 0.0)
            qfx_out = jnp.where(omg > 0.0, fxm * qpa, 0.0)
            fq_up_in = jnp.concatenate(
                [qfx_in[:, 1:], jnp.zeros((nc, 1), t0.dtype)], axis=1)
            fq_up_out = jnp.concatenate(
                [qfx_out[:, 1:], jnp.zeros((nc, 1), t0.dtype)], axis=1)
            d_q = (qfx_in - qfx_out + fq_up_out - fq_up_in
                   + udr_s * qd_detr + ddr_s * qsd
                   - (uer_s - der_s) * qv)
            thpa = thpa + d_th * dtime[:, None] * emsd
            qpa = qpa + d_q * dtime[:, None] * emsd
            return (thpa, qpa), None

        (thg, qg), _ = jax.lax.scan(sub, (thta0, qv), None,
                                    length=NSTEP_ADV)
        qg = jnp.maximum(qg, 1e-9)
        return thg, qg

    def new_cape(thg, qg):
        """Recompute ABE on the adjusted sounding (ref :1810-1905)."""
        exn_g = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qg))
        tg = thg / exn_g
        tvg = tg * (1.0 + 0.608 * qg)
        wgt = jnp.where(in_usl, dp, 0.0) / dpthmx[:, None]
        tmix_g = jnp.sum(wgt * tg, axis=1)
        qmix_g = jnp.maximum(jnp.sum(wgt * qg, axis=1), 1e-9)
        tlcl_g = tlcl_bolton(tmix_g, qmix_g, pmix)
        theteu_g = thetae(tmix_g, qmix_g, pmix, tlcl_g)
        # dilute ascent with the same dilution factors
        tu_g, qu_g = wetbulb(p, theteu_g[:, None] * jnp.ones_like(p), tg)
        tvqu_g = tu_g * (1.0 + 0.608 * qu_g - qliq_u - qice_u)
        tvqu_mid = 0.5 * (tvqu_g + jnp.concatenate(
            [tvqu_g[:, :1], tvqu_g[:, :-1]], axis=1))
        tvg_mid = 0.5 * (tvg + jnp.concatenate(
            [tvg[:, :1], tvg[:, :-1]], axis=1))
        dilbe = (tvqu_mid / tvg_mid - 1.0) * dz_between
        pos = jnp.where(in_cloud & (dilbe > 0.0), dilbe * G, 0.0)
        return jnp.sum(pos, axis=1)

    abe_safe = jnp.maximum(abe, 0.1)

    def closure_body(i, carry):
        ainc, done = carry
        thg, qg = apply_fluxes(ainc)
        abeg = new_cape(thg, qg)
        fabe = abeg / abe_safe
        dabe = jnp.maximum(abe - abeg, 0.1 * abe)
        conv = (fabe <= 1.05 - STAB) & (fabe >= 0.95 - STAB)
        new_ainc = jnp.where(fabe == 0.0, ainc * 0.5,
                             ainc * STAB * abe / jnp.maximum(dabe, 1e-3))
        new_ainc = jnp.minimum(new_ainc, aincmx)
        ainc = jnp.where(done | conv | ishall, ainc, new_ainc)
        return ainc, done | conv

    ainc_init = jnp.where(ishall, ainc_sh, ainc0)
    ainc, _ = jax.lax.fori_loop(0, NITER_CLOSURE, closure_body,
                                (ainc_init, ishall))
    ainc = jnp.where(active_col, ainc, 0.0)
    # negligible-convection cutoff (ref AINC<0.05 RETURN)
    ainc = jnp.where(ainc < 0.05, 0.0, ainc)

    thg, qg = apply_fluxes(ainc)
    exn_g = (P00 / p) ** (0.2854 * (1.0 - 0.28 * qg))
    tg = thg / exn_g

    # hydrometeor detrainment tendencies (ref :2000-2070, FBFRC=0: all
    # precipitation falls out; detrained ql/qi go to the grid)
    dql = detlq2 * ainc[:, None] * timec[:, None] * emsd
    dqi = detic2 * ainc[:, None] * timec[:, None] * emsd

    rain_flux = pptflx * ainc                 # kg/m^2/s over timec
    raincv = rain_flux * dt / 1000.0          # m of rain this step

    # apply over dt (tendency = (g - 0)/timec)
    frac = dt / timec
    t_new = t0 + (tg - t0) * frac[:, None]
    qv_new = qv + (qg - qv) * frac[:, None]
    qc_detr = dql * frac[:, None]
    qi_detr = dqi * frac[:, None]
    th_new = t_new / exner

    return dict(th=th_new, qv=qv_new, qc_detr=qc_detr, qi_detr=qi_detr,
                raincv_m=jnp.maximum(raincv, 0.0), cape=abe,
                timec=timec, ainc=ainc, ishall=ishall,
                peff=peff, ltop=ltop, klcl=klcl)
