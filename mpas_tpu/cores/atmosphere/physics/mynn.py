"""MYNN level-2.5 TKE boundary-layer scheme at full closure.

TPU-native re-implementation of the complete Nakanishi-Niino (2006, 2009)
level-2.5 scheme as configured in the reference
(ref: src/core_atmosphere/physics/physics_wrf/module_bl_mynn.F, RAP/HRRR
constants with the Canuto/Kitamura modification CKmod=1):

- mym_level2 (ref :380-543): thl/qw/thv gradients, G_M/G_H, gradient and
  flux Richardson numbers, level-2 stability functions Sm2/Sh2 with the
  a2/(1+max(Ri,0)) Canuto-Kitamura damping
- mym_length (ref :559-723): surface-layer length els (stable
  1/(1+cns*z/L), unstable (1-alp4*z/L)^0.2), turbulent-scale
  elt = alp1*int(q z dz)/int(q dz) over the PBL+transition layer,
  buoyancy length elb with the alp3 convective enhancement and elf,
  harmonic blend el = min(elb/(elb/elt+elb/els+1), elf), tanh blend to
  the free-atmosphere parcel-displacement (BouLac-class) length above
  the PBL
- mym_turbulence level 2.5 (ref :919-1110): Helfand-Labraga growing-
  turbulence branch (q3 < q2: Sm/Sh = level-2 * sqrt(q3sq/q2sq)), else
  the full e1..e4/eden closure; K_m = l q Sm, K_h = l q Sh,
  K_q = Sqfac K_m
- mym_predict (ref :1353-1600): TKE prognosis with implicit dissipation
  (bp = 2q/(B1 l)) and implicit vertical diffusion; surface TKE from
  ust and phi_m
- mym_condensation (ref :1637-1760, bl_mynn_cloudpdf=1 NN2004-B6 sigma):
  partial-condensation cloud fraction/ql and the Vt/Vq buoyancy-flux
  coefficients feeding G_H

TPU-first: batched column algebra, tridiagonal solves via
ops/matrix.tridiagonal_solve, no per-column control flow. The scalar
(co)variances are the level-2.5 diagnostic forms (t2sq = b2 l^2 Sh dtl^2
etc.) rather than level-3 prognostics (levflag=2.5 configuration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity
from mpas_tpu.ops.matrix import tridiagonal_solve

_KARMAN = 0.4
# closure constants (ref module_bl_mynn.F:84-107, CKmod=1 column)
PR = 0.74
G1 = 0.229
B1 = 24.0
B2 = 15.0
C2 = 0.729
C3 = 0.340
C4 = 0.0
C5 = 0.2
A1 = B1 * (1.0 - 3.0 * G1) / 6.0
C1 = G1 - 1.0 / (3.0 * A1 * 2.88449914061481660)   # = g1 - 1/(3 a1 b1^(1/3))
A2 = A1 * (G1 - C1) / (G1 * PR)
G2 = B2 / B1 * (1.0 - C3) + 2.0 * A1 / B1 * (3.0 - 2.0 * C2)
E1C = 3.0 * A2 * B2 * (1.0 - C3)
E2C = 9.0 * A1 * A2 * (1.0 - C2)
E3C = 9.0 * A2 * A2 * (1.0 - C2) * (1.0 - C5)
E4C = 12.0 * A1 * A2 * (1.0 - C2)
E5C = 6.0 * A1 * A1
# length-scale constants (RAP/HRRR set, ref :116-118)
QMIN, ZMAX, CNS = 0.0, 1.0, 2.1
ALP1, ALP2, ALP3, ALP4, ALP5 = 0.23, 0.65, 3.0, 20.0, 1.0
SQFAC = 2.0
TREF = 300.0
TV0 = 0.608 * TREF
GTR = gravity / TREF
QKE_MIN = 1.0e-4
XLV = 2.5e6
EP2 = 0.622


def _esat(t):
    return 611.2 * jnp.exp(17.67 * (t - 273.15) / (t - 29.65))


def _level2(dzk, du2, dtl, dqw, vtt, vqq):
    """Level-2 Sm/Sh from the flux Richardson number (ref :470-540).
    All inputs at interfaces. Returns (gm, gh, sm2, sh2, a2den, ri)."""
    dtq = vtt * dtl + vqq * dqw
    gm = du2
    gh = -dtq * GTR
    ri = -gh / jnp.maximum(du2, 1.0e-10)
    a2den = 1.0 + jnp.maximum(ri, 0.0)          # CKmod=1
    a2k = A2 / a2den
    f1 = B1 * (G1 - C1) + 3.0 * a2k * (1.0 - C2) * (1.0 - C5) \
        + 2.0 * A1 * (3.0 - 2.0 * C2)
    f2 = B1 * (G1 + G2) - 3.0 * A1 * (1.0 - C2)
    rf1 = B1 * (G1 - C1) / f1
    rf2 = B1 * G1 / f2
    smc = A1 / a2k * f1 / f2
    shc = 3.0 * a2k * (G1 + G2)
    rfc = G1 / (G1 + G2)
    ri1 = 0.5 / smc
    ri2 = rf1 * smc
    ri3 = 4.0 * rf2 * smc - 2.0 * ri2
    ri4 = ri2 ** 2
    rf = jnp.minimum(
        ri1 * (ri + ri2 - jnp.sqrt(jnp.maximum(
            ri ** 2 - ri3 * ri + ri4, 0.0))), rfc)
    sh2 = shc * (rfc - rf) / (1.0 - rf)
    sm2 = smc * (rf1 - rf) / (rf2 - rf) * sh2
    return gm, gh, sm2, sh2, a2den, ri


def _length(z_int, dz_int, qkw, dtv, elt_num_mask, flt, flq, vt0, vq0,
            rmo, zi):
    """Master length scale (ref mym_length :559-723). All at interfaces
    (nC, nz-1). Returns el."""
    zi2 = jnp.maximum(zi, 300.0)
    h1 = jnp.clip(0.3 * zi2, 300.0, 750.0)
    h2 = 0.5 * h1

    # elt = alp1 * int(q z)/int(q) below min(zi2+h1, 4000)
    mask = (z_int <= jnp.minimum(zi2 + h1, 4000.0)[:, None])
    qdz = jnp.maximum(qkw - QMIN, 0.03) * dz_int * mask
    elt = ALP1 * jnp.sum(qdz * z_int, axis=1) \
        / jnp.maximum(jnp.sum(qdz, axis=1), 1.0e-5)
    elt = jnp.maximum(elt, 1.0)
    vflx = (vt0 + 1.0) * flt + (vq0 + TV0) * flq
    vsc = (GTR * elt * jnp.maximum(vflx, 0.0)) ** (1.0 / 3.0)

    bv = jnp.sqrt(GTR * jnp.maximum(dtv, 1.0e-10))
    elb = jnp.where(
        dtv > 0.0,
        ALP2 * qkw / bv * (1.0 + ALP3 / ALP2
                           * jnp.sqrt(vsc[:, None]
                                      / (bv * elt[:, None]))),
        1.0e10)
    elf = jnp.where(dtv > 0.0, ALP2 * qkw / bv, 1.0e10)

    zrmo = z_int * rmo[:, None]
    els_stable = _KARMAN * z_int / (1.0 + CNS * jnp.minimum(zrmo, ZMAX))
    els_unstab = _KARMAN * z_int \
        * jnp.maximum(1.0 - ALP4 * zrmo, 1.0e-4) ** 0.2
    els = jnp.where(rmo[:, None] > 0.0, els_stable, els_unstab)

    el = jnp.minimum(elb / (elb / elt[:, None] + elb / els + 1.0), elf)
    # free-atmosphere blend (ref :705-713): parcel-displacement length
    # sqrt(2 tke)/N as the BouLac-class estimate
    el_fa = ALP5 * jnp.where(dtv > 0.0, qkw / bv, 100.0)
    wt = 0.5 * jnp.tanh((z_int - (zi2 + h1)[:, None]) / h2[:, None]) + 0.5
    return el * (1.0 - wt) + jnp.minimum(el_fa, 200.0) * wt


def _turbulence25(el, qkw_int, gm, gh, sm2, sh2, a2den):
    """Level-2.5 stability functions (ref :1000-1090)."""
    elsq = el ** 2
    q2sq = B1 * elsq * (sm2 * gm + sh2 * gh)
    q3sq = qkw_int ** 2
    gmel = gm * elsq
    ghel = gh * elsq

    # growing turbulence (Helfand & Labraga 1988): scale level-2 values
    qdiv = jnp.sqrt(jnp.maximum(q3sq, 1e-12)
                    / jnp.maximum(q2sq, 1e-12))
    sm_grow = sm2 * qdiv
    sh_grow = sh2 * qdiv

    e1 = q3sq - E1C * ghel / a2den
    e2 = q3sq - E2C * ghel / a2den
    e3 = e1 + E3C * ghel / (a2den ** 2)
    e4 = e1 - E4C * ghel / a2den
    eden = jnp.maximum(e2 * e4 + e3 * E5C * gmel, 1.0e-20)
    sm_full = q3sq * A1 * (e3 - 3.0 * C1 * e4) / eden
    sh_full = q3sq * (A2 / a2den) * (e2 + 3.0 * C1 * E5C * gmel) / eden

    grow = q3sq < q2sq
    sm = jnp.where(grow, sm_grow, sm_full)
    sh = jnp.where(grow, sh_grow, sh_full)
    return jnp.maximum(sm, 0.0), jnp.maximum(sh, 0.0)


def _condensation(thl, qw, p, exner, sh_lyr, el_lyr, dtl_lyr, dqw_lyr):
    """Partial condensation -> (vt, vq, cldfra, ql) at layers
    (ref mym_condensation :1637-1760, bl_mynn_cloudpdf=1: NN2004 eq. B6
    sigma from resolved gradients)."""
    t = thl * exner
    esl = _esat(t)
    qsl = EP2 * esl / jnp.maximum(p - 1.6 * esl, 1.0)
    dqsl = qsl * EP2 * XLV / (287.04 * t ** 2)
    qmq = qw - qsl
    alp = 1.0 / (1.0 + dqsl * XLV / cp)
    bet = dqsl * exner
    sgm = jnp.sqrt(jnp.maximum(
        (alp ** 2 * jnp.maximum(el_lyr ** 2, 1.0) * B2
         * jnp.maximum(sh_lyr, 0.03)) / 4.0
        * (dqw_lyr - bet * dtl_lyr) ** 2, 1.0e-10))
    q1 = qmq / sgm
    cld = 0.5 * (1.0 + jax.scipy.special.erf(q1 * 0.7071067811865476))
    eq1 = 0.3989422804 * jnp.exp(-0.5 * jnp.clip(q1, -20.0, 20.0) ** 2)
    qll = jnp.maximum(cld * q1 + eq1, 0.0)
    ql = alp * sgm * qll
    q2p = XLV / cp / exner
    pt = thl + q2p * ql
    qt = 1.0 + 0.608 * qw - 1.608 * ql
    rac = alp * (cld - qll * eq1) * (q2p * qt - 1.608 * pt)
    vt = qt - 1.0 - rac * bet
    vq = 0.608 * pt - TV0 + rac
    return vt, vq, cld, ql


def mynn(u, v, th, qv, rho, z_mid, dz, sfc, qke, dt):
    """One MYNN-2.5 step. Returns (u, v, th, qv, hpbl, qke_new).
    Inputs (nC, nz) with qke the prognostic 2*TKE carried in
    PhysicsState; sfc: dict with ust, hfx (W/m^2), qfx (kg/m^2/s), cd."""
    nz = u.shape[1]
    thv = th * (1.0 + 0.608 * qv)
    flt = sfc["hfx"] / (rho[:, 0] * cp)             # K m/s
    flq = sfc["qfx"] / rho[:, 0]
    ust = jnp.maximum(sfc["ust"], 0.05)
    # Monin-Obukhov 1/L (ref driver: rmol)
    wthv = flt * (1.0 + 0.608 * qv[:, 0]) + 0.608 * th[:, 0] * flq
    rmo = -_KARMAN * gravity / thv[:, 0] * wthv / ust ** 3

    # PBL height: thv-excess method (ref GET_PBLH genre)
    thv_sfc = thv[:, 0] + 1.5 * jnp.maximum(flt, 0.0) / ust
    above = thv > (thv_sfc[:, None] + 0.5)
    k_top = jnp.argmax(above, axis=1)
    any_above = jnp.any(above, axis=1)
    rows = jnp.arange(u.shape[0])
    h_pbl = jnp.where(any_above, z_mid[rows, k_top], z_mid[:, -1])
    h_pbl = jnp.maximum(h_pbl, 1.5 * z_mid[:, 0])

    # interface geometry (internal walls k=1..nz-1 -> (nC, nz-1))
    dz_int = 0.5 * (dz[:, :-1] + dz[:, 1:])
    z_int = 0.5 * (z_mid[:, :-1] + z_mid[:, 1:])
    thl = th          # no resolved cloud input: thl = th, qw = qv
    qw = qv
    du = (u[:, 1:] - u[:, :-1]) / dz_int
    dv = (v[:, 1:] - v[:, :-1]) / dz_int
    du2 = du * du + dv * dv
    dtl = (thl[:, 1:] - thl[:, :-1]) / dz_int
    dqw = (qw[:, 1:] - qw[:, :-1]) / dz_int

    qke_int = jnp.maximum(0.5 * (qke[:, :-1] + qke[:, 1:]), QKE_MIN)
    qkw = jnp.sqrt(qke_int)

    # pass 1: dry buoyancy (vt = vq = 0) -> el, sh for the condensation
    # sigma; pass 2 closes with the partial-condensation vt/vq
    # (ref: vt/vq from the previous step's covariances; one inner
    # iteration reproduces that coupling within the step)
    vtt = jnp.ones_like(du2)
    vqq = jnp.full_like(du2, TV0)
    for _ in range(2):
        gm, gh, sm2, sh2, a2den, ri = _level2(dz_int, du2, dtl, dqw,
                                              vtt, vqq)
        dtv = (vtt * dtl + vqq * dqw)
        el = _length(z_int, dz_int, qkw, dtv, None, flt, flq,
                     jnp.zeros_like(flt), jnp.zeros_like(flq), rmo,
                     h_pbl)
        sm, sh = _turbulence25(el, qkw, gm, gh, sm2, sh2, a2den)
        # layer-centered sh/el/gradients for condensation; pressure from
        # the gas law p = rho R thv (p/p0)^kappa solved in closed form
        kappa = 287.04 / cp
        p_mid = (rho * 287.04 * th * (1.0 + 0.608 * qv)
                 / 1.0e5 ** kappa) ** (1.0 / (1.0 - kappa))
        exner = (p_mid / 1.0e5) ** kappa
        pad = lambda a: jnp.concatenate([a[:, :1], a], axis=1)
        vt_l, vq_l, cldfra, ql = _condensation(
            thl, qw, p_mid, exner, pad(sh), pad(el), pad(dtl), pad(dqw))
        vtt = 1.0 + 0.5 * (vt_l[:, :-1] + vt_l[:, 1:])
        vqq = TV0 + 0.5 * (vq_l[:, :-1] + vq_l[:, 1:])

    elq = el * qkw
    km = jnp.maximum(elq * sm, 0.1)
    kh = jnp.maximum(elq * sh, 0.1)
    kq = SQFAC * km

    def diffuse(f, kcoef, sflux):
        g = dt * kcoef / dz_int
        zero = jnp.zeros_like(f[:, :1])
        gu = jnp.concatenate([zero, g], axis=1)
        gl = jnp.concatenate([g, zero], axis=1)
        a = -gu / dz
        c = -gl / dz
        b = 1.0 - a - c
        d = f.at[:, 0].add(dt * sflux / dz[:, 0])
        return tridiagonal_solve(a, b, c, d)

    th_new = diffuse(th, kh, flt)
    qv_new = jnp.maximum(diffuse(qv, kh, flq), 0.0)
    spd1 = jnp.sqrt(jnp.maximum(u[:, 0] ** 2 + v[:, 0] ** 2, 1e-4))
    u_new = diffuse(u, km, -sfc["cd"] * spd1 * u[:, 0])
    v_new = diffuse(v, km, -sfc["cd"] * spd1 * v[:, 0])

    # --- mym_predict: TKE prognosis (ref :1353-1600) --------------------
    # production at interfaces
    pdk = elq * (sm * gm + sh * gh)                # q^3-rate (m^2/s^3)
    # map to layers
    zero1 = jnp.zeros_like(qke[:, :1])
    p_lyr = 0.5 * (jnp.concatenate([zero1, pdk], axis=1)
                   + jnp.concatenate([pdk, zero1], axis=1))
    el_lyr = 0.5 * (jnp.concatenate([el[:, :1], el], axis=1)
                    + jnp.concatenate([el, el[:, -1:]], axis=1))
    q_lyr = jnp.sqrt(jnp.maximum(qke, QKE_MIN))
    # implicit dissipation: qke_new = (qke + 2 dt P)/(1 + 2 dt q/(B1 l))
    bp = 2.0 * q_lyr / (B1 * jnp.maximum(el_lyr, 1.0))
    qke_new = (qke + dt * 2.0 * p_lyr) / (1.0 + dt * bp)
    # surface TKE (ref :1399-1404 via mym_initialize closure): phi_m at
    # z1 = 0.5 dz
    zet = 0.5 * dz[:, 0] * rmo
    phi_m = jnp.where(zet >= 0.0, 1.0 + CNS * jnp.minimum(zet, ZMAX),
                      jnp.maximum(1.0 - ALP4 * zet, 1e-4) ** (-0.2))
    wstar3 = jnp.maximum(GTR * wthv * h_pbl, 0.0)
    qke_sfc = B1 ** (2.0 / 3.0) * (ust ** 2 * phi_m ** (2.0 / 3.0)
                                   + 0.5 * wstar3 ** (2.0 / 3.0))
    qke_new = qke_new.at[:, 0].set(jnp.maximum(qke_sfc, QKE_MIN))
    qke_new = diffuse(jnp.maximum(qke_new, QKE_MIN), kq,
                      jnp.zeros_like(qke_sfc))
    qke_new = jnp.clip(qke_new, QKE_MIN, 150.0)
    return u_new, v_new, th_new, qv_new, h_pbl, qke_new
