"""MYNN surface layer (Nakanishi-Niino companion scheme).

ref: src/core_atmosphere/physics/physics_wrf/module_sf_mynn.F —
  SFCLAY1D_mynn    (:419)  Monin-Obukhov iteration with surface-type-
                           dependent roughness closures
  charnock_1955    (:1392) variable-Charnock z0 over water (COARE3.0)
  garratt_1992     (:1414) zt/zq from the roughness Reynolds number
  andreas_2002     (:1553) zt/zq over snow/ice
  PSI_Hogstrom_1996(:1583) stability functions
  zilitinkevich_1995(:1240) land zt/zq option

TPU redesign: the per-point iterative MO solve becomes a fixed number of
vectorized Newton-free iterations over all cells at once (the reference
also iterates a fixed count); every surface-type branch is a masked
select so land/water/ice columns ride the same fused kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_KARMAN = 0.4
_E2 = jnp.exp(2.0)


def _viscosity(t):
    """Kinematic viscosity of air (ref :647 visc=1.32e-5*(1+0.0066*tc))."""
    return 1.32e-5 * (1.0 + 0.0066 * (t - 273.15))


def _charnock_z0(ust, wsp10, visc):
    """Variable-Charnock aerodynamic roughness over water (ref :1392)."""
    czc = 0.011 + 0.007 * jnp.clip((wsp10 - 10.0) / 8.0, 0.0, 1.0)
    return czc * ust * ust / gravity + 0.11 * visc / jnp.maximum(ust, 0.1)


def _garratt_ztzq(z0, ren, water):
    """Thermal/moisture roughness (ref garratt_1992 :1414)."""
    zt_w = jnp.clip(z0 * jnp.exp(2.0 - 2.48 * ren ** 0.25), 2e-9, 5.5e-5)
    zq_w = jnp.clip(z0 * jnp.exp(2.0 - 2.28 * ren ** 0.25), 2e-9, 5.5e-5)
    zt_l = z0 / _E2
    return jnp.where(water, zt_w, zt_l), jnp.where(water, zq_w, zt_l)


def _andreas_ztzq(z0, ren):
    """zt/zq over snow/ice (ref andreas_2002 :1553)."""
    r = jnp.clip(ren, 1e-3, 1000.0)
    ln = jnp.log(r)
    smooth = r <= 0.135
    trans = (r > 0.135) & (r < 2.5)
    bt = jnp.where(smooth, 1.25,
                   jnp.where(trans, 0.149 - 0.55 * ln,
                             0.317 - 0.565 * ln - 0.183 * ln * ln))
    bq = jnp.where(smooth, 1.61,
                   jnp.where(trans, 0.351 - 0.628 * ln,
                             0.396 - 0.512 * ln - 0.180 * ln * ln))
    return z0 * jnp.exp(bt), z0 * jnp.exp(bq)


def _psi_hogstrom(zl, zt, z0, za):
    """Hogstrom (1996) stability functions (ref :1583)."""
    zml = z0 * zl / za
    zhl = zt * zl / za
    # stable branch
    psim_s = -5.3 * (zl - zml)
    psih_s = -8.0 * (zl - zhl)
    # unstable branch
    zl_n = jnp.minimum(zl, 0.0)
    zml_n = jnp.minimum(zml, 0.0)
    zhl_n = jnp.minimum(zhl, 0.0)
    x = (1.0 - 19.0 * zl_n) ** 0.25
    x0 = (1.0 - 19.0 * zml_n) ** 0.25
    y = jnp.sqrt(1.0 - 11.6 * zl_n)
    y0 = jnp.sqrt(1.0 - 11.6 * zhl_n)
    psim_u = (2.0 * jnp.log((1.0 + x) / (1.0 + x0))
              + jnp.log((1.0 + x * x) / (1.0 + x0 * x0))
              - 2.0 * jnp.arctan(x) + 2.0 * jnp.arctan(x0))
    psih_u = 2.0 * jnp.log((1.0 + y) / (1.0 + y0))
    stable = zl > 0.0
    return (jnp.where(stable, psim_s, psim_u),
            jnp.where(stable, psih_s, psih_u))


def mynn_sfclay(u1, v1, th1, qv1, p1, rho1, z1, tsk, qsfc,
                xland=None, snowice=None, z0_land=0.1, n_iter=5):
    """MYNN surface-layer fluxes.

    u1..z1: lowest-model-level fields (nCells,); tsk/qsfc surface values;
    xland 1=land 2=water (None -> all land); snowice bool mask.
    Returns dict(ust, hfx, qfx, lh, rmol, wspd, psim, psih, znt, zt, qke_sfc)
    (ref SFCLAY1D_mynn outputs; qke_sfc is the MYNN surface TKE lower BC
    1.5 * ust^2 / ... ref module_bl_mynn qke at k=1)."""
    water = jnp.zeros_like(tsk, bool) if xland is None else (xland > 1.5)
    ice = jnp.zeros_like(tsk, bool) if snowice is None else snowice
    t1 = th1 * (p1 / 1.0e5) ** (2.0 / 7.0)
    thv1 = th1 * (1.0 + 0.61 * qv1)
    thsk = tsk * (1.0e5 / p1) ** (2.0 / 7.0)
    thvsk = thsk * (1.0 + 0.61 * qsfc)
    visc = _viscosity(t1)

    # gustiness-enhanced wind (ref: VCONVC convective velocity)
    wspd0 = jnp.sqrt(u1 * u1 + v1 * v1)
    dthv = thvsk - thv1
    vconv = jnp.where(dthv > 0.0,
                      (gravity / jnp.maximum(thv1, 1.0)
                       * jnp.maximum(dthv, 0.0) * 1000.0) ** (1.0 / 3.0),
                      0.0)
    wspd = jnp.maximum(jnp.sqrt(wspd0 ** 2 + vconv ** 2), 0.1)

    # bulk Richardson first guess (ref BRi)
    br = gravity * z1 * (thv1 - thvsk) / (thv1 * wspd * wspd)
    zeta = jnp.clip(jnp.where(br >= 0.0,
                              br * 10.0 / jnp.maximum(1.0 - 5.0 * br, 0.1)
                              / 10.0, br), -5.0, 2.0)

    znt = jnp.where(water, 1e-4, z0_land) * jnp.ones_like(tsk)
    ust = _KARMAN * wspd / jnp.log(z1 / znt)
    zt = znt / _E2
    psim = jnp.zeros_like(tsk)
    psih = jnp.zeros_like(tsk)
    for _ in range(n_iter):
        # roughness closures by surface type
        z0_w = _charnock_z0(ust, wspd0, visc)
        znt = jnp.where(water, z0_w, z0_land)
        ren = ust * znt / visc
        zt_g, zq_g = _garratt_ztzq(znt, ren, water)
        zt_i, zq_i = _andreas_ztzq(znt, ren)
        zt = jnp.where(ice, zt_i, zt_g)
        zq = jnp.where(ice, zq_i, zq_g)

        psim, psih = _psi_hogstrom(zeta, zt, znt, z1)
        lnzz0 = jnp.log((z1 + znt) / znt)
        lnzzt = jnp.log((z1 + zt) / zt)
        ust = jnp.maximum(_KARMAN * wspd / (lnzz0 - psim), 1e-3)
        tstar = _KARMAN * (thv1 - thvsk) / (lnzzt - psih)
        # Obukhov length update (ref rmol = 1/L)
        lmo = thv1 * ust * ust / (_KARMAN * gravity
                                  * jnp.where(jnp.abs(tstar) > 1e-10,
                                              tstar, 1e-10))
        zeta = jnp.clip(z1 / lmo, -5.0, 2.0)

    lnzzt = jnp.log((z1 + zt) / zt)
    lnzzq = jnp.log((z1 + zq) / zq)
    chs = ust * _KARMAN / (lnzzt - psih)
    cqs = ust * _KARMAN / (lnzzq - psih)
    hfx = rho1 * cp * chs * (thsk - th1)
    qfx = rho1 * cqs * (qsfc - qv1)
    lh = 2.5e6 * qfx
    rmol = 1.0 / jnp.where(jnp.abs(lmo) > 1e-10, lmo, 1e-10)
    # MYNN surface TKE lower boundary (ref module_bl_mynn: qke(kts) =
    # B1^(2/3) u*^2 with B1 = 24)
    qke_sfc = 24.0 ** (2.0 / 3.0) * ust * ust
    return {"ust": ust, "hfx": hfx, "qfx": qfx, "lh": lh, "rmol": rmol,
            "wspd": wspd, "psim": psim, "psih": psih, "znt": znt,
            "zt": zt, "qke_sfc": qke_sfc, "chs": chs, "br": br}
