"""Monin-Obukhov surface layer.

ref: src/core_atmosphere/physics/mpas_atmphys_driver_sfclayer.F +
physics_wrf/module_sf_sfclay.F (Revised MM5 scheme): bulk Richardson
number -> stability regime -> similarity functions -> u*, t*, q* and
surface exchange coefficients/fluxes.

TPU redesign: fixed-count fixed-point iteration (no data-dependent loops),
fully vectorized over cells; Dyer-Businger psi functions with the standard
unstable (Paulson) and stable (Webb) branches.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity

_KARMAN = 0.4
_LV = 2.5e6


def _psi_m(zeta):
    """Momentum stability function (Paulson unstable / Webb stable)."""
    unstable = zeta < 0.0
    x = (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** 0.25
    psi_u = (2.0 * jnp.log(0.5 * (1.0 + x))
             + jnp.log(0.5 * (1.0 + x * x))
             - 2.0 * jnp.arctan(x) + 0.5 * jnp.pi)
    psi_s = -5.0 * jnp.maximum(zeta, 0.0)
    return jnp.where(unstable, psi_u, psi_s)


def _psi_h(zeta):
    unstable = zeta < 0.0
    x = (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** 0.25
    psi_u = 2.0 * jnp.log(0.5 * (1.0 + x * x))
    psi_s = -5.0 * jnp.maximum(zeta, 0.0)
    return jnp.where(unstable, psi_u, psi_s)


def sfclay(u1, v1, th1, qv1, p1, rho1, z1, tsk, qsfc, z0, n_iter: int = 3):
    """Surface-layer similarity solve.

    Inputs at the lowest model level (suffix 1) + skin temperature tsk,
    surface saturation mixing ratio qsfc, roughness z0 (all (nCells,)).
    Returns dict with ust, hfx (W/m2), qfx (kg/m2/s), cd, ch, and
    tendencies are applied by the PBL scheme via these fluxes
    (ref: sfclay outputs consumed by YSU, module_bl_ysu.F).
    """
    spd = jnp.maximum(jnp.sqrt(u1 * u1 + v1 * v1), 0.1)
    thg = tsk * (1.0e5 / jnp.maximum(p1, 1.0)) ** (287.0 / cp)
    dth = th1 - thg
    thv1 = th1 * (1.0 + 0.61 * qv1)

    lnz = jnp.log(z1 / z0)
    # neutral start
    zeta = jnp.zeros_like(spd)
    for _ in range(n_iter):
        psim = _psi_m(zeta)
        psih = _psi_h(zeta)
        ust = _KARMAN * spd / jnp.maximum(lnz - psim, 1.0)
        tst = _KARMAN * dth / jnp.maximum(lnz - psih, 1.0)
        qst = _KARMAN * (qv1 - qsfc) / jnp.maximum(lnz - psih, 1.0)
        # Obukhov length: L = ust^2 thv / (k g tst_v)
        tstv = tst * (1.0 + 0.61 * qv1) + 0.61 * th1 * qst
        l_inv = _KARMAN * gravity * tstv \
            / jnp.maximum(ust * ust, 1e-6) / thv1
        zeta = jnp.clip(z1 * l_inv, -10.0, 2.0)

    ust = jnp.maximum(ust, 0.01)
    hfx = -rho1 * cp * ust * tst         # positive upward when surface warm
    qfx = -rho1 * ust * qst
    cd = (ust / spd) ** 2
    ch = ust * (-tst) / jnp.maximum(spd * dth * jnp.sign(dth) + 1e-12, 1e-12)
    return {"ust": ust, "hfx": hfx, "qfx": qfx, "lh": _LV * qfx,
            "cd": cd, "zeta": zeta, "tst": tst, "qst": qst}
