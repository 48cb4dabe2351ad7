"""YSU nonlocal boundary-layer scheme.

ref: src/core_atmosphere/physics/mpas_atmphys_driver_pbl.F +
physics_wrf/module_bl_ysu.F (Hong, Noh & Dudhia 2006): bulk-Richardson PBL
height, K-profile eddy diffusivity K = k ws z (1 - z/h)^2, countergradient
heat transport, entrainment at the PBL top, implicit vertical diffusion.

TPU redesign: the PBL-height search and the vertical implicit solve are
masked vector ops + one batched Thomas solve per variable; no per-column
Python control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity
from mpas_tpu.ops.matrix import tridiagonal_solve

_KARMAN = 0.4
_RICR = 0.25        # critical bulk Richardson (ref ysu: 0.25 over land)
_PFAC = 2.0
_BFAC = 6.8         # countergradient coefficient b (ref: module_bl_ysu)


def pbl_height(z, thv, spd2, hfx_v, ust, thv_sfc):
    """Bulk-Richardson PBL height (first level where Rib >= Ricr),
    linearly interpolated. z, thv, spd2: (nCells, nz); surface values
    (nCells,). ref: module_bl_ysu.F hpbl diagnosis."""
    rib = gravity * z * (thv - thv_sfc[:, None]) \
        / (thv_sfc[:, None] * jnp.maximum(spd2, 0.01))
    above = rib >= _RICR
    nz = z.shape[1]
    k_top = jnp.argmax(above, axis=1)
    any_above = jnp.any(above, axis=1)
    k_top = jnp.where(any_above & (k_top > 0), k_top, nz - 1)
    rows = jnp.arange(z.shape[0])
    kb = jnp.maximum(k_top - 1, 0)
    r1, r2 = rib[rows, kb], rib[rows, k_top]
    z1, z2 = z[rows, kb], z[rows, k_top]
    frac = jnp.clip((_RICR - r1) / jnp.where(jnp.abs(r2 - r1) > 1e-9,
                                             r2 - r1, 1e-9), 0.0, 1.0)
    h = z1 + frac * (z2 - z1)
    return jnp.maximum(h, z[:, 0] * 1.5)


def ysu(u, v, th, qv, rho, z_mid, dz, sfc, dt):
    """One PBL step. All (nCells, nz) with k=0 the lowest level; `sfc` is
    the sfclay output dict. Returns updated (u, v, th, qv) and hpbl."""
    thv = th * (1.0 + 0.61 * qv)
    spd2 = u * u + v * v
    thv_sfc = thv[:, 0] + 2.0 * jnp.maximum(
        sfc["hfx"], 0.0) / (rho[:, 0] * cp) / jnp.maximum(sfc["ust"], 0.05)
    h = pbl_height(z_mid, thv, spd2, sfc["hfx"], sfc["ust"], thv_sfc)

    # convective velocity scale and mixed-layer velocity ws
    wstar3 = jnp.maximum(gravity / thv[:, 0] * sfc["hfx"]
                         / (rho[:, 0] * cp) * h, 0.0)
    ws = (sfc["ust"] ** 3 + 0.6 * wstar3) ** (1.0 / 3.0)

    # K profile at interfaces between layers (nCells, nz-1)
    z_int = 0.5 * (z_mid[:, :-1] + z_mid[:, 1:])
    zh = jnp.clip(z_int / h[:, None], 0.0, 1.0)
    k_prof = _KARMAN * ws[:, None] * z_int * (1.0 - zh) ** _PFAC
    # free-atmosphere background + entrainment bump near z/h=1
    k_free = 1.0
    kz = jnp.where(zh < 1.0, jnp.maximum(k_prof, 0.1), k_free)

    # countergradient term for theta (ref: gamah = b * hfx/(rho cp ws h))
    gamma_h = _BFAC * sfc["hfx"] / (rho[:, 0] * cp) \
        / jnp.maximum(ws * h, 1e-3)
    gamma_h = jnp.where(sfc["hfx"] > 0.0, gamma_h, 0.0)

    def diffuse(f, kcoef, sflux, counter_grad=None):
        """Implicit vertical diffusion with surface flux bottom BC."""
        dz_int = 0.5 * (dz[:, :-1] + dz[:, 1:])
        g = dt * kcoef / dz_int
        zero = jnp.zeros_like(f[:, :1])
        gu = jnp.concatenate([zero, g], axis=1)
        gl = jnp.concatenate([g, zero], axis=1)
        a = -gu / dz
        c = -gl / dz
        b = 1.0 - a - c
        d = f
        d = d.at[:, 0].add(dt * sflux / dz[:, 0])
        if counter_grad is not None:
            # explicit countergradient flux divergence
            fcg = kcoef * counter_grad[:, None] * (zh < 1.0)
            div = jnp.concatenate([fcg, zero], axis=1) \
                - jnp.concatenate([zero, fcg], axis=1)
            d = d - dt * div / dz
        return tridiagonal_solve(a, b, c, d)

    th_new = diffuse(th, kz, sfc["hfx"] / (rho[:, 0] * cp), gamma_h)
    qv_new = jnp.maximum(diffuse(qv, kz, sfc["qfx"] / rho[:, 0]), 0.0)
    # momentum: surface stress = -cd |U| u implicit-ish via explicit flux
    spd1 = jnp.sqrt(jnp.maximum(spd2[:, 0], 1e-4))
    u_new = diffuse(u, kz, -sfc["cd"] * spd1 * u[:, 0])
    v_new = diffuse(v, kz, -sfc["cd"] * spd1 * v[:, 0])
    return u_new, v_new, th_new, qv_new, h
