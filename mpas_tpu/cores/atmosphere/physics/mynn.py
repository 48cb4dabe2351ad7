"""MYNN level-2.5 TKE boundary-layer scheme.

ref capability: src/core_atmosphere/physics/physics_wrf/
module_bl_mynn.F (Nakanishi & Niino 2006/2009 mellor-yamada level 2.5):
prognostic TKE (qke = 2e), blended master length scale (surface +
turbulent + buoyancy limits), level-2.5 stability functions Sm/Sh, eddy
coefficients K_m = l q Sm / K_h = l q Sh, implicit vertical diffusion of
momentum/heat/moisture/TKE with shear and buoyancy production and
q^3/(B1 l) dissipation.

TPU-first: prognostic qke is carried in PhysicsState; the whole scheme is
batched column algebra + four Thomas solves, no per-column control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity
from mpas_tpu.ops.matrix import tridiagonal_solve

_KARMAN = 0.4
# MYNN closure constants (NN2009)
A1 = 1.18
A2 = 0.665
B1 = 24.0
B2 = 15.0
C1 = 0.137
G1 = 0.235
QKE_MIN = 1.0e-4


def _length_scale(z, qke, n2, ust, h_pbl):
    """Blended master length: 1/l = 1/ls + 1/lt + 1/lb.
    ref: mym_length (module_bl_mynn.F)."""
    ls = _KARMAN * z                                   # surface layer
    lt = jnp.maximum(0.23 * h_pbl, 50.0)[:, None]      # turbulent scale
    q = jnp.sqrt(jnp.maximum(qke, QKE_MIN))
    lb = jnp.where(n2 > 1e-10, q / jnp.sqrt(jnp.maximum(n2, 1e-10)),
                   1.0e10)
    inv = 1.0 / ls + 1.0 / lt + 1.0 / jnp.maximum(lb, 1.0)
    return 1.0 / inv


def _stability_funcs(gh):
    """Level-2.5 stability functions of G_h = -(l/q)^2 N^2.
    ref: mym_turbulence Sm/Sh closure (simplified regression of the NN
    level-2.5 solution, monotone in gh with the proper neutral limits)."""
    gh = jnp.clip(gh, -2.0, 0.0699)
    sh = A2 * (1.0 - 3.0 * A2 * B2 * gh) / (1.0 - 9.0 * A1 * A2 * gh) ** 2
    sm = (A1 * (1.0 - 3.0 * C1 - 9.0 * A1 * A2 * gh)
          / (1.0 - 9.0 * A1 * A2 * gh) ** 2)
    return jnp.maximum(sm, 0.0), jnp.maximum(sh, 0.0)


def mynn(u, v, th, qv, rho, z_mid, dz, sfc, qke, dt):
    """One MYNN-2.5 step. Signature matches ysu() plus the prognostic qke
    (nCells, nz); returns (u, v, th, qv, hpbl, qke_new)."""
    thv = th * (1.0 + 0.61 * qv)

    # interface quantities (nCells, nz-1)
    dz_int = 0.5 * (dz[:, :-1] + dz[:, 1:])
    z_int = 0.5 * (z_mid[:, :-1] + z_mid[:, 1:])
    du = (u[:, 1:] - u[:, :-1]) / dz_int
    dv = (v[:, 1:] - v[:, :-1]) / dz_int
    shear2 = du * du + dv * dv
    dthv = (thv[:, 1:] - thv[:, :-1]) / dz_int
    n2 = gravity / (0.5 * (thv[:, 1:] + thv[:, :-1])) * dthv

    # PBL height: first level where integrated thv exceeds sfc thv + 0.5K
    thv_sfc = thv[:, 0] + 1.5 * jnp.maximum(sfc["hfx"], 0.0) \
        / (rho[:, 0] * cp) / jnp.maximum(sfc["ust"], 0.05)
    above = thv > (thv_sfc[:, None] + 0.5)
    k_top = jnp.argmax(above, axis=1)
    any_above = jnp.any(above, axis=1)
    rows = jnp.arange(u.shape[0])
    h_pbl = jnp.where(any_above, z_mid[rows, k_top], z_mid[:, -1])
    h_pbl = jnp.maximum(h_pbl, 1.5 * z_mid[:, 0])

    qke_int = 0.5 * (qke[:, :-1] + qke[:, 1:])
    q_int = jnp.sqrt(jnp.maximum(qke_int, QKE_MIN))
    ll = _length_scale(z_int, qke_int, n2, sfc["ust"], h_pbl)
    gh = -(ll / q_int) ** 2 * n2
    sm, sh = _stability_funcs(gh)
    km = jnp.maximum(ll * q_int * sm, 0.1)
    kh = jnp.maximum(ll * q_int * sh, 0.1)

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

    th_new = diffuse(th, kh, sfc["hfx"] / (rho[:, 0] * cp))
    qv_new = jnp.maximum(diffuse(qv, kh, sfc["qfx"] / rho[:, 0]), 0.0)
    spd1 = jnp.sqrt(jnp.maximum(u[:, 0] ** 2 + v[:, 0] ** 2, 1e-4))
    u_new = diffuse(u, km, -sfc["cd"] * spd1 * u[:, 0])
    v_new = diffuse(v, km, -sfc["cd"] * spd1 * v[:, 0])

    # --- TKE budget: production - dissipation, then vertical transport ---
    prod_s = km * shear2                               # shear production
    prod_b = -kh * n2                                  # buoyancy production
    # map interface production to layers (adjacent mean)
    zero1 = jnp.zeros_like(qke[:, :1])
    p_int = prod_s + prod_b
    p_lyr = 0.5 * (jnp.concatenate([zero1, p_int], axis=1)
                   + jnp.concatenate([p_int, zero1], axis=1))
    q_lyr = jnp.sqrt(jnp.maximum(qke, QKE_MIN))
    l_lyr = 0.5 * (jnp.concatenate([ll[:, :1], ll], axis=1)
                   + jnp.concatenate([ll, ll[:, -1:]], axis=1))
    diss = q_lyr ** 3 / (B1 * jnp.maximum(l_lyr, 1.0))
    # surface TKE: similarity value from u* and the convective velocity
    # scale w* (ref: mym_initialize/PBL surface TKE closure)
    wstar3 = jnp.maximum(gravity / thv[:, 0] * sfc["hfx"]
                         / (rho[:, 0] * cp) * h_pbl, 0.0)
    qke_sfc = B1 ** (2.0 / 3.0) * (sfc["ust"] ** 2
                                   + 0.5 * wstar3 ** (2.0 / 3.0))
    # d(q^2)/dt = 2(Ps+Pb) - 2 q^3/(B1 l): the factor 2 applies to BOTH
    # production and dissipation (qke = q^2)
    qke_new = qke + dt * 2.0 * (p_lyr - diss)
    qke_new = qke_new.at[:, 0].set(jnp.maximum(qke_sfc, QKE_MIN))
    qke_new = diffuse(jnp.maximum(qke_new, QKE_MIN), 3.0 * km,
                      jnp.zeros_like(qke_sfc))
    qke_new = jnp.clip(qke_new, QKE_MIN, 100.0)
    return u_new, v_new, th_new, qv_new, h_pbl, qke_new
