"""K-profile parameterization (KPP) ocean boundary-layer mixing.

ref capability: src/core_ocean/shared/mpas_ocn_vmix_cvmix.F (1,007 LoC
CVMix interface, `config_use_cvmix_kpp` path) — the Large, McWilliams &
Doney (1994) scheme as implemented by CVMix: bulk-Richardson boundary
layer depth, Monin-Obukhov stability-dependent turbulent velocity
scales, cubic shape function, matching to interior shear/convective
mixing below, and the non-local (counter-gradient) tracer transport.

TPU-first design: everything is a batched column computation with the
vertical interface dimension in lanes. The boundary-layer depth search
("shallowest interface where Ri_b > Ri_crit") is a masked argmax + linear
interpolation — no data-dependent loops, fully jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import gravity

KAPPA = 0.4          # von Karman
RI_CRIT = 0.3        # CVMix default KPP_Ri_crit
EPS_SL = 0.1         # surface-layer fraction
C_S = 98.96          # unresolved-shear constant (CVMix c_s)
C_V = 1.7            # Vt2 coefficient
BETA_T = -0.2        # entrainment ratio
ZETA_S = -1.0        # unstable-regime match point (scalars)
ZETA_M = -0.2        # (momentum)
A_S = -28.86
A_M = 1.26
C_M = 8.38
NONLOCAL_CS = 6.32739901508     # CVMix Cstar*kappa*(c_s*kappa*eps)^(1/3)


def _w_scales(sigma, hbl, ustar, bflux):
    """Turbulent velocity scales w_m, w_s at sigma = depth/hbl.

    bflux convention here: > 0 = destabilizing (surface buoyancy LOSS).
    Monin-Obukhov length L = -u*^3/(kappa Bf_destab): negative when
    unstable, so zeta = sigma h / L < 0 under convection.
    ref: cvmix_kpp_compute_turbulent_scales (Large et al. eq. 13/B1)."""
    # surface-layer-capped sigma under unstable (destabilizing) forcing
    sig_eff = jnp.where(bflux[..., None] > 0.0,
                        jnp.minimum(sigma, EPS_SL), sigma)
    safe_b = jnp.where(jnp.abs(bflux) < 1e-12, -1e-12, bflux)
    l_mo = -(ustar ** 3) / (KAPPA * safe_b)
    zeta = sig_eff * hbl[..., None] / l_mo[..., None]

    # stable (zeta > 0): w = kappa u* / (1 + 5 zeta)
    w_stab = KAPPA * ustar[..., None] / (1.0 + 5.0 * jnp.maximum(zeta, 0.0))
    # unstable momentum
    zm = jnp.minimum(zeta, 0.0)
    w_m_un = jnp.where(
        zm > ZETA_M,
        KAPPA * ustar[..., None] * (1.0 - 16.0 * zm) ** 0.25,
        KAPPA * ustar[..., None] * (A_M - C_M * zm) ** (1.0 / 3.0))
    w_s_un = jnp.where(
        zm > ZETA_S,
        KAPPA * ustar[..., None] * (1.0 - 16.0 * zm) ** 0.5,
        KAPPA * ustar[..., None] * (A_S - C_S * zm) ** (1.0 / 3.0))
    stable = zeta >= 0.0
    w_m = jnp.where(stable, w_stab, w_m_un)
    w_s = jnp.where(stable, w_stab, w_s_un)
    return w_m, w_s


def surface_forcing_scales(cfg, forcing, rho, tracers):
    """u* (m/s) and surface buoyancy flux Bf (m2/s3, >0 destabilizing).
    ref: cvmix driver computes these from the coupler fluxes
    (mpas_ocn_vmix_cvmix.F surfaceBuoyancyForcing/surfaceFrictionVelocity).
    """
    rho0 = cfg.config_density0
    tau = jnp.sqrt(forcing.windStressZonal ** 2
                   + forcing.windStressMeridional ** 2)
    ustar = jnp.sqrt(tau / rho0)
    # buoyancy gain: g alpha_t Q/(rho0 cp) + g beta_t S FW/rho0
    # (alpha_t/beta_t = 1/rho0 * d(rho)/dT,S from the linear EOS)
    cp = 3996.0
    alpha_t = cfg.config_eos_linear_alpha / rho0   # 1/K
    beta_t = cfg.config_eos_linear_beta / rho0     # 1/psu
    q_net = forcing.sensibleHeatFlux + forcing.shortwaveFlux
    sss = tracers[:, 0, 1]
    b_gain = gravity * alpha_t * q_net / (rho0 * cp) \
        + gravity * beta_t * sss * forcing.freshwaterFlux / rho0
    # return the DESTABILIZING flux (> 0 under surface buoyancy loss)
    return ustar, -b_gain


def boundary_layer_depth(grid, cfg, u, h, rho, ustar, bflux):
    """Bulk-Richardson OBL depth per cell column.
    ref: cvmix_kpp_compute_OBL_depth; Ri_b(z) = (B_r - B(z)) z /
    (|V_r - V(z)|^2 + V_t^2(z))."""
    m = grid.mesh
    rho0 = cfg.config_density0
    # layer-middle depths
    z_mid = jnp.cumsum(h, axis=-1) - 0.5 * h           # positive down
    b = -gravity * rho / rho0                          # buoyancy
    b_ref = b[:, :1]

    # cell-centered speed from edge normal velocities (mean of squares)
    eoc = m.edgesOnCell
    wmask = (m.edgeSignOnCell != 0).astype(u.dtype)
    cnt = jnp.maximum(jnp.sum(wmask, axis=1), 1.0)
    u2_cell = jnp.einsum("ce,cek->ck", wmask, (u ** 2)[eoc]) / cnt[:, None]
    dv2 = jnp.maximum(u2_cell[:, :1] - 2.0 * jnp.sqrt(
        u2_cell[:, :1] * u2_cell) + u2_cell, 0.0) + 1e-10

    # N at layer middles (from local stratification)
    dz = jnp.maximum(0.5 * (h + jnp.roll(h, 1, axis=-1)), 1e-3)
    db = b - jnp.concatenate([b[:, :1], b[:, :-1]], axis=-1)
    n2 = jnp.maximum(-db / dz, 0.0)       # note b decreases downward stable
    n_freq = jnp.sqrt(n2)

    # unresolved shear Vt^2 (Large eq. 23)
    w_m, w_s = _w_scales(jnp.ones_like(rho), jnp.sum(h, -1), ustar, bflux)
    vt2 = (C_V * jnp.sqrt(-BETA_T / (C_S * EPS_SL)) / (RI_CRIT * KAPPA ** 2)
           * z_mid * n_freq * w_s)
    vt2 = jnp.maximum(vt2, 1e-10)

    rib = (b_ref - b) * z_mid / (dv2 + vt2)

    # shallowest depth where rib > RI_CRIT: masked first-crossing + interp
    above = rib > RI_CRIT
    first = jnp.argmax(above, axis=-1)                 # 0 if none/immediate
    any_cross = jnp.any(above, axis=-1)
    nz = rib.shape[-1]
    idx = jnp.clip(first, 1, nz - 1)
    take = lambda a: jnp.take_along_axis(a, idx[:, None], axis=-1)[:, 0]
    take0 = lambda a: jnp.take_along_axis(
        a, jnp.maximum(idx - 1, 0)[:, None], axis=-1)[:, 0]
    r1, r0 = take(rib), take0(rib)
    z1, z0 = take(z_mid), take0(z_mid)
    frac = jnp.clip((RI_CRIT - r0) / jnp.where(
        jnp.abs(r1 - r0) < 1e-12, 1e-12, r1 - r0), 0.0, 1.0)
    hbl = z0 + frac * (z1 - z0)
    col_depth = jnp.sum(h, axis=-1)
    hbl = jnp.where(any_cross, hbl, col_depth)         # mixes to bottom
    # Ekman/Monin-Obukhov limits under stable forcing
    # (ref: cvmix_kpp Ekman & MO depth limitation options)
    return jnp.clip(hbl, 0.5 * h[:, 0], col_depth)


def coefs_kpp(grid, cfg, u, h, rho, forcing=None, tracers=None):
    """KPP diffusivity/viscosity + nonlocal transport coefficient.

    Returns (vert_visc (nEdges, nz-1), vert_diff (nCells, nz-1),
    nonlocal (nCells, nz-1)); the nonlocal term multiplies the surface
    tracer flux in the tracer tendency (ref: vertNonLocalFlux).
    """
    from mpas_tpu.cores.ocean.vmix import coefs_rich
    m = grid.mesh

    if forcing is None:
        ustar = jnp.full((m.nCells,), 1e-3, dtype=u.dtype)
        bflux = jnp.zeros((m.nCells,), dtype=u.dtype)
    else:
        ustar, bflux = surface_forcing_scales(cfg, forcing,
                                              rho, tracers)
    ustar = jnp.maximum(ustar, 1e-4)

    hbl = boundary_layer_depth(grid, cfg, u, h, rho, ustar, bflux)

    # interface depths (interior interfaces, nz-1 of them)
    z_int = jnp.cumsum(h, axis=-1)[:, :-1]            # positive down
    sigma = jnp.clip(z_int / hbl[:, None], 0.0, 1.0)
    w_m, w_s = _w_scales(sigma, hbl, ustar, bflux)
    shape = sigma * (1.0 - sigma) ** 2                # G(sigma)

    k_m_bl = hbl[:, None] * w_m * shape
    k_s_bl = hbl[:, None] * w_s * shape

    # interior mixing below the OBL: shear (Richardson) + background
    visc_int_e, diff_int_c = coefs_rich(grid, cfg, u, h, rho)

    in_bl = z_int < hbl[:, None]
    diff = jnp.where(in_bl, jnp.maximum(k_s_bl, diff_int_c), diff_int_c)

    # momentum: map the cell-based K_m to edges
    coe = m.cellsOnEdge
    k_m_edge = 0.5 * (k_m_bl[coe[:, 0]] + k_m_bl[coe[:, 1]])
    in_bl_edge = 0.5 * ((in_bl.astype(u.dtype))[coe[:, 0]]
                        + (in_bl.astype(u.dtype))[coe[:, 1]]) > 0.5
    visc = jnp.where(in_bl_edge, jnp.maximum(k_m_edge, visc_int_e),
                     visc_int_e)

    # nonlocal transport (unstable only): gamma = Cs G(sigma) (ref LMD
    # eq. 20 as CVMix's flux-fraction form)
    nonlocal_c = jnp.where((bflux > 0.0)[:, None],
                           NONLOCAL_CS * shape, 0.0)
    nonlocal_c = jnp.where(in_bl, nonlocal_c, 0.0)
    return visc, diff, nonlocal_c, hbl
