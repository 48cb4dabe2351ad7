"""Vertical mixing coefficient schemes.

ref: src/core_ocean/shared/mpas_ocn_vmix.F (driver + implicit solves) and
the coefficient builders: mpas_ocn_vmix_coefs_const.F,
mpas_ocn_vmix_coefs_rich.F (Richardson; visc :258-282, diff :362-385),
mpas_ocn_vmix_coefs_tanh.F, mpas_ocn_vmix_cvmix.F (CVMix interface — the
convective-instability branch is reproduced here).

Each builder returns interface coefficients:
  vert_visc: (nEdges, nz-1)  at interior interfaces of edge columns
  vert_diff: (nCells, nz-1)  at interior interfaces of cell columns
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import gravity


def richardson_number(grid, cfg, u, h, rho):
    """Ri at interior cell interfaces: N^2 / shear^2.

    ref: ocn_vmix_get_rich_numbers (mpas_ocn_vmix_coefs_rich.F:403+):
    du2TopOfEdge from vertical velocity differences (:551), buoyancy from
    the displaced-density difference, Ri = -g/rho0 * d(rho)/dz / shear^2.
    """
    m = grid.mesh
    rho0 = cfg.config_density0
    h_mid = 0.5 * (h[:, :-1] + h[:, 1:])                  # (nCells, nz-1)
    drho = rho[:, 1:] - rho[:, :-1]                       # >0 stable
    n2 = (gravity / rho0) * drho / jnp.maximum(h_mid, 1e-3)

    du2_edge = (u[:, :-1] - u[:, 1:]) ** 2                # (nEdges, nz-1)
    # edge -> cell mean (ref averages du2 onto cells, :560-572)
    eoc = m.edgesOnCell
    w = (m.edgeSignOnCell != 0).astype(u.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    du2_cell = jnp.einsum("ce,cek->ck", w, du2_edge[eoc]) / cnt[:, None]
    shear2 = du2_cell / jnp.maximum(h_mid, 1e-3) ** 2

    ri = n2 / jnp.maximum(shear2, 1e-12)
    coe = m.cellsOnEdge
    ri_edge = 0.5 * (ri[coe[:, 0]] + ri[coe[:, 1]])
    return ri, ri_edge


def coefs_const(grid, cfg, u, h, rho):
    """ref: mpas_ocn_vmix_coefs_const.F."""
    nzm1 = grid.nz - 1
    visc = jnp.full((grid.mesh.nEdges, nzm1), cfg.config_vert_visc,
                    dtype=u.dtype)
    diff = jnp.full((grid.mesh.nCells, nzm1), cfg.config_vert_diff,
                    dtype=u.dtype)
    return visc, diff


def coefs_rich(grid, cfg, u, h, rho):
    """Richardson-number dependent Pacanowski-Philander mixing.
    ref: mpas_ocn_vmix_coefs_rich.F:258-282 (visc), :362-385 (diff)."""
    ri_cell, ri_edge = richardson_number(grid, cfg, u, h, rho)
    bk_v = cfg.config_bkrd_vert_visc
    bk_d = cfg.config_bkrd_vert_diff
    mix = cfg.config_rich_mix

    den_e = (1.0 + 5.0 * jnp.maximum(ri_edge, 0.0)) ** 2
    visc = jnp.where(
        ri_edge > 0.0,
        jnp.minimum(bk_v + mix / den_e, cfg.config_convective_visc),
        cfg.config_convective_visc)

    den_c = 1.0 + 5.0 * jnp.maximum(ri_cell, 0.0)
    diff = jnp.where(
        ri_cell > 0.0,
        jnp.minimum(bk_d + (bk_v + mix / den_c ** 2) / den_c,
                    cfg.config_convective_diff),
        cfg.config_convective_diff)
    return visc, diff


def coefs_tanh(grid, cfg, u, h, rho):
    """Depth-profile tanh mixing (max near the surface, min at depth).
    ref: mpas_ocn_vmix_coefs_tanh.F:220-223: coef(k) =
    -(max-min)/2 * tanh((refBottomDepth(k-1) + zMid)/zWidth) + (max+min)/2
    with positive depth and negative zMid."""
    # positive interface depths from layer thicknesses
    depth_int = jnp.cumsum(h, axis=-1)[:, :-1]           # (nCells, nz-1)
    zmid = cfg.config_tanh_zmid
    width = cfg.config_tanh_zwidth

    def prof(vmax, vmin, d):
        return (-(vmax - vmin) * 0.5 * jnp.tanh((d + zmid) / width)
                + (vmax + vmin) * 0.5)

    diff = prof(cfg.config_max_diff_tanh, cfg.config_min_diff_tanh,
                depth_int)
    coe = grid.mesh.cellsOnEdge
    d_edge = 0.5 * (depth_int[coe[:, 0]] + depth_int[coe[:, 1]])
    visc = prof(cfg.config_max_visc_tanh, cfg.config_min_visc_tanh, d_edge)
    return visc, diff


def coefs_cvmix_convection(grid, cfg, u, h, rho):
    """Convective-instability mixing (the CVMix convection scheme of
    mpas_ocn_vmix_cvmix.F): background values, raised to convective values
    wherever the column is statically unstable (N^2 < 0)."""
    visc, diff = coefs_const(grid, cfg, u, h, rho)
    unstable_c = (rho[:, 1:] - rho[:, :-1]) < 0.0        # (nCells, nz-1)
    diff = jnp.where(unstable_c, cfg.config_convective_diff, diff)
    coe = grid.mesh.cellsOnEdge
    unstable_e = unstable_c[coe[:, 0]] | unstable_c[coe[:, 1]]
    visc = jnp.where(unstable_e, cfg.config_convective_visc, visc)
    return visc, diff


def coefs_cvmix_shear(grid, cfg, u, h, rho):
    """CVMix shear-instability interior mixing
    (ref: mpas_ocn_vmix_cvmix.F's cvmix_shear block,
    config_cvmix_shear_mixing_scheme):
      'KPP' = LMD94:  nu = nu0 * (1 - (Ri/Ri0)^2)^3  for 0 < Ri < Ri0
      'PP'  = Pacanowski-Philander: nu = nu0/(1+5Ri)^2, kappa = nu/(1+5Ri)
    Returns the SHEAR contribution only (added to background by the
    cvmix driver)."""
    ri_cell, ri_edge = richardson_number(grid, cfg, u, h, rho)
    scheme = getattr(cfg, "config_cvmix_shear_mixing_scheme", "KPP")
    if scheme == "PP":
        nu0 = getattr(cfg, "config_cvmix_shear_pp_nu_zero", 5.0e-3)
        alpha = 5.0
        visc = nu0 / (1.0 + alpha * jnp.maximum(ri_edge, 0.0)) ** 2
        diff = (nu0 / (1.0 + alpha * jnp.maximum(ri_cell, 0.0)) ** 2) \
            / (1.0 + alpha * jnp.maximum(ri_cell, 0.0))
        return visc, diff
    nu0 = getattr(cfg, "config_cvmix_shear_kpp_nu_zero", 5.0e-3)
    ri0 = getattr(cfg, "config_cvmix_shear_kpp_Ri_zero", 0.7)
    expo = getattr(cfg, "config_cvmix_shear_kpp_exp", 3.0)

    def lmd(ri):
        x = jnp.clip(ri / ri0, 0.0, 1.0)
        return nu0 * (1.0 - x * x) ** expo
    return lmd(jnp.maximum(ri_edge, 0.0)), lmd(jnp.maximum(ri_cell, 0.0))


def coefs_cvmix_tidal(grid, cfg, u, h, rho):
    """CVMix tidal mixing, Simmons et al. (2004) genre
    (ref: mpas_ocn_vmix_cvmix.F cvmix_tidal block):
      kappa(z) = q * Gamma * E(x,y) * F(z) / (rho * max(N^2, N2min))
      F(z) = exp(-(H - d)/zeta) / (zeta * (1 - exp(-H/zeta)))
    E: column tidal energy flux (W/m2) — grid.tidalEnergyFlux when
    present, else the config constant."""
    m = grid.mesh
    q = getattr(cfg, "config_cvmix_tidal_mixing_q", 0.33)
    gam = getattr(cfg, "config_cvmix_tidal_efficiency", 0.2)
    zeta = getattr(cfg, "config_cvmix_tidal_vertical_decay_scale", 500.0)
    e_flux = getattr(grid, "tidalEnergyFlux", None)
    if e_flux is None:
        e_flux = jnp.full((m.nCells,),
                          getattr(cfg, "config_cvmix_tidal_energy_flux",
                                  1.0e-3), dtype=u.dtype)
    rho0 = cfg.config_density0
    h_mid = 0.5 * (h[:, :-1] + h[:, 1:])
    drho = rho[:, 1:] - rho[:, :-1]
    n2 = (gravity / rho0) * drho / jnp.maximum(h_mid, 1e-3)
    n2 = jnp.maximum(n2, 1.0e-8)
    depth_int = jnp.cumsum(h, axis=-1)[:, :-1]           # interface depth
    hcol = jnp.sum(h, axis=-1, keepdims=True)
    fz = jnp.exp(-(hcol - depth_int) / zeta) \
        / (zeta * jnp.maximum(1.0 - jnp.exp(-hcol / zeta), 1e-6))
    diff = q * gam * e_flux[:, None] * fz / (rho0 * n2)
    diff = jnp.minimum(diff, getattr(cfg, "config_cvmix_tidal_max", 0.05))
    coe = m.cellsOnEdge
    visc = 0.5 * (diff[coe[:, 0]] + diff[coe[:, 1]])
    return visc, diff


def coefs_cvmix_double_diffusion(grid, cfg, tracers, h):
    """CVMix double diffusion (LMD94 salt fingering + diffusive
    convection; ref: mpas_ocn_vmix_cvmix.F cvmix_ddiff block). Returns
    the DIFFUSIVITY contribution at cell interfaces (viscosity effect is
    negligible and omitted, as in CVMix defaults)."""
    t = tracers[..., 0]
    s = tracers[..., 1]
    alpha = cfg.config_eos_linear_alpha
    beta = cfg.config_eos_linear_beta
    dT = t[:, :-1] - t[:, 1:]       # positive: warm over cold
    dS = s[:, :-1] - s[:, 1:]
    num = alpha * dT
    den = beta * dS
    r_rho = num / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
    # salt fingering: warm-salty over cold-fresh, 1 < R_rho < 1.9
    rr0 = 1.9
    kap_max = 1.0e-4
    x = jnp.clip((r_rho - 1.0) / (rr0 - 1.0), 0.0, 1.0)
    finger = jnp.where((num > 0) & (den > 0) & (r_rho > 1.0),
                       kap_max * (1.0 - x) ** 3, 0.0)
    # diffusive convection: cold-fresh over warm-salty, 0 < R_rho < 1
    mol = 1.4e-7
    rr = jnp.clip(r_rho, 1e-3, 1.0)
    dc = jnp.where((num < 0) & (den < 0) & (r_rho < 1.0) & (r_rho > 0.0),
                   mol * 0.909 * jnp.exp(
                       4.6 * jnp.exp(-0.54 * (1.0 / rr - 1.0))), 0.0)
    return finger + dc


def coefs_cvmix(grid, cfg, u, h, rho, tracers=None):
    """CVMix driver: background + enabled interior schemes (shear, tidal,
    double diffusion), convective-instability values applied last —
    mirroring ocn_vmix_coefs_cvmix_build's accumulation order
    (ref: mpas_ocn_vmix_cvmix.F:169-420)."""
    visc, diff = coefs_const(grid, cfg, u, h, rho)
    if getattr(cfg, "config_use_cvmix_shear", False):
        v2, d2 = coefs_cvmix_shear(grid, cfg, u, h, rho)
        visc = visc + v2
        diff = diff + d2
    if getattr(cfg, "config_use_cvmix_tidal_mixing", False):
        v3, d3 = coefs_cvmix_tidal(grid, cfg, u, h, rho)
        visc = visc + v3
        diff = diff + d3
    if getattr(cfg, "config_use_cvmix_double_diffusion", False) \
            and tracers is not None and tracers.shape[-1] >= 2:
        diff = diff + coefs_cvmix_double_diffusion(grid, cfg, tracers, h)
    if getattr(cfg, "config_use_cvmix_convection", True):
        unstable_c = (rho[:, 1:] - rho[:, :-1]) < 0.0
        diff = jnp.where(unstable_c, cfg.config_convective_diff, diff)
        coe = grid.mesh.cellsOnEdge
        unstable_e = unstable_c[coe[:, 0]] | unstable_c[coe[:, 1]]
        visc = jnp.where(unstable_e, cfg.config_convective_visc, visc)
    return visc, diff


_SCHEMES = {
    "const": coefs_const,
    "rich": coefs_rich,
    "tanh": coefs_tanh,
    "cvmix": coefs_cvmix_convection,
}


def build_coefs(grid, cfg, u, h, rho, forcing=None, tracers=None):
    """Scheme dispatcher (ref: ocn_vmix_coefs_build, mpas_ocn_vmix.F).
    Returns (vert_visc, vert_diff, nonlocal-or-None); the nonlocal
    coefficient is only produced by the KPP scheme."""
    scheme = getattr(cfg, "config_vert_mix_scheme", "const")
    if scheme in ("kpp", "cvmix_kpp"):
        from mpas_tpu.cores.ocean.kpp import coefs_kpp
        visc, diff, nonlocal_c, _hbl = coefs_kpp(
            grid, cfg, u, h, rho, forcing=forcing, tracers=tracers)
        return visc, diff, nonlocal_c
    if scheme == "cvmix" and (
            getattr(cfg, "config_use_cvmix_shear", False)
            or getattr(cfg, "config_use_cvmix_tidal_mixing", False)
            or getattr(cfg, "config_use_cvmix_double_diffusion", False)):
        visc, diff = coefs_cvmix(grid, cfg, u, h, rho, tracers=tracers)
        return visc, diff, None
    visc, diff = _SCHEMES[scheme](grid, cfg, u, h, rho)
    return visc, diff, None
