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
    visc, diff = _SCHEMES[scheme](grid, cfg, u, h, rho)
    return visc, diff, None
