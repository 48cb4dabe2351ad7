"""Scalar transport: Skamarock & Gassmann (2011) 3rd/4th-order flux-form
advection with optional Zalesak positive-definite/monotonic limiting.

ref: atm_advance_scalars_work (src/core_atmosphere/dynamics/
mpas_atm_time_integration.F:3238) and atm_advance_scalars_mono_work (:3612).
Re-design: all scalars advance together as a trailing axis (the reference
loops one scalar at a time to bound scratch memory; on TPU the scalar axis
rides the lanes with the vertical), and the limiter is fully vectorized —
masked min/max over the cell neighborhood instead of per-cell loops.

Shapes: scalars (nCells, nz, nS); ruAvg (nEdges, nz); wwAvg (nCells, nz+1).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.setup import AtmGrid

EPS = 1.0e-20


def _edge_flux_value(grid: AtmGrid, psi, uh):
    """High-order edge value sum_j (A + sign(uh)*A3)*psi[adv_j]
    (includes the dvEdge factor baked into adv_coefs).  Uses the
    cell-assembled factorization (advection.py) when available."""
    if grid.d2_bmat is not None:
        from mpas_tpu.cores.atmosphere.advection import edge_value_parts
        base, third = edge_value_parts(grid, psi)
        return base + jnp.sign(uh)[..., None] * third
    g = psi[grid.advCellsForEdge]                     # (nE, NA, nz, nS)
    base = jnp.einsum("ej,ejks->eks", grid.adv_coefs, g)
    third = jnp.einsum("ej,ejks->eks", grid.adv_coefs_3rd, g)
    return base + jnp.sign(uh)[..., None] * third


def _vert_flux3(grid: AtmGrid, psi, ww, coef3):
    """flux3 vertical flux of psi (nC, nz, nS) with interface mass ww."""
    nz = grid.vert.nz
    fzm, fzp = grid.vert.fzm, grid.vert.fzp
    wI = ww[..., None]
    second = wI[:, 1:nz] * (fzm[1:nz, None] * psi[:, 1:]
                            + fzp[1:nz, None] * psi[:, :-1])
    qm2 = psi[:, 0:nz - 3]
    qm1 = psi[:, 1:nz - 2]
    qi = psi[:, 2:nz - 1]
    qp1 = psi[:, 3:nz]
    m = wI[:, 2:nz - 1]
    f4 = m * (7.0 * (qi + qm1) - (qp1 + qm2)) / 12.0
    f3 = f4 + coef3 * jnp.abs(m) * ((qp1 - qm2) - 3.0 * (qi - qm1)) / 12.0
    zero = jnp.zeros_like(psi[:, :1])
    return jnp.concatenate([zero, second[:, :1], f3,
                            second[:, nz - 2:nz - 1], zero], axis=1)


def _rho_int(grid: AtmGrid, rho_old, ruAvg, wwAvg, dt):
    """Re-integrated density from the time-averaged fluxes
    (ref mono :3755-3775)."""
    mesh = grid.mesh
    div = jnp.sum(mesh.divW[..., None] * ruAvg[mesh.edgesOnCell], axis=1) \
        * mesh.invAreaCell[:, None]
    return rho_old + dt * (-div - grid.vert.rdzw
                           * (wwAvg[:, 1:] - wwAvg[:, :-1]))


def _time_weight(rk_step, order, advance_density):
    if not advance_density:
        return 1.0
    if rk_step == 1:
        return 1.0 / 3.0 if order == 3 else 0.5
    if rk_step == 2:
        return 0.5
    return 1.0


def advance_scalars(grid: AtmGrid, cfg: AtmConfig, scalars_old, scalars_new,
                    rho_old, rho_new, ruAvg, wwAvg, dt, rk_step: int,
                    advance_density: bool, scalar_tend=0.0):
    """Unlimited SG11 transport (ref :3238). Returns updated mixing ratios."""
    mesh = grid.mesh
    rdzw = grid.vert.rdzw
    wtn = _time_weight(rk_step, cfg.config_time_integration_order,
                       advance_density)
    psi_edge = _edge_flux_value(grid, scalars_new, ruAvg)   # (nE, nz, nS)
    ge = (ruAvg[..., None] * psi_edge)[mesh.edgesOnCell]
    tend = -jnp.sum(mesh.edgeSignOnCell[..., None, None] * ge, axis=1) \
        * mesh.invAreaCell[:, None, None] + scalar_tend

    wdtn = _vert_flux3(grid, scalars_new, wwAvg, cfg.config_coef_3rd_order)
    rho_denom = (1.0 - wtn) * rho_old + wtn * rho_new
    out = (scalars_old * rho_old[..., None]
           + dt * (tend - rdzw[:, None] * (wdtn[:, 1:] - wdtn[:, :-1]))) \
        / rho_denom[..., None]
    return out


def advance_scalars_mono(grid: AtmGrid, cfg: AtmConfig, scalars_old,
                         scalars_new, rho_old, rho_new, ruAvg, wwAvg, dt,
                         advance_density: bool, scalar_tend=None,
                         positive_definite_only: bool = False):
    """Zalesak-limited transport (ref :3612): 3rd/4th-order fluxes split
    into a monotone upwind part + limited correction."""
    mesh = grid.mesh
    nz = grid.vert.nz
    rdzw = grid.vert.rdzw
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    psi_o = scalars_old
    if scalar_tend is not None:
        psi_o = psi_o + dt * scalar_tend / rho_old[..., None]
    psi_n = scalars_new

    if advance_density:
        rho_denom = _rho_int(grid, rho_old, ruAvg, wwAvg, dt)
    else:
        rho_denom = rho_new

    # --- high-order fluxes -------------------------------------------------
    flux_h = ruAvg[..., None] * _edge_flux_value(grid, psi_n, ruAvg)
    wdtn = _vert_flux3(grid, psi_n, wwAvg, cfg.config_coef_3rd_order)

    # --- monotone bounds from psi_old (ref :3820-3906) ---------------------
    lo = jnp.pad(psi_o, ((0, 0), (1, 1), (0, 0)), mode="edge")
    s_max = jnp.maximum(jnp.maximum(lo[:, :-2], lo[:, 1:-1]), lo[:, 2:])
    s_min = jnp.minimum(jnp.minimum(lo[:, :-2], lo[:, 1:-1]), lo[:, 2:])
    nb = psi_o[mesh.cellsOnCell]                        # (nC, mE, nz, nS)
    mask = mesh.edgesOnCellMask[..., None, None] > 0
    s_max = jnp.maximum(s_max, jnp.max(jnp.where(mask, nb, -jnp.inf), axis=1))
    s_min = jnp.minimum(s_min, jnp.min(jnp.where(mask, nb, jnp.inf), axis=1))
    if positive_definite_only:
        s_min = jnp.zeros_like(s_min)
        s_max = jnp.full_like(s_max, jnp.inf)

    # --- upwind parts (ref :3965-3980, :4005-4013) -------------------------
    uh_pos = jnp.maximum(ruAvg, 0.0)[..., None]
    uh_neg = jnp.minimum(ruAvg, 0.0)[..., None]
    fu_h = mesh.dvEdge[:, None, None] * dt * (uh_pos * psi_o[c1]
                                              + uh_neg * psi_o[c2])
    flux_corr_h = dt * flux_h - fu_h                     # limited correction

    ww = wwAvg[..., None]
    fu_v_mid = dt * (jnp.maximum(ww[:, 1:nz], 0.0) * psi_o[:, :-1]
                     + jnp.minimum(ww[:, 1:nz], 0.0) * psi_o[:, 1:])
    zero = jnp.zeros_like(psi_o[:, :1])
    fu_v = jnp.concatenate([zero, fu_v_mid, zero], axis=1)  # (nC, nz+1, nS)
    wdtn_corr = dt * wdtn - fu_v

    # --- upwind (low-order) update, coupled form (ref :3966-3977, :4020) ---
    acc = psi_o * rho_old[..., None] \
        - rdzw[:, None] * (fu_v[:, 1:] - fu_v[:, :-1])
    gfu = fu_h[mesh.edgesOnCell]
    acc = acc - jnp.sum(mesh.edgeSignOnCell[..., None, None] * gfu, axis=1) \
        * mesh.invAreaCell[:, None, None]

    # --- incoming/outgoing correction-flux sums (ref :3983-3987, :4021-4027)
    sc_in = -rdzw[:, None] * (jnp.minimum(wdtn_corr[:, 1:], 0.0)
                              - jnp.maximum(wdtn_corr[:, :-1], 0.0))
    sc_out = -rdzw[:, None] * (jnp.maximum(wdtn_corr[:, 1:], 0.0)
                               - jnp.minimum(wdtn_corr[:, :-1], 0.0))
    gfc = flux_corr_h[mesh.edgesOnCell]
    signed = mesh.edgeSignOnCell[..., None, None] * gfc
    sc_out = sc_out - jnp.sum(jnp.maximum(signed, 0.0), axis=1) \
        * mesh.invAreaCell[:, None, None]
    sc_in = sc_in - jnp.sum(jnp.minimum(signed, 0.0), axis=1) \
        * mesh.invAreaCell[:, None, None]

    # --- limiter (ref :4036-4060) ------------------------------------------
    rden = rho_denom[..., None]
    scale_in = jnp.clip((s_max * rden - acc) / (sc_in + EPS), 0.0, 1.0)
    scale_out = jnp.clip((s_min * rden - acc) / (sc_out - EPS), 0.0, 1.0)

    # --- rescale fluxes (ref :4104-4130) -----------------------------------
    fh = jnp.maximum(flux_corr_h, 0.0) \
        * jnp.minimum(scale_out[c1], scale_in[c2]) \
        + jnp.minimum(flux_corr_h, 0.0) \
        * jnp.minimum(scale_in[c1], scale_out[c2])
    fv_mid = jnp.maximum(wdtn_corr[:, 1:nz], 0.0) \
        * jnp.minimum(scale_out[:, :-1], scale_in[:, 1:]) \
        + jnp.minimum(wdtn_corr[:, 1:nz], 0.0) \
        * jnp.minimum(scale_out[:, 1:], scale_in[:, :-1])
    fv = jnp.concatenate([zero, fv_mid, zero], axis=1)

    # --- final update (ref :4136-4153) -------------------------------------
    gfh = fh[mesh.edgesOnCell]
    acc = acc - jnp.sum(mesh.edgeSignOnCell[..., None, None] * gfh, axis=1) \
        * mesh.invAreaCell[:, None, None]
    acc = acc - rdzw[:, None] * (fv[:, 1:] - fv[:, :-1])
    return acc / rden
