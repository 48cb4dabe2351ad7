"""Scalar transport: Skamarock & Gassmann (2011) 3rd/4th-order flux-form
advection with optional Zalesak positive-definite/monotonic limiting.

ref: atm_advance_scalars_work (src/core_atmosphere/dynamics/
mpas_atm_time_integration.F:3238) and atm_advance_scalars_mono_work (:3612).

TPU layout (round-5 relayout): the public API carries scalars
(nCells, nz, nS) but every internal tensor is a per-scalar rank-2
(cells, levels) array — the scalar axis is a static python loop, exactly
like the reference's per-scalar loop, because ANY tensor with the small
nS axis in the minor dims pays 128/nS lane padding on every HBM touch
(measured: one rank-4 (nC, mE, nz, 1) edge gather costs ~4 GB physical
per call). Edge-to-cell accumulations are slot-major: per edge-slot
rank-2 gathers via the transposed edgesOnCell table (the
advection.py pattern, PERF.md round-5).

Shapes: scalars (nCells, nz, nS); ruAvg (nEdges, nz); wwAvg (nCells, nz+1).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.setup import AtmGrid

EPS = 1.0e-20


def _unstack(scalars):
    return [scalars[..., i] for i in range(scalars.shape[-1])]


def _edge_flux_value_s(grid: AtmGrid, psi_s, sign_uh):
    """High-order edge value for ONE scalar (nC, nz) -> (nE, nz)."""
    if grid.d2_bmat is not None:
        from mpas_tpu.cores.atmosphere.advection import edge_value_parts
        base, third = edge_value_parts(grid, psi_s)
        return base + sign_uh * third
    g = psi_s[grid.advCellsForEdge]                   # (nE, NA, nz)
    base = jnp.einsum("ej,ejk->ek", grid.adv_coefs, g)
    third = jnp.einsum("ej,ejk->ek", grid.adv_coefs_3rd, g)
    return base + sign_uh * third


_SLOT_MAJOR_MAX_K = 32   # one (8,128) lane tile: measured crossover


def _cell_edge_sum(mesh, fe):
    """-sum_s edgeSign[:, s] * fe[edgesOnCell[:, s]] * invAreaCell for a
    rank-2 edge field fe (nE, K).

    Measured dispatch (same-chip A/B, PERF.md round 5): for K <= 32 the
    slot-major per-slot rank-2 gathers win big (jw_120km 127.6k ->
    165.8k col/s); for K > 32 (nz 40/55 configs) the single rank-3
    gather+reduce is faster. Both forms avoid the former rank-4 gather
    with a trailing unit scalar axis (~1 ms per op of pure padding)."""
    if fe.shape[-1] <= _SLOT_MAJOR_MAX_K:
        eocT = mesh.edgesOnCell.T
        acc = 0.0
        for s in range(eocT.shape[0]):
            acc = acc + mesh.edgeSignOnCell[:, s][:, None] * fe[eocT[s]]
        return -acc * mesh.invAreaCell[:, None]
    ge = fe[mesh.edgesOnCell]                          # (nC, mE, K)
    return -jnp.sum(mesh.edgeSignOnCell[..., None] * ge, axis=1) \
        * mesh.invAreaCell[:, None]


def _vert_flux3_s(grid: AtmGrid, psi_s, ww, coef3):
    """flux3 vertical flux of one scalar (nC, nz); ww (nC, nz+1)."""
    nz = grid.vert.nz
    fzm, fzp = grid.vert.fzm, grid.vert.fzp
    second = ww[:, 1:nz] * (fzm[1:nz] * psi_s[:, 1:]
                            + fzp[1:nz] * psi_s[:, :-1])
    qm2 = psi_s[:, 0:nz - 3]
    qm1 = psi_s[:, 1:nz - 2]
    qi = psi_s[:, 2:nz - 1]
    qp1 = psi_s[:, 3:nz]
    m = ww[:, 2:nz - 1]
    f4 = m * (7.0 * (qi + qm1) - (qp1 + qm2)) / 12.0
    f3 = f4 + coef3 * jnp.abs(m) * ((qp1 - qm2) - 3.0 * (qi - qm1)) / 12.0
    zero = jnp.zeros_like(psi_s[:, :1])
    return jnp.concatenate([zero, second[:, :1], f3,
                            second[:, nz - 2:nz - 1], zero], axis=1)


def _rho_int(grid: AtmGrid, rho_old, ruAvg, wwAvg, dt):
    """Re-integrated density from the time-averaged fluxes
    (ref mono :3755-3775); slot-major divergence."""
    mesh = grid.mesh
    if ruAvg.shape[-1] <= _SLOT_MAJOR_MAX_K:
        eocT = mesh.edgesOnCell.T
        div = 0.0
        for s in range(eocT.shape[0]):
            div = div + mesh.divW[:, s][:, None] * ruAvg[eocT[s]]
        div = div * mesh.invAreaCell[:, None]
    else:
        div = jnp.sum(mesh.divW[..., None] * ruAvg[mesh.edgesOnCell],
                      axis=1) * mesh.invAreaCell[:, None]
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
    rho_denom = (1.0 - wtn) * rho_old + wtn * rho_new
    sign_uh = jnp.sign(ruAvg)
    nS = scalars_old.shape[-1]
    tend_list = (_unstack(scalar_tend) if hasattr(scalar_tend, "ndim")
                 and getattr(scalar_tend, "ndim", 0) == 3
                 else [scalar_tend] * nS)
    outs = []
    for i, (po, pn) in enumerate(zip(_unstack(scalars_old),
                                     _unstack(scalars_new))):
        psi_edge = _edge_flux_value_s(grid, pn, sign_uh)    # (nE, nz)
        tend = _cell_edge_sum(mesh, ruAvg * psi_edge) + tend_list[i]
        wdtn = _vert_flux3_s(grid, pn, wwAvg, cfg.config_coef_3rd_order)
        outs.append((po * rho_old
                     + dt * (tend - rdzw * (wdtn[:, 1:] - wdtn[:, :-1])))
                    / rho_denom)
    return jnp.stack(outs, axis=-1)


def advance_scalars_mono(grid: AtmGrid, cfg: AtmConfig, scalars_old,
                         scalars_new, rho_old, rho_new, ruAvg, wwAvg, dt,
                         advance_density: bool, scalar_tend=None,
                         positive_definite_only: bool = False):
    """Zalesak-limited transport (ref :3612): 3rd/4th-order fluxes split
    into a monotone upwind part + limited correction. Per-scalar rank-2
    internals (see module docstring)."""
    mesh = grid.mesh
    nz = grid.vert.nz
    rdzw = grid.vert.rdzw
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    if advance_density:
        rho_denom = _rho_int(grid, rho_old, ruAvg, wwAvg, dt)
    else:
        rho_denom = rho_new

    sign_uh = jnp.sign(ruAvg)
    uh_pos = jnp.maximum(ruAvg, 0.0)
    uh_neg = jnp.minimum(ruAvg, 0.0)
    dv_dt = mesh.dvEdge[:, None] * dt
    ww_pos = jnp.maximum(wwAvg[:, 1:nz], 0.0)
    ww_neg = jnp.minimum(wwAvg[:, 1:nz], 0.0)
    inv_area = mesh.invAreaCell[:, None]
    nS = scalars_old.shape[-1]
    tend_list = (_unstack(scalar_tend) if scalar_tend is not None
                 else [None] * nS)

    outs = []
    for i, (po_raw, pn) in enumerate(zip(_unstack(scalars_old),
                                         _unstack(scalars_new))):
        psi_o = po_raw
        if tend_list[i] is not None:
            psi_o = psi_o + dt * tend_list[i] / rho_old

        # --- high-order fluxes (rank-2) --------------------------------
        flux_h = ruAvg * _edge_flux_value_s(grid, pn, sign_uh)
        wdtn = _vert_flux3_s(grid, pn, wwAvg, cfg.config_coef_3rd_order)

        # --- monotone bounds from psi_old (ref :3820-3906) -------------
        lo = jnp.pad(psi_o, ((0, 0), (1, 1)), mode="edge")
        s_max = jnp.maximum(jnp.maximum(lo[:, :-2], lo[:, 1:-1]),
                            lo[:, 2:])
        s_min = jnp.minimum(jnp.minimum(lo[:, :-2], lo[:, 1:-1]),
                            lo[:, 2:])
        if nz <= _SLOT_MAJOR_MAX_K:
            cocT = mesh.cellsOnCell.T
            for s in range(cocT.shape[0]):
                valid = (mesh.edgesOnCellMask[:, s] > 0)[:, None]
                nb = psi_o[cocT[s]]
                s_max = jnp.maximum(s_max,
                                    jnp.where(valid, nb, -jnp.inf))
                s_min = jnp.minimum(s_min, jnp.where(valid, nb, jnp.inf))
        else:
            nb = psi_o[mesh.cellsOnCell]              # (nC, mE, nz)
            valid = (mesh.edgesOnCellMask > 0)[..., None]
            s_max = jnp.maximum(
                s_max, jnp.max(jnp.where(valid, nb, -jnp.inf), 1))
            s_min = jnp.minimum(
                s_min, jnp.min(jnp.where(valid, nb, jnp.inf), 1))
        if positive_definite_only:
            s_min = jnp.zeros_like(s_min)
            s_max = jnp.full_like(s_max, jnp.inf)

        # --- upwind parts (ref :3965-3980, :4005-4013) -----------------
        fu_h = dv_dt * (uh_pos * psi_o[c1] + uh_neg * psi_o[c2])
        flux_corr_h = dt * flux_h - fu_h             # limited correction

        fu_v_mid = dt * (ww_pos * psi_o[:, :-1] + ww_neg * psi_o[:, 1:])
        zero = jnp.zeros_like(psi_o[:, :1])
        fu_v = jnp.concatenate([zero, fu_v_mid, zero], axis=1)
        wdtn_corr = dt * wdtn - fu_v

        # --- upwind (low-order) update (ref :3966-3977, :4020) ---------
        acc = psi_o * rho_old - rdzw * (fu_v[:, 1:] - fu_v[:, :-1])
        sc_in = -rdzw * (jnp.minimum(wdtn_corr[:, 1:], 0.0)
                         - jnp.maximum(wdtn_corr[:, :-1], 0.0))
        sc_out = -rdzw * (jnp.maximum(wdtn_corr[:, 1:], 0.0)
                          - jnp.minimum(wdtn_corr[:, :-1], 0.0))
        if nz <= _SLOT_MAJOR_MAX_K:
            eocT = mesh.edgesOnCell.T
            for s in range(eocT.shape[0]):
                sgn = mesh.edgeSignOnCell[:, s][:, None]
                acc = acc - sgn * fu_h[eocT[s]] * inv_area
                signed = sgn * flux_corr_h[eocT[s]]
                sc_out = sc_out - jnp.maximum(signed, 0.0) * inv_area
                sc_in = sc_in - jnp.minimum(signed, 0.0) * inv_area
        else:
            sgn3 = mesh.edgeSignOnCell[..., None]
            acc = acc - jnp.sum(sgn3 * fu_h[mesh.edgesOnCell], 1) \
                * inv_area
            signed = sgn3 * flux_corr_h[mesh.edgesOnCell]
            sc_out = sc_out - jnp.sum(jnp.maximum(signed, 0.0), 1) \
                * inv_area
            sc_in = sc_in - jnp.sum(jnp.minimum(signed, 0.0), 1) \
                * inv_area

        # --- limiter (ref :4036-4060) ----------------------------------
        scale_in = jnp.clip((s_max * rho_denom - acc) / (sc_in + EPS),
                            0.0, 1.0)
        scale_out = jnp.clip((s_min * rho_denom - acc) / (sc_out - EPS),
                             0.0, 1.0)

        # --- rescale fluxes (ref :4104-4130) ---------------------------
        fh = jnp.maximum(flux_corr_h, 0.0) \
            * jnp.minimum(scale_out[c1], scale_in[c2]) \
            + jnp.minimum(flux_corr_h, 0.0) \
            * jnp.minimum(scale_in[c1], scale_out[c2])
        fv_mid = jnp.maximum(wdtn_corr[:, 1:nz], 0.0) \
            * jnp.minimum(scale_out[:, :-1], scale_in[:, 1:]) \
            + jnp.minimum(wdtn_corr[:, 1:nz], 0.0) \
            * jnp.minimum(scale_out[:, 1:], scale_in[:, :-1])
        fv = jnp.concatenate([zero, fv_mid, zero], axis=1)

        # --- final update (ref :4136-4153) -----------------------------
        acc = acc + _cell_edge_sum(mesh, fh)
        acc = acc - rdzw * (fv[:, 1:] - fv[:, :-1])
        outs.append(acc / rho_denom)
    return jnp.stack(outs, axis=-1)
