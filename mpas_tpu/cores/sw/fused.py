"""Fused, gather-batched shallow-water stage computation (the hot path).

Numerically identical to dynamics.solve_diagnostics + compute_tend +
compute_scalar_tend (ref: mpas_sw_time_integration.F:360-1395) but
restructured for TPU gather economics: XLA's TPU gather costs per *row*
(~constant up to ~8 lanes of payload), so every field needing the same index
map is stacked into one gather. Gather count per stage drops from ~20 to 9:

  coe#1: h, tracer mixing ratios          (K = 1+T)
  eoc#1: u^2, u*h_edge, u, tracer fluxes  (K = 3+T)
  eov:   u                                 (K = 1)
  cov:   h                                 (K = 1)
  voe:   pv_vertex [, vorticity if del2]   (K = 1-2)
  eoe#1: u                                 (K = 1)   -> tangential v
  voc:   pv_vertex                         (K = 1)
  coe#2: pv_cell, bernoulli [, div del2]   (K = 2-3)
  eoe#2: u*h_edge, u*h_edge*pv_edge        (K = 2)

The two 12-wide edgesOnEdge gathers are inherent to APVM (tangential v must
exist everywhere before pv_edge is upwinded; ref: :1295-1326).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import gravity
from mpas_tpu.mesh.mesh import Mesh
from mpas_tpu.cores.sw.config import SWConfig
from mpas_tpu.cores.sw.state import SWState


def stage_tendencies(mesh: Mesh, cfg: SWConfig, state: SWState, dt, h_s):
    """(tend_u, tend_h, tend_coupled_tracers) for one RK stage."""
    u, h, tr = state.u, state.h, state.tracers
    T = tr.shape[1]
    apvm = cfg.config_apvm_upwinding
    visc2 = cfg.config_h_mom_eddy_visc2
    invA = mesh.invAreaCell
    invAT = mesh.invAreaTriangle
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    v1, v2 = mesh.verticesOnEdge[:, 0], mesh.verticesOnEdge[:, 1]

    # ---- coe#1: cell -> edge values (h + tracer ratios) -------------------
    cellvals = jnp.concatenate([h[:, None], tr], axis=1)      # (nC, 1+T)
    gc = 0.5 * (cellvals[c1] + cellvals[c2])                  # (nE, 1+T)
    h_edge = gc[:, 0]
    psi_edge = gc[:, 1:]                                      # (nE, T)

    uhe = u * h_edge
    fluxes = uhe[:, None] * psi_edge                          # (nE, T)

    # ---- eoc#1: edge -> cell sums (ke, tend_h, div, tracer tend) ----------
    edgevals = jnp.concatenate(
        [(u * u)[:, None], uhe[:, None], u[:, None], fluxes], axis=1)
    ge = edgevals[mesh.edgesOnCell]                           # (nC, mE, 3+T)
    ke = jnp.sum(mesh.keW[..., None] * ge[..., 0:1], axis=1)[:, 0] * invA
    divsums = jnp.sum(mesh.divW[..., None] * ge[..., 1:], axis=1)
    tend_h = -divsums[:, 0] * invA
    divergence = divsums[:, 1] * invA
    tend_ct = -divsums[:, 2:] * invA[:, None]                 # (nC, T)

    # ---- eov: circulation/vorticity; cov: h_vertex ------------------------
    vorticity = jnp.sum(mesh.curlW * u[mesh.edgesOnVertex], axis=1) * invAT
    h_vertex = jnp.sum(mesh.kiteAreasOnVertex * h[mesh.cellsOnVertex],
                       axis=1) * invAT
    pv_vertex = (mesh.fVertex + vorticity) / h_vertex

    # ---- eoe#1: tangential velocity (needed for APVM) ---------------------
    from mpas_tpu.ops.stencils import tangential_cell_assembled
    v_t = tangential_cell_assembled(mesh, u)

    # ---- voe: pv_vertex -> edges (mean + tangential gradient) -------------
    if visc2 > 0.0:
        vv = jnp.stack([pv_vertex, vorticity], axis=1)
        gv = vv[mesh.verticesOnEdge]                          # (nE, 2, 2)
        pv_a, pv_b = gv[:, 0, 0], gv[:, 1, 0]
        vort_a, vort_b = gv[:, 0, 1], gv[:, 1, 1]
    else:
        pv_a, pv_b = pv_vertex[v1], pv_vertex[v2]
    gradPVt = (pv_b - pv_a) * mesh.invDvEdge
    pv_edge = 0.5 * (pv_a + pv_b) - apvm * v_t * dt * gradPVt

    # ---- voc: pv_vertex -> cells ------------------------------------------
    pv_cell = jnp.sum(mesh.kiteAreasOnCell
                      * pv_vertex[mesh.verticesOnCell], axis=1) * invA

    # ---- coe#2: normal gradients (pv_cell, bernoulli [, divergence]) ------
    bern = ke + gravity * (h + h_s)
    cols = [pv_cell[:, None], bern[:, None]]
    if visc2 > 0.0:
        cols.append(divergence[:, None])
    cv = jnp.concatenate(cols, axis=1)
    gchain = (cv[c2] - cv[c1]) * mesh.invDcEdge[:, None]
    not_bnd = (1.0 - mesh.boundaryEdge)
    gradPVn = gchain[:, 0] * not_bnd
    gradB = gchain[:, 1] * not_bnd
    pv_edge = pv_edge - apvm * u * dt * gradPVn

    # ---- eoe#2: the q (PV flux) term --------------------------------------
    from mpas_tpu.ops.stencils import trisk_q_cell_assembled
    q = trisk_q_cell_assembled(mesh, uhe, pv_edge)

    tend_u = q - gradB
    if visc2 > 0.0:
        gradDiv = gchain[:, 2] * not_bnd
        gradTvort = (vort_b - vort_a) * mesh.invDvEdge
        tend_u = tend_u + mesh.meshScalingDel2 * visc2 * (gradDiv - gradTvort)
    tend_u = tend_u * not_bnd
    return tend_u, tend_h, tend_ct
