"""Mesh-generic TRiSK stencil operators (the hot compute primitives).

TPU-native re-design of the reference's per-entity scatter loops as *pure
gathers from the destination entity* — no scatter appears anywhere, so XLA
maps every operator onto dense vectorized gathers + masked reductions over a
small static neighbor axis (maxEdges / vertexDegree). Padded neighbor slots
point at entity 0 and carry zero sign/weight, mirroring the reference's
"garbage column" trick without growing the field arrays.

Reference parity (what-loop -> which-op):
  divergence at cells        sw_compute_solve_diagnostics divergence loop
                             (ref: mpas_sw_time_integration.F:1205-1224)
  circulation/vorticity      same file :1186-1199
  normal gradient at edges   momentum grad in sw_compute_tend (:489-497)
  tangential velocity        mpas_tangential_velocity
                             (ref: mpas_vector_operations.F:352-360)
  kinetic energy at cells    sw_compute_solve_diagnostics ke loop (:1230-1241)
  cell->vertex kite remap    h_vertex loop (:1272-1283)
  vertex->cell kite remap    pv_cell loop (:1330-1341)
  vertex->edge average       pv_edge loop (:1302-1310)

Fields may carry trailing dims (e.g. (nCells, nVertLevels) with the vertical
in the minor/lane dimension — the reference keeps the vertical innermost for
the same cache reasons; ref: mpas_atm_dimensions.F static inner dims).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.mesh.mesh import Mesh


def _w(weights, field_ndim):
    """Broadcast (n, s) weights over a gathered (n, s, ...) field."""
    extra = field_ndim - 1
    return weights.reshape(weights.shape + (1,) * extra)


def edge_divergence(mesh: Mesh, u_edge):
    """Divergence at cell centers of a normal-velocity (or flux) edge field.

    div(c) = (1/A_c) * sum_j sign(c,j) * u(e_j) * dvEdge(e_j)
    """
    ue = u_edge[mesh.edgesOnCell]                      # (nCells, maxEdges, ...)
    acc = jnp.sum(_w(mesh.divW, ue.ndim - 1) * ue, axis=1)
    return acc * mesh.invAreaCell.reshape((-1,) + (1,) * (acc.ndim - 1))


def edge_circulation(mesh: Mesh, u_edge):
    """Circulation at vertices: sum_i sign(v,i) * u(e_i) * dcEdge(e_i)."""
    ue = u_edge[mesh.edgesOnVertex]
    return jnp.sum(_w(mesh.curlW, ue.ndim - 1) * ue, axis=1)


def edge_curl(mesh: Mesh, u_edge):
    """Relative vorticity at vertices: circulation / areaTriangle."""
    circ = edge_circulation(mesh, u_edge)
    return circ * mesh.invAreaTriangle.reshape((-1,) + (1,) * (circ.ndim - 1))


def cell_gradient_n(mesh: Mesh, f_cell, mask_boundary: bool = True):
    """Normal gradient at edges: (f(cell2) - f(cell1)) / dcEdge.

    Zeroed on boundary edges (where cell2 is the pad slot) when
    mask_boundary, matching the reference's nCellsSolve guards.
    """
    f2 = f_cell[mesh.cellsOnEdge[:, 1]]
    f1 = f_cell[mesh.cellsOnEdge[:, 0]]
    g = (f2 - f1) * mesh.invDcEdge.reshape((-1,) + (1,) * (f1.ndim - 1))
    if mask_boundary:
        m = (1.0 - mesh.boundaryEdge).reshape((-1,) + (1,) * (g.ndim - 1))
        g = g * m
    return g


def cell_to_edge_mean(mesh: Mesh, f_cell):
    """Arithmetic 2-point cell->edge interpolation (2nd-order h_edge)."""
    f1 = f_cell[mesh.cellsOnEdge[:, 0]]
    f2 = f_cell[mesh.cellsOnEdge[:, 1]]
    return 0.5 * (f1 + f2)


def vertex_gradient_t(mesh: Mesh, f_vertex):
    """Tangential gradient at edges: (f(v2) - f(v1)) / dvEdge."""
    f2 = f_vertex[mesh.verticesOnEdge[:, 1]]
    f1 = f_vertex[mesh.verticesOnEdge[:, 0]]
    return (f2 - f1) * mesh.invDvEdge.reshape((-1,) + (1,) * (f1.ndim - 1))


def vertex_to_edge_mean(mesh: Mesh, f_vertex):
    """0.5*(f(v1)+f(v2)) — the reference accumulates 0.5*pv_vertex from the
    vertex side (mpas_sw_time_integration.F:1302-1310); identical result."""
    return 0.5 * (f_vertex[mesh.verticesOnEdge[:, 0]]
                  + f_vertex[mesh.verticesOnEdge[:, 1]])


def tangential_velocity(mesh: Mesh, u_edge):
    """TRiSK tangential reconstruction: v(e) = sum_i w(e,i)*u(edgesOnEdge)."""
    ue = u_edge[mesh.edgesOnEdge]
    return jnp.sum(_w(mesh.weightsOnEdge, ue.ndim - 1) * ue, axis=1)


def tangential_cell_assembled(mesh: Mesh, x_edge):
    """The same TRiSK tangential operator, cell-assembled.

    Algebraically identical to `tangential_velocity` (the weights were
    built per cell; see mesh/build.py), but the 12-wide edgesOnEdge
    gather (the dycore's dominant HBM cost on TPU) becomes one 6-wide
    edgesOnCell gather + a static (maxEdges x maxEdges) contraction +
    two row gathers: ~3x less gather traffic, MXU-friendly contraction.

    x_edge: (nE,) or (nE, K). Returns the same shape."""
    g = x_edge[mesh.edgesOnCell]                      # (nC, mE, ...)
    if g.ndim == 2:
        G = jnp.einsum("cpi,ci->cp", mesh.triskM, g)
    else:
        G = jnp.einsum("cpi,cik->cpk", mesh.triskM, g)
    # 2-coordinate gather G[cell, slot] per edge side. (Merging (nC, mE)
    # with reshape first is NOT free on TPU: mE=6 pads to 8 sublanes, so
    # the merge is a physical relayout — measured 830 MB/step of pure
    # reshape traffic in the trace.)
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    s1, s2 = mesh.edgeSlotOnCell[:, 0], mesh.edgeSlotOnCell[:, 1]
    return G[c1, s1] + G[c2, s2]


def trisk_q_cell_assembled(mesh: Mesh, u_weighted, pv_edge):
    """Nonlinear Coriolis q(e) = sum_j w(e,j) * u_w(e_j) * 0.5*(pv(e)+pv(e_j))
    via the cell-assembled operator: q = 0.5*(pv * T(u_w) + T(u_w * pv))
    (exact algebra; ref loop mpas_atm_time_integration.F:4803-4813).
    u_weighted is u (atm) or u*h_edge (sw) etc."""
    if u_weighted.ndim == 1:
        cat = jnp.stack([u_weighted, u_weighted * pv_edge], axis=-1)
        t = tangential_cell_assembled(mesh, cat)
        return 0.5 * (pv_edge * t[..., 0] + t[..., 1])
    cat = jnp.concatenate([u_weighted, u_weighted * pv_edge], axis=-1)
    t = tangential_cell_assembled(mesh, cat)
    k = u_weighted.shape[-1]
    return 0.5 * (pv_edge * t[..., :k] + t[..., k:])


def kinetic_energy_cell(mesh: Mesh, u_edge):
    """KE at cells: (1/A) sum_j 0.25*dc*dv*u^2 over edgesOnCell."""
    ue = u_edge[mesh.edgesOnCell]
    acc = jnp.sum(_w(mesh.keW, ue.ndim - 1) * ue * ue, axis=1)
    return acc * mesh.invAreaCell.reshape((-1,) + (1,) * (acc.ndim - 1))


def cell_to_vertex_kite(mesh: Mesh, f_cell):
    """Kite-area-weighted cell->vertex remap (h_vertex)."""
    fc = f_cell[mesh.cellsOnVertex]
    acc = jnp.sum(_w(mesh.kiteAreasOnVertex, fc.ndim - 1) * fc, axis=1)
    return acc * mesh.invAreaTriangle.reshape((-1,) + (1,) * (acc.ndim - 1))


def vertex_to_cell_kite(mesh: Mesh, f_vertex):
    """Kite-area-weighted vertex->cell remap (pv_cell / vorticity_cell)."""
    fv = f_vertex[mesh.verticesOnCell]
    acc = jnp.sum(_w(mesh.kiteAreasOnCell, fv.ndim - 1) * fv, axis=1)
    return acc * mesh.invAreaCell.reshape((-1,) + (1,) * (acc.ndim - 1))


def edge_sum_on_cell(mesh: Mesh, f_edge, weights=None):
    """Generic masked sum of an edge field over each cell's edges."""
    fe = f_edge[mesh.edgesOnCell]
    w = mesh.edgesOnCellMask if weights is None else mesh.edgesOnCellMask * weights
    return jnp.sum(_w(w, fe.ndim - 1) * fe, axis=1)
