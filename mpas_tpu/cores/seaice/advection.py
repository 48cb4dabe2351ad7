"""Upwind flux-form transport of the ITD tracer hierarchy.

ref: src/core_seaice/shared/mpas_seaice_advection_upwind.F (2,740 LoC) —
first-order upwind advection of iceAreaCategory and its child tracers
(iceVolume, snowVolume, area-weighted surface temperature). The tracer
hierarchy means child tracers are transported *weighted by their parent*
(e.g. surfaceTemperature rides on iceAreaCategory), so a cell that loses all
ice also loses its temperature signal consistently.

TPU redesign: edge normal velocities are interpolated from the two edge
vertices once per dynamics step; all category fields advect in one batched
gather/sum (category = trailing lane dim). Scatter-free: the divergence at a
cell is a masked sum over edgesOnCell.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.state import SeaiceGrid, SeaiceState


def edge_normal_velocity(grid: SeaiceGrid, u_v, v_v):
    """Project vertex velocities onto edge normals.
    ref: seaice_interpolate_vertex_to_edge + normal projection in
    mpas_seaice_advection_upwind.F."""
    m = grid.mesh
    voe = m.verticesOnEdge
    ue = 0.5 * (u_v[voe[:, 0]] + u_v[voe[:, 1]])
    ve = 0.5 * (v_v[voe[:, 0]] + v_v[voe[:, 1]])
    ne = jnp.cos(m.angleEdge)
    nn = jnp.sin(m.angleEdge)
    un = ue * ne + ve * nn
    # closed walls: no flux through boundary edges
    return jnp.where(m.boundaryEdge > 0, 0.0, un)


def _upwind_tend(grid: SeaiceGrid, un, phi):
    """d(phi)/dt from upwind fluxes; phi is (nCells, ...) per-area density."""
    m = grid.mesh
    coe = m.cellsOnEdge
    up = jnp.where((un > 0.0)[:, None] if phi.ndim > 1 else (un > 0.0),
                   phi[coe[:, 0]], phi[coe[:, 1]])
    flux = (un * m.dvEdge)[:, None] * up if phi.ndim > 1 \
        else un * m.dvEdge * up
    eoc = m.edgesOnCell
    sgn = m.edgeSignOnCell
    w = sgn if phi.ndim == 1 else sgn[..., None]
    div = jnp.sum(w * flux[eoc], axis=1)
    inv_a = m.invAreaCell if phi.ndim == 1 else m.invAreaCell[:, None]
    return -div * inv_a


def advect_upwind(grid: SeaiceGrid, cfg: SeaiceConfig, state: SeaiceState,
                  dt) -> SeaiceState:
    """One upwind transport step of the full tracer hierarchy."""
    un = edge_normal_velocity(grid, state.uVelocity, state.vVelocity)

    a = state.iceAreaCategory
    vi = state.iceVolumeCategory
    vs = state.snowVolumeCategory
    aT = a * state.surfaceTemperature  # parent-weighted child tracer

    a1 = a + dt * _upwind_tend(grid, un, a)
    vi1 = vi + dt * _upwind_tend(grid, un, vi)
    vs1 = vs + dt * _upwind_tend(grid, un, vs)
    aT1 = aT + dt * _upwind_tend(grid, un, aT)

    a1 = jnp.maximum(a1, 0.0)
    vi1 = jnp.maximum(vi1, 0.0)
    vs1 = jnp.maximum(vs1, 0.0)
    T1 = jnp.where(a1 > cfg.puny, aT1 / jnp.maximum(a1, cfg.puny),
                   state.surfaceTemperature)

    return state.replace(iceAreaCategory=a1, iceVolumeCategory=vi1,
                         snowVolumeCategory=vs1, surfaceTemperature=T1)
