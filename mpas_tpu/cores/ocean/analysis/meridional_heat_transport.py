"""Meridional heat transport analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_meridional_heat_transport.F —
heat transport through latitude (or y) bins: sum over edges crossing each
bin boundary of rho0*cp * u * h * T_edge * dvEdge, reported per bin.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_CP = 3996.0          # ref: seawater specific heat (mpas_ocn_constants)


class MeridionalHeatTransport:
    n_bins: int = 12

    def init(self, grid, cfg):
        m = grid.mesh
        ye = np.asarray(m.latEdge) if m.on_sphere else np.asarray(m.yEdge)
        yc = np.asarray(m.latCell) if m.on_sphere else np.asarray(m.yCell)
        edges = np.linspace(yc.min() - 1e-9, yc.max() + 1e-9,
                            self.n_bins + 1)
        self._bin_edges = edges
        coe = np.asarray(m.cellsOnEdge)
        y1, y2 = yc[coe[:, 0]], yc[coe[:, 1]]
        # signed crossing indicator per (edge, bin boundary): +1 if the
        # edge's normal direction (cell1 -> cell2) crosses the boundary
        # northward, -1 southward
        inner = edges[1:-1]                             # (nBins-1,)
        crosses_n = (y1[:, None] < inner) & (y2[:, None] >= inner)
        crosses_s = (y2[:, None] < inner) & (y1[:, None] >= inner)
        self._sign = jnp.asarray(crosses_n.astype(np.float64)
                                 - crosses_s.astype(np.float64))

    def compute(self, grid, cfg, state):
        m = grid.mesh
        coe = m.cellsOnEdge
        h_edge = 0.5 * (state.layerThickness[coe[:, 0]]
                        + state.layerThickness[coe[:, 1]])
        t_edge = 0.5 * (state.tracers[coe[:, 0], :, 0]
                        + state.tracers[coe[:, 1], :, 0])
        # column-integrated heat flux through each edge (W per edge)
        q_edge = cfg.config_density0 * _CP * jnp.sum(
            state.u * h_edge * t_edge, axis=-1) * m.dvEdge
        mht = self._sign.T @ q_edge                     # (nBins-1,)
        return {
            "binBoundaryMerHeatTrans": self._bin_edges[1:-1],
            "meridionalHeatTransportLat": np.asarray(mht),
        }
