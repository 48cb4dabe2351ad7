"""Meridional overturning circulation (MOC) streamfunction member.

ref: src/core_ocean/analysis_members/mpas_ocn_moc_streamfunction.F —
psi(lat_bin, z) from the meridional transport accumulated below each level
across latitude bin boundaries: psi(y, k) = -sum_{k'>=k} T(y, k') where
T(y, k) is the net northward transport through the bin boundary at layer k.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class MocStreamfunction:
    n_bins: int = 12

    def init(self, grid, cfg):
        m = grid.mesh
        yc = np.asarray(m.latCell) if m.on_sphere else np.asarray(m.yCell)
        edges = np.linspace(yc.min() - 1e-9, yc.max() + 1e-9,
                            self.n_bins + 1)
        self._bin_edges = edges
        coe = np.asarray(m.cellsOnEdge)
        y1, y2 = yc[coe[:, 0]], yc[coe[:, 1]]
        inner = edges[1:-1]
        crosses_n = (y1[:, None] < inner) & (y2[:, None] >= inner)
        crosses_s = (y2[:, None] < inner) & (y1[:, None] >= inner)
        self._sign = jnp.asarray(crosses_n.astype(np.float64)
                                 - crosses_s.astype(np.float64))

    def compute(self, grid, cfg, state):
        m = grid.mesh
        coe = m.cellsOnEdge
        h_edge = 0.5 * (state.layerThickness[coe[:, 0]]
                        + state.layerThickness[coe[:, 1]])
        # transport per edge per layer (m3/s)
        t_edge = state.u * h_edge * m.dvEdge[:, None]
        # net northward transport per bin boundary per layer
        t_bin = jnp.einsum("eb,ek->bk", self._sign, t_edge)
        # streamfunction: integrate upward from the bottom (psi(bottom)=0)
        psi = -jnp.cumsum(t_bin[:, ::-1], axis=1)[:, ::-1]
        return {
            "binBoundaryMocStreamfunction": self._bin_edges[1:-1],
            "mocStreamvalLatAndDepth": np.asarray(psi) / 1.0e6,  # Sv
        }
