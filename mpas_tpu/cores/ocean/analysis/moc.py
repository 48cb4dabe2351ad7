"""Meridional overturning circulation (MOC) streamfunction member.

ref: src/core_ocean/analysis_members/mpas_ocn_moc_streamfunction.F —
psi(lat_bin, z) from the meridional transport accumulated below each level
across latitude bin boundaries: psi(y, k) = -sum_{k'>=k} T(y, k') where
T(y, k) is the net northward transport through the bin boundary at layer k.

Round 4: configurable bin count and per-region masks (the reference's
regionCellMasks/regionsInGroup machinery, :128-144 — e.g. an Atlantic
MOC): each region restricts the transport accumulation to edges interior
to the region's cell mask and reports its own psi(lat, z), alongside the
global streamfunction.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class MocStreamfunction:
    """n_bins: number of latitude bins (ref: config_AM_mocStreamfunction
    uses the binBoundaryMocStreamfunction coordinate array).
    regions: optional {name: cell_mask (nCells,) bool/0-1} — the
    regionCellMasks analogue; None = global only."""

    def __init__(self, n_bins: int = 12, regions: dict | None = None):
        self.n_bins = n_bins
        self.regions = regions or {}

    def _bin_signs(self, m, yc, cell_mask=None):
        """(nEdges, n_bins-1) crossing signs; edges outside the region
        (either cell unmasked) are excluded — the reference's
        regionCellMasks edge restriction."""
        coe = np.asarray(m.cellsOnEdge)
        y1, y2 = yc[coe[:, 0]], yc[coe[:, 1]]
        inner = self._bin_edges[1:-1]
        crosses_n = (y1[:, None] < inner) & (y2[:, None] >= inner)
        crosses_s = (y2[:, None] < inner) & (y1[:, None] >= inner)
        sign = crosses_n.astype(np.float64) - crosses_s.astype(np.float64)
        if cell_mask is not None:
            cm = np.asarray(cell_mask).astype(bool)
            in_region = cm[coe[:, 0]] & cm[coe[:, 1]]
            sign = sign * in_region[:, None]
        return jnp.asarray(sign)

    def init(self, grid, cfg):
        m = grid.mesh
        yc = np.asarray(m.latCell) if m.on_sphere else np.asarray(m.yCell)
        self._bin_edges = np.linspace(yc.min() - 1e-9, yc.max() + 1e-9,
                                      self.n_bins + 1)
        self._sign = self._bin_signs(m, yc)
        self._region_signs = {
            name: self._bin_signs(m, yc, mask)
            for name, mask in self.regions.items()}

    def _psi(self, sign, t_edge):
        t_bin = jnp.einsum("eb,ek->bk", sign, t_edge)
        return -jnp.cumsum(t_bin[:, ::-1], axis=1)[:, ::-1]

    def compute(self, grid, cfg, state):
        m = grid.mesh
        coe = m.cellsOnEdge
        h_edge = 0.5 * (state.layerThickness[coe[:, 0]]
                        + state.layerThickness[coe[:, 1]])
        # transport per edge per layer (m3/s)
        t_edge = state.u * h_edge * m.dvEdge[:, None]
        out = {
            "binBoundaryMocStreamfunction": self._bin_edges[1:-1],
            "mocStreamvalLatAndDepth":
                np.asarray(self._psi(self._sign, t_edge)) / 1.0e6,  # Sv
        }
        for name, sign in self._region_signs.items():
            out[f"mocStreamvalLatAndDepthRegion_{name}"] = \
                np.asarray(self._psi(sign, t_edge)) / 1.0e6
        return out
