"""Zonal-mean analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_zonal_mean.F — bins cells
into nZonalMeanBins latitude (or y) bands and averages tracers/velocity
per band and vertical level.

TPU redesign: static bin edges; binning is a one-hot matmul (segment mean
without scatters), which lowers onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ZonalMean:
    n_bins: int = 16

    def init(self, grid, cfg):
        m = grid.mesh
        y = np.asarray(m.latCell) if m.on_sphere else np.asarray(m.yCell)
        edges = np.linspace(y.min() - 1e-9, y.max() + 1e-9, self.n_bins + 1)
        which = np.clip(np.searchsorted(edges, y) - 1, 0, self.n_bins - 1)
        onehot = np.zeros((len(y), self.n_bins))
        onehot[np.arange(len(y)), which] = 1.0
        self._onehot = jnp.asarray(onehot)          # (nCells, nBins)
        self._bin_centers = 0.5 * (edges[:-1] + edges[1:])

    def compute(self, grid, cfg, state):
        area = grid.mesh.areaCell[:, None]
        w = self._onehot * area                     # (nCells, nBins)
        wsum = jnp.maximum(jnp.sum(w, axis=0), 1e-30)  # empty bins -> 0 mean

        def zmean(f_cell_nz):                       # (nCells, nz) -> (nBins, nz)
            return (w.T @ f_cell_nz) / wsum[:, None]

        out = {"binCenters": np.asarray(self._bin_centers),
               "zonalMeanThickness": np.asarray(zmean(state.layerThickness))}
        names = ["temperature", "salinity"]
        for i in range(min(state.tracers.shape[-1], len(names))):
            out[f"zonalMean{names[i].capitalize()}"] = \
                np.asarray(zmean(state.tracers[..., i]))
        return out
