"""Layer-volume-weighted averages analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_layer_volume_weighted_averages.F
— per-vertical-layer volume-weighted means/min/max of tracers and
thickness over the full domain (and per region; regions = whole domain
here).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class LayerVolumeWeightedAverage:
    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        area = grid.mesh.areaCell[:, None]
        h = state.layerThickness
        vol = h * area                                  # (nCells, nz)
        vol_layer = jnp.sum(vol, axis=0)                # (nz,)
        out = {
            "avgLayerThickness": np.asarray(
                jnp.sum(h * area, axis=0) / jnp.sum(area)),
            "layerVolume": np.asarray(vol_layer),
        }
        names = ["temperature", "salinity"]
        for i in range(min(state.tracers.shape[-1], len(names))):
            tr = state.tracers[..., i]
            out[f"avgLayer{names[i].capitalize()}"] = np.asarray(
                jnp.sum(tr * vol, axis=0) / vol_layer)
            out[f"minLayer{names[i].capitalize()}"] = np.asarray(
                jnp.min(tr, axis=0))
            out[f"maxLayer{names[i].capitalize()}"] = np.asarray(
                jnp.max(tr, axis=0))
        return out
