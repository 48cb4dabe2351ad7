"""Mixed-layer-depth analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_mixed_layer_depths.F —
threshold-based MLDs: depth where potential density (or temperature)
first differs from the surface value by more than a threshold, linearly
interpolated between layer midpoints.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.ocean.core import equation_of_state


class MixedLayerDepths:
    # ref defaults: config_AM_mixedLayerDepths_Dthreshold = 0.03 kg/m3,
    # Tthreshold = 0.2 C
    den_threshold: float = 0.03
    temp_threshold: float = 0.2

    def init(self, grid, cfg):
        pass

    @staticmethod
    def _mld(h, field, threshold, sign=1.0):
        """First depth where sign*(field - field_surface) > threshold."""
        z_mid = jnp.cumsum(h, axis=-1) - 0.5 * h            # positive down
        dev = sign * (field - field[:, :1])
        exceeded = dev > threshold                           # (nCells, nz)
        # first exceeding level (nz if never)
        nz = h.shape[-1]
        idx = jnp.argmax(exceeded, axis=-1)
        any_exc = jnp.any(exceeded, axis=-1)
        idx = jnp.where(any_exc, idx, nz - 1)
        iprev = jnp.maximum(idx - 1, 0)
        rows = jnp.arange(h.shape[0])
        f1, f2 = dev[rows, iprev], dev[rows, idx]
        z1, z2 = z_mid[rows, iprev], z_mid[rows, idx]
        frac = jnp.where(jnp.abs(f2 - f1) > 1e-12,
                         (threshold - f1) / (f2 - f1), 1.0)
        mld = z1 + jnp.clip(frac, 0.0, 1.0) * (z2 - z1)
        bottom = jnp.sum(h, axis=-1)
        return jnp.where(any_exc, mld, bottom)

    def compute(self, grid, cfg, state):
        h = state.layerThickness
        rho = equation_of_state(cfg, state.tracers[..., 0],
                                state.tracers[..., 1])
        t = state.tracers[..., 0]
        return {
            "dThreshMLD": np.asarray(
                self._mld(h, rho, self.den_threshold, sign=1.0)),
            "tThreshMLD": np.asarray(
                self._mld(h, t, self.temp_threshold, sign=-1.0)),
        }
