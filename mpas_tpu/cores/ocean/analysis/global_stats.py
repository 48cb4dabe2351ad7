"""Global statistics analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_global_stats.F — global
min/max/area-weighted mean/sum of the prognostic fields (the reference
computes these with dmpar reductions; here jnp reductions that lower to
psum/pmin/pmax under shard_map).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpas_tpu.cores.ocean.core import equation_of_state


class GlobalStats:
    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        m = grid.mesh
        area = m.areaCell[:, None]
        h = state.layerThickness
        vol = h * area
        total_vol = jnp.sum(vol)
        out = {
            "volumeCellGlobal": total_vol,
            "sshGlobalMin": jnp.min(jnp.sum(h, axis=-1) - grid.bottomDepth),
            "sshGlobalMax": jnp.max(jnp.sum(h, axis=-1) - grid.bottomDepth),
            "normalVelocityGlobalMax": jnp.max(jnp.abs(state.u)),
            "layerThicknessGlobalMin": jnp.min(h),
            "layerThicknessGlobalMax": jnp.max(h),
        }
        # cell kinetic energy via the TRiSK KE weights (ref: global stats
        # 'kineticEnergyCellMax/Avg')
        ke = jnp.sum(m.keW[..., None] * (state.u * state.u)[m.edgesOnCell],
                     axis=1) * m.invAreaCell[:, None]
        out["kineticEnergyGlobal"] = jnp.sum(ke * vol)
        # volume-weighted tracer means (ref: 'avg' columns of global stats)
        names = ["temperature", "salinity"]
        for i in range(min(state.tracers.shape[-1], len(names))):
            tr = state.tracers[..., i]
            out[f"{names[i]}GlobalAvg"] = jnp.sum(tr * vol) / total_vol
            out[f"{names[i]}GlobalMin"] = jnp.min(tr)
            out[f"{names[i]}GlobalMax"] = jnp.max(tr)
        rho = equation_of_state(cfg, state.tracers[..., 0],
                                state.tracers[..., 1])
        out["densityGlobalAvg"] = jnp.sum(rho * vol) / total_vol
        return {k: float(v) for k, v in out.items()}
