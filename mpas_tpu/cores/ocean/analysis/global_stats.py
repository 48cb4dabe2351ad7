"""Global statistics analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_global_stats.F — the
reference sweeps EVERY field of the state pool computing global min /
max / sum / rms / area-or-volume-weighted mean plus vertical sums
(:117-1579, the min/max/sum/avg "stats" columns). This member does the
same over every array field of OcnState (discovered via the dataclass,
so new prognostics are swept automatically) rather than a hand-picked
subset; dmpar reductions become jnp reductions that lower to
psum/pmin/pmax under shard_map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpas_tpu.cores.ocean.core import equation_of_state

_TRACER_NAMES = ["temperature", "salinity", "tracer3", "tracer4",
                 "tracer5", "tracer6", "tracer7", "tracer8"]


class GlobalStats:
    def init(self, grid, cfg):
        pass

    def _field_stats(self, out, name, f, weight, wsum):
        """min/max/sum/avg/rms (+ vertical sum extremes for 3D fields) —
        the reference's per-field stats columns."""
        out[f"{name}GlobalMin"] = jnp.min(f)
        out[f"{name}GlobalMax"] = jnp.max(f)
        out[f"{name}GlobalSum"] = jnp.sum(f * weight)
        out[f"{name}GlobalAvg"] = out[f"{name}GlobalSum"] / wsum
        out[f"{name}GlobalRms"] = jnp.sqrt(
            jnp.sum(f * f * weight) / wsum)
        if f.ndim >= 2 and f.shape[-1] > 1:
            vs = jnp.sum(f, axis=1)
            out[f"{name}VertSumMin"] = jnp.min(vs)
            out[f"{name}VertSumMax"] = jnp.max(vs)

    def compute(self, grid, cfg, state):
        m = grid.mesh
        area = m.areaCell[:, None]
        h = state.layerThickness
        vol = h * area
        total_vol = jnp.sum(vol)
        total_area = jnp.sum(m.areaCell)
        out = {}

        # --- full sweep over every OcnState array field ------------------
        for fdef in dataclasses.fields(state):
            f = getattr(state, fdef.name)
            if f is None:
                continue
            f = jnp.asarray(f)
            if fdef.name == "tracers":
                for i in range(f.shape[-1]):
                    nm = _TRACER_NAMES[i] if i < len(_TRACER_NAMES) \
                        else f"tracer{i+1}"
                    self._field_stats(out, nm, f[..., i], vol, total_vol)
                continue
            if f.shape[0] == m.nCells:
                w, ws = (vol, total_vol) if f.ndim >= 2 \
                    else (m.areaCell, total_area)
            elif f.shape[0] == m.nEdges:
                # edge fields weighted by the edge area dv*dc/2
                ae = 0.5 * m.dvEdge * m.dcEdge
                w = ae[:, None] if f.ndim >= 2 else ae
                ws = jnp.sum(ae) * (f.shape[-1] if f.ndim >= 2 else 1.0)
            else:
                w, ws = 1.0, float(f.size)
            self._field_stats(out, fdef.name, f, w, ws)

        # --- derived diagnostics (ref stats: ssh, KE, density, CFL) ------
        out["volumeCellGlobal"] = total_vol
        # reference field names for the prognostics (Registry names)
        out["normalVelocityGlobalMax"] = jnp.max(jnp.abs(state.u))
        ssh = jnp.sum(h, axis=-1) - grid.bottomDepth
        self._field_stats(out, "ssh", ssh, m.areaCell, total_area)
        ke = jnp.sum(m.keW[..., None] * (state.u * state.u)[m.edgesOnCell],
                     axis=1) * m.invAreaCell[:, None]
        out["kineticEnergyGlobal"] = jnp.sum(ke * vol)
        out["kineticEnergyCellMax"] = jnp.max(ke)
        rho = equation_of_state(cfg, state.tracers[..., 0],
                                state.tracers[..., 1])
        self._field_stats(out, "density", rho, vol, total_vol)
        # horizontal CFL number (ref: CFLNumberGlobal)
        dt = cfg.config_dt
        cfl = jnp.max(jnp.abs(state.u)
                      * (dt * m.invDcEdge[:, None]))
        out["CFLNumberGlobal"] = cfl
        return {k: float(v) for k, v in out.items()}
