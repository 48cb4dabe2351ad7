"""Sea-ice analysis members: runtime-togglable diagnostic plugins.

ref: src/core_seaice/analysis_members/ — ~17 members driven by
mpas_seaice_analysis_driver.F; each registers init/compute callbacks and
a per-member compute alarm, writing to its own output stream
(Registry_seaice_*.xml). Mirrors the ocean AnalysisDriver redesign
(cores/ocean/analysis/__init__.py): a member is a small object with a
jittable `compute(grid, cfg, state) -> dict`; the driver calls due
members from host code between jitted step chunks so the dynamics XLA
program stays fixed.

Members covered (reference file in parens):
  areaVariables (mpas_seaice_area_variables.F), conservationCheck
  (…conservation_check.F), icePresent (…ice_present.F),
  maximumIcePresence (…maximum_ice_presence.F), miscellaneous
  (…miscellaneous.F), pondDiagnostics (…pond_diagnostics.F),
  ridgingDiagnostics (…ridging_diagnostics.F), temperatures
  (…temperatures.F), regionalStatistics (…regional_statistics.F),
  pointwiseStats (…pointwise_stats.F), highFrequencyOutput
  (…high_frequency_output.F), geographicalVectors
  (…geographical_vectors.F), loadBalance (…load_balance.F),
  unitConversion (…unit_conversion.F), iceShelves (…ice_shelves.F:
  ice area over land-ice-masked cavity cells), timeSeriesStats
  (…time_series_stats.F genre: avg/min/max accumulation over the
  member's own call history).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.seaice.thermo_vertical import (bl99_salinity_profile,
                                                   temperature_ice_bl99,
                                                   temperature_mush)

# sea-ice extent threshold: cells count toward 'extent' when total
# concentration exceeds 0.15 (the reference/observational convention used
# by mpas_seaice_regional_statistics.F)
EXTENT_THRESHOLD = 0.15


def _cell_totals(state):
    a = jnp.sum(state.iceAreaCategory, axis=-1)
    vi = jnp.sum(state.iceVolumeCategory, axis=-1)
    vs = jnp.sum(state.snowVolumeCategory, axis=-1)
    return a, vi, vs


class AreaVariables:
    """Category-aggregated cell fields (iceAreaCell, iceVolumeCell,
    snowVolumeCell, openWaterArea, cell mean thicknesses)."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        a, vi, vs = _cell_totals(state)
        safe_a = jnp.maximum(a, cfg.puny)
        return {
            "iceAreaCell": a,
            "iceVolumeCell": vi,
            "snowVolumeCell": vs,
            "openWaterArea": jnp.maximum(1.0 - a, 0.0),
            "iceThicknessCell": jnp.where(a > cfg.puny, vi / safe_a, 0.0),
            "snowThicknessCell": jnp.where(a > cfg.puny, vs / safe_a, 0.0),
        }


class ConservationCheck:
    """Global mass/energy totals + deltas since the previous call
    (ref: the energy/water/salt conservation accumulators of
    mpas_seaice_conservation_check.F)."""

    def init(self, grid, cfg):
        self._prev = None

    def compute(self, grid, cfg, state):
        area = grid.mesh.areaCell
        _a, vi, vs = _cell_totals(state)
        ice_mass = jnp.sum(vi * area) * cfg.rho_ice
        snow_mass = jnp.sum(vs * area) * cfg.rho_snow
        out = {"totalIceMass": ice_mass, "totalSnowMass": snow_mass}
        if state.iceEnthalpy is not None:
            # q (J/m3) integrated over layer volume: vol/cat/nilyr slabs
            nilyr = state.iceEnthalpy.shape[-1]
            lv = state.iceVolumeCategory[..., None] / nilyr
            out["totalIceEnergy"] = jnp.sum(
                jnp.sum(state.iceEnthalpy * lv, axis=(-1, -2)) * area)
        if state.snowEnthalpy is not None:
            nslyr = state.snowEnthalpy.shape[-1]
            lv = state.snowVolumeCategory[..., None] / nslyr
            out["totalSnowEnergy"] = jnp.sum(
                jnp.sum(state.snowEnthalpy * lv, axis=(-1, -2)) * area)
        prev, self._prev = self._prev, {k: float(v) for k, v in out.items()}
        for k in list(out):
            out[f"{k}Delta"] = (out[k] - prev[k]) if prev else out[k] * 0.0
        return out


class IcePresent:
    """Accumulated fraction-of-calls with ice present per cell."""

    def init(self, grid, cfg):
        self._count = 0
        self._present = None

    def compute(self, grid, cfg, state):
        a, _, _ = _cell_totals(state)
        here = (a > cfg.puny).astype(a.dtype)
        self._count += 1
        self._present = here if self._present is None \
            else self._present + here
        return {"icePresent": here,
                "icePresentFraction": self._present / self._count}


class MaximumIcePresence:
    """Running max concentration per cell over the run."""

    def init(self, grid, cfg):
        self._max = None

    def compute(self, grid, cfg, state):
        a, _, _ = _cell_totals(state)
        self._max = a if self._max is None else jnp.maximum(self._max, a)
        return {"maximumIcePresence": self._max}


class Miscellaneous:
    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        speed = jnp.sqrt(state.uVelocity ** 2 + state.vVelocity ** 2)
        return {"iceSpeedVertex": speed,
                "iceSpeedMax": jnp.max(speed),
                "stressMaxAbs": jnp.max(jnp.abs(state.stress11))}


class PondDiagnostics:
    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        if state.pondArea is None:
            z = jnp.zeros_like(state.iceAreaCategory[:, 0])
            return {"pondAreaCell": z, "pondVolumeCell": z}
        pa = jnp.sum(state.pondArea * state.iceAreaCategory, axis=-1)
        pv = jnp.sum(state.pondArea * state.pondDepth
                     * state.iceAreaCategory, axis=-1)
        return {"pondAreaCell": pa, "pondVolumeCell": pv}


class RidgingDiagnostics:
    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        a, vi, _ = _cell_totals(state)
        if state.levelIceArea is None:
            lvl_a = a
            lvl_v = vi
        else:
            lvl_a = jnp.sum(state.levelIceArea * state.iceAreaCategory,
                            axis=-1)
            lvl_v = jnp.sum(state.levelIceVolume * state.iceVolumeCategory,
                            axis=-1)
        return {"levelIceAreaCell": lvl_a,
                "ridgedIceAreaCell": jnp.maximum(a - lvl_a, 0.0),
                "ridgedIceVolumeCell": jnp.maximum(vi - lvl_v, 0.0)}


class Temperatures:
    """Layer temperatures recovered from the prognostic enthalpies
    (ref: mpas_seaice_temperatures.F converts q -> T via the column
    package's enthalpy inversion)."""

    def init(self, grid, cfg):
        self._sal = jnp.asarray(
            bl99_salinity_profile(cfg.config_n_ice_layers))

    def compute(self, grid, cfg, state):
        if state.iceEnthalpy is None:
            t0 = state.surfaceTemperature
            return {"iceTemperature": t0[..., None],
                    "surfaceTemperatureCell":
                        jnp.mean(t0, axis=-1)}
        q = state.iceEnthalpy
        s = self._sal[None, None, :]
        if cfg.config_thermo_type == "mushy":
            t = temperature_mush(cfg, q, s)
        else:
            t = temperature_ice_bl99(cfg, q, s)
        # only meaningful where ice exists
        has = state.iceVolumeCategory[..., None] > cfg.puny
        t = jnp.where(has, t, 0.0)
        return {"iceTemperature": t,
                "surfaceTemperatureCell":
                    jnp.mean(state.surfaceTemperature, axis=-1)}


class RegionalStatistics:
    """Per-region totals: area, extent (conc > 0.15), volume, snow volume
    (ref: mpas_seaice_regional_statistics.F; default regions = the two
    hemispheres by latCell sign, planar meshes get one global region)."""

    def __init__(self, region_masks: Dict[str, Any] | None = None):
        self._regions = region_masks

    def init(self, grid, cfg):
        if self._regions is None:
            lat = np.asarray(grid.mesh.latCell)
            if np.allclose(lat, 0.0):
                self._regions = {"global": np.ones_like(lat)}
            else:
                self._regions = {"northern": (lat > 0).astype(float),
                                 "southern": (lat <= 0).astype(float)}
        self._regions = {k: jnp.asarray(v)
                         for k, v in self._regions.items()}

    def compute(self, grid, cfg, state):
        area = grid.mesh.areaCell
        a, vi, vs = _cell_totals(state)
        ext = (a > EXTENT_THRESHOLD).astype(a.dtype)
        out = {}
        for name, mask in self._regions.items():
            w = mask * area
            out[f"iceAreaRegion_{name}"] = jnp.sum(a * w)
            out[f"iceExtentRegion_{name}"] = jnp.sum(ext * w)
            out[f"iceVolumeRegion_{name}"] = jnp.sum(vi * w)
            out[f"snowVolumeRegion_{name}"] = jnp.sum(vs * w)
        return out


class PointwiseStats:
    """Field values sampled at chosen cells."""

    def __init__(self, cell_ids=(0,)):
        self._cells = jnp.asarray(np.asarray(cell_ids, dtype=np.int32))

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        a, vi, vs = _cell_totals(state)
        c = self._cells
        return {"iceAreaPoints": a[c], "iceVolumePoints": vi[c],
                "snowVolumePoints": vs[c]}


class HighFrequencyOutput:
    """Cheap 2-D snapshot set for sub-stream-interval output."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        a, vi, _ = _cell_totals(state)
        return {"iceAreaCellHF": a, "iceVolumeCellHF": vi,
                "uVelocityHF": state.uVelocity,
                "vVelocityHF": state.vVelocity}


class GeographicalVectors:
    """Vertex velocities projected onto geographic (zonal, meridional)
    axes (ref: mpas_seaice_geographical_vectors.F). The prognostic
    (u, v) already live in the local (east, north) frame, so on the
    sphere this is a rotation by the local-frame offset — identity in
    this mesh convention — and the member's job is the cell-centred
    area-weighted aggregate the reference writes out."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        m = grid.mesh
        # vertex -> cell: arithmetic mean over the cell's vertices (a
        # polygon has one vertex per edge slot, so edgesOnCellMask is the
        # per-slot validity for verticesOnCell too)
        voc = m.verticesOnCell
        vocm = m.edgesOnCellMask
        nv = jnp.maximum(jnp.sum(vocm, axis=1), 1.0)
        u_c = jnp.sum(state.uVelocity[voc] * vocm, axis=1) / nv
        v_c = jnp.sum(state.vVelocity[voc] * vocm, axis=1) / nv
        return {"uGeographicalCell": u_c, "vGeographicalCell": v_c}


class LoadBalance:
    """Cells-with-ice count (the reference's per-block load metric)."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        a, _, _ = _cell_totals(state)
        return {"nCellsWithIce": jnp.sum((a > cfg.puny).astype(jnp.int32))}


class UnitConversion:
    """Headline numbers in publication units (10^6 km^2, km^3)."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        area = grid.mesh.areaCell
        a, vi, _ = _cell_totals(state)
        ext = (a > EXTENT_THRESHOLD).astype(a.dtype)
        return {
            "iceExtentMkm2": jnp.sum(ext * area) / 1.0e12,
            "iceAreaMkm2": jnp.sum(a * area) / 1.0e12,
            "iceVolumeKm3": jnp.sum(vi * area) / 1.0e9,
        }


class TimeSeriesStats:
    """Running avg/min/max of scalar diagnostics across calls (the
    time_series_stats genre; daily/monthly/climatology variants are this
    operator driven at different compute intervals)."""

    def init(self, grid, cfg):
        self._n = 0
        self._acc = {}

    def compute(self, grid, cfg, state):
        area = grid.mesh.areaCell
        a, vi, _ = _cell_totals(state)
        cur = {"iceArea": float(jnp.sum(a * area)),
               "iceVolume": float(jnp.sum(vi * area))}
        self._n += 1
        for k, v in cur.items():
            s = self._acc.setdefault(k, {"sum": 0.0, "min": v, "max": v})
            s["sum"] += v
            s["min"] = min(s["min"], v)
            s["max"] = max(s["max"], v)
        out = {}
        for k, s in self._acc.items():
            out[f"{k}Avg"] = s["sum"] / self._n
            out[f"{k}Min"] = s["min"]
            out[f"{k}Max"] = s["max"]
        return out


class IceShelves:
    """Ice area over ice-shelf cavities: sum(iceAreaCell * areaCell) over
    cells flagged by a land-ice mask (ref:
    mpas_seaice_ice_shelves.F:223-322, iceAreaOverIceShelves). The
    reference mask arrives from the ocean coupler (landIceMask in the
    ocean_coupling pool); standalone runs here take an explicit mask.
    Without one the member reports ZERO (matching the reference when no
    coupler supplies landIceMask) rather than mislabeling all Southern
    Ocean ice as shelf-cavity ice — pass land_ice_mask explicitly to
    activate the diagnostic."""

    def __init__(self, land_ice_mask: Any | None = None):
        self._mask = land_ice_mask

    def init(self, grid, cfg):
        if self._mask is None:
            self._mask = np.zeros(grid.mesh.nCells)
        self._mask = jnp.asarray(self._mask)

    def compute(self, grid, cfg, state):
        a, _, _ = _cell_totals(state)
        return {"iceAreaOverIceShelves":
                jnp.sum(a * grid.mesh.areaCell * self._mask)}


_REGISTRY = {
    "areaVariables": AreaVariables,
    "iceShelves": IceShelves,
    "conservationCheck": ConservationCheck,
    "icePresent": IcePresent,
    "maximumIcePresence": MaximumIcePresence,
    "miscellaneous": Miscellaneous,
    "pondDiagnostics": PondDiagnostics,
    "ridgingDiagnostics": RidgingDiagnostics,
    "temperatures": Temperatures,
    "regionalStatistics": RegionalStatistics,
    "pointwiseStats": PointwiseStats,
    "highFrequencyOutput": HighFrequencyOutput,
    "geographicalVectors": GeographicalVectors,
    "loadBalance": LoadBalance,
    "unitConversion": UnitConversion,
    "timeSeriesStats": TimeSeriesStats,
}


def available_members() -> List[str]:
    return sorted(_REGISTRY)


@dataclasses.dataclass
class SeaiceAnalysisDriver:
    """members: {name: compute_interval_seconds}; results accumulate in
    `history` as (time_seconds, {field: value}) per member. Same alarm
    semantics as the ocean AnalysisDriver."""
    members: Dict[str, float]
    history: Dict[str, list] = dataclasses.field(default_factory=dict)
    _instances: Dict[str, Any] = dataclasses.field(default_factory=dict)
    _next_due: Dict[str, float] = dataclasses.field(default_factory=dict)

    def init(self, grid, cfg):
        for name in self.members:
            if name not in _REGISTRY:
                raise ValueError(f"unknown analysis member '{name}'; "
                                 f"available: {available_members()}")
            self._instances[name] = _REGISTRY[name]()
            self._instances[name].init(grid, cfg)
            self.history[name] = []
            self._next_due[name] = 0.0

    def compute_due(self, grid, cfg, state, t_seconds: float):
        for name, interval in self.members.items():
            if t_seconds + 1e-9 >= self._next_due[name]:
                out = self._instances[name].compute(grid, cfg, state)
                self.history[name].append((t_seconds, out))
                while self._next_due[name] <= t_seconds + 1e-9:
                    self._next_due[name] += interval

    def compute_all(self, grid, cfg, state, t_seconds: float = 0.0):
        for name in self.members:
            out = self._instances[name].compute(grid, cfg, state)
            self.history[name].append((t_seconds, out))
