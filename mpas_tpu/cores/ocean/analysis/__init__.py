"""Ocean analysis members: runtime-togglable diagnostic plugins.

ref: src/core_ocean/analysis_members/ — 30+ members driven by
mpas_ocn_analysis_driver.F (:388-701): each member registers init /
compute / restart / finalize callbacks and a per-member compute alarm
(config_AM_<member>_compute_interval). Members write to their own output
streams.

TPU redesign: a member is a small object with `name`, a jittable
`compute(grid, cfg, state) -> dict[str, array]`, and a compute interval in
seconds. The AnalysisDriver owns the member list and calls due members from
host code between jitted step chunks (diagnostics never enter the step
function, so the dycore's XLA program stays fixed).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List

from mpas_tpu.cores.ocean.analysis.global_stats import GlobalStats
from mpas_tpu.cores.ocean.analysis.layer_volume_weighted_average import (
    LayerVolumeWeightedAverage)
from mpas_tpu.cores.ocean.analysis.meridional_heat_transport import (
    MeridionalHeatTransport)
from mpas_tpu.cores.ocean.analysis.mixed_layer_depths import MixedLayerDepths
from mpas_tpu.cores.ocean.analysis.moc import MocStreamfunction
from mpas_tpu.cores.ocean.analysis.okubo_weiss import OkuboWeiss
from mpas_tpu.cores.ocean.analysis.zonal_mean import ZonalMean
from mpas_tpu.cores.ocean.analysis.extra_members import (
    DebugDiagnostics, EddyProductVariables, EliassenPalm,
    HighFrequencyOutput, PointwiseStats, RegionalStats, RpnCalculator,
    SurfaceAreaWeightedAverages, TestComputeInterval, TimeFilters,
    TransectTransport, WaterMassCensus)

_REGISTRY = {
    "globalStats": GlobalStats,
    "zonalMean": ZonalMean,
    "mixedLayerDepths": MixedLayerDepths,
    "meridionalHeatTransport": MeridionalHeatTransport,
    "okuboWeiss": OkuboWeiss,
    "layerVolumeWeightedAverage": LayerVolumeWeightedAverage,
    "mocStreamfunction": MocStreamfunction,
    "eddyProductVariables": EddyProductVariables,
    "waterMassCensus": WaterMassCensus,
    "transectTransport": TransectTransport,
    "highFrequencyOutput": HighFrequencyOutput,
    "surfaceAreaWeightedAverages": SurfaceAreaWeightedAverages,
    "pointwiseStats": PointwiseStats,
    "debugDiagnostics": DebugDiagnostics,
    "timeFilters": TimeFilters,
    "regionalStats": RegionalStats,
    "rpnCalculator": RpnCalculator,
    "eliassenPalm": EliassenPalm,
    "testComputeInterval": TestComputeInterval,
}


def available_members() -> List[str]:
    return sorted(_REGISTRY)


@dataclasses.dataclass
class AnalysisDriver:
    """ref: ocn_analysis_init/compute (mpas_ocn_analysis_driver.F:388-701).

    members: {name: compute_interval_seconds}; results accumulate in
    `history` as (time_seconds, {field: value}) tuples per member.
    """
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

    def _run(self, name, grid, cfg, state, forcing):
        """Members that declare a `forcing` parameter get the surface
        forcing pool (ref: members reading forcingPool)."""
        import inspect
        fn = self._instances[name].compute
        if forcing is not None and \
                "forcing" in inspect.signature(fn).parameters:
            return fn(grid, cfg, state, forcing=forcing)
        return fn(grid, cfg, state)

    def compute_due(self, grid, cfg, state, t_seconds: float,
                    forcing=None):
        """Run every member whose alarm is ringing at model time t."""
        for name, interval in self.members.items():
            if t_seconds + 1e-9 >= self._next_due[name]:
                out = self._run(name, grid, cfg, state, forcing)
                self.history[name].append((t_seconds, out))
                while self._next_due[name] <= t_seconds + 1e-9:
                    self._next_due[name] += interval

    def compute_all(self, grid, cfg, state, t_seconds: float = 0.0,
                    forcing=None):
        for name in self.members:
            out = self._run(name, grid, cfg, state, forcing)
            self.history[name].append((t_seconds, out))
