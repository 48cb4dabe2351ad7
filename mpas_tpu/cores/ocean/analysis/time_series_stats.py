"""Time-series statistics analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_time_series_stats.F — the
reference's general accumulation engine (operations avg/min/max/sum, N
repeated windows for climatologies; instances 'timeSeriesStatsMonthly',
'timeSeriesStatsClimatology', ...). Here: windowed accumulation of a
configurable set of state expressions with avg/min/max, plus a repeated-
bucket mode for climatologies (e.g. 12 monthly buckets).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax.numpy as jnp
import numpy as np

_EXPRESSIONS: Dict[str, Callable] = {
    "ssh": lambda grid, cfg, st: jnp.sum(st.layerThickness, axis=-1)
    - grid.bottomDepth,
    "temperatureSurface": lambda grid, cfg, st: st.tracers[:, 0, 0],
    "kineticEnergyColumn": lambda grid, cfg, st: jnp.sum(st.u * st.u,
                                                         axis=-1),
}


@dataclasses.dataclass
class TimeSeriesStats:
    """One instance (ref: one Registry-configured AM instance).

    window_seconds: accumulation window; at each window end a record
    {field_avg, field_min, field_max} is appended to `records`.
    n_buckets > 1 turns on climatology mode: windows cycle through
    buckets and accumulate across repeats (ref: 'Climatology' instance).
    """
    window_seconds: float
    fields: tuple = ("ssh", "temperatureSurface")
    n_buckets: int = 1
    records: list = dataclasses.field(default_factory=list)
    _acc: dict = dataclasses.field(default_factory=dict)
    _bucket_acc: list = dataclasses.field(default_factory=list)
    _count: int = 0
    _window_start: float = 0.0
    _window_index: int = 0

    def init(self, grid, cfg):
        for f in self.fields:
            if f not in _EXPRESSIONS:
                raise ValueError(f"unknown time-series field '{f}'; "
                                 f"known: {sorted(_EXPRESSIONS)}")
        self._acc = {}
        self._count = 0
        self._bucket_acc = [None] * self.n_buckets

    def accumulate(self, grid, cfg, state, t_seconds: float):
        vals = {f: np.asarray(_EXPRESSIONS[f](grid, cfg, state))
                for f in self.fields}
        if not self._acc:
            for f, v in vals.items():
                self._acc[f] = {"sum": v.copy(), "min": v.copy(),
                                "max": v.copy()}
            self._count = 1
        else:
            for f, v in vals.items():
                a = self._acc[f]
                a["sum"] += v
                np.minimum(a["min"], v, out=a["min"])
                np.maximum(a["max"], v, out=a["max"])
            self._count += 1

        if t_seconds - self._window_start + 1e-9 >= self.window_seconds:
            self._close_window(t_seconds)

    def _close_window(self, t_seconds):
        rec = {}
        for f, a in self._acc.items():
            rec[f"{f}_avg"] = a["sum"] / max(self._count, 1)
            rec[f"{f}_min"] = a["min"]
            rec[f"{f}_max"] = a["max"]
        bucket = self._window_index % self.n_buckets
        if self.n_buckets > 1:
            # climatology: running mean across repeats of this bucket
            prev = self._bucket_acc[bucket]
            if prev is None:
                self._bucket_acc[bucket] = {"n": 1, "rec": rec}
            else:
                n = prev["n"] + 1
                for k in rec:
                    if k.endswith("_avg"):
                        prev["rec"][k] = (prev["rec"][k] * prev["n"]
                                          + rec[k]) / n
                    elif k.endswith("_min"):
                        prev["rec"][k] = np.minimum(prev["rec"][k], rec[k])
                    else:
                        prev["rec"][k] = np.maximum(prev["rec"][k], rec[k])
                prev["n"] = n
        self.records.append((t_seconds, bucket, rec))
        self._acc = {}
        self._count = 0
        self._window_start = t_seconds
        self._window_index += 1

    def climatology(self, bucket: int):
        b = self._bucket_acc[bucket]
        return None if b is None else b["rec"]
