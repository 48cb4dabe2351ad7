"""Time-varying external forcing.

ref: src/framework/mpas_forcing.F (2,690 LoC): forcing *groups* own a
forcing clock (offset from the model clock) and a set of *streams*, each
holding fields read from time-series input files and interpolated to the
forcing time — 'constant' (piecewise) or 'linear' interpolation between the
bracketing records, optional cyclic forcing over a fixed cycle
(mpas_forcing_init_group :66, mpas_forcing_init_field :216,
mpas_forcing_get_forcing :1162, restart of the forcing clock :2494).

TPU-native design: forcing is host-side I/O — records load as numpy arrays
(lazily, per file) and interpolate on the host; the step function receives
the interpolated arrays as ordinary jnp inputs, so nothing here is traced.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from mpas_tpu.framework.timekeeping import Time, TimeInterval
from mpas_tpu.io.netcdf import read_netcdf


def _decode_xtime(x) -> list[str]:
    """xtime char array (Time, StrLen) -> list of trimmed strings."""
    out = []
    for row in np.asarray(x):
        s = b"".join(bytes([c]) if isinstance(c, int) else bytes(c)
                     for c in row.tolist()) if row.dtype.kind != "S" \
            else row.tobytes()
        out.append(s.decode().strip().strip("\x00"))
    return out


@dataclasses.dataclass
class ForcingStream:
    """One time-series forcing file: xtime records + named variables."""
    filename: str
    variables: list[str]
    _times: Optional[list[Time]] = None
    _data: Optional[dict] = None
    calendar: str = "gregorian_noleap"

    def _load(self):
        if self._data is not None:
            return
        data = read_netcdf(self.filename)[0]
        if "xtime" not in data:
            raise ValueError(f"forcing file {self.filename} has no xtime")
        self._times = [Time.from_string(s, self.calendar)
                       for s in _decode_xtime(data["xtime"])]
        self._data = {v: np.asarray(data[v]) for v in self.variables}

    @property
    def times(self) -> list[Time]:
        self._load()
        return self._times

    def record(self, i: int) -> dict:
        self._load()
        return {v: self._data[v][i] for v in self.variables}


@dataclasses.dataclass
class ForcingField:
    stream: ForcingStream
    name: str
    interpolation: str = "linear"     # 'linear' | 'constant'


class ForcingGroup:
    """A named set of forcing fields sharing one forcing clock.

    forcing_offset shifts the forcing time relative to the model time
    (ref: forcingIntervalIn/forcing clock offset); cycle_start +
    cycle_duration enable cyclic forcing — times are wrapped into
    [cycle_start, cycle_start + cycle_duration) (ref: cyclic branch of
    mpas_forcing_get_forcing_time :1324).
    """

    def __init__(self, name: str,
                 forcing_offset: TimeInterval = TimeInterval(),
                 cycle_start: Optional[Time] = None,
                 cycle_duration: Optional[TimeInterval] = None):
        self.name = name
        self.offset = forcing_offset
        self.cycle_start = cycle_start
        self.cycle_duration = cycle_duration
        if (cycle_start is None) != (cycle_duration is None):
            raise ValueError("cyclic forcing needs both cycle_start and "
                             "cycle_duration")
        if cycle_duration is not None and cycle_duration.months:
            raise ValueError("cycle_duration must be a fixed-length interval")
        self.fields: dict[str, ForcingField] = {}

    def add_field(self, stream: ForcingStream, name: str,
                  interpolation: str = "linear"):
        if interpolation not in ("linear", "constant"):
            raise ValueError(f"unknown interpolation {interpolation!r}")
        if name not in stream.variables:
            raise ValueError(f"{name!r} not a variable of {stream.filename}")
        self.fields[name] = ForcingField(stream, name, interpolation)

    # -- time machinery ------------------------------------------------------

    def _forcing_time(self, model_time: Time) -> Time:
        t = model_time + self.offset
        if self.cycle_start is not None:
            span = self.cycle_duration.us
            rel = (t.us - self.cycle_start.us) % span
            t = Time(self.cycle_start.us + rel, t.calendar)
        return t

    def _bracket(self, times: list[Time], t: Time):
        """Indices (i0, i1, frac) with times[i0] <= t <= times[i1].

        Cyclic groups wrap across the record boundary; acyclic groups clamp
        to the first/last record (the reference aborts outside the data
        range — clamping is the deliberate forgiving variant, logged by the
        caller if it matters)."""
        n = len(times)
        if n == 1:
            return 0, 0, 0.0
        if t <= times[0]:
            if self.cycle_start is not None:
                span = self.cycle_duration.us
                dt_wrap = (times[0].us - t.us)
                gap = span - (times[-1].us - times[0].us)
                return n - 1, 0, 1.0 - dt_wrap / gap if gap > 0 else 0.0
            return 0, 0, 0.0
        if t >= times[-1]:
            if self.cycle_start is not None:
                span = self.cycle_duration.us
                gap = span - (times[-1].us - times[0].us)
                return (n - 1, 0,
                        (t.us - times[-1].us) / gap if gap > 0 else 0.0)
            return n - 1, n - 1, 0.0
        lo = 0
        for i in range(1, n):
            if times[i] >= t:
                lo = i - 1
                break
        denom = times[lo + 1].us - times[lo].us
        return lo, lo + 1, (t.us - times[lo].us) / denom

    def get_forcing(self, model_time: Time) -> dict:
        """Interpolated forcing arrays at the (offset, wrapped) time
        (ref: mpas_forcing_get_forcing :1162)."""
        t = self._forcing_time(model_time)
        out = {}
        for name, fld in self.fields.items():
            i0, i1, frac = self._bracket(fld.stream.times, t)
            a = fld.stream.record(i0)[name]
            if fld.interpolation == "constant" or i0 == i1:
                out[name] = a
            else:
                b = fld.stream.record(i1)[name]
                out[name] = (1.0 - frac) * a + frac * b
        return out

    # -- restart -------------------------------------------------------------

    def restart_times(self, model_time: Time) -> dict:
        """State needed to restore the forcing clock on restart
        (ref: mpas_forcing_write_restart_times :2494)."""
        return {"group": self.name,
                "forcing_time": self._forcing_time(model_time).to_string()}
