"""Framework forcing: interpolation, offsets, cyclic wrapping
(ref: src/framework/mpas_forcing.F; SURVEY §2.1)."""

import numpy as np
import pytest

from mpas_tpu.framework.forcing import ForcingGroup, ForcingStream
from mpas_tpu.framework.timekeeping import Time, TimeInterval
from mpas_tpu.io.netcdf import write_netcdf


def _write_forcing(path, times, values):
    n = len(times)
    xt = np.zeros((n, 64), dtype="S1")
    for i, t in enumerate(times):
        for j, ch in enumerate(t):
            xt[i, j] = ch.encode()
    write_netcdf(str(path),
                 {"Time": n, "StrLen": 64, "nCells": len(values[0])},
                 {"xtime": (("Time", "StrLen"), xt),
                  "airTemperature": (("Time", "nCells"),
                                     np.asarray(values, dtype=np.float64))})


@pytest.fixture
def forcing_file(tmp_path):
    p = tmp_path / "forcing.nc"
    _write_forcing(p, ["0000-01-01_00:00:00", "0000-01-01_06:00:00",
                       "0000-01-01_12:00:00", "0000-01-01_18:00:00"],
                   [[0.0, 10.0], [6.0, 16.0], [12.0, 22.0], [18.0, 28.0]])
    return str(p)


class TestForcing:
    def test_linear_interpolation(self, forcing_file):
        g = ForcingGroup("atm")
        s = ForcingStream(forcing_file, ["airTemperature"])
        g.add_field(s, "airTemperature")
        out = g.get_forcing(Time.from_string("0000-01-01_03:00:00"))
        np.testing.assert_allclose(out["airTemperature"], [3.0, 13.0])
        out = g.get_forcing(Time.from_string("0000-01-01_06:00:00"))
        np.testing.assert_allclose(out["airTemperature"], [6.0, 16.0])

    def test_constant_interpolation(self, forcing_file):
        g = ForcingGroup("atm")
        s = ForcingStream(forcing_file, ["airTemperature"])
        g.add_field(s, "airTemperature", interpolation="constant")
        out = g.get_forcing(Time.from_string("0000-01-01_05:59:00"))
        np.testing.assert_allclose(out["airTemperature"], [0.0, 10.0])

    def test_offset(self, forcing_file):
        g = ForcingGroup("atm",
                         forcing_offset=TimeInterval.from_seconds(3 * 3600))
        s = ForcingStream(forcing_file, ["airTemperature"])
        g.add_field(s, "airTemperature")
        out = g.get_forcing(Time.from_string("0000-01-01_00:00:00"))
        np.testing.assert_allclose(out["airTemperature"], [3.0, 13.0])

    def test_cyclic_wrapping(self, forcing_file):
        g = ForcingGroup(
            "atm", cycle_start=Time.from_string("0000-01-01_00:00:00"),
            cycle_duration=TimeInterval.from_seconds(24 * 3600))
        s = ForcingStream(forcing_file, ["airTemperature"])
        g.add_field(s, "airTemperature")
        # 1 day + 3h wraps to 03:00
        out = g.get_forcing(Time.from_string("0000-01-02_03:00:00"))
        np.testing.assert_allclose(out["airTemperature"], [3.0, 13.0])
        # 21:00 is between the last record (18) and the wrapped first (0+24)
        out = g.get_forcing(Time.from_string("0000-01-01_21:00:00"))
        np.testing.assert_allclose(out["airTemperature"], [9.0, 19.0])

    def test_acyclic_clamps(self, forcing_file):
        g = ForcingGroup("atm")
        s = ForcingStream(forcing_file, ["airTemperature"])
        g.add_field(s, "airTemperature")
        out = g.get_forcing(Time.from_string("0000-01-02_09:00:00"))
        np.testing.assert_allclose(out["airTemperature"], [18.0, 28.0])

    def test_bad_args_raise(self, forcing_file):
        s = ForcingStream(forcing_file, ["airTemperature"])
        g = ForcingGroup("atm")
        with pytest.raises(ValueError, match="interpolation"):
            g.add_field(s, "airTemperature", interpolation="cubic")
        with pytest.raises(ValueError, match="not a variable"):
            g.add_field(s, "bogus")
        with pytest.raises(ValueError, match="cycle_start"):
            ForcingGroup("x", cycle_duration=TimeInterval.from_seconds(60))

    def test_restart_times(self, forcing_file):
        g = ForcingGroup("atm",
                         forcing_offset=TimeInterval.from_seconds(3600))
        rt = g.restart_times(Time.from_string("0000-01-01_05:00:00"))
        assert rt == {"group": "atm", "forcing_time": "0000-01-01_06:00:00"}
