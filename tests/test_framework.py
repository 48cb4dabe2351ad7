"""Framework subsystem tests: timekeeping, streams/restart, namelist, log,
timers.

Parity model: the reference test core's timekeeping interval arithmetic
tests + stream I/O round-trip tests (ref: mpas_test_core_timekeeping_tests.F,
mpas_test_core_streams.F:38) and the compass restart_test genre (SURVEY §4).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.framework.timekeeping import (Alarm, Clock, Time, TimeInterval)


class TestTimekeeping:
    def test_parse_roundtrip(self):
        for s in ("0000-01-01_00:00:00", "2000-02-28_23:59:59",
                  "1999-12-31_12:30:00"):
            assert Time.from_string(s).to_string() == s

    def test_add_interval_day_crossing(self):
        t = Time.from_string("0000-01-31_18:00:00")
        t2 = t + TimeInterval.from_string("12:00:00")
        assert t2.to_string() == "0000-02-01_06:00:00"

    def test_leap_calendars(self):
        g = Time.from_string("2000-02-28_00:00:00", "gregorian")
        assert (g + TimeInterval.from_string("1_00:00:00")).to_string() \
            == "2000-02-29_00:00:00"
        nl = Time.from_string("2000-02-28_00:00:00", "gregorian_noleap")
        assert (nl + TimeInterval.from_string("1_00:00:00")).to_string() \
            == "2000-03-01_00:00:00"
        d360 = Time.from_string("2000-02-28_00:00:00", "360day")
        assert (d360 + TimeInterval.from_string("3_00:00:00")).to_string() \
            == "2000-03-01_00:00:00"

    def test_fractional_dt_exact(self):
        """config_dt=172.8 s must accumulate exactly (500 steps = 1 day)."""
        t = Time.from_string("0000-01-01_00:00:00")
        dt = TimeInterval.from_seconds(172.8)
        assert (t + dt * 500).to_string() == "0000-01-02_00:00:00"

    def test_month_interval(self):
        t = Time.from_string("2000-01-31_00:00:00", "gregorian")
        t2 = t + TimeInterval(months=1)
        assert t2.to_string() == "2000-02-29_00:00:00"  # clamped

    def test_alarm_periodic(self):
        start = Time.from_string("0000-01-01_00:00:00")
        clock = Clock(start, TimeInterval.from_seconds(3600))
        clock.add_alarm(Alarm("out", interval=TimeInterval.from_string(
            "6:00:00"), reference=start))
        rings = []
        for i in range(25):
            if clock.is_ringing("out"):
                rings.append(i)
                clock.reset_alarm("out")
            clock.advance()
        assert rings == [0, 6, 12, 18, 24]

    def test_steps_until_stop(self):
        start = Time.from_string("0000-01-01_00:00:00")
        clock = Clock(start, TimeInterval.from_seconds(172.8),
                      run_duration=TimeInterval.from_string("1_00:00:00"))
        assert clock.steps_until_stop() == 500


class TestNamelist:
    def test_parse_file(self, tmp_path):
        from mpas_tpu.framework.namelist import from_namelist_file
        from mpas_tpu.cores.sw.config import SWConfig
        nml = tmp_path / "namelist.sw"
        nml.write_text("""&sw_model
   config_test_case = 2
   config_dt = 300.0
   config_monotonic = .true.
   config_time_integration = 'RK4'
/
&dimensions
   config_nvertlevels = 1
/
""")
        cfg = from_namelist_file(SWConfig, str(nml))
        assert cfg.config_test_case == 2
        assert cfg.config_dt == 300.0
        assert cfg.config_monotonic is True
        assert cfg.config_time_integration == "RK4"
        # untouched defaults survive
        assert cfg.config_apvm_upwinding == 0.5


class TestStreams:
    def _mgr(self, tmp_path, dt_s=3600.0, out_interval="6:00:00"):
        from mpas_tpu.framework.streams import Stream, StreamManager
        start = Time.from_string("0000-01-01_00:00:00")
        clock = Clock(start, TimeInterval.from_seconds(dt_s))
        mgr = StreamManager(clock, run_dir=str(tmp_path))
        mgr.add_stream(Stream(
            name="output", direction="output",
            filename_template="output.$Y-$M-$D_$h.$m.$s.nc",
            fields=["h", "u"], output_interval=out_interval))
        return mgr, clock

    def test_write_read_roundtrip(self, tmp_path):
        mgr, clock = self._mgr(tmp_path)
        h = np.linspace(0, 1, 10)
        u = np.linspace(1, 2, 30)
        provider = lambda n: (("nCells",), h) if n == "h" else (("nEdges",), u)
        fname = mgr.write("output", provider,
                          dims={"nCells": 10, "nEdges": 30})
        assert fname and os.path.exists(fname)
        data, dims, _ = mgr.read("output")
        assert np.allclose(data["h"], h)
        assert np.allclose(data["u"], u)

    def test_alarm_gating(self, tmp_path):
        mgr, clock = self._mgr(tmp_path)
        provider = lambda n: (("one",), np.zeros(1))
        writes = 0
        for _ in range(13):
            if mgr.write("output", provider, dims={"one": 1}):
                writes += 1
            clock.advance()
        assert writes == 3  # t=0h, 6h, 12h

    def test_clobber_never_modify(self, tmp_path):
        from mpas_tpu.framework.streams import Stream, StreamManager
        start = Time.from_string("0000-01-01_00:00:00")
        clock = Clock(start, TimeInterval.from_seconds(3600))
        mgr = StreamManager(clock, run_dir=str(tmp_path))
        mgr.add_stream(Stream(name="x", direction="output",
                              filename_template="fixed.nc", fields=["a"],
                              output_interval="1:00:00",
                              clobber_mode="never_modify"))
        provider = lambda n: (("one",), np.zeros(1))
        mgr.write("x", provider, dims={"one": 1}, force=True)
        with pytest.raises(FileExistsError):
            mgr.write("x", provider, dims={"one": 1}, force=True)

    def test_parse_streams_xml(self, tmp_path):
        from mpas_tpu.framework.streams import parse_streams_xml
        xml = tmp_path / "streams.sw"
        xml.write_text("""<streams>
<immutable_stream name="restart" type="input;output"
   filename_template="restart.$Y-$M-$D_$h.$m.$s.nc"
   input_interval="initial_only" output_interval="1_00:00:00"/>
<stream name="output" type="output" filename_template="output.nc"
   output_interval="6:00:00">
   <var name="h"/> <var name="u"/>
</stream>
</streams>""")
        streams = parse_streams_xml(str(xml))
        assert [s.name for s in streams] == ["restart", "output"]
        assert streams[0].direction == "input;output"
        assert streams[1].fields == ["h", "u"]


class TestRestartEquivalence:
    """compass restart_test parity: run N == run N/2 + checkpoint + resume."""

    def test_sw_restart(self, sphere_mesh_small, tmp_path):
        from mpas_tpu.mesh.mesh import to_device
        from mpas_tpu.cores.sw import test_cases as tc
        from mpas_tpu.cores.sw.config import SWConfig
        from mpas_tpu.cores.sw.time_integration import run_steps
        from mpas_tpu.framework.streams import Stream, StreamManager

        mesh, state, h_s = tc.test_case_5(sphere_mesh_small)
        cfg = SWConfig(config_dt=900.0, config_test_case=5)
        md = to_device(mesh)
        s0 = jax.tree.map(jnp.asarray, state)
        hs = jnp.asarray(h_s)

        full = run_steps(md, cfg, s0, hs, 10)

        half = run_steps(md, cfg, s0, hs, 5)
        # checkpoint through the stream system
        start = Time.from_string("0000-01-01_00:00:00")
        clock = Clock(start, TimeInterval.from_seconds(900.0))
        clock.advance(5)
        mgr = StreamManager(clock, run_dir=str(tmp_path))
        mgr.add_stream(Stream(
            name="restart", direction="input;output",
            filename_template="restart.$Y-$M-$D_$h.$m.$s.nc",
            fields=["u", "h", "tracers"], output_interval="1:00:00"))
        arrays = {"u": (("nEdges",), np.asarray(half.u)),
                  "h": (("nCells",), np.asarray(half.h)),
                  "tracers": (("nCells", "nTracers"),
                              np.asarray(half.tracers))}
        mgr.write("restart", lambda n: arrays[n],
                  dims={"nCells": mesh.nCells, "nEdges": mesh.nEdges,
                        "nTracers": 2}, force=True)

        data, _, _ = mgr.read("restart")
        from mpas_tpu.cores.sw.state import SWState
        resumed = SWState(u=jnp.asarray(data["u"]), h=jnp.asarray(data["h"]),
                          tracers=jnp.asarray(data["tracers"]))
        full2 = run_steps(md, cfg, resumed, hs, 5)

        # float64 fields written/read losslessly -> bitwise-identical resume
        assert np.array_equal(np.asarray(full.h), np.asarray(full2.h))
        assert np.array_equal(np.asarray(full.u), np.asarray(full2.u))
        assert np.array_equal(np.asarray(full.tracers),
                              np.asarray(full2.tracers))


class TestLogAndTimers:
    def test_log_crit_raises(self, tmp_path):
        from mpas_tpu.framework.log import LogManager, MPASLogError
        log = LogManager("sw", run_dir=str(tmp_path))
        log.write("hello {x}", x=42)
        with pytest.raises(MPASLogError):
            log.write("boom", message_type="CRIT")
        text = open(os.path.join(str(tmp_path), "log.sw.0000.out")).read()
        assert "hello 42" in text
        assert "CRITICAL ERROR: boom" in text

    def test_timer_nesting(self):
        from mpas_tpu.framework.timers import TimerManager
        tm = TimerManager()
        with tm.timer("outer"):
            with tm.timer("inner"):
                pass
            with tm.timer("inner"):
                pass
        table = tm.table()
        assert "outer" in table and "inner" in table
        assert tm.root.children["outer"].children["inner"].count == 2


class TestPackageGatingAndStreamHardening:
    """ref: package-gated allocation (gen_inc.c:478, mpas_dmpar.F:5226),
    clobber modes (mpas_stream_manager.F:363), regex streamIDs
    (regex_matching.c)."""

    def _schema(self, tmp_path):
        from mpas_tpu.framework.registry import load_schema
        xml = """<registry core="t" version="1">
<dims><dim name="nCells" definition="namelist"/>
<dim name="nz" definition="5"/></dims>
<packages><package name="pkgA" description="a"/>
<package name="pkgB" description="b"/></packages>
<var_struct name="state" time_levs="2">
<var name="h" type="real" dimensions="nz nCells" units="m" description="d"/>
<var name="extraA" type="real" dimensions="nCells" packages="pkgA"
 units="m" description="d"/>
<var name="extraB" type="real" dimensions="nCells" packages="pkgB"
 units="m" description="d"/>
</var_struct></registry>"""
        p = tmp_path / "Registry.xml"
        p.write_text(xml)
        return load_schema(str(p))

    def test_inactive_package_field_vanishes_from_state(self, tmp_path):
        from mpas_tpu.framework.registry import build_state_pytree
        schema = self._schema(tmp_path)
        dims = {"nCells": 10, "nz": 5}
        st = build_state_pytree(schema, dims, active_packages={"pkgA"})
        assert "h" in st["state"]           # package-less: always there
        assert "extraA" in st["state"]      # active package
        assert "extraB" not in st["state"]  # inactive: never allocated
        st_all = build_state_pytree(schema, dims)   # None = all active
        assert "extraB" in st_all["state"]

    def _mgr(self, tmp_path, active=None, clobber="overwrite"):
        from mpas_tpu.framework.streams import Stream, StreamManager
        from mpas_tpu.framework.timekeeping import Clock, Time, TimeInterval
        clock = Clock(Time.from_string("0001-01-01_00:00:00", "gregorian"),
                      TimeInterval.from_string("01:00:00"))
        mgr = StreamManager(clock, run_dir=str(tmp_path),
                            active_packages=active)
        mgr.add_stream(Stream(
            name="output", direction="output", filename_template="out.nc",
            fields=["h", "extraB"], output_interval="01:00:00",
            clobber_mode=clobber,
            field_packages={"extraB": ("pkgB",)}))
        mgr.add_stream(Stream(
            name="block_1", direction="output",
            filename_template="b1.nc", fields=["h"],
            output_interval="01:00:00"))
        mgr.add_stream(Stream(
            name="block_2", direction="output",
            filename_template="b2.nc", fields=["h"],
            output_interval="01:00:00"))
        return mgr

    @staticmethod
    def _provider(f):
        return ("nCells",), np.arange(4.0)

    def test_inactive_field_vanishes_from_output(self, tmp_path):
        from mpas_tpu.io.netcdf import read_netcdf
        mgr = self._mgr(tmp_path, active={"pkgA"})
        fn = mgr.write("output", self._provider, {"nCells": 4}, force=True)
        data, _, _ = read_netcdf(fn)
        assert "h" in data and "extraB" not in data
        mgr2 = self._mgr(tmp_path, active={"pkgA", "pkgB"},
                         clobber="overwrite")
        fn2 = mgr2.write("output", self._provider, {"nCells": 4},
                         force=True)
        data2, _, _ = read_netcdf(fn2)
        assert "extraB" in data2

    def test_regex_stream_ids(self, tmp_path):
        mgr = self._mgr(tmp_path)
        assert sorted(mgr.streams_matching("block_.*")) == ["block_1",
                                                            "block_2"]
        assert mgr.streams_matching("output") == ["output"]
        out = mgr.write_matching("block_.*", self._provider,
                                 {"nCells": 4}, force=True)
        assert len(out) == 2 and all(o is not None for o in out)

    def test_clobber_never_modify_protects_restart(self, tmp_path):
        mgr = self._mgr(tmp_path, clobber="never_modify")
        mgr.write("output", self._provider, {"nCells": 4}, force=True)
        with pytest.raises(FileExistsError):
            mgr.write("output", self._provider, {"nCells": 4}, force=True)

    def test_clobber_append_accumulates_records(self, tmp_path):
        from mpas_tpu.io.netcdf import read_netcdf
        mgr = self._mgr(tmp_path, clobber="append")
        fn = mgr.write("output", self._provider, {"nCells": 4}, force=True)
        mgr.write("output", self._provider, {"nCells": 4}, force=True)
        data, _, _ = read_netcdf(fn)
        assert data["h"].shape[0] == 2      # two records


class TestShardedIO:
    """Per-host aggregated restart shards (ref: PIO iotasks/stride,
    mpas_framework.F:89-104; IO-decomp transposes mpas_dmpar.F:2260+)."""

    @pytest.mark.parametrize("group_size", [1, 4])
    def test_roundtrip(self, tmp_path, group_size):
        import jax
        from mpas_tpu.io.sharded import read_sharded, write_sharded
        from mpas_tpu.mesh.sphere import icosahedral_mesh
        from mpas_tpu.parallel.layout import build_sharded_mesh
        from mpas_tpu.parallel.partition import sfc_partition
        from mpas_tpu.parallel.runner import scatter_field

        mesh = icosahedral_mesh(8, lloyd_iters=1)
        part = sfc_partition(mesh, 8)
        sm = build_sharded_mesh(mesh, part, halo_depth=2)
        rng = np.random.default_rng(3)
        h = rng.standard_normal((mesh.nCells, 5))
        u = rng.standard_normal((mesh.nEdges, 5))
        fields = {"h": scatter_field(sm, h, "cell"),
                  "u": scatter_field(sm, u, "edge")}
        d = str(tmp_path / f"ckpt{group_size}")
        write_sharded(d, sm, fields, {"h": "cell", "u": "edge"},
                      {"cell": mesh.nCells, "edge": mesh.nEdges},
                      group_size=group_size, attrs={"xtime": "t0"})
        back, attrs = read_sharded(d)
        np.testing.assert_array_equal(back["h"], h)
        np.testing.assert_array_equal(back["u"], u)
        assert attrs["xtime"] == "t0"
        import os
        n_files = len([f for f in os.listdir(d) if f.endswith(".npz")])
        assert n_files == (8 if group_size == 1 else 2)
