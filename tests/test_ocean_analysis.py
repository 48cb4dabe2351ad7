"""Ocean analysis members: driver alarms + member correctness.

Parity model: the analysis-member subsystem (mpas_ocn_analysis_driver.F
:388-701) with per-member compute intervals; member values checked against
hand-computed invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.core import OcnConfig, run_steps
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
from mpas_tpu.cores.ocean.analysis import AnalysisDriver, available_members


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(8, 16, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    return (jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state))


def test_registry_lists_members():
    names = available_members()
    for expect in ["globalStats", "zonalMean", "mixedLayerDepths",
                   "meridionalHeatTransport", "okuboWeiss"]:
        assert expect in names


def test_driver_alarm_intervals(channel):
    grid, state = channel
    cfg = OcnConfig()
    drv = AnalysisDriver(members={"globalStats": 3600.0})
    drv.init(grid, cfg)
    for t in [0.0, 600.0, 3600.0, 4000.0, 7200.0]:
        drv.compute_due(grid, cfg, state, t)
    times = [t for t, _ in drv.history["globalStats"]]
    assert times == [0.0, 3600.0, 7200.0]


def test_global_stats_invariants(channel):
    grid, state = channel
    cfg = OcnConfig()
    drv = AnalysisDriver(members={"globalStats": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state)
    _, out = drv.history["globalStats"][0]
    vol_direct = float(jnp.sum(state.layerThickness
                               * grid.mesh.areaCell[:, None]))
    assert out["volumeCellGlobal"] == pytest.approx(vol_direct, rel=1e-12)
    assert out["temperatureGlobalMin"] <= out["temperatureGlobalAvg"] \
        <= out["temperatureGlobalMax"]
    assert out["normalVelocityGlobalMax"] == 0.0   # initial state at rest


def test_zonal_mean_uniform_field(channel):
    grid, state = channel
    cfg = OcnConfig()
    st2 = state.replace(tracers=state.tracers.at[..., 0].set(7.5))
    drv = AnalysisDriver(members={"zonalMean": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, st2)
    _, out = drv.history["zonalMean"][0]
    zm = out["zonalMeanTemperature"]
    occupied = out["zonalMeanThickness"][:, 0] > 0.0
    assert occupied.sum() >= 8
    assert np.allclose(zm[occupied], 7.5)


def test_mld_detects_pycnocline(channel):
    grid, state = channel
    cfg = OcnConfig()
    # two-layer temperature: warm above 250m, cold below
    h = state.layerThickness
    z_mid = np.asarray(jnp.cumsum(h, axis=-1) - 0.5 * h)
    t = np.where(z_mid < 250.0, 15.0, 5.0)
    st2 = state.replace(tracers=state.tracers.at[..., 0].set(jnp.asarray(t)))
    drv = AnalysisDriver(members={"mixedLayerDepths": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, st2)
    _, out = drv.history["mixedLayerDepths"][0]
    # MLD should sit near the 250 m interface (layers are ~100 m here)
    assert np.all(out["tThreshMLD"] > 100.0)
    assert np.all(out["tThreshMLD"] < 400.0)


def test_mht_zero_at_rest_nonzero_with_flow(channel):
    grid, state = channel
    cfg = OcnConfig()
    drv = AnalysisDriver(members={"meridionalHeatTransport": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state)
    _, out0 = drv.history["meridionalHeatTransport"][0]
    assert np.allclose(out0["meridionalHeatTransportLat"], 0.0)
    st2 = state.replace(u=state.u + 0.1)
    drv.compute_all(grid, cfg, st2)
    _, out1 = drv.history["meridionalHeatTransport"][1]
    assert np.any(np.abs(out1["meridionalHeatTransportLat"]) > 0.0)


def test_okubo_weiss_solid_body_rotation_negative(channel):
    """Pure rotation (vorticity, no strain) => W < 0 in the core."""
    grid, state = channel
    cfg = OcnConfig()
    m = grid.mesh
    # solid-body rotation about domain center: u = Omega k x r
    xc = 0.5 * (float(jnp.min(m.xCell)) + float(jnp.max(m.xCell)))
    yc = 0.5 * (float(jnp.min(m.yCell)) + float(jnp.max(m.yCell)))
    om = 1e-5
    ue = (-om * (m.yEdge - yc) * jnp.cos(m.angleEdge)
          + om * (m.xEdge - xc) * jnp.sin(m.angleEdge))
    u = jnp.broadcast_to(ue[:, None], state.u.shape) \
        * (1.0 - m.boundaryEdge)[:, None]
    st2 = state.replace(u=u)
    drv = AnalysisDriver(members={"okuboWeiss": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, st2)
    _, out = drv.history["okuboWeiss"][0]
    ow = out["okuboWeiss"]
    # interior cells: dominated by rotation
    # cells that resolve the true solid-body vorticity 2*Omega = 2e-5
    # (the x-periodic seam and walls see a spurious aliased field)
    vort = out["vorticity"][:, 0]
    interior = (vort > 1.9e-5) & (vort < 2.1e-5)
    assert interior.sum() > 10
    assert np.all(ow[interior, 0] < 0)


def test_members_during_run(channel):
    grid, state = channel
    cfg = OcnConfig(config_dt=30.0)
    drv = AnalysisDriver(members={"globalStats": 600.0,
                                  "layerVolumeWeightedAverage": 1200.0})
    drv.init(grid, cfg)
    t = 0.0
    s = state
    for _ in range(4):
        drv.compute_due(grid, cfg, s, t)
        s = run_steps(grid, cfg, s, 20)
        t += 600.0
    assert len(drv.history["globalStats"]) == 4
    assert len(drv.history["layerVolumeWeightedAverage"]) == 2
    vols = [h["volumeCellGlobal"] for _, h in drv.history["globalStats"]]
    assert max(vols) - min(vols) < 1e-6 * vols[0]


def test_moc_streamfunction_zero_at_rest_and_closed(channel):
    grid, state = channel
    cfg = OcnConfig()
    drv = AnalysisDriver(members={"mocStreamfunction": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state)
    _, out0 = drv.history["mocStreamfunction"][0]
    assert np.allclose(out0["mocStreamvalLatAndDepth"], 0.0)
    # uniform northward flow: psi nonzero at depth, ~0 at the surface only
    # if transport is barotropic the column integral is the max
    m = grid.mesh
    un = jnp.sin(m.angleEdge) * (1.0 - m.boundaryEdge)  # northward
    st2 = state.replace(u=jnp.broadcast_to(un[:, None], state.u.shape))
    drv.compute_all(grid, cfg, st2)
    _, out1 = drv.history["mocStreamfunction"][1]
    psi = out1["mocStreamvalLatAndDepth"]
    assert np.abs(psi).max() > 0.0
    # streamfunction magnitude decreases from bottom accumulation:
    # psi at the top row equals minus the full column transport
    assert np.abs(psi[:, 0]).max() >= np.abs(psi[:, -1]).max()


def test_time_series_stats_windows_and_climatology(channel):
    from mpas_tpu.cores.ocean.analysis.time_series_stats import (
        TimeSeriesStats)
    grid, state = channel
    cfg = OcnConfig()
    ts = TimeSeriesStats(window_seconds=3600.0, n_buckets=2,
                         fields=("ssh", "temperatureSurface"))
    ts.init(grid, cfg)
    # 4 windows of 4 samples each; temperature ramps by window
    t = 0.0
    for w in range(4):
        st = state.replace(
            tracers=state.tracers.at[..., 0].add(float(w)))
        for _ in range(4):
            t += 900.0
            ts.accumulate(grid, cfg, st, t)
    assert len(ts.records) == 4
    # window averages reflect the ramp
    _, b0, r0 = ts.records[0]
    _, b1, r1 = ts.records[1]
    assert np.allclose(r1["temperatureSurface_avg"]
                       - r0["temperatureSurface_avg"], 1.0)
    # climatology buckets: bucket 0 = mean of windows 0,2; bucket 1 = 1,3
    c0 = ts.climatology(0)
    c1 = ts.climatology(1)
    assert np.allclose(c1["temperatureSurface_avg"]
                       - c0["temperatureSurface_avg"], 1.0)
    # min/max bracket the average
    assert np.all(r0["ssh_min"] <= r0["ssh_avg"] + 1e-12)
    assert np.all(r0["ssh_max"] >= r0["ssh_avg"] - 1e-12)


# ---------------------------------------------------------------------------
# round-2 member breadth (ref: the remaining analysis_members/ files)
# ---------------------------------------------------------------------------

def test_new_members_compute(channel):
    """All ten new members run through the driver and produce sane output."""
    from mpas_tpu.cores.ocean.analysis import AnalysisDriver
    grid, state = channel
    cfg = OcnConfig()
    names = ["eddyProductVariables", "waterMassCensus", "transectTransport",
             "highFrequencyOutput", "surfaceAreaWeightedAverages",
             "pointwiseStats", "debugDiagnostics", "timeFilters",
             "regionalStats", "rpnCalculator", "eliassenPalm",
             "testComputeInterval"]
    drv = AnalysisDriver(members={n: 3600.0 for n in names})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state)
    for n in names:
        assert len(drv.history[n]) == 1, n
        _, out = drv.history[n][0]
        for k, v in out.items():
            if isinstance(v, (list, str)) or (
                    isinstance(v, np.ndarray)
                    and not np.issubdtype(v.dtype, np.number)):
                continue   # name lists (regionNames etc.)
            assert np.isfinite(np.asarray(v, dtype=np.float64)).all(), \
                (n, k)


def test_water_mass_census_conserves_volume(channel):
    from mpas_tpu.cores.ocean.analysis.extra_members import WaterMassCensus
    grid, state = channel
    cfg = OcnConfig()
    m = WaterMassCensus()
    m.init(grid, cfg)
    out = m.compute(grid, cfg, state)
    mask = grid.cellMask if grid.cellMask is not None else 1.0
    vol = float(np.sum(np.asarray(state.layerThickness * mask)
                       * np.asarray(grid.mesh.areaCell)[:, None]))
    # T/S of the channel lie inside the default bin ranges: the
    # FRACTIONAL distribution (reference output form) sums to 1, and the
    # regional fractions each sum to 1 over non-empty regions
    assert out["waterMassFractionalDistribution"].sum() \
        == pytest.approx(1.0, rel=1e-10)
    for fr in out["waterMassFractionalDistributionRegion"]:
        assert fr.sum() == pytest.approx(1.0, rel=1e-10)
    # z positions are at/below the surface where volume exists
    nz = out["waterMassFractionalDistribution"] > 0
    assert (out["zPositionOfTSDiagram"][nz] <= 0.0).all()


def test_transect_transport_zero_at_rest(channel):
    from mpas_tpu.cores.ocean.analysis.extra_members import TransectTransport
    grid, state = channel
    cfg = OcnConfig()
    m = TransectTransport()
    m.init(grid, cfg)
    out = m.compute(grid, cfg, state.replace(u=state.u * 0.0))
    assert out["nTransectEdges"] > 0
    assert out["transectTransportSv"] == 0.0


def test_rpn_calculator_arithmetic(channel):
    from mpas_tpu.cores.ocean.analysis.extra_members import RpnCalculator
    grid, state = channel
    cfg = OcnConfig()
    m = RpnCalculator()
    m.expression = "temperature 2.0 * salinity -"
    m.init(grid, cfg)
    out = m.compute(grid, cfg, state)
    expect = 2.0 * np.asarray(state.tracers[..., 0]) \
        - np.asarray(state.tracers[..., 1])
    assert np.allclose(out["rpnResult"], expect)


def test_time_filters_low_pass(channel):
    from mpas_tpu.cores.ocean.analysis.extra_members import TimeFilters
    grid, state = channel
    cfg = OcnConfig()
    m = TimeFilters()
    m.init(grid, cfg)
    m.compute(grid, cfg, state)                      # seeds the filter
    kicked = state.replace(u=state.u + 1.0)
    out = m.compute(grid, cfg, kicked)
    # the filtered field moves toward the kick but lags it
    du = out["uLowPass"] - np.asarray(state.u)
    assert 0.0 < du.mean() < 1.0


def test_eliassen_palm_twa_identity(channel):
    """For a horizontally uniform thickness field the TWA velocity equals
    the plain band mean, and the form-drag component vanishes (the
    defining TWA identities, ref mpas_ocn_eliassen_palm.F)."""
    from mpas_tpu.cores.ocean.analysis.extra_members import EliassenPalm
    import jax.numpy as jnp
    grid, state = channel
    cfg = OcnConfig()
    h0 = jnp.full_like(state.layerThickness, 50.0)
    st = state.replace(layerThickness=h0)
    m = EliassenPalm()
    m.init(grid, cfg)
    out = m.compute(grid, cfg, st)
    assert np.abs(out["epFormDrag"]).max() < 1e-10
    assert np.isfinite(out["epFluxMeridional"]).all()


def test_compute_interval_member_counts(channel):
    from mpas_tpu.cores.ocean.analysis.extra_members import \
        TestComputeInterval
    grid, state = channel
    cfg = OcnConfig()
    m = TestComputeInterval()
    m.init(grid, cfg)
    for k in range(3):
        out = m.compute(grid, cfg, state)
    assert out["computeCount"] == 3


def test_moc_regions_and_bins(channel):
    """Round-4 MOC: configurable bins + region masks (ref: the
    regionCellMasks machinery of mpas_ocn_moc_streamfunction.F:128-144).
    A region mask covering everything reproduces the global psi; a
    half-domain region differs; bin count is honored."""
    from mpas_tpu.cores.ocean.analysis.moc import MocStreamfunction
    grid, state = channel
    cfg = OcnConfig()
    m = grid.mesh
    yc = np.asarray(m.yCell)
    all_mask = np.ones(m.nCells)
    south = (yc < np.median(yc)).astype(float)
    mem = MocStreamfunction(n_bins=20, regions={"all": all_mask,
                                                "south": south})
    mem.init(grid, cfg)
    st = state.replace(u=state.u + 0.05)   # nonzero transport
    out = mem.compute(grid, cfg, st)
    psi = out["mocStreamvalLatAndDepth"]
    assert psi.shape[0] == 19               # n_bins - 1 boundaries
    np.testing.assert_allclose(out["mocStreamvalLatAndDepthRegion_all"],
                               psi, rtol=1e-12)
    psi_s = out["mocStreamvalLatAndDepthRegion_south"]
    assert psi_s.shape == psi.shape
    # the southern half-region must carry no transport across northern
    # boundaries and differ from the global psi overall
    assert float(np.max(np.abs(psi_s - psi))) > 0.0
    assert np.allclose(psi_s[-1], 0.0)
