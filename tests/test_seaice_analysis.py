"""Sea-ice analysis members (ref: src/core_seaice/analysis_members/ —
driver alarm semantics + per-member diagnostics; the conservation-check
member must agree with the transport step's own conservation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.seaice.analysis import (SeaiceAnalysisDriver,
                                            available_members)
from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.core import run_steps
from mpas_tpu.cores.seaice.init_square import init_square
from mpas_tpu.mesh.planar import box_hex_mesh


@pytest.fixture(scope="module")
def setup():
    m = box_hex_mesh(10, 10, 20000.0)
    cfg = SeaiceConfig(config_dt=600.0, config_thermo_type="bl99")
    grid, state, forcing = init_square(m, cfg)
    from mpas_tpu.cores.seaice import thermo_vertical as tv
    q_i, q_s = tv.init_enthalpy(cfg, m.nCells, cfg.config_n_categories,
                                nilyr=cfg.config_n_ice_layers,
                                nslyr=cfg.config_n_snow_layers,
                                T_init=-8.0)
    state = state.replace(iceEnthalpy=q_i, snowEnthalpy=q_s)
    return m, cfg, grid, state, forcing


def test_all_members_compute_finite(setup):
    m, cfg, grid, state, forcing = setup
    drv = SeaiceAnalysisDriver({n: 600.0 for n in available_members()})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state, 0.0)
    for name, hist in drv.history.items():
        assert len(hist) == 1, name
        for k, v in hist[0][1].items():
            arr = np.asarray(v)
            assert np.isfinite(arr).all(), f"{name}.{k} not finite"


def test_area_variables_match_totals(setup):
    m, cfg, grid, state, forcing = setup
    drv = SeaiceAnalysisDriver({"areaVariables": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state)
    out = drv.history["areaVariables"][0][1]
    np.testing.assert_allclose(
        np.asarray(out["iceAreaCell"]),
        np.asarray(state.iceAreaCategory).sum(-1), rtol=1e-12)
    assert np.all(np.asarray(out["openWaterArea"]) >= 0.0)


def test_conservation_check_across_step(setup):
    """Delta of totalIceMass between two calls equals the step's own
    volume change (transport conserves; thermo sources show up here)."""
    m, cfg, grid, state, forcing = setup
    drv = SeaiceAnalysisDriver({"conservationCheck": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state, 0.0)
    out1 = run_steps(grid, cfg, state, forcing, 3)
    drv.compute_all(grid, cfg, out1, 1800.0)
    h = drv.history["conservationCheck"]
    area = np.asarray(m.areaCell)
    dv = (np.asarray(out1.iceVolumeCategory).sum(-1)
          - np.asarray(state.iceVolumeCategory).sum(-1))
    expect = float((dv * area).sum()) * cfg.rho_ice
    got = float(h[1][1]["totalIceMassDelta"])
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-6)


def test_alarm_semantics(setup):
    m, cfg, grid, state, forcing = setup
    drv = SeaiceAnalysisDriver({"unitConversion": 1200.0})
    drv.init(grid, cfg)
    for t in [0.0, 600.0, 1200.0, 1800.0, 2400.0]:
        drv.compute_due(grid, cfg, state, t)
    times = [t for t, _ in drv.history["unitConversion"]]
    assert times == [0.0, 1200.0, 2400.0]


def test_regional_statistics_partition(setup):
    """Planar mesh -> single global region; extent <= area of domain."""
    m, cfg, grid, state, forcing = setup
    drv = SeaiceAnalysisDriver({"regionalStatistics": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, state)
    out = drv.history["regionalStatistics"][0][1]
    assert "iceAreaRegion_global" in out
    total_area = float(np.asarray(m.areaCell).sum())
    assert 0.0 < float(out["iceExtentRegion_global"]) <= total_area


def test_temperatures_inversion_consistency(setup):
    """bl99 enthalpy -> temperature must invert to sub-freezing values
    where ice exists."""
    m, cfg, grid, state, forcing = setup
    out1 = run_steps(grid, cfg, state, forcing, 2)
    drv = SeaiceAnalysisDriver({"temperatures": 1.0})
    drv.init(grid, cfg)
    drv.compute_all(grid, cfg, out1)
    t = np.asarray(drv.history["temperatures"][0][1]["iceTemperature"])
    has = np.broadcast_to(
        np.asarray(out1.iceVolumeCategory)[..., None] > cfg.puny, t.shape)
    assert np.all(t[has] <= 0.5)
    assert np.all(t[has] > -60.0)


def test_ice_shelves_masked_area(setup):
    """iceAreaOverIceShelves = sum(iceAreaCell*areaCell) over masked cells
    (ref: mpas_seaice_ice_shelves.F:223-322)."""
    from mpas_tpu.cores.seaice.analysis import IceShelves
    m, cfg, grid, state, forcing = setup
    mask = np.zeros(m.nCells)
    mask[: m.nCells // 3] = 1.0
    mem = IceShelves(land_ice_mask=mask)
    mem.init(grid, cfg)
    out = mem.compute(grid, cfg, state)
    a = np.sum(np.asarray(state.iceAreaCategory), axis=-1)
    expect = float(np.sum(a * np.asarray(m.areaCell) * mask))
    np.testing.assert_allclose(float(out["iceAreaOverIceShelves"]),
                               expect, rtol=1e-6)
