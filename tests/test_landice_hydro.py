"""Subglacial hydrology + land-ice global statistics.

Parity model: mpas_li_subglacial_hydro.F behavior (water mass budget, till
capacity, down-potential sheet flow) and mpas_li_global_stats.F outputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.cores.landice.config import LiConfig, SECONDS_PER_YEAR
from mpas_tpu.cores.landice.core import make_grid, zero_state
from mpas_tpu.cores.landice.hydro import (HydroState, basal_melt_from_thermal,
                                          hydraulic_potential, sgh_step,
                                          zero_hydro)
from mpas_tpu.cores.landice.init_dome import init_halfar
from mpas_tpu.cores.landice.statistics import global_stats


@pytest.fixture(scope="module")
def dome():
    mesh = box_hex_mesh(16, 16, 4000.0)
    cfg = LiConfig()
    grid, state, t0 = init_halfar(mesh, cfg, h0=500.0, r0=25000.0)
    return mesh, cfg, grid, state


class TestHydro:
    def test_till_fills_before_sheet(self, dome):
        mesh, cfg, grid, state = dome
        hydro = zero_hydro(mesh.nCells)
        melt = jnp.where(state.thickness > 1.0, 1.0e-9, 0.0)  # ~3 cm/yr
        out = sgh_step(grid, cfg, hydro, state.thickness, melt,
                       dt=30.0 * 86400.0)
        # a month of 1e-9 m/s is ~2.6 mm: all goes to the till
        assert float(jnp.max(out.tillWater)) > 1e-4
        assert float(jnp.max(out.tillWater)) <= 2.0 + 1e-12
        assert float(jnp.max(out.waterThickness)) < 1e-6

    def test_sheet_flows_down_potential(self, dome):
        mesh, cfg, grid, state = dome
        # saturate the till, put a water blob at the dome center
        w = jnp.where(state.thickness > 400.0, 0.5, 0.0)
        hydro = HydroState(waterThickness=w,
                           tillWater=jnp.full(mesh.nCells, 2.0))
        melt = jnp.zeros(mesh.nCells)
        w0_tot = float(jnp.sum(w * grid.mesh.areaCell))
        out = sgh_step(grid, cfg, hydro, state.thickness, melt,
                       dt=1.0 * 86400.0, n_sub=20)
        w1 = out.waterThickness
        # water mass conserved under pure transport while the sheet stays
        # inside the ice mask (losses only at the margin/ocean outlet)
        assert float(jnp.sum(w1 * grid.mesh.areaCell)) \
            == pytest.approx(w0_tot, rel=1e-6)
        # it spread outward from the center (center thins)
        assert float(jnp.max(w1)) < 0.5
        # potential is highest under the dome center (thickest ice)
        phi = hydraulic_potential(grid, cfg, state.thickness)
        assert int(jnp.argmax(phi)) == int(jnp.argmax(state.thickness))

    def test_basal_melt_thermal_branch(self, dome):
        mesh, cfg, grid, state = dome
        # temperate bed, cold interior => geothermal flux melts
        t = jnp.full((mesh.nCells, cfg.config_nvertlevels), 273.15)
        melt = basal_melt_from_thermal(grid, cfg, state.thickness, t)
        sel = np.asarray(state.thickness) > 1.0
        m = np.asarray(melt)
        assert np.all(m[sel] > 0.0)
        # geothermal 0.042 W/m2 / (rho Lf) ~ 1.3e-10 m/s ~ 4 mm/yr
        assert m.max() == pytest.approx(
            cfg.config_geothermal_flux / (3.34e5 * 1000.0), rel=1e-6)
        # frozen bed: no melt
        t_cold = t - 10.0
        m2 = basal_melt_from_thermal(grid, cfg, state.thickness, t_cold)
        assert float(jnp.max(m2)) == 0.0


class TestGlobalStats:
    def test_stats_of_grounded_dome(self, dome):
        mesh, cfg, grid, state = dome
        out = global_stats(grid, cfg, state)
        vol_direct = float(jnp.sum(state.thickness * grid.mesh.areaCell))
        assert out["totalIceVolume"] == pytest.approx(vol_direct, rel=1e-12)
        assert out["floatingIceArea"] == 0.0            # bed at z=0
        assert out["groundedIceArea"] > 0.0
        assert out["volumeAboveFloatation"] == pytest.approx(
            vol_direct, rel=1e-6)                       # all grounded
        # max cell-center thickness sits slightly off the analytic peak
        assert out["maxThickness"] == pytest.approx(500.0, rel=0.03)
