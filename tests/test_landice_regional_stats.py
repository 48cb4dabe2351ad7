"""Regional land-ice statistics analysis member.

Parity model: mpas_li_regional_stats.F (li_compute_regional_stats) —
the global-stats reductions restricted to cell-mask regions.
"""

import numpy as np
import pytest

from mpas_tpu.cores.landice.config import LiConfig, SECONDS_PER_YEAR
from mpas_tpu.cores.landice.init_dome import init_halfar
from mpas_tpu.cores.landice.statistics import global_stats, regional_stats
from mpas_tpu.mesh.planar import box_hex_mesh


@pytest.fixture(scope="module")
def dome():
    mesh = box_hex_mesh(20, 20, 3000.0)
    cfg = LiConfig(config_dt=0.25 * SECONDS_PER_YEAR,
                   config_thermal_solver="none")
    grid, state, _ = init_halfar(mesh, cfg, h0=500.0, r0=25000.0)
    return mesh, cfg, grid, state


class TestRegionalStats:
    def _two_regions(self, mesh):
        x = np.asarray(mesh.xCell)
        xc = 0.5 * (x.min() + x.max())
        left = (x < xc).astype(float)
        return np.stack([left, 1.0 - left], axis=1)   # (nC, 2)

    def test_regions_partition_the_globals(self, dome):
        mesh, cfg, grid, state = dome
        masks = self._two_regions(mesh)
        reg = regional_stats(grid, cfg, state, masks)
        glo = global_stats(grid, cfg, state)
        for rkey, gkey in [("regionalIceVolume", "totalIceVolume"),
                           ("regionalIceArea", "totalIceArea"),
                           ("regionalGroundedIceArea", "groundedIceArea"),
                           ("regionalSumCalvingFlux", "totalCalvingFlux")]:
            np.testing.assert_allclose(reg[rkey].sum(), glo[gkey],
                                       rtol=1e-12, err_msg=rkey)
        np.testing.assert_allclose(reg["regionalMaxThickness"].max(),
                                   glo["maxThickness"], rtol=1e-12)

    def test_empty_region_is_zero(self, dome):
        mesh, cfg, grid, state = dome
        # region 0 = everything, region 1 = nothing
        masks = np.stack([np.ones(mesh.nCells), np.zeros(mesh.nCells)],
                         axis=1)
        reg = regional_stats(grid, cfg, state, masks)
        assert reg["regionalIceVolume"][1] == 0.0
        assert reg["regionalIceArea"][1] == 0.0
        assert reg["regionalMaxSurfaceSpeed"][1] == 0.0

    def test_mass_balance_integrals(self, dome):
        mesh, cfg, grid, state = dome
        masks = self._two_regions(mesh)
        smb = np.full(mesh.nCells, 0.3)     # uniform accumulation
        reg = regional_stats(grid, cfg, state, masks, sfc_mass_bal=smb)
        total_area = float(np.asarray(grid.mesh.areaCell).sum())
        np.testing.assert_allclose(reg["regionalSumSfcMassBal"].sum(),
                                   0.3 * total_area, rtol=1e-12)
        # grounded + floating partition is bounded by the total
        assert (reg["regionalSumGroundedSfcMassBal"].sum()
                + reg["regionalSumFloatingSfcMassBal"].sum()
                <= reg["regionalSumSfcMassBal"].sum() + 1e-9)
