"""Land-ice calving variants: eigencalving, topographic threshold,
restore-front, masks, and strain-rate machinery.

Parity model: mpas_li_calving.F — li_calve_ice dispatch (:198-276),
eigencalving (:966-1158), topographic_calving (:886-949),
li_restore_calving_front (:293-544), calculate_calving_front_mask
(:1330-1394).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.cores.landice import calving as cv
from mpas_tpu.cores.landice.config import LiConfig
from mpas_tpu.cores.landice.core import make_grid


@pytest.fixture(scope="module")
def shelf():
    """A marine ice-sheet strip: grounded on the left (shallow bed),
    floating shelf in the middle, open ocean on the right."""
    mesh = box_hex_mesh(16, 12, 2000.0)
    x = np.asarray(mesh.xCell)
    xn = (x - x.min()) / (x.max() - x.min())
    bed = np.where(xn < 0.3, -50.0, -800.0)          # deep bed offshore
    h = np.where(xn < 0.3, 900.0,
                 np.where(xn < 0.7, 400.0, 0.0))     # shelf then ocean
    cfg = LiConfig(config_nvertlevels=4)
    grid = make_grid(mesh, cfg, bed=jnp.asarray(bed))
    return mesh, cfg, grid, jnp.asarray(h), xn


class TestMasks:
    def test_mask_partition(self, shelf):
        mesh, cfg, grid, h, xn = shelf
        masks = cv.cell_masks(grid, cfg, h)
        ice = np.asarray(masks["ice"])
        floating = np.asarray(masks["floating"])
        # grounded interior is ice but not floating
        assert ice[xn < 0.25].all()
        assert not floating[xn < 0.25].any()
        # the 400 m shelf over the -800 m bed floats
        mid = (xn > 0.35) & (xn < 0.65)
        assert floating[mid].all()
        # open ocean has no ice
        assert not ice[xn > 0.75].any()

    def test_front_mask_at_ocean_boundary(self, shelf):
        mesh, cfg, grid, h, xn = shelf
        masks = cv.cell_masks(grid, cfg, h)
        front = np.asarray(cv.calving_front_mask(grid, cfg, h, masks))
        # the front lives at the shelf edge, not in the interior
        assert front.sum() > 0
        assert not front[xn < 0.4].any()
        edge_zone = (xn > 0.55) & (xn < 0.75)
        assert front[edge_zone].sum() == front.sum()


class TestStrainRates:
    def test_uniform_extension(self, shelf):
        """u = (a x, 0) -> e1 = a, e2 = 0."""
        mesh, cfg, grid, h, xn = shelf
        a = 1.0e-9
        ang = np.asarray(mesh.angleEdge)
        xe = np.asarray(mesh.xEdge)
        u_edge = jnp.asarray(a * xe * np.cos(ang))
        ux, uy = cv.cell_velocity_from_edges(grid, u_edge)
        np.testing.assert_allclose(np.asarray(ux),
                                   a * np.asarray(mesh.xCell), rtol=0.15)
        e1, e2 = cv.principal_strain_rates(grid, ux, uy)
        interior = (xn > 0.2) & (xn < 0.8)
        np.testing.assert_allclose(np.asarray(e1)[interior], a, rtol=0.2)
        assert np.all(np.abs(np.asarray(e2)[interior]) < 0.3 * a)


class TestEigencalving:
    def test_spreading_shelf_calves_at_front(self, shelf):
        mesh, cfg, grid, h, xn = shelf
        # diverging flow over the shelf: both principal rates positive
        a = 3.0e-10
        ang = np.asarray(mesh.angleEdge)
        u_edge = jnp.asarray(a * (np.asarray(mesh.xEdge) * np.cos(ang)
                                  + np.asarray(mesh.yEdge) * np.sin(ang)))
        dt = 3.15e7
        h1, flux = cv.eigencalving(grid, cfg, h, u_edge, dt,
                                   jnp.zeros_like(h), k_eigen=1.0e17)
        removed = np.asarray(h - h1)
        assert removed.sum() > 0.0
        # mass bookkeeping: flux accounts exactly for removed ice
        np.testing.assert_allclose(np.asarray(flux), removed, atol=1e-9)
        # grounded ice untouched
        assert np.all(removed[xn < 0.3] == 0.0)

    def test_converging_flow_no_eigencalving_velocity(self, shelf):
        """Compressive flow (both rates negative) -> calving velocity 0;
        only the cleanup passes may act (K max(0,e1) max(0,e2) form)."""
        mesh, cfg, grid, h, xn = shelf
        a = -3.0e-10
        ang = np.asarray(mesh.angleEdge)
        u_edge = jnp.asarray(a * (np.asarray(mesh.xEdge) * np.cos(ang)
                                  + np.asarray(mesh.yEdge) * np.sin(ang)))
        dt = 3.15e7
        h1, _ = cv.eigencalving(grid, cfg, h, u_edge, dt,
                                jnp.zeros_like(h), k_eigen=1.0e17)
        # with zero calving velocity the 400 m shelf (> calving
        # thickness) keeps its volume except cleanup-removed cells
        kept = np.asarray(h1)
        assert kept[(xn > 0.35) & (xn < 0.55)].min() == 400.0


class TestTopographic:
    def test_deep_bed_margin_calves(self, shelf):
        mesh, cfg, grid, h, xn = shelf
        h1, flux = cv.topographic_calving(grid, cfg, h,
                                          jnp.zeros_like(h),
                                          bed_threshold=-500.0)
        removed = np.asarray(h - h1)
        # only margin cells over the -800 m bed go
        assert removed.sum() > 0.0
        assert np.all(removed[xn < 0.3] == 0.0)
        np.testing.assert_allclose(np.asarray(flux), removed, atol=1e-9)


class TestRestoreFront:
    def test_advance_beyond_initial_extent_removed(self, shelf):
        mesh, cfg, grid, h, xn = shelf
        initial = h > 0.0
        h_adv = jnp.where(jnp.asarray((xn > 0.7) & (xn < 0.8)), 120.0, h)
        h1, flux = cv.restore_calving_front(grid, cfg, h_adv,
                                            jnp.zeros_like(h), initial)
        assert np.all(np.asarray(h1)[(xn > 0.7)] == 0.0)
        np.testing.assert_allclose(np.asarray(h1)[xn < 0.7],
                                   np.asarray(h_adv)[xn < 0.7])


class TestDispatch:
    def test_core_dispatch_eigencalving(self, shelf):
        from mpas_tpu.cores.landice.core import calve
        mesh, _, grid, h, xn = shelf
        cfg = LiConfig(config_calving="eigencalving")
        u_int = jnp.full((mesh.nEdges, 5), 1.0e-6)
        h1, flux = calve(grid, cfg, h, jnp.zeros_like(h),
                         u_int=u_int, dt=3.15e7)
        assert np.all(np.isfinite(np.asarray(h1)))

    def test_core_dispatch_topographic(self, shelf):
        from mpas_tpu.cores.landice.core import calve
        mesh, _, grid, h, xn = shelf
        cfg = LiConfig(config_calving="topographic_threshold")
        h1, flux = calve(grid, cfg, h, jnp.zeros_like(h))
        assert float(jnp.sum(flux)) > 0.0
