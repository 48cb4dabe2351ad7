"""Regional boundaries (LBC zones) + IAU.

Parity model: mpas_atm_boundaries.F zone semantics (nSpecZone=2,
nRelaxZone=5), relaxation-coefficient formula
(atm_bdy_adjust_dynamics_relaxzone_tend), IAU constant-tendency window."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.cores.atmosphere.boundaries import (N_BDY_ZONE, N_RELAX_ZONE,
                                                  build_bdy_masks,
                                                  lbc_interp,
                                                  relaxzone_tend,
                                                  speczone_reset)
from mpas_tpu.cores.atmosphere.iau import (IAUConfig, IAUIncrements,
                                           iau_tendencies)


@pytest.fixture(scope="module")
def masks():
    mesh = box_hex_mesh(20, 20, 10000.0)
    return mesh, build_bdy_masks(mesh)


class TestBdyMasks:
    def test_zone_structure(self, masks):
        mesh, bm = masks
        z = np.asarray(bm.bdyMaskCell)
        # outermost cells are zone 7 (specified), interior 0
        assert z.max() == N_BDY_ZONE
        assert (z == 0).sum() > 0
        # every zone 1..7 present on a 18x18 usable box
        for zone in range(1, N_BDY_ZONE + 1):
            assert (z == zone).sum() > 0, f"zone {zone} missing"
        # boundary-adjacent cells are in the specified zone
        be = np.asarray(mesh.boundaryEdge) > 0
        coe = np.asarray(mesh.cellsOnEdge)
        assert np.all(z[np.unique(coe[be].ravel())] > N_RELAX_ZONE)

    def test_zones_are_contiguous_rings(self, masks):
        mesh, bm = masks
        z = np.asarray(bm.bdyMaskCell)
        coc = np.asarray(mesh.cellsOnCell)
        sgn = np.asarray(mesh.edgeSignOnCell)
        # neighboring cells differ by at most one zone
        for c in range(mesh.nCells):
            nbrs = coc[c][sgn[c] != 0]
            assert np.all(np.abs(z[nbrs] - z[c]) <= 1)

    def test_relax_coef_profile(self, masks):
        mesh, bm = masks
        z = np.asarray(bm.bdyMaskCell)
        coef = np.asarray(bm.relaxCoefCell)
        # ref formula: (zone-1)/nRelaxZone inside the relax zone, 0 outside
        expect = np.where((z >= 1) & (z <= N_RELAX_ZONE),
                          np.maximum(z - 1, 0) / N_RELAX_ZONE, 0.0)
        assert np.allclose(coef, expect)


class TestZoneAdjustments:
    def test_speczone_reset_overwrites_only_spec(self, masks):
        mesh, bm = masks
        f = jnp.ones((mesh.nCells, 4))
        drv = jnp.full((mesh.nCells, 4), 9.0)
        out = np.asarray(speczone_reset(bm, f, drv))
        z = np.asarray(bm.bdyMaskCell)
        assert np.all(out[z > N_RELAX_ZONE] == 9.0)
        assert np.all(out[z <= N_RELAX_ZONE] == 1.0)

    def test_relax_tend_restores_boundary(self, masks):
        """Forward-Euler with only the relax tendency drives the relax-zone
        field toward the driving value, fastest in the outer ring."""
        mesh, bm = masks
        dt = 60.0
        f = jnp.zeros((mesh.nCells,))
        drv = jnp.ones((mesh.nCells,))
        g = f
        for _ in range(2000):
            g = g + dt * relaxzone_tend(bm, dt, g, drv)
        gn = np.asarray(g)
        z = np.asarray(bm.bdyMaskCell)
        # outer relax ring (zone 5) relaxes faster than inner (zone 2)
        assert gn[z == 5].mean() > gn[z == 2].mean()
        assert np.all(gn[z == 0] == 0.0)          # interior untouched
        assert gn[z == 5].mean() > 0.5

    def test_lbc_time_interpolation(self):
        a = {"u": jnp.zeros(4)}
        b = {"u": jnp.full(4, 2.0)}
        mid = lbc_interp(a, b, 0.0, 3600.0, 900.0)
        assert np.allclose(np.asarray(mid["u"]), 0.5)
        late = lbc_interp(a, b, 0.0, 3600.0, 7200.0)   # clamped
        assert np.allclose(np.asarray(late["u"]), 2.0)


class TestIAU:
    def test_constant_tendency_inside_window(self):
        cfg = IAUConfig(config_IAU_option="on",
                        config_IAU_window_length_s=3600.0)
        nC, nz, nE = 5, 4, 12
        inc = IAUIncrements(theta_incr=jnp.ones((nC, nz)),
                            rho_incr=jnp.full((nC, nz), 0.1),
                            u_incr=jnp.full((nE, nz), 2.0),
                            qv_incr=None)
        rho = jnp.full((nC, nz), 1.2)
        t_rt, t_rho, t_u, t_qv = iau_tendencies(cfg, inc, rho, 0.0)
        assert np.allclose(np.asarray(t_rt), 1.2 / 3600.0)
        assert np.allclose(np.asarray(t_u), 2.0 / 3600.0)
        # integrated over the window the increment is recovered
        assert float(t_u[0, 0] * 3600.0) == pytest.approx(2.0)

    def test_zero_after_window(self):
        cfg = IAUConfig(config_IAU_window_length_s=3600.0)
        inc = IAUIncrements(theta_incr=jnp.ones((3, 2)),
                            rho_incr=jnp.ones((3, 2)),
                            u_incr=jnp.ones((5, 2)), qv_incr=None)
        t_rt, t_rho, t_u, _ = iau_tendencies(cfg, inc, jnp.ones((3, 2)),
                                             7200.0)
        assert float(jnp.max(jnp.abs(t_rt))) == 0.0
        assert float(jnp.max(jnp.abs(t_u))) == 0.0
