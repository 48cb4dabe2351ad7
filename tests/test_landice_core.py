"""Land-ice core: Halfar analytic SIA parity + thermal/calving behavior.

Parity model: the reference land-ice verification against the Halfar (1983)
similarity solution (the dome compass test; mpas_li_sia.F:405-410 comments
discuss Halfar error statistics of discretization choices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.cores.landice.config import LiConfig, SECONDS_PER_YEAR
from mpas_tpu.cores.landice.core import (LiState, calve, make_grid, run_steps,
                                         sia_velocity, thermal_solve,
                                         total_volume, zero_state)
from mpas_tpu.cores.landice.init_dome import (halfar_thickness, init_halfar)


_H0, _R0 = 500.0, 30000.0


@pytest.fixture(scope="module")
def dome():
    # explicit SIA diffusion CFL: D ~ Gamma H^5 |grad s|^2 ~ 3e-2 m2/s for
    # this dome => dt = 0.25 yr is stable at dx = 3 km
    mesh = box_hex_mesh(26, 26, 3000.0)
    cfg = LiConfig(config_dt=0.25 * SECONDS_PER_YEAR,
                   config_thermal_solver="none")
    grid, state, t0 = init_halfar(mesh, cfg, h0=_H0, r0=_R0)
    return mesh, cfg, grid, state, t0


class TestHalfar:
    def test_dome_matches_analytic_after_2000yr(self, dome):
        mesh, cfg, grid, state, t0 = dome
        n_years = 2000.0
        out = run_steps(grid, cfg, state, int(n_years * 4))
        x = np.asarray(mesh.xCell)
        y = np.asarray(mesh.yCell)
        xc, yc = 0.5 * (x.min() + x.max()), 0.5 * (y.min() + y.max())
        r = np.sqrt((x - xc) ** 2 + (y - yc) ** 2)
        h_exact = halfar_thickness(cfg, r, t0 + n_years * SECONDS_PER_YEAR,
                                   _H0, _R0)
        h_model = np.asarray(out.thickness)
        # relative L2 error over the (exact) ice-covered region
        sel = h_exact > 1.0
        err = np.sqrt(np.mean((h_model[sel] - h_exact[sel]) ** 2)) \
            / np.sqrt(np.mean(h_exact[sel] ** 2))
        assert err < 0.05, f"Halfar L2 error {err:.4f}"
        # dome must actually have evolved (spread + thinned ~11%)
        assert float(out.thickness.max()) < 0.95 * _H0

    def test_volume_conserved_no_calving(self, dome):
        mesh, cfg, grid, state, t0 = dome
        v0 = float(total_volume(grid, state))
        out = run_steps(grid, cfg, state, 50)
        v1 = float(total_volume(grid, out))
        assert v1 == pytest.approx(v0, rel=1e-10)

    def test_sia_velocity_downslope(self, dome):
        """SIA flow must point down the surface gradient (outward)."""
        mesh, cfg, grid, state, t0 = dome
        u = sia_velocity(grid, cfg, state.thickness, state.temperature)
        # depth-averaged outward flux through any edge with ice: the flux
        # divergence integrated over the dome interior must spread mass,
        # i.e. the thickest cell thins after one step
        out = run_steps(grid, cfg, state, 1)
        imax = int(jnp.argmax(state.thickness))
        assert float(out.thickness[imax]) < float(state.thickness[imax])
        assert bool(jnp.all(jnp.isfinite(u)))
        # surface speed larger than basal (no sliding => basal = 0)
        assert float(jnp.max(jnp.abs(u[:, -1]))) == 0.0
        assert float(jnp.max(jnp.abs(u[:, 0]))) > 0.0


class TestThermal:
    def test_column_relaxes_between_boundary_conditions(self, dome):
        mesh, cfg, grid, state, t0 = dome
        cfg2 = LiConfig(config_thermal_solver="temperature",
                        config_surface_air_temperature=250.0)
        t = state.temperature * 0 + 260.0
        h = state.thickness
        for _ in range(50):
            t = thermal_solve(grid, cfg2, h, t,
                              jnp.asarray(10.0 * SECONDS_PER_YEAR))
        sel = np.asarray(h) > 100.0
        tn = np.asarray(t)
        # surface layer pulled toward the air temperature
        assert np.all(tn[sel, 0] < 256.0)
        # bed warmer than surface (geothermal flux)
        assert np.all(tn[sel, -1] > tn[sel, 0])
        assert np.all(tn <= 273.15 + 1e-9)

    def test_flow_param_temperature_dependence(self):
        from mpas_tpu.cores.landice.core import flow_param_a
        cfg = LiConfig(config_flowParamA_calculation="PB1982")
        a_cold = float(flow_param_a(cfg, jnp.asarray([250.0]))[0])
        a_warm = float(flow_param_a(cfg, jnp.asarray([270.0]))[0])
        assert a_warm > a_cold > 0.0


class TestCalving:
    def test_floating_thin_ice_calves(self):
        mesh = box_hex_mesh(8, 8, 5000.0)
        cfg = LiConfig(config_calving="thickness_threshold",
                       config_calving_thickness=100.0)
        bed = jnp.full((mesh.nCells,), -500.0)   # deep ocean everywhere
        grid = make_grid(mesh, cfg, bed=bed)
        state = zero_state(mesh, cfg)
        h = jnp.full((mesh.nCells,), 50.0)       # thin floating shelf
        h_new, flux = calve(grid, cfg, h, state.calvingFlux)
        assert float(jnp.max(h_new)) == 0.0
        assert float(jnp.sum(flux)) == pytest.approx(50.0 * mesh.nCells)

    def test_grounded_ice_does_not_calve(self):
        mesh = box_hex_mesh(8, 8, 5000.0)
        cfg = LiConfig(config_calving="floating")
        grid = make_grid(mesh, cfg)              # bed at z=0 (grounded)
        state = zero_state(mesh, cfg)
        h = jnp.full((mesh.nCells,), 50.0)
        h_new, _ = calve(grid, cfg, h, state.calvingFlux)
        assert np.allclose(np.asarray(h_new), 50.0)
