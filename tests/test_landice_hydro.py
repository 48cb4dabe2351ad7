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


class TestFullGladsModel:
    """Full distributed+channelized model with prognostic pressure
    (ref li_SGH_solve/calc_pressure/update_channel; SHMIP-genre
    behavioral anchors: de Fleurian et al. 2018 suites A/B)."""

    def _run(self, dome, melt_rate, years=0.5, channels=True, n_out=40):
        from mpas_tpu.cores.landice.hydro import sgh_step_full
        mesh, cfg, grid, state = dome
        hydro = zero_hydro(mesh.nCells, n_edges=mesh.nEdges)
        # pre-fill the till so the input reaches the sheet (the till's
        # 2 m capacity otherwise swallows months of melt — the behavior
        # test_till_fills_before_sheet pins)
        hydro = hydro.replace(tillWater=jnp.full(mesh.nCells, 2.0))
        melt = jnp.where(state.thickness > 1.0, melt_rate, 0.0)
        speed = jnp.where(state.thickness > 1.0, 1.0e-6, 0.0)  # ~30 m/yr
        dt = years * SECONDS_PER_YEAR / n_out
        import jax as _jax
        step = _jax.jit(lambda h: sgh_step_full(
            grid, cfg, h, state.thickness, melt, speed, dt, n_sub=10,
            channels=channels))
        for _ in range(n_out):
            hydro = step(hydro)
        return mesh, cfg, grid, state, hydro

    def test_pressure_bounded_and_positive_N(self, dome):
        """Water pressure stays within [0, overburden]; effective
        pressure is non-negative everywhere (the reference clamps)."""
        from mpas_tpu.cores.landice.hydro import effective_pressure
        mesh, cfg, grid, state, hydro = self._run(dome, 5.0e-10)
        P = np.asarray(hydro.waterPressure)
        ovb = np.asarray(cfg.rho_ice * cfg.gravity * state.thickness)
        assert (P >= -1e-6).all() and (P <= ovb + 1e-6).all()
        N = np.asarray(effective_pressure(cfg, hydro, state.thickness))
        assert (N >= -1e-6).all()
        assert np.isfinite(np.asarray(hydro.waterThickness)).all()

    def test_higher_input_lowers_effective_pressure(self, dome):
        """SHMIP suite-A signature: increasing distributed input raises
        water pressure (lowers N) in the distributed regime."""
        from mpas_tpu.cores.landice.hydro import effective_pressure
        *_, state, h_lo = self._run(dome, 1.0e-10, channels=False,
                                    years=2.0)
        mesh, cfg, grid, state, h_hi = self._run(dome, 5.0e-9,
                                                 channels=False,
                                                 years=2.0)
        interior = np.asarray(state.thickness) > 300.0
        N_lo = np.asarray(effective_pressure(cfg, h_lo, state.thickness))
        N_hi = np.asarray(effective_pressure(cfg, h_hi, state.thickness))
        assert N_hi[interior].mean() < N_lo[interior].mean()

    def test_channels_grow_under_high_discharge(self, dome):
        """SHMIP suite-B signature: strong input channelizes —
        channel area grows where discharge concentrates; weak input
        leaves the network effectively un-channelized."""
        *_, h_hi = self._run(dome, 2.0e-8, years=1.0)
        *_, h_lo = self._run(dome, 1.0e-11, years=1.0)
        s_hi = float(jnp.max(h_hi.channelArea))
        s_lo = float(jnp.max(h_lo.channelArea))
        # cavity-opening water gives even the weak run some incipient
        # dissipation; the strong-input run channelizes several-fold
        # beyond it (SHMIP A vs B contrast)
        assert s_hi > 3.0 * max(s_lo, 1e-12), (s_hi, s_lo)
        assert s_hi > 0.2, s_hi

    def test_cavity_opening_with_sliding(self, dome):
        """Cavity opening scales with sliding speed: a sliding bed
        carries more water at steady state than a frozen-to-bed run."""
        from mpas_tpu.cores.landice.hydro import sgh_step_full
        mesh, cfg, grid, state = dome
        melt = jnp.where(state.thickness > 1.0, 1.0e-10, 0.0)
        import jax as _jax
        def run(speed_val):
            hydro = zero_hydro(mesh.nCells, n_edges=mesh.nEdges)
            speed = jnp.where(state.thickness > 1.0, speed_val, 0.0)
            step = _jax.jit(lambda h: sgh_step_full(
                grid, cfg, h, state.thickness, melt, speed,
                30.0 * 86400.0, n_sub=10))
            for _ in range(12):
                hydro = step(hydro)
            return float(jnp.sum(hydro.waterThickness))
        assert run(3.0e-6) > run(0.0)
