"""Land-ice enthalpy (polythermal) thermal solver + IR advection.

Parity model: mpas_li_thermal.F enthalpy branch and mpas_li_advection.F
incremental-remapping branch capabilities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.cores.landice.config import LiConfig, SECONDS_PER_YEAR
from mpas_tpu.cores.landice.core import make_grid, run_steps, total_volume
from mpas_tpu.cores.landice.init_dome import init_halfar
from mpas_tpu.cores.landice import thermal_enthalpy as te
from mpas_tpu.cores.landice.advection_ir import vertex_velocity_from_edges


@pytest.fixture(scope="module")
def dome():
    mesh = box_hex_mesh(20, 20, 3000.0)
    cfg = LiConfig(config_dt=0.25 * SECONDS_PER_YEAR,
                   config_thermal_solver="enthalpy")
    grid, state, t0 = init_halfar(mesh, cfg, h0=500.0, r0=25000.0)
    return mesh, cfg, grid, state, t0


def test_enthalpy_inversion_roundtrip(dome):
    mesh, cfg, grid, state, _ = dome
    nz = state.temperature.shape[-1]
    sig_mid = 0.5 * (np.asarray(grid.layerInterfaceSigma[:-1])
                     + np.asarray(grid.layerInterfaceSigma[1:]))
    sig_mid = jnp.asarray(sig_mid)
    T = jnp.full_like(state.temperature, 260.0)
    w = jnp.zeros_like(T)
    E = te.enthalpy_from_tw(T, w)
    T2, w2 = te.tw_from_enthalpy(cfg, E, state.thickness, sig_mid)
    sel = np.asarray(state.thickness) > 1.0
    np.testing.assert_allclose(np.asarray(T2)[sel], 260.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(w2)[sel], 0.0, atol=1e-12)
    # temperate: enthalpy above E_pmp maps to T_pmp + water
    t_pmp = te.pmp_temperature(cfg, state.thickness, sig_mid)
    E_warm = te.C_ICE * (t_pmp - 273.15) + 0.005 * te.L_FUS
    T3, w3 = te.tw_from_enthalpy(cfg, E_warm, state.thickness, sig_mid)
    np.testing.assert_allclose(np.asarray(T3)[sel],
                               np.asarray(t_pmp)[sel], atol=1e-9)
    np.testing.assert_allclose(np.asarray(w3)[sel], 0.005, atol=1e-10)


def test_pmp_decreases_with_depth(dome):
    mesh, cfg, grid, state, _ = dome
    sig_mid = 0.5 * (grid.layerInterfaceSigma[:-1]
                     + grid.layerInterfaceSigma[1:])
    t_pmp = np.asarray(te.pmp_temperature(cfg, state.thickness, sig_mid))
    thick = np.asarray(state.thickness) > 100.0
    assert np.all(np.diff(t_pmp[thick], axis=-1) < 0.0)


def test_enthalpy_solver_cold_column_stays_cold(dome):
    mesh, cfg, grid, state, _ = dome
    T = jnp.full_like(state.temperature, 250.0)
    T2, w2, bmr = te.thermal_solve_enthalpy(
        grid, cfg, state.thickness, T, None, cfg.config_dt)
    sel = np.asarray(state.thickness) > 1.0
    assert np.all(np.asarray(w2)[sel] < 1e-6)       # no melt appears
    assert np.all(np.asarray(T2)[sel] < 273.15)
    assert np.all(np.asarray(bmr) >= 0.0)


def test_enthalpy_solver_warm_base_melts(dome):
    """Near-pmp basal ice + strong geothermal + friction -> basal water."""
    mesh, cfg, grid, state, _ = dome
    import dataclasses
    cfg2 = dataclasses.replace(cfg, config_geothermal_flux=0.5)  # hot
    sig_mid = 0.5 * (grid.layerInterfaceSigma[:-1]
                     + grid.layerInterfaceSigma[1:])
    T = te.pmp_temperature(cfg2, state.thickness, sig_mid) - 0.05
    w = None
    bmr_tot = 0.0
    for _ in range(10):
        T, w, bmr = te.thermal_solve_enthalpy(
            grid, cfg2, state.thickness, T, w, cfg2.config_dt)
        bmr_tot += float(jnp.sum(bmr))
    sel = np.asarray(state.thickness) > 100.0
    assert np.asarray(w)[sel].max() > 0.0           # temperate ice formed
    # water fraction capped at the drainage threshold
    assert np.asarray(w).max() <= te.W_MAX + 1e-12


def test_vertex_velocity_exact_for_uniform_field(dome):
    mesh, cfg, grid, state, _ = dome
    u0, v0 = 12.0, -7.0
    un = (u0 * jnp.cos(jnp.asarray(mesh.angleEdge))
          + v0 * jnp.sin(jnp.asarray(mesh.angleEdge)))
    u_v, v_v = vertex_velocity_from_edges(grid.mesh, un)
    interior = np.asarray(
        (np.asarray(mesh.edgeSignOnVertex) != 0).all(axis=1))
    np.testing.assert_allclose(np.asarray(u_v)[interior], u0, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v_v)[interior], v0, rtol=1e-9)


def test_ir_advection_conserves_volume(dome):
    mesh, cfg, grid, state, _ = dome
    import dataclasses
    cfg_ir = dataclasses.replace(
        cfg, config_thickness_advection="incremental_remapping",
        config_thermal_solver="none", config_calving="none")
    v0 = float(total_volume(grid, state))
    out = run_steps(grid, cfg_ir, state, 40)
    v1 = float(total_volume(grid, out))
    assert abs(v1 - v0) / v0 < 1e-9
    assert np.all(np.isfinite(np.asarray(out.thickness)))
    # the dome spreads: peak decreases
    assert float(jnp.max(out.thickness)) < float(jnp.max(state.thickness))


def test_full_enthalpy_run_stable(dome):
    mesh, cfg, grid, state, _ = dome
    out = run_steps(grid, cfg, state, 20)
    assert np.all(np.isfinite(np.asarray(out.temperature)))
    assert out.waterFrac is not None
    assert np.all(np.asarray(out.waterFrac) >= 0.0)
    assert np.all(np.asarray(out.waterFrac) <= te.W_MAX + 1e-12)


class TestBasalEnergyBalance:
    """ref basal_melt_grounded_ice / li_basal_melt_floating_ice."""

    def _setup(self):
        from mpas_tpu.mesh.planar import box_hex_mesh
        from mpas_tpu.cores.landice.config import LiConfig
        from mpas_tpu.cores.landice.init_dome import init_halfar
        mesh = box_hex_mesh(10, 10, 5000.0)
        cfg = LiConfig()
        grid, state, _ = init_halfar(mesh, cfg, h0=800.0, r0=20000.0)
        return mesh, cfg, grid, state

    def test_cold_bed_no_melt_warm_bed_melts(self):
        from mpas_tpu.cores.landice.thermal_enthalpy import (
            basal_energy_balance)
        mesh, cfg, grid, state = self._setup()
        nz = cfg.config_nvertlevels
        h = state.thickness
        wf = jnp.zeros((mesh.nCells, nz))
        fric = jnp.full(mesh.nCells, 0.05)           # 50 mW/m2 friction
        bw = jnp.full(mesh.nCells, 0.01)
        t_cold = jnp.full((mesh.nCells, nz), 250.0)
        bmb_c, tb_c, _ = basal_energy_balance(cfg, h, t_cold, wf, fric,
                                              bw, 3600.0)
        sel = np.asarray(h) > 1.0
        assert (np.asarray(bmb_c)[sel] >= 0.0).all()   # no melt, cold bed
        # temperate bed: conductive drain ~0, friction+geo melt
        t_pmp = 273.15 - 9.8e-8 * cfg.rho_ice * cfg.gravity \
            * np.asarray(jnp.maximum(h, 10.0))
        t_warm = jnp.broadcast_to(jnp.asarray(t_pmp)[:, None],
                                  (mesh.nCells, nz))
        bmb_w, tb_w, cond = basal_energy_balance(cfg, h, t_warm, wf,
                                                 fric, bw, 3600.0)
        assert (np.asarray(bmb_w)[sel] < 0.0).all()    # melting
        # melt magnitude ~ (geo+fric)/(rho L): 0.092 W/m2 -> ~9.6 mm/yr
        rate = -np.asarray(bmb_w)[sel].max() * 3.15e7
        expect = (cfg.config_geothermal_flux + 0.05) \
            / (cfg.rho_ice * 3.34e5) * 3.15e7
        assert abs(rate - expect) / expect < 0.1, (rate, expect)
        assert (np.asarray(tb_w)[sel] <= np.asarray(t_pmp)[sel] + 1e-9).all()

    def test_floating_melt_thermal_forcing(self):
        from mpas_tpu.cores.landice.thermal_enthalpy import (
            basal_melt_floating)
        mesh, cfg, grid, state = self._setup()
        h = jnp.full(mesh.nCells, 300.0)
        bed = jnp.full(mesh.nCells, -600.0)          # floating (draft 268m)
        warm = basal_melt_floating(cfg, h, bed,
                                   jnp.full(mesh.nCells, 274.5))
        cold = basal_melt_floating(cfg, h, bed,
                                   jnp.full(mesh.nCells, 271.0))
        assert float(jnp.max(warm)) > 0.0
        assert float(jnp.max(warm)) > float(jnp.max(cold))
        # gamma_T = 1e-4 linear forcing: ~40 m/yr per degree of thermal
        # forcing (ISMIP6-range sensitivity); ~3 C here
        myr = float(jnp.max(warm)) * 3.15e7
        assert 10.0 < myr < 300.0, myr
        # grounded ice: no ocean melt
        grounded = basal_melt_floating(cfg, h, jnp.zeros(mesh.nCells),
                                       jnp.full(mesh.nCells, 274.5))
        assert float(jnp.max(grounded)) == 0.0
