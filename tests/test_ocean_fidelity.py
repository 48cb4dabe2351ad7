"""Ocean fidelity pass (round 4): full-sweep global stats, CVMix
interior mixing schemes, and the interpolating global-ocean init.

ref: mpas_ocn_global_stats.F (full-field sweep), mpas_ocn_vmix_cvmix.F
(shear/tidal/double-diffusion interior schemes),
mpas_ocn_init_global_ocean.F (gridded T/S/topography interpolation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.ocean.core import OcnConfig, run_steps


@pytest.fixture(scope="module")
def channel():
    from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
    from mpas_tpu.mesh.planar import channel_hex_mesh
    mesh = channel_hex_mesh(10, 32, 10000.0)
    grid, state = init_baroclinic_channel(mesh, nz=12)
    return grid, state


class TestGlobalStatsSweep:
    def test_every_state_field_swept(self, channel):
        from mpas_tpu.cores.ocean.analysis.global_stats import GlobalStats
        grid, state = channel
        cfg = OcnConfig()
        gs = GlobalStats()
        out = gs.compute(grid, cfg, state)
        # every non-None OcnState array field must appear with the full
        # stats column set (the reference sweeps the whole pool)
        for f in dataclasses.fields(state):
            v = getattr(state, f.name)
            if v is None or f.name == "tracers":
                continue
            for col in ("GlobalMin", "GlobalMax", "GlobalSum",
                        "GlobalAvg", "GlobalRms"):
                assert f"{f.name}{col}" in out, (f.name, col)
        for nm in ("temperature", "salinity"):
            assert f"{nm}GlobalAvg" in out
            assert f"{nm}VertSumMax" in out
        assert "CFLNumberGlobal" in out and out["CFLNumberGlobal"] >= 0
        assert all(np.isfinite(v) for v in out.values())

    def test_stats_values_sane(self, channel):
        from mpas_tpu.cores.ocean.analysis.global_stats import GlobalStats
        grid, state = channel
        out = GlobalStats().compute(grid, OcnConfig(), state)
        assert out["temperatureGlobalMin"] <= out["temperatureGlobalAvg"] \
            <= out["temperatureGlobalMax"]
        assert out["volumeCellGlobal"] > 0


class TestCVMixInterior:
    def _rho_stable(self, grid, state, cfg):
        from mpas_tpu.cores.ocean.core import equation_of_state
        return equation_of_state(cfg, state.tracers[..., 0],
                                 state.tracers[..., 1])

    def test_shear_lmd94_limits(self, channel):
        from mpas_tpu.cores.ocean.vmix import coefs_cvmix_shear
        grid, state = channel
        cfg = OcnConfig(config_use_cvmix_shear=True)
        rho = self._rho_stable(grid, state, cfg)
        # strong shear -> near nu0; zero shear/stable -> ~0
        u_sheared = jnp.asarray(state.u).at[:, 0].add(0.5)
        visc, diff = coefs_cvmix_shear(grid, cfg, u_sheared,
                                       state.layerThickness, rho)
        assert float(jnp.max(visc)) <= cfg.config_cvmix_shear_kpp_nu_zero \
            + 1e-12
        assert float(jnp.max(visc)) > 0.5 * cfg.config_cvmix_shear_kpp_nu_zero
        visc0, _ = coefs_cvmix_shear(grid, cfg, jnp.zeros_like(state.u),
                                     state.layerThickness, rho)
        assert float(jnp.max(visc0)) < 1e-6

    def test_tidal_bottom_intensified(self, channel):
        from mpas_tpu.cores.ocean.vmix import coefs_cvmix_tidal
        grid, state = channel
        cfg = OcnConfig(config_use_cvmix_tidal_mixing=True)
        rho = self._rho_stable(grid, state, cfg)
        visc, diff = coefs_cvmix_tidal(grid, cfg, state.u,
                                       state.layerThickness, rho)
        # deposition function decays upward from the bottom
        d = np.asarray(diff)
        assert np.all(d >= 0) and np.all(np.isfinite(d))
        assert d[:, -1].mean() > d[:, 0].mean()

    def test_double_diffusion_salt_fingering(self, channel):
        from mpas_tpu.cores.ocean.vmix import coefs_cvmix_double_diffusion
        grid, state = channel
        cfg = OcnConfig()
        # warm-salty over cold-fresh with alpha dT / beta dS in (1, 1.9)
        nC, nz = state.layerThickness.shape
        t = jnp.linspace(15.0, 5.0, nz)[None, :] * jnp.ones((nC, 1))
        dT = t[:, :-1] - t[:, 1:]
        # choose dS so R_rho = alpha dT / (beta dS) = 1.5
        dS_val = cfg.config_eos_linear_alpha * float(dT[0, 0]) \
            / (cfg.config_eos_linear_beta * 1.5)
        s = 35.0 - dS_val * jnp.arange(nz)[None, :] * jnp.ones((nC, 1))
        tr = jnp.stack([t, s], axis=-1)
        kap = coefs_cvmix_double_diffusion(grid, cfg, tr,
                                           state.layerThickness)
        assert float(jnp.max(kap)) > 0.0
        assert float(jnp.max(kap)) <= 1.0e-4 + 1e-12

    def test_cvmix_combined_steps_stably(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_dt=120.0,
                        config_time_integrator="RK4",
                        config_vert_mix_scheme="cvmix",
                        config_use_cvmix_shear=True,
                        config_use_cvmix_tidal_mixing=True,
                        config_use_cvmix_double_diffusion=True)
        out = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                        jax.tree.map(jnp.asarray, state), 3)
        assert np.all(np.isfinite(np.asarray(out.layerThickness)))
        assert np.all(np.isfinite(np.asarray(out.tracers)))


class TestGlobalOceanInit:
    def test_interpolating_init_runs(self):
        from mpas_tpu.cores.ocean.init_global_ocean import (
            init_global_ocean, synthetic_woa_dataset)
        from mpas_tpu.mesh.sphere import icosahedral_mesh
        mesh = icosahedral_mesh(8, lloyd_iters=1)
        ds = synthetic_woa_dataset()
        grid, state, forcing = init_global_ocean(mesh, ds, nz=16)
        T = np.asarray(state.tracers[..., 0])
        S = np.asarray(state.tracers[..., 1])
        lat = np.asarray(grid.mesh.latCell)
        # SST warm at equator, cold at poles; stratified columns
        eq = np.abs(lat) < 0.3
        po = np.abs(lat) > 1.2
        assert T[eq, 0].mean() > T[po, 0].mean() + 10.0
        # deep ocean columns are stably stratified (land/shelf columns
        # have few active levels; compare surface vs deepest ACTIVE level)
        # (polar columns are legitimately surface-cold — dataset SST < 2C)
        mlc = np.asarray(grid.maxLevelCell)
        deep = (mlc >= 12) & (np.abs(lat) < 1.0)
        t_bot = T[np.arange(T.shape[0]), mlc - 1]
        assert np.all(T[deep, 0] >= t_bot[deep] - 1e-9)
        assert 33.0 < S.mean() < 36.5
        # land columns produced shallow maxLevelCell
        mlc = np.asarray(grid.maxLevelCell)
        assert mlc.min() == 2 and mlc.max() > 8
        cfg = OcnConfig(config_dt=300.0, config_time_integrator="RK4",
                        config_mom_del2=1.0e4, config_tracer_del2=1.0e3)
        out = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                        jax.tree.map(jnp.asarray, state), 2)
        assert np.all(np.isfinite(np.asarray(out.layerThickness)))

    def test_dataset_netcdf_round_trip(self, tmp_path):
        # a gridded dataset written as netCDF4 loads back through
        # load_dataset_netcdf (the real-file path)
        from mpas_tpu.cores.ocean.init_global_ocean import (
            load_dataset_netcdf, synthetic_woa_dataset)
        from mpas_tpu.io.hdf5_write import write_hdf5
        ds = synthetic_woa_dataset(nlat=12, nlon=24, ndep=8)
        p = str(tmp_path / "woa.nc")
        write_hdf5(p, {"lat": 12, "lon": 24, "depth": 8},
                   {"lat": (("lat",), np.rad2deg(ds["lat"])),
                    "lon": (("lon",), np.rad2deg(ds["lon"])),
                    "depth": (("depth",), ds["depth"]),
                    "t_an": (("depth", "lat", "lon"), ds["temperature"]),
                    "s_an": (("depth", "lat", "lon"), ds["salinity"]),
                    "z": (("lat", "lon"), ds["topography"])})
        out = load_dataset_netcdf(p)
        assert np.allclose(out["lat"], ds["lat"], atol=1e-12)
        assert np.allclose(out["temperature"], ds["temperature"])


class TestCarbonateSystem:
    """Carbonate chemistry anchors (published values): surface seawater
    at DIC=2000 umol/kg, ALK=2300, T=20C, S=35 has pH ~8.05-8.2 and
    pCO2 ~280-420 uatm (Zeebe & Wolf-Gladrow genre); warming raises
    pCO2 ~4%/K; the air-sea flux direction follows the pCO2 gradient."""

    def test_surface_equilibrium_anchor(self):
        import jax.numpy as jnp
        from mpas_tpu.cores.ocean.carbonate import carbonate_equilibrium
        dic = jnp.asarray([2.000e-3])
        alk = jnp.asarray([2.300e-3])
        ph, pco2, co3, hco3 = carbonate_equilibrium(
            dic, alk, jnp.asarray([20.0]), jnp.asarray([35.0]))
        assert 8.0 < float(ph[0]) < 8.25, float(ph[0])
        assert 250.0 < float(pco2[0]) < 430.0, float(pco2[0])
        # speciation: HCO3 dominates, CO3 ~ 10%
        assert float(hco3[0]) > 0.8 * float(dic[0])
        assert 0.03 * float(dic[0]) < float(co3[0]) < 0.15 * float(dic[0])

    def test_warming_raises_pco2(self):
        import jax.numpy as jnp
        from mpas_tpu.cores.ocean.carbonate import carbonate_equilibrium
        dic = jnp.asarray([2.0e-3]); alk = jnp.asarray([2.3e-3])
        s = jnp.asarray([35.0])
        _, p15, _, _ = carbonate_equilibrium(dic, alk, jnp.asarray([15.0]), s)
        _, p25, _, _ = carbonate_equilibrium(dic, alk, jnp.asarray([25.0]), s)
        ratio = float(p25[0] / p15[0])
        assert 1.3 < ratio < 1.8, ratio     # ~4.2%/K over 10 K

    def test_flux_direction_and_ice_gate(self):
        import jax.numpy as jnp
        from mpas_tpu.cores.ocean.carbonate import air_sea_co2_flux
        dic = jnp.asarray([2.0e-3]); alk = jnp.asarray([2.3e-3])
        t = jnp.asarray([10.0]); s = jnp.asarray([35.0])
        w = jnp.asarray([8.0])
        f_in, pco2, _ = air_sea_co2_flux(dic, alk, t, s, w,
                                         pco2_atm_uatm=420.0)
        # cold water at this DIC/ALK is undersaturated -> uptake
        assert float(pco2[0]) < 420.0
        assert float(f_in[0]) > 0.0
        f_ice, _, _ = air_sea_co2_flux(dic, alk, t, s, w,
                                       pco2_atm_uatm=420.0, ice_frac=1.0)
        assert abs(float(f_ice[0])) < 1e-15

    def test_carbon_step_uptake_raises_dic(self, channel):
        import jax.numpy as jnp
        from mpas_tpu.cores.ocean.bgc import carbon_step
        grid, state = channel
        nC, nz = state.layerThickness.shape
        nT = state.tracers.shape[-1]
        tr = jnp.concatenate(
            [state.tracers,
             jnp.full((nC, nz, 1), 2.0e-3),    # DIC
             jnp.full((nC, nz, 1), 2.3e-3)],   # ALK
            axis=-1)
        st = state.replace(tracers=tr)
        st2, diag = carbon_step(
            st, grid, 3600.0, t_c=jnp.full(nC, 10.0),
            s=jnp.full(nC, 35.0), wind10=jnp.full(nC, 8.0),
            index_dic=nT, index_alk=nT + 1)
        d_dic = np.asarray(st2.tracers[:, 0, nT] - tr[:, 0, nT])
        assert np.all(d_dic > 0.0)            # undersaturated -> uptake
        assert np.all(np.asarray(diag["pco2Surface"]) < 420.0)
        assert np.all(np.isfinite(np.asarray(diag["phSurface"])))

    def test_tidal_energy_flux_from_dataset(self):
        """The global-ocean init interpolates the dataset's tidal energy
        flux onto cells (ref: the tidalEnergyFlux input of
        mpas_ocn_vmix_cvmix.F), and the cvmix tidal scheme uses it."""
        import jax.numpy as jnp
        from mpas_tpu.cores.ocean.init_global_ocean import (
            init_global_ocean, synthetic_woa_dataset)
        from mpas_tpu.cores.ocean.vmix import coefs_cvmix_tidal
        from mpas_tpu.cores.ocean.core import equation_of_state
        from mpas_tpu.mesh.sphere import icosahedral_mesh
        mesh = icosahedral_mesh(8, lloyd_iters=1)
        grid, state, _ = init_global_ocean(mesh, synthetic_woa_dataset(),
                                           nz=12)
        tef = np.asarray(grid.tidalEnergyFlux)
        assert tef.shape == (mesh.nCells,)
        assert tef.max() > 5.0 * max(tef.min(), 1e-9)  # ridge-concentrated
        cfg = OcnConfig(config_use_cvmix_tidal_mixing=True)
        rho = equation_of_state(cfg, state.tracers[..., 0],
                                state.tracers[..., 1])
        visc, diff = coefs_cvmix_tidal(grid, cfg, jnp.asarray(state.u),
                                       jnp.asarray(state.layerThickness),
                                       rho)
        d = np.asarray(diff)
        assert np.all(np.isfinite(d)) and d.max() > 0
        # mixing follows the energy-flux geography
        hi = tef > np.percentile(tef, 90)
        lo = tef < np.percentile(tef, 20)
        assert d[hi].mean() > d[lo].mean()
