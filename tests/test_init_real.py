"""Real-data (GFS, init case 7) pipeline: WPS intermediate IO, real-case
initialization, GWD statics.

Parity model: mpas_init_atm_read_met.F round-trip fidelity,
init_atm_case_gfs balance properties, mpas_init_atm_gwd.F statistics.
"""

import numpy as np
import pytest

from mpas_tpu.cores.init_atmosphere import met_reader as mr
from mpas_tpu.cores.init_atmosphere.gwd import gwd_statics


def _synthetic_gfs(tmp_path, nx=72, ny=37):
    """Global 5-degree synthetic GFS first guess."""
    lats = -90.0 + 5.0 * np.arange(ny)
    lons = 0.0 + 5.0 * np.arange(nx)
    LA, LO = np.meshgrid(lats, lons, indexing="ij")
    plevs = np.array([100000.0, 85000.0, 70000.0, 50000.0, 30000.0,
                      20000.0, 10000.0])
    fields = []

    def std_z(p):
        return 287.0 * 250.0 / 9.81 * np.log(101325.0 / p)

    for p in plevs:
        t = 288.0 - 55.0 * np.log(101325.0 / p) / np.log(101325.0 / 1e4) \
            + 10.0 * np.cos(np.radians(LA))
        z = std_z(p) * (1.0 + 0.01 * np.cos(np.radians(LA)))
        u = 20.0 * np.sin(np.radians(2.0 * LA)) ** 2 * (p / 1e5)
        v = np.zeros_like(u)
        rh = 50.0 * np.ones_like(u) * (p / 1e5)
        for name, slab, units in [("TT", t, "K"), ("GHT", z, "m"),
                                  ("UU", u, "m s-1"), ("VV", v, "m s-1"),
                                  ("RH", rh, "%")]:
            fields.append(mr.MetField(
                field=name, units=units, desc=f"{name} at {p}",
                hdate="2020-01-01_00:00:00", xfcst=0.0, xlvl=float(p),
                nx=nx, ny=ny, iproj=0, startlat=float(lats[0]),
                startlon=float(lons[0]), deltalat=5.0, deltalon=5.0,
                earth_radius=6371.229, is_wind_grid_rel=False,
                slab=slab))
    for name, slab in [("PSFC", 101325.0 - 500.0 * np.cos(np.radians(LA))),
                       ("SKINTEMP", 288.0 + 12.0 * np.cos(np.radians(LA))),
                       ("SOILHGT", 200.0 * np.maximum(
                           np.cos(np.radians(LA)), 0.0))]:
        fields.append(mr.MetField(
            field=name, units="-", desc=name,
            hdate="2020-01-01_00:00:00", xfcst=0.0, xlvl=200100.0,
            nx=nx, ny=ny, iproj=0, startlat=float(lats[0]),
            startlon=float(lons[0]), deltalat=5.0, deltalon=5.0,
            earth_radius=6371.229, is_wind_grid_rel=False,
            slab=np.asarray(slab, dtype=np.float64)))
    path = str(tmp_path / "FILE_2020-01-01_00")
    mr.write_met_file(path, fields)
    return path


class TestMetIO:
    def test_roundtrip(self, tmp_path):
        path = _synthetic_gfs(tmp_path)
        fields = mr.read_met_file(path)
        names = {f.field for f in fields}
        assert {"TT", "GHT", "UU", "VV", "RH", "PSFC", "SKINTEMP",
                "SOILHGT"} <= names
        tt = [f for f in fields if f.field == "TT"]
        assert len(tt) == 7
        f0 = tt[0]
        assert f0.nx == 72 and f0.ny == 37 and f0.iproj == 0
        assert f0.deltalat == pytest.approx(5.0)
        # slab round-trips in float32 precision
        levels, slabs = mr.fields_by_level(fields, "TT")
        assert levels[0] == pytest.approx(100000.0)
        assert np.all(np.diff(levels) < 0)
        assert np.isfinite(slabs).all()

    def test_surface_field(self, tmp_path):
        path = _synthetic_gfs(tmp_path)
        fields = mr.read_met_file(path)
        psfc = mr.surface_field(fields, "PSFC")
        assert psfc is not None and psfc.shape == (37, 72)


class TestRealInit:
    @pytest.fixture(scope="class")
    def real_ic(self, tmp_path_factory):
        from mpas_tpu.mesh.sphere import icosahedral_mesh
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.init_atmosphere.real_case import init_real
        path = _synthetic_gfs(tmp_path_factory.mktemp("met"))
        fields = mr.read_met_file(path)
        mesh = icosahedral_mesh(4, lloyd_iters=1)     # 162 cells
        cfg = AtmConfig(config_nvertlevels=10, config_dt=600.0,
                        config_len_disp=1.9e6)
        grid, state, diag, extras = init_real(mesh, cfg, fields)
        return mesh, cfg, grid, state, diag, extras

    def test_state_physical(self, real_ic):
        mesh, cfg, grid, state, diag, extras = real_ic
        th = np.asarray(state.theta_m)
        rho = np.asarray(state.rho_zz) * np.asarray(grid.zz)
        assert np.isfinite(th).all() and np.isfinite(rho).all()
        assert th.min() > 230.0 and th.max() < 2000.0
        assert rho.min() > 0.005 and rho.max() < 1.6
        qv = np.asarray(state.scalars[..., 0])
        assert qv.min() >= 0.0 and qv.max() < 0.03
        # terrain made it into the grid
        assert np.asarray(grid.zgrid)[:, 0].max() > 50.0
        assert np.asarray(extras["skintemp"]).max() > 295.0

    def test_hydrostatic_residual_small(self, real_ic):
        """dp/dz ~ -rho g within a few percent (hydrostatic balance)."""
        mesh, cfg, grid, state, diag, extras = real_ic
        from mpas_tpu.constants import cp, rgas, p0, gravity
        exner = np.asarray(diag.exner)
        th = np.asarray(state.theta_m)
        p = p0 * exner ** (cp / rgas)
        zgrid = np.asarray(grid.zgrid)
        zmid = 0.5 * (zgrid[:, 1:] + zgrid[:, :-1])
        dpdz = (p[:, 1:] - p[:, :-1]) / (zmid[:, 1:] - zmid[:, :-1])
        rho_mid = 0.5 * (np.asarray(state.rho_zz * grid.zz)[:, 1:]
                         + np.asarray(state.rho_zz * grid.zz)[:, :-1])
        resid = np.abs(dpdz + rho_mid * gravity) / (rho_mid * gravity)
        assert np.median(resid) < 0.05

    def test_one_dycore_step_stable(self, real_ic):
        import jax
        import jax.numpy as jnp
        mesh, cfg, grid, state, diag, extras = real_ic
        from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                                run_steps)
        gridj = jax.tree.map(jnp.asarray, grid)
        carry = init_carry(gridj, cfg, jax.tree.map(jnp.asarray, state),
                           jax.tree.map(jnp.asarray, diag), cfg.config_dt)
        out = run_steps(gridj, cfg, carry, cfg.config_dt, 2)
        assert bool(jnp.all(jnp.isfinite(out.state.u)))
        assert bool(jnp.all(jnp.isfinite(out.state.theta_m)))


class TestGWD:
    def test_statistics_flat_vs_rough(self):
        ny = nx = 64
        rng = np.random.default_rng(1)
        flat = np.zeros((ny, nx))
        rough = 300.0 * rng.standard_normal((ny, nx))
        i_c = np.asarray([32.0])
        j_c = np.asarray([32.0])
        s_flat = gwd_statics(flat, i_c, j_c)
        s_rough = gwd_statics(rough, i_c, j_c)
        assert s_flat["var2d"][0] == pytest.approx(0.0)
        assert s_rough["var2d"][0] > 100.0
        for k in ("ol1", "ol2", "ol3", "ol4"):
            assert 0.0 <= s_rough[k][0] <= 1.0
        for k in ("oa1", "oa2", "oa3", "oa4"):
            assert -1.0 <= s_rough[k][0] <= 1.0

    def test_asymmetry_sign(self):
        """Terrain rising to the east -> OA1 negative (the reference's
        get_oa1 counts nu in the WEST half: mpas_init_atm_gwd.F)."""
        ny = nx = 64
        ii = np.arange(nx)[None, :] * np.ones((ny, 1))
        ramp = 10.0 * ii
        s = gwd_statics(ramp, np.asarray([32.0]), np.asarray([32.0]))
        assert s["oa1"][0] < -0.3
        assert abs(s["oa2"][0]) < 0.1
        # and rising to the north -> OA2 negative (nu = south half)
        jjr = np.arange(ny)[:, None] * np.ones((1, nx))
        s2 = gwd_statics(10.0 * jjr, np.asarray([32.0]),
                         np.asarray([32.0]))
        assert s2["oa2"][0] < -0.3

    def test_ol_critical_height(self):
        """OL uses hc = 1116.2 - 0.878*var2d: terrain entirely below hc
        gives OL=0; a tall plateau in the middle rows raises OL1."""
        ny = nx = 64
        low = 50.0 * np.ones((ny, nx))     # var2d=0 -> hc=1116.2 > 50
        s = gwd_statics(low, np.asarray([32.0]), np.asarray([32.0]))
        for k in ("ol1", "ol2", "ol3", "ol4"):
            assert s[k][0] == 0.0
        # 800 m plateau: var2d=400 -> hc ~ 765 m discriminates plateau
        # from plain (a 4000 m plateau drives hc negative and saturates
        # every OL at 1 — the reference's linear-hc behavior)
        plateau = np.zeros((ny, nx))
        plateau[24:40, :] = 800.0           # middle rows of the 32-box
        s2 = gwd_statics(plateau, np.asarray([32.0]), np.asarray([32.0]),
                         half=16)
        assert s2["ol1"][0] > 0.9           # middle-row band is high
        assert s2["ol1"][0] > s2["ol2"][0]  # ol2 sees mostly low ground
        assert abs(s2["ol2"][0] - 0.5) < 0.1

    def test_con_water_dominated_zero(self):
        """Water-dominated boxes have convexity zeroed (WATER landuse
        logic of get_con)."""
        from mpas_tpu.cores.init_atmosphere.gwd import WATER
        ny = nx = 32
        rng = np.random.default_rng(3)
        topo = 200.0 * rng.standard_normal((ny, nx))
        lu_water = np.full((ny, nx), WATER)
        lu_land = np.ones((ny, nx))
        s_w = gwd_statics(topo, np.asarray([16.0]), np.asarray([16.0]),
                          landuse=lu_water)
        s_l = gwd_statics(topo, np.asarray([16.0]), np.asarray([16.0]),
                          landuse=lu_land)
        assert s_w["con"][0] == 0.0
        assert s_l["con"][0] > 1.0          # Gaussian kurtosis ~ 3

    def test_global_driver_pole_and_wrap(self):
        """compute_gwd_fields handles longitude wrap and pole
        reflection; box sizes grow toward the poles (latitude
        correction) and statistics stay finite/bounded."""
        from mpas_tpu.cores.init_atmosphere.gwd import compute_gwd_fields
        topo_y, topo_x = 60, 120
        rng = np.random.default_rng(5)
        topo = 300.0 * rng.standard_normal((topo_y, topo_x))
        lat = np.asarray([-89.0, 0.0, 89.0, 45.0])
        lon = np.asarray([-179.9, 179.9, 0.0, 10.0])
        dc = np.full(4, 1.2e6)              # large boxes
        out = compute_gwd_fields(topo, None, lat, lon, dc)
        for k, v in out.items():
            assert np.all(np.isfinite(v)), k
        assert np.all(out["var2d"] > 0.0)
        for k in ("oa1", "oa2", "oa3", "oa4"):
            assert np.all(np.abs(out[k]) <= 1.0)


def _synthetic_gfs_full(tmp_path, nx=72, ny=37):
    """Synthetic GFS with the full surface group: soil layers
    (GFS ST/SM codes), SST, SEAICE, SNOW (ref field list:
    mpas_init_atm_cases.F:3400-3460)."""
    path = _synthetic_gfs(tmp_path, nx, ny)
    fields = mr.read_met_file(path)
    lats = -90.0 + 5.0 * np.arange(ny)
    lons = 0.0 + 5.0 * np.arange(nx)
    LA, LO = np.meshgrid(lats, lons, indexing="ij")
    sfc = {
        "ST000010": 285.0 + 10.0 * np.cos(np.radians(LA)),
        "ST010040": 284.0 + 9.0 * np.cos(np.radians(LA)),
        "ST040100": 283.0 + 8.0 * np.cos(np.radians(LA)),
        "ST100200": 282.0 + 7.0 * np.cos(np.radians(LA)),
        "SM000010": 0.25 + 0.1 * np.sin(np.radians(LO)),
        "SM010040": 0.27 + 0.1 * np.sin(np.radians(LO)),
        "SM040100": 0.30 + 0.05 * np.sin(np.radians(LO)),
        "SM100200": 0.32 + 0.02 * np.sin(np.radians(LO)),
        "SST": 271.0 + 29.0 * np.cos(np.radians(LA)) ** 2,
        "SEAICE": np.where(np.abs(LA) > 70.0, 0.9, 0.0),
        "SNOW": np.where(np.abs(LA) > 60.0, 5.0, 0.0),
    }
    for name, slab in sfc.items():
        fields.append(mr.MetField(
            field=name, units="-", desc=name,
            hdate="2020-01-01_00:00:00", xfcst=0.0, xlvl=200100.0,
            nx=nx, ny=ny, iproj=0, startlat=float(lats[0]),
            startlon=float(lons[0]), deltalat=5.0, deltalon=5.0,
            earth_radius=6371.229, is_wind_grid_rel=False,
            slab=np.asarray(slab, dtype=np.float64)))
    path2 = str(tmp_path / "FILE_FULL_2020-01-01_00")
    mr.write_met_file(path2, fields)
    return path2


class TestRealCaseDepth:
    """Round-4 depth of init case 7 (ref: mpas_init_atm_cases.F:2526-3500):
    iterative moisture/hydrostatic rebalance, Noah soil-layer
    interpolation, SST/SEAICE, and the case-8 surface-update stream."""

    def test_soil_sst_seaice_extras(self, tmp_path):
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.init_atmosphere.real_case import init_real
        from mpas_tpu.mesh.sphere import icosahedral_mesh
        path = _synthetic_gfs_full(tmp_path)
        fields = mr.read_met_file(path)
        mesh = icosahedral_mesh(8, lloyd_iters=1)
        cfg = AtmConfig(config_nvertlevels=10, config_dt=1200.0,
                        config_len_disp=960000.0)
        grid, state, diag, extras = init_real(mesh, cfg, fields)
        tslb, smois = extras["tslb"], extras["smois"]
        assert tslb.shape == (mesh.nCells, 4)
        assert smois.shape == (mesh.nCells, 4)
        assert np.all((tslb > 230.0) & (tslb < 330.0))
        assert np.all((smois >= 0.02) & (smois <= 0.48))
        # soil temperature decreases into the column poleward structure
        lat = np.degrees(np.asarray(mesh.latCell))
        eq, po = np.abs(lat) < 20, np.abs(lat) > 70
        assert tslb[eq, 0].mean() > tslb[po, 0].mean()
        assert np.all((extras["xice"] >= 0.0) & (extras["xice"] <= 1.0))
        assert extras["xice"][po].mean() > 0.5
        assert abs(extras["xice"][eq]).max() < 1e-9
        # sst warm at the equator
        assert extras["sst"][eq].mean() > extras["sst"][po].mean() + 15.0

    def test_moisture_rebalance_consistency(self, tmp_path):
        """After the iterative rebalance, qv equals RH*qsat evaluated at
        the MODEL-level pressure/temperature (self-consistency the
        single-pass interpolation lacks)."""
        from mpas_tpu.constants import cp, p0, rgas, rvord
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.init_atmosphere.real_case import init_real
        from mpas_tpu.mesh.sphere import icosahedral_mesh
        path = _synthetic_gfs_full(tmp_path)
        fields = mr.read_met_file(path)
        mesh = icosahedral_mesh(8, lloyd_iters=1)
        cfg = AtmConfig(config_nvertlevels=10, config_dt=1200.0,
                        config_len_disp=960000.0)
        grid, state, diag, extras = init_real(mesh, cfg, fields)
        qv = np.asarray(state.scalars[..., 0])
        th_m = np.asarray(state.theta_m)
        exner = np.asarray(diag.exner)
        zz = np.asarray(grid.zz)
        t_abs = th_m / (1.0 + rvord * qv) * exner
        p_model = p0 * exner ** (cp / rgas)
        es = 611.2 * np.exp(17.67 * (t_abs - 273.15) / (t_abs - 29.65))
        qsat = 0.622 * es / np.maximum(p_model - es, 100.0)
        rh = qv / qsat
        assert np.all(np.isfinite(rh))
        assert float(np.nanmax(rh)) < 1.05   # never supersaturated

    @pytest.mark.slow
    def test_24h_run_with_physics(self, tmp_path):
        """A synthetic GFS initialization runs 24 h stably with the
        mesoscale_reference physics suite on (the VERDICT item-7 done
        criterion)."""
        import jax
        import jax.numpy as jnp
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.atmosphere.hooks import run_steps_with_physics
        from mpas_tpu.cores.atmosphere.physics.manager import (
            PhysicsConfig, init_physics_state)
        from mpas_tpu.ops.reconstruct import build_reconstruct_coeffs
        from mpas_tpu.cores.atmosphere.time_integration import init_carry
        from mpas_tpu.cores.init_atmosphere.real_case import init_real
        from mpas_tpu.mesh.sphere import icosahedral_mesh
        path = _synthetic_gfs_full(tmp_path)
        fields = mr.read_met_file(path)
        mesh = icosahedral_mesh(8, lloyd_iters=1)
        cfg = AtmConfig(config_nvertlevels=10, config_dt=1200.0,
                        config_len_disp=960000.0,
                        config_microp_scheme="mp_kessler",
                        config_physics_suite="mesoscale_reference")
        grid, state, diag, extras = init_real(mesh, cfg, fields)
        # widen scalars to (qv, qc, qr) for the Kessler microphysics
        import numpy as _np
        sc = _np.zeros(state.scalars.shape[:2] + (3,))
        sc[..., 0] = _np.asarray(state.scalars[..., 0])
        state = state.replace(scalars=sc)
        gridj = jax.tree.map(jnp.asarray, grid)
        carry = init_carry(gridj, cfg, jax.tree.map(jnp.asarray, state),
                           jax.tree.map(jnp.asarray, diag), cfg.config_dt)
        nz = cfg.config_nvertlevels
        phys = init_physics_state(mesh.nCells, nz,
                                  tsk0=jnp.asarray(extras["skintemp"]))
        coeffs = build_reconstruct_coeffs(gridj.mesh)
        out, phys2 = run_steps_with_physics(
            gridj, cfg, carry, phys, coeffs, cfg.config_dt, 72)
        th = np.asarray(out.state.theta_m)
        assert np.all(np.isfinite(th))
        assert np.all(np.isfinite(np.asarray(out.state.u)))
        assert np.abs(np.asarray(out.state.u)).max() < 150.0


class TestStaticAggregation:
    """Pixel-push static-field aggregation (mpas_init_atm_static.F:
    TER mean :320-369, LU/SOILCAT dominant category :420-555,
    consistency fixups :561-588)."""

    def _mesh4(self):
        lat_c = np.deg2rad(np.asarray([0.0, 0.0, 10.0, 10.0]))
        lon_c = np.deg2rad(np.asarray([0.0, 10.0, 0.0, 10.0]))
        return lat_c, lon_c

    def test_terrain_cell_average(self):
        from mpas_tpu.cores.init_atmosphere import static as st
        lat_c, lon_c = self._mesh4()
        rng = np.random.default_rng(0)
        lat_p = np.deg2rad(rng.uniform(-5, 15, 6000))
        lon_p = np.deg2rad(rng.uniform(-5, 15, 6000))
        vals = np.where(lat_p > np.deg2rad(5.0), 1000.0, 100.0)
        m, cnt = st.pixel_push_mean(lat_p, lon_p, vals, lat_c, lon_c)
        assert cnt.sum() == 6000
        np.testing.assert_allclose(m[:2], 100.0, atol=25.0)
        np.testing.assert_allclose(m[2:], 1000.0, atol=25.0)

    def test_dominant_category_skips_zero(self):
        from mpas_tpu.cores.init_atmosphere import static as st
        lat_c, lon_c = self._mesh4()
        lat_p = np.deg2rad(np.asarray([0.0, 0.1, -0.1, 0.05, 9.9]))
        lon_p = np.deg2rad(np.asarray([0.0, 0.1, -0.1, 0.05, 9.9]))
        cats = np.asarray([0, 7, 7, 3, 5])   # zeros dropped (ref :418)
        dom, hist = st.pixel_push_dominant(lat_p, lon_p, cats,
                                           lat_c, lon_c, 24)
        assert dom[0] == 7                   # 2x cat7 beats 1x cat3
        assert dom[3] == 5
        assert hist[0].sum() == 3            # the zero pixel is gone

    def test_water_consistency_both_ways(self):
        from mpas_tpu.cores.init_atmosphere import static as st
        # cell 0: water in LU only; cell 1: water in soil only;
        # cell 2: land-ice LU forces ice soil; cell 3: consistent land
        lu = np.asarray([16, 3, 24, 5])
        sc = np.asarray([4, 14, 7, 8])
        lu2, sc2, lm = st.landuse_consistency(lu, sc)
        assert sc2[0] == 14 and lu2[1] == 16     # both become water
        assert sc2[2] == 16                      # isice soil category
        assert list(lm) == [0, 0, 1, 1]

    def test_soiltemp_lapse(self):
        from mpas_tpu.cores.init_atmosphere import static as st
        t = st.soiltemp_adjust(np.asarray([285.0, 285.0, 285.0]),
                               np.asarray([0.0, 1000.0, 3000.0]),
                               np.asarray([1, 1, 0]))
        np.testing.assert_allclose(t[:2], [285.0, 278.5])
        assert t[2] == 0.0                       # water cell zeroed

    def test_shd_min_max(self):
        from mpas_tpu.cores.init_atmosphere import static as st
        g = np.stack([np.full(3, 0.2), np.full(3, 0.8),
                      np.full(3, 0.5)], axis=-1)
        lo, hi = st.shd_min_max(g)
        np.testing.assert_allclose(lo, 0.2)
        np.testing.assert_allclose(hi, 0.8)
