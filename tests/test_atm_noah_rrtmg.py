"""Noah-class 4-layer LSM and k-distribution (RRTMG-class) radiation.

Parity model: module_sf_noahlsm / module_ra_rrtmg_{lw,sw} capabilities.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.physics import noah
from mpas_tpu.cores.atmosphere.physics import rrtmg


def _columns(n=4, nz=20):
    """Idealized midlatitude columns."""
    z = jnp.linspace(100.0, 20000.0, nz)[None, :] * jnp.ones((n, 1))
    t = 288.0 - 6.5e-3 * jnp.minimum(z, 11000.0)
    p = 1.0e5 * jnp.exp(-z / 7500.0)
    rho = p / (287.0 * t)
    dz = jnp.full((n, nz), 1000.0)
    qv = 0.01 * jnp.exp(-z / 2500.0)
    qc = jnp.zeros_like(qv)
    return t, p, rho, dz, qv, qc


class TestNoah:
    def test_soil_heat_diffusion_relaxes(self):
        """Hot skin over cold soil: layer-1 soil warms, deep layer lags."""
        n = 3
        tsk = jnp.full((n,), 300.0)
        tslb = jnp.full((n, 4), 285.0)
        smois = jnp.full((n, 4), 0.25)
        swe = jnp.zeros((n,))
        out = noah.noah_lsm(tsk, tslb, smois, swe,
                            gsw=jnp.full((n,), 400.0),
                            glw=jnp.full((n,), 350.0),
                            hfx=jnp.full((n,), 50.0),
                            lh=jnp.full((n,), 50.0),
                            precip_rate=jnp.zeros((n,)), dt=600.0)
        t1 = np.asarray(out["tslb"])
        assert np.all(t1[:, 0] > 285.0)          # top soil warmed
        assert np.all(t1[:, 3] < t1[:, 0])       # deep layer lags
        assert np.all(np.asarray(out["g_flux"]) > 0.0)

    def test_energy_balance_steady_state(self):
        """With balanced fluxes the skin temperature barely moves."""
        n = 2
        tsk = jnp.full((n,), 290.0)
        tslb = jnp.full((n, 4), 290.0)
        # choose fluxes so net ~ 0: eps*sig*T^4 = 401 W/m2 at 290 K
        lw_up = 0.985 * 5.67e-8 * 290.0 ** 4
        out = noah.noah_lsm(tsk, tslb, jnp.full((n, 4), 0.25),
                            jnp.zeros((n,)),
                            gsw=jnp.full((n,), lw_up * 0.5),
                            glw=jnp.full((n,), lw_up * 0.5 / 0.985),
                            hfx=jnp.zeros((n,)), lh=jnp.zeros((n,)),
                            precip_rate=jnp.zeros((n,)), dt=600.0)
        assert np.allclose(np.asarray(out["tsk"]), 290.0, atol=0.3)

    def test_snow_melts_and_caps_skin(self):
        n = 2
        tsk = jnp.full((n,), 272.0)
        out = noah.noah_lsm(tsk, jnp.full((n, 4), 272.0),
                            jnp.full((n, 4), 0.3), jnp.full((n,), 0.05),
                            gsw=jnp.full((n,), 700.0),
                            glw=jnp.full((n,), 350.0),
                            hfx=jnp.zeros((n,)), lh=jnp.zeros((n,)),
                            precip_rate=jnp.zeros((n,)), dt=3600.0)
        assert np.all(np.asarray(out["tsk"]) <= 273.15 + 1e-9)
        assert np.all(np.asarray(out["swe"]) < 0.05)
        assert np.all(np.asarray(out["snow_melt"]) > 0.0)

    def test_infiltration_moistens_soil(self):
        n = 2
        out = noah.noah_lsm(jnp.full((n,), 285.0), jnp.full((n, 4), 285.0),
                            jnp.full((n, 4), 0.1), jnp.zeros((n,)),
                            gsw=jnp.zeros((n,)), glw=jnp.full((n,), 320.0),
                            hfx=jnp.zeros((n,)), lh=jnp.zeros((n,)),
                            precip_rate=jnp.full((n,), 5.0e-7),  # ~1.8mm/h
                            dt=3600.0)
        assert np.all(np.asarray(out["smois"])[:, 0] > 0.1)
        # beta reflects dry root zone
        assert np.all(np.asarray(out["beta"]) < 0.5)


class TestRRTMG:
    def test_planck_band_fractions_sum_to_one(self):
        t = jnp.asarray([220.0, 260.0, 300.0])
        total = sum(
            np.asarray(rrtmg._planck_band_fraction(t, *band["nu"],
                                                   n_quad=32))
            for band in rrtmg._tables()["lw"])
        # the 16 bands, 10-3250 cm-1, capture nearly all terrestrial
        # emission (ref: module_ra_rrtmg_lw.F wavenum1/wavenum2 tables)
        assert np.all(total > 0.93) and np.all(total <= 1.005)

    def test_band_structure_matches_reference(self):
        tab = rrtmg._tables()
        assert len(tab["lw"]) == 16 and len(tab["sw"]) == 14
        assert sum(len(b["w"]) for b in tab["lw"]) == 140
        assert sum(len(b["w"]) for b in tab["sw"]) == 112
        assert tab["lw"][0]["nu"] == (10.0, 350.0)
        assert tab["lw"][15]["nu"] == (2600.0, 3250.0)
        # g-weights are a partition of unity per band
        for b in tab["lw"] + tab["sw"]:
            assert abs(float(np.sum(b["w"])) - 1.0) < 1e-12

    def test_lw_cooling_and_olr(self):
        t, p, rho, dz, qv, qc = _columns()
        tsk = t[:, 0] + 1.0
        dtdt, glw, olr = rrtmg.rrtmg_lw(t, qv, qc, rho, dz, tsk)
        assert np.all(np.isfinite(np.asarray(dtdt)))
        # clear-sky column LW cools on average
        assert float(jnp.mean(dtdt)) < 0.0
        # OLR in the physical range for a 288K surface
        assert 150.0 < float(olr[0]) < 340.0
        assert 200.0 < float(glw[0]) < 450.0

    def test_lw_greenhouse_vapor(self):
        """More water vapor => more downwelling LW at the surface."""
        t, p, rho, dz, qv, qc = _columns()
        tsk = t[:, 0]
        _, glw_dry, olr_dry = rrtmg.rrtmg_lw(t, 0.3 * qv, qc, rho, dz, tsk)
        _, glw_wet, olr_wet = rrtmg.rrtmg_lw(t, qv, qc, rho, dz, tsk)
        assert float(glw_wet[0]) > float(glw_dry[0])
        assert float(olr_wet[0]) < float(olr_dry[0])

    def test_co2_greenhouse(self):
        t, p, rho, dz, qv, qc = _columns()
        tsk = t[:, 0]
        _, _, olr_lo = rrtmg.rrtmg_lw(t, qv, qc, rho, dz, tsk,
                                      co2_ppv=200.0e-6)
        _, _, olr_hi = rrtmg.rrtmg_lw(t, qv, qc, rho, dz, tsk,
                                      co2_ppv=800.0e-6)
        assert float(olr_hi[0]) < float(olr_lo[0])

    def test_sw_surface_flux_and_cloud_dimming(self):
        t, p, rho, dz, qv, qc = _columns()
        mu = jnp.full((t.shape[0],), 0.7)
        dtdt, gsw_clear = rrtmg.rrtmg_sw(qv, qc, rho, dz, mu)
        qc_cloudy = qc.at[:, 5:8].set(3.0e-4)
        _, gsw_cloud = rrtmg.rrtmg_sw(qv, qc_cloudy, rho, dz, mu)
        assert np.all(np.isfinite(np.asarray(dtdt)))
        assert 300.0 < float(gsw_clear[0]) < 0.8 * 1361.0 * 0.7
        assert float(gsw_cloud[0]) < float(gsw_clear[0])
        # absorption heats the column somewhere (O3 + H2O)
        assert float(jnp.max(dtdt)) > 0.0

    def test_suite_runs_with_kdist_and_noah(self):
        """End-to-end: the physics suite step with Noah + kdist options."""
        from mpas_tpu.cores.atmosphere.physics.manager import (
            PhysicsConfig, init_physics_state)
        cfg = PhysicsConfig(config_lsm_scheme="noah",
                            config_radiation_scheme="kdist")
        st = init_physics_state(10, 20, lsm_scheme="noah")
        assert st.tslb is not None and st.smois is not None
        assert cfg.config_radiation_scheme == "kdist"


class TestNoahParamTables:
    """Vendored SOILPARM/VEGPARM tables (noah_tables.py; ref:
    module_sf_noahlsm.F SOILPARM/VEGPARM blocks)."""

    def _forcings(self, n):
        z = jnp.zeros(n)
        return dict(gsw=jnp.full(n, 400.0), glw=jnp.full(n, 330.0),
                    hfx=jnp.full(n, 60.0), lh=jnp.full(n, 80.0),
                    precip_rate=z, dt=1800.0)

    def test_soil_class_controls_hydrology(self):
        """Sand (class 1) drains much faster than clay (class 12):
        after identical wet starts, sand's bottom-layer drainage removes
        more water."""
        from mpas_tpu.cores.atmosphere.physics.noah import noah_lsm
        n = 4
        tsk = jnp.full(n, 295.0)
        tslb = jnp.full((n, 4), 290.0)
        smois = jnp.full((n, 4), 0.33)
        swe = jnp.zeros(n)
        f = self._forcings(n)
        out_sand = noah_lsm(tsk, tslb, smois, swe, isltyp=jnp.full(n, 1,
                            dtype=jnp.int32), **f)
        out_clay = noah_lsm(tsk, tslb, smois, swe, isltyp=jnp.full(n, 12,
                            dtype=jnp.int32), **f)
        assert float(out_sand["smois"][:, 3].mean()) \
            != float(out_clay["smois"][:, 3].mean())
        # wilting/field-capacity differ -> beta differs
        assert float(out_sand["beta"].mean()) > float(
            out_clay["beta"].mean())

    def test_veg_class_controls_transpiration(self):
        """Barren (19, shdfac 0.01) transpires less than cropland (2)."""
        from mpas_tpu.cores.atmosphere.physics.noah import noah_lsm
        n = 4
        tsk = jnp.full(n, 295.0)
        tslb = jnp.full((n, 4), 290.0)
        smois = jnp.full((n, 4), 0.25)
        swe = jnp.zeros(n)
        f = self._forcings(n)
        out_crop = noah_lsm(tsk, tslb, smois, swe,
                            isltyp=jnp.full(n, 6, dtype=jnp.int32),
                            ivgtyp=jnp.full(n, 2, dtype=jnp.int32), **f)
        out_bare = noah_lsm(tsk, tslb, smois, swe,
                            isltyp=jnp.full(n, 6, dtype=jnp.int32),
                            ivgtyp=jnp.full(n, 19, dtype=jnp.int32), **f)
        # cropland loses more top-layer water to transpiration
        assert float(out_crop["smois"][:, 0].mean()) < float(
            out_bare["smois"][:, 0].mean())

    def test_table_sanity(self):
        from mpas_tpu.cores.atmosphere.physics.noah_tables import (
            soil_params, veg_params)
        import numpy as np
        sp = soil_params(np.arange(1, 20))
        assert np.all(np.asarray(sp["smcmax"])[:13] > 0.3)
        assert np.all(np.asarray(sp["smcwlt"]) < np.asarray(sp["smcref"])
                      + 1e-12)
        vp = veg_params(np.arange(1, 25))
        assert float(np.asarray(vp["albedo"])[23]) > 0.5   # snow/ice
        assert float(np.asarray(vp["z0"])[13]) > 1.0       # evergreen
