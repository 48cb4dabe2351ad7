"""Sea-ice column tracer packages: linear-remap ITD, melt ponds, age,
aerosols, brine height, algae, snow metamorphism, snow-ice formation.

ref capabilities: ice_itd.F90 (linear_itd), ice_meltpond_{cesm,lvl,topo},
ice_age.F90, ice_firstyear.F90, ice_aerosol.F90, ice_brine.F90,
ice_algae.F90, ice_therm_itd.F90 (freeboard snow-ice).
"""

import pytest
import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.seaice import bgc, ponds, snow, tracers
from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.itd import linear_remap

CFG = SeaiceConfig()


def _itd_state(h_per_cat, a_per_cat):
    a = jnp.asarray(a_per_cat)[None, :]
    h = jnp.asarray(h_per_cat)[None, :]
    vi = a * h
    vs = 0.1 * a
    ts = jnp.full_like(a, -5.0)
    return a, vi, vs, ts


class TestLinearRemapITD:
    def test_conserves_area_volume(self):
        # cat-1 ice grew past its upper bound (0.64): remap must move some
        # of it into cat 2 while conserving total area and volume
        a, vi, vs, ts = _itd_state([0.70, 1.0, 2.0, 3.0, 5.0],
                                   [0.3, 0.2, 0.1, 0.05, 0.01])
        a2, vi2, vs2, ts2, _, _, _, _ = linear_remap(CFG, a, vi, vs, ts)
        np.testing.assert_allclose(float(a2.sum()), float(a.sum()),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(vi2.sum()), float(vi.sum()),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(vs2.sum()), float(vs.sum()),
                                   rtol=1e-10)
        # ice moved up: cat 2 gained area
        assert float(a2[0, 1]) > float(a[0, 1])
        assert float(a2[0, 0]) < float(a[0, 0])

    def test_melt_moves_ice_down(self):
        # cat-2 ice melted below the cat-1/2 boundary
        a, vi, vs, ts = _itd_state([0.3, 0.60, 2.0, 3.0, 5.0],
                                   [0.2, 0.3, 0.1, 0.05, 0.01])
        a2, vi2, *_ = linear_remap(CFG, a, vi, vs, ts)
        assert float(a2[0, 0]) > float(a[0, 0])
        np.testing.assert_allclose(float(vi2.sum()), float(vi.sum()),
                                   rtol=1e-10)

    def test_in_bounds_noop(self):
        a, vi, vs, ts = _itd_state([0.3, 1.0, 2.0, 3.0, 6.0],
                                   [0.2, 0.3, 0.1, 0.05, 0.01])
        a2, vi2, *_ = linear_remap(CFG, a, vi, vs, ts)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a),
                                   atol=1e-12)

    def test_area_tracer_rides(self):
        a, vi, vs, ts = _itd_state([0.70, 1.0, 2.0, 3.0, 5.0],
                                   [0.3, 0.2, 0.1, 0.05, 0.01])
        age = jnp.full_like(a, 1.0e6)
        *_, at2, _ = linear_remap(CFG, a, vi, vs, ts, area_tracers=(age,))
        # a uniform area tracer stays uniform where ice remains
        got = np.asarray(at2[0])[0][np.asarray(a)[0] > 0]
        np.testing.assert_allclose(got, 1.0e6, rtol=1e-8)


class TestPonds:
    a = jnp.asarray([[0.8, 0.5]])
    h_i = jnp.asarray([[1.5, 2.5]])

    def test_cesm_grows_with_melt(self):
        ap0 = jnp.zeros((1, 2))
        ap, hp = ponds.ponds_cesm(CFG, self.a, self.h_i,
                                  jnp.zeros((1, 2)), ap0, ap0,
                                  jnp.full((1, 2), 0.02),  # 2 cm ice melt
                                  jnp.zeros((1, 2)), jnp.zeros((1, 2)),
                                  3600.0)
        assert np.all(np.asarray(ap) > 0.0)
        assert np.all(np.asarray(hp) > 0.0)
        np.testing.assert_allclose(np.asarray(hp),
                                   0.8 * np.asarray(ap), rtol=1e-6)

    def test_cesm_refreeze_shrinks(self):
        ap0 = jnp.full((1, 2), 0.3)
        hp0 = 0.8 * ap0
        z = jnp.zeros((1, 2))
        ap, hp = ponds.ponds_cesm(CFG, self.a, self.h_i,
                                  jnp.full((1, 2), -20.0), ap0, hp0,
                                  z, z, z, 86400.0)
        assert np.all(np.asarray(ap) < np.asarray(ap0))

    def test_lvl_darcy_drains_warm_ice(self):
        z = jnp.zeros((1, 2))
        alvl = jnp.ones((1, 2))
        ap0 = jnp.full((1, 2), 0.4)
        hp0 = 0.8 * ap0
        # warm ice (high porosity) drains faster than cold ice
        t_warm = jnp.full((1, 2, 7), -0.5)
        t_cold = jnp.full((1, 2, 7), -15.0)
        ap_w, *_ = ponds.ponds_lvl(CFG, self.a, self.h_i, z, ap0, hp0, z,
                                   alvl, z, z, z, 86400.0, t_ice=t_warm)
        ap_c, *_ = ponds.ponds_lvl(CFG, self.a, self.h_i, z, ap0, hp0, z,
                                   alvl, z, z, z, 86400.0, t_ice=t_cold)
        assert np.all(np.asarray(ap_w) < np.asarray(ap_c))

    def test_lvl_lid_grows_when_cold(self):
        z = jnp.zeros((1, 2))
        alvl = jnp.ones((1, 2))
        ap0 = jnp.full((1, 2), 0.4)
        *_, ip = ponds.ponds_lvl(CFG, self.a, self.h_i,
                                 jnp.full((1, 2), -10.0), ap0, 0.8 * ap0,
                                 z, alvl, z, z, z, 86400.0)
        assert np.all(np.asarray(ip) > 0.0)

    def test_topo_respects_freeboard(self):
        z = jnp.zeros((1, 2))
        thin = jnp.asarray([[0.3, 0.3]])
        ap, hp = ponds.ponds_topo(CFG, self.a, thin, z, z, z, z,
                                  jnp.full((1, 2), 0.5),  # huge melt
                                  z, z, 3600.0)
        fb = 0.3 * (1.0 - CFG.rho_ice / CFG.rho_seawater)
        assert np.all(np.asarray(hp) <= fb + 1e-9)


class TestTracers:
    def test_age_increments_only_with_ice(self):
        a = jnp.asarray([[0.5, 0.0]])
        age = jnp.asarray([[100.0, 100.0]])
        age2 = tracers.increment_age(age, a, 50.0)
        np.testing.assert_allclose(np.asarray(age2), [[150.0, 0.0]])

    def test_aerosol_conservation_no_melt(self):
        sh = (1, 2, 3)
        ssl_s = jnp.full(sh, 1.0e-6)
        int_s = jnp.full(sh, 2.0e-6)
        ssl_i = jnp.full(sh, 3.0e-6)
        int_i = jnp.full(sh, 4.0e-6)
        z = jnp.zeros((1, 2))
        out = tracers.update_aerosol(
            ssl_s, int_s, ssl_i, int_i, jnp.full((1, 2), 0.5),
            jnp.full((1, 2), 0.2), jnp.full((1, 2), 1.5),
            jnp.zeros(sh), z, z, z, 3600.0)
        tot0 = float((ssl_s + int_s + ssl_i + int_i).sum())
        tot1 = sum(float(x.sum()) for x in out[:4])
        np.testing.assert_allclose(tot1, tot0, rtol=1e-12)

    def test_aerosol_melt_scavenges_to_ocean(self):
        sh = (1, 1, 1)
        ssl_s = jnp.full(sh, 1.0e-6)
        z3 = jnp.zeros(sh)
        dt = 3600.0
        out = tracers.update_aerosol(
            ssl_s, z3, z3, z3, jnp.full((1, 1), 0.5),
            jnp.full((1, 1), 0.2), jnp.full((1, 1), 1.5),
            z3, jnp.full((1, 1), 0.1 / dt),  # melt half the snow
            jnp.zeros((1, 1)), jnp.zeros((1, 1)), dt)
        flux = float(out[4].sum()) * dt
        assert flux > 0.0
        tot1 = sum(float(x.sum()) for x in out[:4])
        np.testing.assert_allclose(tot1 + flux, float(ssl_s.sum()),
                                   rtol=1e-10)


class TestBGC:
    def test_brine_relaxes_to_sea_level(self):
        h_i = jnp.asarray([[2.0]])
        h_s = jnp.asarray([[0.2]])
        hb = jnp.asarray([[0.5]])
        h_sl = float((CFG.rho_ice * 2.0 + CFG.rho_snow * 0.2)
                     / CFG.rho_seawater)
        for _ in range(50):
            hb = bgc.brine_height_update(hb, h_i, h_s, CFG.rho_ice,
                                         CFG.rho_snow, CFG.rho_seawater,
                                         86400.0)
        np.testing.assert_allclose(float(hb[0, 0]), h_sl, rtol=1e-3)

    def test_algae_grow_in_light_with_nutrients(self):
        one = jnp.ones((1, 1))
        alg = 0.1 * one
        no3 = 5.0 * one
        sio3 = 10.0 * one
        z = jnp.zeros((1, 1))
        alg2, no3_2, _, _ = bgc.algae_step(
            alg, no3, sio3, 1.5 * one, 20.0 * one, -1.8 * one,
            5.0, 10.0, z, z, 86400.0)
        assert float(alg2[0, 0]) > float(alg[0, 0])

    def test_algae_dark_no_growth(self):
        one = jnp.ones((1, 1))
        alg = 0.1 * one
        z = jnp.zeros((1, 1))
        alg2, *_ = bgc.algae_step(alg, 5.0 * one, 10.0 * one, 1.5 * one,
                                  z, -1.8 * one, 5.0, 10.0, z, z, 86400.0)
        assert float(alg2[0, 0]) <= float(alg[0, 0])


class TestSnow:
    def test_wet_metamorphism_faster(self):
        h_s = jnp.asarray([0.3])
        z = jnp.zeros((1,))
        r0 = jnp.full((1,), 100.0e-6)
        rho0 = jnp.full((1,), 330.0)
        r_wet, _ = snow.snow_metamorphism(r0, jnp.asarray([0.0]),
                                          jnp.asarray([-1.8]), h_s, z, z,
                                          rho0, 86400.0)
        r_dry, _ = snow.snow_metamorphism(r0, jnp.asarray([-20.0]),
                                          jnp.asarray([-1.8]), h_s, z, z,
                                          rho0, 86400.0)
        assert float(r_wet[0]) > float(r_dry[0])

    def test_snowfall_refreshes_grains(self):
        h_s = jnp.asarray([0.3])
        z = jnp.zeros((1,))
        r0 = jnp.full((1,), 800.0e-6)
        rho0 = jnp.full((1,), 330.0)
        r, _ = snow.snow_metamorphism(r0, jnp.asarray([-20.0]),
                                      jnp.asarray([-1.8]), h_s,
                                      jnp.asarray([0.15 / 86400.0]), z,
                                      rho0, 86400.0)
        assert float(r[0]) < float(r0[0])

    def test_snow_ice_conserves_mass_and_zeroes_freeboard(self):
        # heavy snow load -> negative freeboard -> flooding
        h_i = jnp.asarray([1.0])
        h_s = jnp.asarray([0.5])
        h_i2, h_s2, dh = snow.snow_ice_formation(
            h_i, h_s, CFG.rho_ice, CFG.rho_snow, CFG.rho_seawater)
        assert float(dh[0]) > 0.0
        fb2 = float(h_i2[0]) * (1.0 - CFG.rho_ice / CFG.rho_seawater) \
            - float(h_s2[0]) * CFG.rho_snow / CFG.rho_seawater
        np.testing.assert_allclose(fb2, 0.0, atol=1e-10)


class TestColumnIntegration:
    pytestmark = pytest.mark.slow
    def test_full_column_step_with_packages(self):
        """column_physics_step with ponds+age+brine+algae+snow on and the
        linear ITD remap, one step, conservation + finiteness."""
        from mpas_tpu.cores.seaice.column import column_physics_step
        from mpas_tpu.cores.seaice.state import SeaiceForcing, SeaiceState
        cfg = SeaiceConfig(config_itd_remap_type="linear",
                           config_pond_scheme="lvl",
                           config_use_ice_age=True, config_use_brine=True,
                           config_use_algae=True,
                           config_use_snow_metamorphism=True)
        nC, nCat = 4, 5
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(0.0, 0.18, (nC, nCat)))
        h = jnp.asarray([0.3, 1.0, 2.0, 3.0, 5.0])[None, :] \
            * jnp.ones((nC, 1))
        st = SeaiceState(
            iceAreaCategory=a, iceVolumeCategory=a * h,
            snowVolumeCategory=0.1 * a,
            surfaceTemperature=jnp.full((nC, nCat), -5.0),
            uVelocity=jnp.zeros(1), vVelocity=jnp.zeros(1),
            stress11=jnp.zeros(nC), stress22=jnp.zeros(nC),
            stress12=jnp.zeros(nC),
            pondArea=jnp.full((nC, nCat), 0.1),
            pondDepth=jnp.full((nC, nCat), 0.08),
            pondLid=jnp.zeros((nC, nCat)),
            levelIceArea=jnp.full((nC, nCat), 0.9),
            levelIceVolume=jnp.full((nC, nCat), 0.9),
            iceAge=jnp.full((nC, nCat), 1.0e5),
            brineHeight=jnp.full((nC, nCat), 0.5),
            algaeIce=jnp.full((nC, nCat), 0.1),
            nitrateIce=jnp.full((nC, nCat), 5.0),
            silicateIce=jnp.full((nC, nCat), 10.0),
            snowGrainRadius=jnp.full((nC, nCat), 200.0e-6),
            snowDensity=jnp.full((nC, nCat), 330.0))
        frc = SeaiceForcing(
            uAirVelocity=jnp.full(nC, 8.0), vAirVelocity=jnp.zeros(nC),
            airTemperature=jnp.full(nC, -10.0),
            shortwaveDown=jnp.full(nC, 50.0),
            longwaveDown=jnp.full(nC, 250.0),
            uOceanVelocity=jnp.zeros(nC), vOceanVelocity=jnp.zeros(nC),
            seaSurfaceTemperature=jnp.full(nC, -1.8),
            oceanHeatFlux=jnp.full(nC, 2.0),
            sshGradientU=jnp.zeros(1), sshGradientV=jnp.zeros(1),
            rainfallRate=jnp.full(nC, 1.0e-5),
            snowfallRate=jnp.full(nC, 1.0e-8))
        out = column_physics_step(cfg, st, frc, 3600.0)
        for name in ("iceAreaCategory", "iceVolumeCategory", "pondArea",
                     "iceAge", "brineHeight", "algaeIce",
                     "snowGrainRadius"):
            arr = np.asarray(getattr(out, name))
            assert np.all(np.isfinite(arr)), name
        assert np.all(np.asarray(out.iceAreaCategory) >= 0.0)
        assert float(out.iceAge.max()) > 1.0e5  # aged where ice persists


class TestAlgalDyn3Group:
    """Three-group algal dynamics (ref ice_algae.F90 algal_dyn with the
    Registry default parameter set)."""

    def _run(self, sw=20.0, no3=10.0, nh4=1.0, sio3=20.0, dt=3600.0,
             steps=1, t=-1.8):
        import jax.numpy as jnp
        from mpas_tpu.cores.seaice.bgc import algal_dyn
        a = jnp.full((2, 3), 0.5)
        NO3 = jnp.full(2, no3); NH4 = jnp.full(2, nh4)
        SI = jnp.full(2, sio3); DON = jnp.zeros(2)
        for _ in range(steps):
            a, NO3, NH4, SI, DON, g = algal_dyn(
                a, NO3, NH4, SI, DON, jnp.full(2, sw),
                jnp.full(2, t), dt)
        return a, NO3, NH4, SI, DON, g

    def test_diatoms_dominate_bottom_ice(self):
        """Published growth ordering (mu_max 1.44/0.41/0.63 per day):
        diatoms outgrow the flagellate groups under replete nutrients."""
        import numpy as np
        a, *_ = self._run(steps=48)
        a = np.asarray(a[0])
        assert a[0] > a[1] and a[0] > a[2], a

    def test_silicate_limitation_selects_against_diatoms(self):
        """Si starvation (K_Si = 4 mmol/m3 for diatoms, 0 for the
        others) halts diatom growth while small plankton continue."""
        import numpy as np
        a_lo, *_ = self._run(sio3=0.05, steps=48)
        a_hi, *_ = self._run(sio3=20.0, steps=48)
        a_lo = np.asarray(a_lo[0]); a_hi = np.asarray(a_hi[0])
        assert a_lo[0] < 0.25 * a_hi[0]          # diatoms crippled
        assert a_lo[1] > 0.9 * a_hi[1]           # small plankton fine

    def test_phaeocystis_photoinhibited_at_high_light(self):
        """The Phaeocystis inhibition parameter (0.04 vs 0.001 1/(W/m2))
        reverses its light response at strong PAR."""
        import numpy as np
        _, _, _, _, _, g_lo = self._run(sw=5.0)
        _, _, _, _, _, g_hi = self._run(sw=120.0)
        # diatoms grow faster at high light; Phaeocystis slower
        assert float(g_hi[0, 0]) > float(g_lo[0, 0])
        assert float(g_hi[0, 2]) < float(g_lo[0, 2])

    def test_nh4_preference_and_nitrogen_budget(self):
        """NH4 is drawn preferentially; total N (algae + NO3 + NH4 + DON)
        closes to the grazed export at roundoff."""
        import numpy as np
        import jax.numpy as jnp
        from mpas_tpu.cores.seaice.bgc import algal_dyn, GRAZED_G
        a0 = jnp.full((1, 3), 0.5)
        NO3, NH4 = jnp.full(1, 5.0), jnp.full(1, 2.0)
        SI, DON = jnp.full(1, 20.0), jnp.zeros(1)
        a1, no1, nh1, si1, don1, g = algal_dyn(
            a0, NO3, NH4, SI, DON, jnp.full(1, 30.0),
            jnp.full(1, -1.8), 7200.0)
        d_nh4 = float(NH4[0] - nh1[0])
        d_no3 = float(NO3[0] - no1[0])
        # preference: NH4 supplies a disproportionate share of uptake
        assert d_nh4 > 0.0
        grazed = float(jnp.sum(jnp.asarray(GRAZED_G) * g))
        total0 = float(jnp.sum(a0) + NO3[0] + NH4[0] + DON[0])
        total1 = float(jnp.sum(a1) + no1[0] + nh1[0] + don1[0])
        assert abs(total0 - (total1 + grazed)) < 1e-6 * total0

    def test_dark_and_cold_suppress_growth(self):
        import numpy as np
        _, _, _, _, _, g_dark = self._run(sw=0.0)
        assert float(np.max(np.asarray(g_dark))) == 0.0
        _, _, _, _, _, g_warm = self._run(t=-1.0)
        _, _, _, _, _, g_cold = self._run(t=-15.0)
        assert float(g_cold[0, 0]) < float(g_warm[0, 0])
