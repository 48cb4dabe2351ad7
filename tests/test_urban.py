"""Urban canopy (SLUCM-class) + building energy (BEM-class) physics.

Parity model: physics_wrf/module_sf_urban.F (Kusaka/Chen SLUCM) and
module_sf_bem.F indoor energy budget."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.physics import urban


def _forcing(n=4, sunny=True):
    t_air = jnp.full((n,), 300.0)
    wind = jnp.full((n,), 3.0)
    swdown = jnp.full((n,), 800.0 if sunny else 0.0)
    lwdown = jnp.full((n,), 380.0)
    mu = jnp.full((n,), 0.9 if sunny else -0.3)
    return t_air, wind, swdown, lwdown, mu


class TestGeometry:
    def test_sky_view_factors(self):
        """Analytic canyon SVFs: flat (h/w->0) road sees the whole sky;
        deep canyons see almost none (module_sf_urban.F geometry)."""
        svf0, _ = urban.sky_view_factors(jnp.asarray(1e-6))
        assert abs(float(svf0) - 1.0) < 1e-5
        svf_deep, _ = urban.sky_view_factors(jnp.asarray(5.0))
        assert float(svf_deep) < 0.1
        # canonical h/w = 1: sqrt(2) - 1
        svf1, _ = urban.sky_view_factors(jnp.asarray(1.0))
        assert abs(float(svf1) - (np.sqrt(2.0) - 1.0)) < 1e-9

    def test_shadowing_grows_with_canyon_depth(self):
        mu = jnp.asarray(0.5)
        s1 = float(urban._shadow_fraction(jnp.asarray(0.2), mu))
        s2 = float(urban._shadow_fraction(jnp.asarray(2.0), mu))
        assert s2 > s1
        assert 0.0 <= s1 <= 1.0 and s2 == 1.0


class TestSLUCM:
    def test_daytime_heating(self):
        """Sunny canyon: all facets warm above air temperature and the
        aggregated sensible flux is strongly positive (the urban daytime
        energy balance)."""
        st = urban.init_urban_state(4, t0=300.0)
        f = _forcing(sunny=True)
        for _ in range(12):
            st, diag = urban.slucm_step(st, *f, dt=300.0)
        assert float(jnp.min(st.ts_roof)) > 300.0
        assert float(jnp.min(st.ts_road)) > 300.0
        assert float(jnp.min(diag["hfx_urban"])) > 50.0
        assert np.isfinite(np.asarray(st.t_wall)).all()

    def test_shaded_road_cooler_than_roof(self):
        """In a deep canyon the shadowed road stays cooler than the fully
        exposed roof (the defining SLUCM shading effect)."""
        pr = urban.UrbanParams(h_over_w=3.0)
        st = urban.init_urban_state(2, t0=300.0)
        f = _forcing(n=2, sunny=True)
        for _ in range(24):
            st, _ = urban.slucm_step(st, *f, dt=300.0, params=pr)
        assert float(jnp.max(st.ts_road)) < float(jnp.min(st.ts_roof))

    def test_nocturnal_heat_release(self):
        """After a hot day, the urban fabric releases stored heat at
        night: skin stays warmer than a facet that never stored heat
        (the urban-heat-island storage mechanism)."""
        st = urban.init_urban_state(2, t0=300.0)
        day = _forcing(n=2, sunny=True)
        for _ in range(48):
            st, _ = urban.slucm_step(st, *day, dt=300.0)
        night = _forcing(n=2, sunny=False)
        cold = urban.init_urban_state(2, t0=300.0)
        for _ in range(12):
            st, d_warm = urban.slucm_step(st, *night, dt=300.0)
            cold, d_cold = urban.slucm_step(cold, *night, dt=300.0)
        assert float(jnp.min(st.ts_road - cold.ts_road)) > 0.5

    def test_anthropogenic_heat_diurnal(self):
        st = urban.init_urban_state(1)
        f = _forcing(n=1, sunny=False)
        _, d_aft = urban.slucm_step(st, *f, dt=300.0, hour_utc=14.0)
        _, d_night = urban.slucm_step(st, *f, dt=300.0, hour_utc=2.0)
        assert float(d_aft["ah"]) > float(d_night["ah"])


class TestBEM:
    def test_ac_cooling_load_and_waste_heat(self):
        """Hot walls drive the indoor node above target; the AC removes
        the load and dumps waste heat (x (1+1/COP)) into the canyon
        (module_sf_bem.F behavior)."""
        st = urban.init_urban_state(2, t0=306.0)
        st = st.replace(t_indoor=jnp.full((2,), 302.0))
        f = _forcing(n=2, sunny=True)
        q_ac = 0.0
        for _ in range(24):
            st, diag = urban.slucm_step(st, *f, dt=300.0)
            q_ac = diag["q_ac"]
        assert float(jnp.min(q_ac)) > 0.0
        # the conditioned node relaxes toward the target
        assert float(jnp.max(jnp.abs(st.t_indoor - 295.0))) < 7.0

    def test_indoor_stable_no_forcing(self):
        st = urban.init_urban_state(2, t0=295.0)
        f = _forcing(n=2, sunny=False)
        for _ in range(12):
            st, diag = urban.slucm_step(st, *f, dt=300.0)
        assert np.isfinite(float(jnp.max(st.t_indoor)))
        assert float(jnp.max(diag["q_ac"])) < 5.0


class TestBEP:
    def test_canopy_drag_profile(self):
        """Drag acts only below the building height, decelerates the wind
        monotonically and produces wake TKE there (module_sf_bep.F
        behavior)."""
        n, nz = 3, 10
        z = jnp.broadcast_to(jnp.linspace(5.0, 95.0, nz), (n, nz))
        u = jnp.full((n, nz), 6.0)
        v = jnp.full((n, nz), 2.0)
        u2, v2, tke = urban.bep_column_drag(u, v, z, dt=60.0,
                                            building_height=30.0)
        below = np.asarray(z)[0] < 30.0
        assert np.all(np.asarray(u2)[:, below] < 6.0)
        assert np.all(np.asarray(u2)[:, ~below] == 6.0)
        assert np.all(np.asarray(tke)[:, below] > 0.0)
        assert np.all(np.asarray(tke)[:, ~below] == 0.0)
        # implicit update never reverses the wind
        assert np.all(np.asarray(u2) > 0.0)

    def test_strong_drag_stability(self):
        n, nz = 2, 5
        z = jnp.broadcast_to(jnp.linspace(5.0, 45.0, nz), (n, nz))
        u = jnp.full((n, nz), 30.0)
        v = jnp.zeros((n, nz))
        u2, _, _ = urban.bep_column_drag(u, v, z, dt=600.0,
                                         frontal_density=1.0,
                                         cd_building=1.0)
        assert np.all(np.asarray(u2) >= 0.0)
        assert np.all(np.isfinite(np.asarray(u2)))


class TestSLUCMDeep:
    """Round-5 fidelity additions: canyon air, stability, latent heat."""

    def test_canyon_air_between_facets_and_atm(self):
        """TC is the flux-weighted blend of TA, TG, TB (the diagnostic
        canyon-air solution of module_sf_urban.F:1340-1346)."""
        st = urban.init_urban_state(2, t0=305.0)
        t_air, wind, swdown, lwdown, mu = _forcing(n=2, sunny=True)
        for _ in range(12):
            st, diag = urban.slucm_step(st, t_air, wind, swdown, lwdown,
                                        mu, dt=300.0)
        tc = np.asarray(diag["tc_canyon"])
        lo = np.minimum(np.asarray(t_air),
                        np.minimum(np.asarray(st.ts_road),
                                   np.asarray(st.ts_wall)))
        hi = np.maximum(np.asarray(t_air),
                        np.maximum(np.asarray(st.ts_road),
                                   np.asarray(st.ts_wall)))
        assert np.all(tc >= lo - 1e-6) and np.all(tc <= hi + 1e-6)

    def test_louis79_stability_asymmetry(self):
        """Unstable (negative Ri) exchange exceeds stable at the same
        wind (the Louis-79 surface-layer behavior)."""
        import jax.numpy as jnp
        ch_un = float(urban._louis79(jnp.asarray(-1.0), 10.0, 0.1))
        ch_st = float(urban._louis79(jnp.asarray(0.5), 10.0, 0.1))
        ch_n = float(urban._louis79(jnp.asarray(0.0), 10.0, 0.1))
        assert ch_un > ch_n > ch_st > 0.0

    def test_rain_wet_surfaces_evaporate(self):
        """Rain switches the road/roof wet fractions on (IMP_SCHEME=1
        BETR/BETG=0.7): latent flux appears, sensible drops."""
        st = urban.init_urban_state(2, t0=302.0)
        t_air, wind, swdown, lwdown, mu = _forcing(n=2, sunny=True)
        rain = jnp.full((2,), 5.0)
        st_d = st_w = st
        for _ in range(12):
            st_d, d_dry = urban.slucm_step(st_d, t_air, wind, swdown,
                                           lwdown, mu, dt=300.0)
            st_w, d_wet = urban.slucm_step(st_w, t_air, wind, swdown,
                                           lwdown, mu, dt=300.0,
                                           rain_mmh=rain)
        assert float(jnp.min(d_wet["lh_urban"])) > \
            float(jnp.max(d_dry["lh_urban"])) + 10.0
        assert float(jnp.max(st_w.ts_road)) < float(jnp.min(st_d.ts_road))

    def test_8dir_shadow_average(self):
        """The 8-orientation shadow equals the analytic <|sin|>=2/pi mean
        in the unsaturated regime."""
        import jax.numpy as jnp
        got = float(urban._shadow_fraction_8dir(
            jnp.asarray(0.2), jnp.asarray(1.0), jnp.asarray(0.8)))
        tanz = np.sqrt(1 - 0.64) / 0.8
        angles = np.arange(1, 9) * np.pi / 8
        expect = np.mean(np.minimum(0.2 * tanz * np.abs(np.sin(angles)),
                                    1.0))
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_urbparm_classes_ranked(self):
        """Commercial class (3) has taller/denser morphology and more
        anthropogenic heat than low-intensity residential (1)."""
        p1 = urban.URBPARM_TABLE[1]
        p3 = urban.URBPARM_TABLE[3]
        assert p3.ah_peak > p1.ah_peak
        assert p3.roof_frac > p1.roof_frac
        assert p3.zr > p1.zr


class TestBEMDeep:
    def test_hvac_band_and_waste_heat(self):
        """Indoor air is held inside the target band; cooling load
        produces canyon waste heat amplified by 1+1/COP."""
        st = urban.init_urban_state(2, t0=308.0)
        st = st.replace(t_indoor=jnp.full((2,), 305.0),
                        t_mass=jnp.full((2,), 305.0))
        t_air, wind, swdown, lwdown, mu = _forcing(n=2, sunny=True)
        for _ in range(24):
            st, diag = urban.slucm_step(st, t_air, wind, swdown, lwdown,
                                        mu, dt=300.0)
        assert float(jnp.max(st.t_indoor)) <= 295.0 + 2.0 + 1e-6
        assert float(jnp.min(diag["q_ac"])) > 0.0

    def test_window_gain_heats_interior(self):
        """More glazing -> larger cooling load under strong sun."""
        pr_hi = urban.UrbanParams(glazing=0.5)
        pr_lo = urban.UrbanParams(glazing=0.0, q_internal=0.0)
        t_air, wind, swdown, lwdown, mu = _forcing(n=1, sunny=True)
        s_hi = s_lo = urban.init_urban_state(1, t0=300.0)
        for _ in range(24):
            s_hi, d_hi = urban.slucm_step(s_hi, t_air, wind, swdown,
                                          lwdown, mu, dt=300.0,
                                          params=pr_hi)
            s_lo, d_lo = urban.slucm_step(s_lo, t_air, wind, swdown,
                                          lwdown, mu, dt=300.0,
                                          params=pr_lo)
        assert float(d_hi["q_ac"][0]) > float(d_lo["q_ac"][0])


class TestBEPDeep:
    def test_height_distribution_drag_tapers(self):
        """With a height distribution, drag weakens with height as fewer
        buildings reach the level (BEP morphology)."""
        n, nz = 1, 8
        z = jnp.broadcast_to(jnp.linspace(2.0, 30.0, nz), (n, nz))
        u = jnp.full((n, nz), 5.0)
        v = jnp.zeros((n, nz))
        u2, _, tke = urban.bep_column_drag(
            u, v, z, dt=120.0, height_bins=(5.0, 15.0, 25.0),
            height_fractions=(0.5, 0.3, 0.2))
        du = 5.0 - np.asarray(u2)[0]
        assert du[0] > du[4] > du[7] >= 0.0

    def test_heat_sources_sign_and_distribution(self):
        """Hot walls heat in-canopy levels; levels above the tallest bin
        receive nothing."""
        n, nz = 1, 6
        z_int = jnp.broadcast_to(jnp.linspace(0.0, 60.0, nz + 1),
                                 (n, nz + 1))
        t_col = jnp.full((n, nz), 300.0)
        src = urban.bep_heat_sources(
            z_int, ts_wall=jnp.full((n,), 310.0),
            ts_road=jnp.full((n,), 312.0),
            ts_roof=jnp.full((n,), 315.0), t_col=t_col)
        s = np.asarray(src)[0]
        assert s[0] > 0.0            # road + wall heating at the bottom
        assert np.all(s[3:] == 0.0)  # above 15 m tallest bin (interfaces 30+)
