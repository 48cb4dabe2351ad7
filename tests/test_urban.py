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
