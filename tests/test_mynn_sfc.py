"""MYNN surface layer tests (ref module_sf_mynn.F SFCLAY1D_mynn)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.atmosphere.physics.mynn_sfc import mynn_sfclay

jax.config.update("jax_enable_x64", True)


def _sfc(nc=6, tsk=290.0, t1=288.0, wind=5.0, water=False):
    p1 = jnp.full((nc,), 9.9e4)
    th1 = jnp.full((nc,), t1 * (1.0e5 / 9.9e4) ** (2.0 / 7.0))
    u1 = jnp.full((nc,), wind)
    v1 = jnp.zeros((nc,))
    qv1 = jnp.full((nc,), 5e-3)
    rho1 = p1 / (287.05 * t1)
    z1 = jnp.full((nc,), 30.0)
    tskv = jnp.full((nc,), tsk)
    qsfc = jnp.full((nc,), 8e-3)
    xland = jnp.full((nc,), 2.0 if water else 1.0)
    return u1, v1, th1, qv1, p1, rho1, z1, tskv, qsfc, xland


class TestMynnSfc:
    def test_unstable_upward_heat_flux(self):
        *args, xland = _sfc(tsk=295.0, t1=288.0)
        out = mynn_sfclay(*args, xland=xland)
        assert np.all(np.asarray(out["hfx"]) > 0.0)
        assert np.all(np.asarray(out["rmol"]) < 0.0)   # unstable: L < 0

    def test_stable_downward_heat_flux(self):
        *args, xland = _sfc(tsk=283.0, t1=288.0)
        out = mynn_sfclay(*args, xland=xland)
        assert np.all(np.asarray(out["hfx"]) < 0.0)
        assert np.all(np.asarray(out["rmol"]) > 0.0)

    def test_charnock_roughness_grows_with_wind_over_water(self):
        z0 = []
        for w in (5.0, 25.0):
            *args, xland = _sfc(wind=w, water=True)
            out = mynn_sfclay(*args, xland=xland)
            z0.append(float(out["znt"][0]))
        assert z0[1] > z0[0]

    def test_water_thermal_roughness_capped(self):
        *args, xland = _sfc(water=True, wind=15.0)
        out = mynn_sfclay(*args, xland=xland)
        zt = np.asarray(out["zt"])
        assert np.all(zt <= 5.5e-5 + 1e-12) and np.all(zt >= 2e-9)

    def test_stronger_wind_stronger_ust(self):
        ust = []
        for w in (3.0, 12.0):
            *args, xland = _sfc(wind=w)
            out = mynn_sfclay(*args, xland=xland)
            ust.append(float(out["ust"][0]))
        assert ust[1] > ust[0]

    def test_qke_surface_positive_and_scales(self):
        *args, xland = _sfc(wind=10.0)
        out = mynn_sfclay(*args, xland=xland)
        qke = np.asarray(out["qke_sfc"])
        ust = np.asarray(out["ust"])
        np.testing.assert_allclose(qke, 24.0 ** (2 / 3) * ust ** 2,
                                   rtol=1e-12)

    def test_ice_uses_andreas(self):
        *args, xland = _sfc(tsk=265.0, t1=268.0)
        ice = jnp.ones_like(xland, bool)
        out_i = mynn_sfclay(*args, xland=xland, snowice=ice)
        out_l = mynn_sfclay(*args, xland=xland)
        assert not np.allclose(np.asarray(out_i["zt"]),
                               np.asarray(out_l["zt"]))

    def test_jit_finite(self):
        *args, xland = _sfc()
        f = jax.jit(lambda *a: mynn_sfclay(*a, xland=xland))
        out = f(*args)
        for v in out.values():
            assert bool(jnp.all(jnp.isfinite(v)))
