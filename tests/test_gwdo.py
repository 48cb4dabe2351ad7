"""GWDO (orographic gravity-wave drag + flow blocking) column tests.

ref: module_bl_gwdo.F gwdo2d — drag opposes the low-level wind, vanishes
without subgrid orography, and is limited so it cannot reverse the wind
within one step (the reference dtfac critical-line limiter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.physics.gwdo import gwdo

# Whole-module slow: each test pays one multi-second scheme jit-compile.
pytestmark = pytest.mark.slow

jax.config.update("jax_enable_x64", True)


def _column(nc=8, nz=24, u0=15.0, dtdz=-6.5e-3):
    """Stably stratified westerly column set."""
    z = np.linspace(200.0, 12000.0, nz)
    z_mid = np.tile(z, (nc, 1))
    dz = np.gradient(z)
    dz = np.tile(dz, (nc, 1))
    t = 288.0 + dtdz * z_mid + 2e-7 * z_mid ** 2   # stable troposphere
    p = 1.0e5 * np.exp(-z_mid / 8000.0)
    u = np.full((nc, nz), u0) * (0.3 + 0.7 * np.tanh(z_mid / 3000.0))
    v = np.zeros((nc, nz))
    qv = np.full((nc, nz), 1e-3)
    return tuple(jnp.asarray(a) for a in (u, v, t, qv, p, z_mid, dz))


def _statics(nc, sigma=250.0):
    var2d = jnp.full((nc,), sigma)
    oc1 = jnp.ones((nc,))
    oa4 = jnp.zeros((nc, 4))
    ol4 = jnp.full((nc, 4), 0.5)
    dx = jnp.full((nc,), 120.0e3)
    return var2d, oc1, oa4, ol4, dx


class TestGWDO:
    def test_drag_opposes_flow(self):
        u, v, t, qv, p, z, dz = _column()
        var2d, oc1, oa4, ol4, dx = _statics(u.shape[0])
        dudt, dvdt, dusfc, dvsfc = gwdo(u, v, t, qv, p, z, dz,
                                        var2d, oc1, oa4, ol4, dx, 300.0)
        assert np.all(np.isfinite(np.asarray(dudt)))
        # westerly flow: integrated zonal stress on the atmosphere < 0
        # means the surface receives positive (eastward) stress; the
        # column-integrated deceleration must oppose u
        dec = np.asarray(jnp.sum(dudt * dz, axis=1))
        assert np.all(dec <= 1e-12)
        assert np.any(dec < 0.0)
        np.testing.assert_allclose(np.asarray(dvdt), 0.0, atol=1e-10)

    def test_no_orography_no_drag(self):
        u, v, t, qv, p, z, dz = _column()
        nc = u.shape[0]
        var2d = jnp.zeros((nc,))
        _, oc1, oa4, ol4, dx = _statics(nc)
        dudt, dvdt, dusfc, dvsfc = gwdo(u, v, t, qv, p, z, dz,
                                        var2d, oc1, oa4, ol4, dx, 300.0)
        np.testing.assert_allclose(np.asarray(dudt), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(dusfc), 0.0, atol=1e-12)

    def test_limiter_never_reverses_wind(self):
        """dtfac (ref :712-719) caps the deceleration so a huge dt does
        not flip the low-level wind in one step."""
        u, v, t, qv, p, z, dz = _column(u0=5.0)
        var2d, oc1, oa4, ol4, dx = _statics(u.shape[0], sigma=800.0)
        dt = 3600.0
        dudt, dvdt, _, _ = gwdo(u, v, t, qv, p, z, dz,
                                var2d, oc1, oa4, ol4, dx, dt)
        u1 = np.asarray(u + dt * dudt)
        # low levels stay westerly (no sign flip from drag alone)
        assert np.all(u1[:, :6] > -1e-9)

    def test_taller_orography_more_drag(self):
        u, v, t, qv, p, z, dz = _column()
        nc = u.shape[0]
        _, oc1, oa4, ol4, dx = _statics(nc)
        out = []
        for sigma in (100.0, 400.0):
            dudt, *_ = gwdo(u, v, t, qv, p, z, dz,
                            jnp.full((nc,), sigma), oc1, oa4, ol4,
                            dx, 300.0)
            out.append(float(jnp.sum(jnp.abs(dudt))))
        assert out[1] > out[0]

    def test_jit_compiles(self):
        u, v, t, qv, p, z, dz = _column(nc=4, nz=16)
        var2d, oc1, oa4, ol4, dx = _statics(4)
        f = jax.jit(lambda *a: gwdo(*a, 300.0))
        dudt, dvdt, dusfc, dvsfc = f(u, v, t, qv, p, z, dz,
                                     var2d, oc1, oa4, ol4, dx)
        assert np.all(np.isfinite(np.asarray(dudt)))
