"""cal_cldfra3 cloud-fraction tests (ref module_mp_thompson_cldfra3.F)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.atmosphere.physics.cldfra3 import cal_cldfra3
from mpas_tpu.cores.atmosphere.physics.wsm6 import _qsat_liq

# Whole-module slow: each test pays one multi-second scheme jit-compile.
pytestmark = pytest.mark.slow

jax.config.update("jax_enable_x64", True)


def _column(nc=4, nz=30, rh=0.3):
    z = np.linspace(100.0, 14000.0, nz)
    t = 290.0 - 6.5e-3 * z
    t = np.where(z > 11000.0, t[np.argmin(np.abs(z - 11000.0))], t)
    p = 1.0e5 * np.exp(-z / 8000.0)
    t2 = np.tile(t, (nc, 1))
    p2 = np.tile(p, (nc, 1))
    qvs = np.asarray(_qsat_liq(jnp.asarray(t2), jnp.asarray(p2)))
    qv = rh * qvs
    rho = p2 / (287.05 * t2)
    dz = np.tile(np.gradient(z), (nc, 1))
    zero = np.zeros((nc, nz))
    return (jnp.asarray(qv), jnp.asarray(zero), jnp.asarray(zero),
            jnp.asarray(zero), jnp.asarray(p2), jnp.asarray(t2),
            jnp.asarray(rho), jnp.asarray(dz))


def _call(qv, qc, qi, qs, p, t, rho, dz, land=True):
    nc = qv.shape[0]
    xland = jnp.full((nc,), 1.0 if land else 2.0)
    gridkm = jnp.full((nc,), 120.0)
    return cal_cldfra3(qv, qc, qi, qs, p, t, rho, dz, xland, gridkm)


class TestCldfra3:
    def test_dry_column_clear(self):
        args = _column(rh=0.2)
        cfr, qc, qi = _call(*args)
        np.testing.assert_allclose(np.asarray(cfr), 0.0, atol=1e-12)

    def test_existing_condensate_overcast(self):
        qv, qc, qi, qs, p, t, rho, dz = _column(rh=0.3)
        qc = qc.at[:, 8:12].set(5e-5)
        cfr, _, _ = _call(qv, qc, qi, qs, p, t, rho, dz)
        assert np.all(np.asarray(cfr)[:, 8:12] == 1.0)

    def test_humid_layer_partly_cloudy_and_seeded(self):
        qv, qc, qi, qs, p, t, rho, dz = _column(rh=0.3)
        qvs = _qsat_liq(t, p)
        # humid (97% RH) warm layer spanning several levels
        qv = qv.at[:, 4:9].set(0.97 * qvs[:, 4:9])
        cfr, qc2, qi2 = _call(qv, qc, qi, qs, p, t, rho, dz)
        c = np.asarray(cfr)[:, 4:9]
        assert np.all(c > 0.0) and np.all(c <= 0.90 + 1e-12)
        # deck seeding adds radiation-visible water to the partly
        # cloudy multi-level deck (ref adjust_cloudH2O)
        assert float(jnp.sum(qc2[:, 4:9])) > 0.0

    def test_more_humid_more_cloud(self):
        out = []
        for rh in (0.92, 0.985):
            qv, qc, qi, qs, p, t, rho, dz = _column(rh=0.3)
            qvs = _qsat_liq(t, p)
            qv = qv.at[:, 5:8].set(rh * qvs[:, 5:8])
            cfr, _, _ = _call(qv, qc, qi, qs, p, t, rho, dz)
            out.append(float(jnp.mean(cfr[:, 5:8])))
        assert out[1] > out[0]

    def test_ocean_threshold_differs(self):
        qv, qc, qi, qs, p, t, rho, dz = _column(rh=0.3)
        qvs = _qsat_liq(t, p)
        qv = qv.at[:, 5:8].set(0.93 * qvs[:, 5:8])
        cl, _, _ = _call(qv, qc, qi, qs, p, t, rho, dz, land=True)
        co, _, _ = _call(qv, qc, qi, qs, p, t, rho, dz, land=False)
        # ocean RH_00 is higher -> less cloud at the same RH
        assert float(jnp.mean(co[:, 5:8])) <= float(jnp.mean(cl[:, 5:8]))

    def test_jit_and_finite(self):
        args = _column(nc=3, nz=24, rh=0.8)
        f = jax.jit(lambda *a: _call(*a))
        cfr, qc, qi = f(*args)
        for a in (cfr, qc, qi):
            assert bool(jnp.all(jnp.isfinite(a)))
        assert bool(jnp.all((cfr >= 0.0) & (cfr <= 1.0)))
