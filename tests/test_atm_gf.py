"""Grell-Freitas scale-aware convection (GF-class).

Parity model: module_cu_gf.mpas.F (Grell & Freitas 2014) — deep/shallow
plume split, Beta-profile normalized mass flux, multi-closure ensemble,
scale-aware (1-sigma)^2 damping, condensate detrainment.
"""

import pytest
import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.atmosphere.physics.gf import gf_convection

# Whole-module slow: each test pays one multi-second scheme jit-compile.
pytestmark = pytest.mark.slow


def _columns(n=6, nz=30, unstable=True):
    z = jnp.linspace(100.0, 15000.0, nz)[None, :] * jnp.ones((n, 1))
    dz = jnp.full((n, nz), z[0, 1] - z[0, 0])
    p = 1.0e5 * jnp.exp(-z / 8000.0)
    if unstable:
        th = 300.0 - 0.002 * z + 0.008 * jnp.maximum(z - 5000.0, 0.0)
        qv = 0.016 * jnp.exp(-z / 2000.0)
    else:
        th = 290.0 + 0.01 * z
        qv = 0.002 * jnp.exp(-z / 2500.0)
    exner = (p / 1.0e5) ** 0.2854
    t = th * exner
    rho = p / (287.0 * t)
    return th, qv, p, rho, z, dz, exner


class TestGrellFreitas:
    def test_fires_when_unstable(self):
        th, qv, p, rho, z, dz, exner = _columns()
        th2, qv2, qc, rain, cape = gf_convection(
            th, qv, p, rho, z, dz, exner, 600.0, dx=15000.0)
        assert np.all(np.isfinite(np.asarray(th2)))
        assert np.all(np.isfinite(np.asarray(qv2)))
        assert float(jnp.max(cape)) > 50.0
        assert float(jnp.max(rain)) > 0.0
        # boundary layer dries
        assert float(jnp.mean(qv2[:, 0])) <= float(jnp.mean(qv[:, 0]))
        # detrained condensate is non-negative and bounded
        assert float(jnp.min(qc)) >= 0.0
        assert float(jnp.max(qc)) < 0.01

    def test_silent_when_stable(self):
        th, qv, p, rho, z, dz, exner = _columns(unstable=False)
        th2, qv2, qc, rain, cape = gf_convection(
            th, qv, p, rho, z, dz, exner, 600.0, dx=15000.0)
        assert float(jnp.max(rain)) == 0.0
        np.testing.assert_allclose(np.asarray(th2), np.asarray(th),
                                   atol=1e-8)

    def test_scale_awareness_damps_at_high_resolution(self):
        """GF §2.3: as dx -> cloud scale, (1-sigma)^2 -> 0 and the scheme
        hands the convection to the resolved dynamics."""
        th, qv, p, rho, z, dz, exner = _columns()
        _, _, _, rain_coarse, _ = gf_convection(
            th, qv, p, rho, z, dz, exner, 600.0, dx=50000.0)
        _, _, _, rain_fine, _ = gf_convection(
            th, qv, p, rho, z, dz, exner, 600.0, dx=3000.0)
        assert float(jnp.max(rain_fine)) < float(jnp.max(rain_coarse))

    def test_jit_and_manager_dispatch(self):
        import jax
        th, qv, p, rho, z, dz, exner = _columns()
        out = jax.jit(lambda *a: gf_convection(*a, dx=15000.0))(
            th, qv, p, rho, z, dz, exner, 600.0)
        assert np.all(np.isfinite(np.asarray(out[0])))

    def test_energy_sanity(self):
        """Latent heating is bounded: column-integrated cp*dT matches
        Lv * precipitated water to within the subsidence redistribution."""
        th, qv, p, rho, z, dz, exner = _columns()
        dt = 600.0
        th2, qv2, qc, rain, _ = gf_convection(
            th, qv, p, rho, z, dz, exner, dt, dx=15000.0)
        # temperature change bounded by the 5 K/step clamp
        dtemp = np.asarray((th2 - th) * exner)
        assert np.abs(dtemp).max() <= 5.0 + 1e-6


def test_aerosol_aware_autoconversion():
    """GF aerosol option (ref: module_cu_gf.mpas.F CCN-dependent
    autoconversion): a polluted column (high CCN) rains less and
    detrains more cloud water than a clean one, all else equal."""
    import numpy as np
    import jax.numpy as jnp
    from mpas_tpu.cores.atmosphere.physics.gf import gf_convection
    nz = 30
    z = np.linspace(100.0, 15000.0, nz)
    t = 300.0 - 6.5e-3 * z
    p = 1.013e5 * np.exp(-z / 7600.0)
    rho = p / (287.0 * t)
    exner = (p / 1.0e5) ** (287.0 / 1004.5)
    th = t / exner
    qv = 0.017 * np.exp(-z / 2200.0)
    J = lambda a: jnp.asarray(a[None, :])
    args = (J(th), J(qv), J(p), J(rho), J(z),
            J(np.full(nz, z[1] - z[0])), J(exner), 300.0)
    _, _, qc_clean, rain_clean, _ = gf_convection(
        *args, ccn=jnp.asarray([100.0]))
    _, _, qc_poll, rain_poll, _ = gf_convection(
        *args, ccn=jnp.asarray([2000.0]))
    assert float(rain_clean[0]) > 0.0
    assert float(rain_poll[0]) < float(rain_clean[0])
    assert float(jnp.sum(qc_poll)) >= float(jnp.sum(qc_clean))
