"""MYNN PBL, Tiedtke mass-flux convection, Thompson microphysics.

Parity model: module_bl_mynn.F, module_cu_ntiedtke.F, module_mp_thompson.F
capabilities (scheme-selection options of the reference suite).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.physics.mynn import mynn
from mpas_tpu.cores.atmosphere.physics.tiedtke import tiedtke
from mpas_tpu.cores.atmosphere.physics.thompson import thompson


def _columns(n=6, nz=20, unstable=True):
    z = (jnp.arange(nz)[None, :] + 0.5) * 500.0 * jnp.ones((n, 1))
    dz = jnp.full((n, nz), 500.0)
    lapse = 0.004 if unstable else 0.008
    th = 290.0 + lapse * z
    p = 1.0e5 * jnp.exp(-z / 7500.0)
    t = th * (p / 1.0e5) ** 0.2854
    rho = p / (287.0 * t)
    qv = 0.012 * jnp.exp(-z / 2500.0)
    u = 8.0 * jnp.ones((n, nz))
    v = jnp.zeros((n, nz))
    return u, v, th, qv, rho, z, dz, p, t


def _sfc(n, hfx=150.0):
    return {"hfx": jnp.full((n,), hfx), "qfx": jnp.full((n,), 5.0e-5),
            "ust": jnp.full((n,), 0.4), "cd": jnp.full((n,), 2.0e-3),
            "lh": jnp.full((n,), 120.0)}


class TestMYNN:
    def test_tke_grows_under_heating(self):
        u, v, th, qv, rho, z, dz, p, t = _columns()
        n = u.shape[0]
        qke = jnp.full_like(th, 1.0e-4)
        out = mynn(u, v, th, qv, rho, z, dz, _sfc(n), qke, 60.0)
        u2, v2, th2, qv2, hpbl, qke2 = out
        assert np.all(np.isfinite(np.asarray(qke2)))
        assert float(jnp.max(qke2)) > 1.0e-3       # turbulence spun up
        assert np.all(np.asarray(hpbl) > 500.0)

    def test_mixing_weaker_when_stable(self):
        u, v, th, qv, rho, z, dz, p, t = _columns(unstable=False)
        n = u.shape[0]
        qke = jnp.full_like(th, 0.5)
        _, _, th_u, _, _, qke_u = mynn(u, v, th, qv, rho, z, dz,
                                       _sfc(n, hfx=200.0), qke, 120.0)
        _, _, th_s, _, _, qke_s = mynn(u, v, th, qv, rho, z, dz,
                                       _sfc(n, hfx=-100.0), qke, 120.0)
        # TKE decays under surface cooling relative to heating
        assert float(jnp.sum(qke_s)) < float(jnp.sum(qke_u))

    def test_heat_conserved_up_to_surface_flux(self):
        u, v, th, qv, rho, z, dz, p, t = _columns()
        n = u.shape[0]
        qke = jnp.full_like(th, 0.1)
        sfc = _sfc(n)
        dt = 60.0
        _, _, th2, _, _, _ = mynn(u, v, th, qv, rho, z, dz, sfc, qke, dt)
        dcol = float(jnp.sum((th2 - th) * dz * rho, axis=1)[0]) * 1004.0
        expect = float(sfc["hfx"][0]) * dt * 1004.0 / 1004.0
        # column enthalpy change ~ surface flux * dt (within profile temp
        # conversion slop since we diffuse theta, not T)
        assert dcol == pytest.approx(float(sfc["hfx"][0]) * dt, rel=0.2)


class TestTiedtke:
    def test_convection_fires_when_unstable(self):
        u, v, th, qv, rho, z, dz, p, t = _columns()
        n = u.shape[0]
        # make low levels moist + conditionally unstable
        th = 300.0 - 0.002 * z
        th = th + 0.008 * jnp.maximum(z - 5000.0, 0.0)
        qv = 0.016 * jnp.exp(-z / 2000.0)
        exner = (p / 1.0e5) ** 0.2854
        th2, qv2, rain, cape = tiedtke(th, qv, p, rho, z, dz, exner, 600.0)
        assert np.all(np.isfinite(np.asarray(th2)))
        assert float(jnp.max(cape)) > 50.0
        assert float(jnp.max(rain)) > 0.0
        # convection dries the boundary layer and heats aloft
        assert float(jnp.mean(qv2[:, 0])) <= float(jnp.mean(qv[:, 0]))

    def test_no_convection_when_stable(self):
        u, v, th, qv, rho, z, dz, p, t = _columns(unstable=False)
        th = 290.0 + 0.01 * z
        qv = 0.002 * jnp.exp(-z / 2500.0)
        exner = (p / 1.0e5) ** 0.2854
        th2, qv2, rain, cape = tiedtke(th, qv, p, rho, z, dz, exner, 600.0)
        assert float(jnp.max(rain)) == 0.0
        np.testing.assert_allclose(np.asarray(th2), np.asarray(th),
                                   atol=1e-8)


class TestThompson:
    def _mp_columns(self, n=4, nz=20):
        u, v, th, qv, rho, z, dz, p, t = _columns(n, nz)
        qc = jnp.where((z > 1000.0) & (z < 4000.0), 1.5e-3, 0.0)
        zero = jnp.zeros_like(qc)
        return th, qv, qc, zero, zero, zero, zero, rho, p, dz

    def test_rain_forms_and_falls(self):
        th, qv, qc, qr, qi, qs, qg, rho, p, dz = self._mp_columns()
        exner = (p / 1.0e5) ** 0.2854
        nr = jnp.full_like(qc, 1.0)
        ni = jnp.full_like(qc, 1.0)
        rain_tot = 0.0
        for _ in range(30):
            (th, qv, qc, qr, qi, qs, qg, nr, ni, rain) = thompson(
                th, qv, qc, qr, qi, qs, qg, nr, ni, rho, exner, p, dz,
                30.0)
            rain_tot += float(jnp.max(rain))
        assert np.all(np.isfinite(np.asarray(th)))
        assert rain_tot > 0.0 or float(jnp.max(qr)) > 1e-6

    def test_number_conc_tracks_mass(self):
        """Where rain mass exists, rain number is nontrivial (two-moment)."""
        th, qv, qc, qr, qi, qs, qg, rho, p, dz = self._mp_columns()
        exner = (p / 1.0e5) ** 0.2854
        nr = jnp.full_like(qc, 1.0e-2)
        ni = jnp.full_like(qc, 1.0e-2)
        for _ in range(20):
            (th, qv, qc, qr, qi, qs, qg, nr, ni, _) = thompson(
                th, qv, qc, qr, qi, qs, qg, nr, ni, rho, exner, p, dz,
                30.0)
        qr_np = np.asarray(qr)
        nr_np = np.asarray(nr)
        got_rain = qr_np > 1e-7
        if got_rain.any():
            assert nr_np[got_rain].max() > 1.0   # number was created

    def test_water_conservation_no_sedimentation_exits(self):
        """Total water is conserved up to surface precipitation."""
        th, qv, qc, qr, qi, qs, qg, rho, p, dz = self._mp_columns()
        exner = (p / 1.0e5) ** 0.2854
        nr = jnp.full_like(qc, 1.0)
        ni = jnp.full_like(qc, 1.0)
        col0 = jnp.sum((qv + qc + qr + qi + qs + qg) * rho * dz, axis=1)
        precip = jnp.zeros(th.shape[0])
        for _ in range(10):
            (th, qv, qc, qr, qi, qs, qg, nr, ni, rain) = thompson(
                th, qv, qc, qr, qi, qs, qg, nr, ni, rho, exner, p, dz,
                30.0)
            precip = precip + rain * 1000.0
        col1 = jnp.sum((qv + qc + qr + qi + qs + qg) * rho * dz, axis=1)
        np.testing.assert_allclose(np.asarray(col1 + precip),
                                   np.asarray(col0), rtol=1e-6)

    def test_dycore_coupling_thompson(self):
        """Supercell-style moist run with mp_thompson stays finite."""
        import jax
        from mpas_tpu.mesh.planar import planar_hex_mesh
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.atmosphere.init_supercell import init_supercell
        from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                                run_steps)
        mesh = planar_hex_mesh(12, 12, 2000.0)
        cfg = AtmConfig(config_nvertlevels=16, config_dt=10.0,
                        config_len_disp=2000.0,
                        config_microp_scheme="mp_thompson")
        grid, state, diag = init_supercell(mesh, cfg, case=5)
        # widen scalars to 8 (qv..qg, nr, ni)
        sc = np.zeros(state.scalars.shape[:-1] + (8,))
        sc[..., :state.scalars.shape[-1]] = np.asarray(state.scalars)
        sc[..., 6] = 1.0e-2
        sc[..., 7] = 1.0e-2
        state = state.replace(scalars=jnp.asarray(sc))
        gridj = jax.tree.map(jnp.asarray, grid)
        carry = init_carry(gridj, cfg, jax.tree.map(jnp.asarray, state),
                           jax.tree.map(jnp.asarray, diag), cfg.config_dt)
        out = run_steps(gridj, cfg, carry, cfg.config_dt, 3)
        assert bool(jnp.all(jnp.isfinite(out.state.theta_m)))
        assert bool(jnp.all(jnp.isfinite(out.state.scalars)))
