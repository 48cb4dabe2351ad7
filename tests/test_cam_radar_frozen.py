"""CAM-class radiation, radar reflectivity, Noah frozen-surface variants.

Parity model: physics_wrf/module_ra_cam.F (+_support) radclwmx/radcswmx,
module_mp_radar.F refl10cm, module_sf_noah_seaice(_drv).F and the glacial
branch of module_sf_noahdrv.F.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.physics import cam_radiation as cam
from mpas_tpu.cores.atmosphere.physics import radar


def _columns(n=4, nz=20):
    z = jnp.linspace(100.0, 20000.0, nz)[None, :] * jnp.ones((n, 1))
    t = 288.0 - 6.5e-3 * jnp.minimum(z, 11000.0)
    p = 1.0e5 * jnp.exp(-z / 7500.0)
    rho = p / (287.0 * t)
    dz = jnp.full((n, nz), 1000.0)
    qv = 0.01 * jnp.exp(-z / 2500.0)
    qc = jnp.zeros_like(qv)
    return t, p, rho, dz, qv, qc


class TestCamLW:
    def test_clear_sky_cooling_and_olr(self):
        """Column anchor: midlatitude clear-sky LW cooling ~1-3 K/day in
        the lower troposphere; OLR and surface downwelling in the
        observed clear-sky ranges (radclwmx behavior)."""
        t, p, rho, dz, qv, qc = _columns()
        tsk = t[:, 0] + 1.0
        tend, glw, olr = cam.cam_lw(t, qv, qc, rho, dz, tsk)
        per_day = np.asarray(tend) * 86400.0
        # lower-troposphere (first 8 km) mean cooling
        mean_cool = per_day[:, :8].mean()
        assert -5.0 < mean_cool < -0.3, mean_cool
        assert np.all((np.asarray(olr) > 150.0) & (np.asarray(olr) < 340.0))
        assert np.all((np.asarray(glw) > 150.0) & (np.asarray(glw) < 450.0))

    def test_energy_consistency(self):
        """Column-integrated heating equals the net flux convergence
        (TOA - surface), the defining property of the exchange integral."""
        t, p, rho, dz, qv, qc = _columns()
        tsk = t[:, 0]
        tend, glw, olr = cam.cam_lw(t, qv, qc, rho, dz, tsk)
        col = np.asarray(jnp.sum(tend * cam.CP * rho * dz, axis=-1))
        sfc_net = 0.985 * cam._SB * np.asarray(tsk) ** 4 - np.asarray(glw)
        toa_net = np.asarray(olr)
        np.testing.assert_allclose(col, -(toa_net - sfc_net), rtol=1e-6)

    def test_cloud_greenhouse(self):
        """A low cloud raises surface downwelling LW (cloud greenhouse)."""
        t, p, rho, dz, qv, qc = _columns()
        tsk = t[:, 0]
        _, glw_clear, olr_clear = cam.cam_lw(t, qv, qc, rho, dz, tsk)
        qc2 = qc.at[:, 2:4].set(5e-4)
        _, glw_cloud, olr_cloud = cam.cam_lw(t, qv, qc2, rho, dz, tsk)
        assert np.all(np.asarray(glw_cloud) > np.asarray(glw_clear))
        assert np.all(np.asarray(olr_cloud) < np.asarray(olr_clear))


class TestCamSW:
    def test_night_is_zero(self):
        t, p, rho, dz, qv, qc = _columns()
        tend, gsw = cam.cam_sw(qv, qc, rho, dz,
                               mu0=jnp.full((t.shape[0],), -0.2))
        assert float(jnp.max(jnp.abs(tend))) == 0.0
        assert float(jnp.max(jnp.abs(gsw))) == 0.0

    def test_clear_sky_budget(self):
        """Overhead sun, clear sky: surface absorption below the TOA input
        and positive, column heating positive (H2O NIR absorption)."""
        t, p, rho, dz, qv, qc = _columns()
        mu = jnp.ones((t.shape[0],))
        tend, gsw = cam.cam_sw(qv, qc, rho, dz, mu, albedo=0.2)
        g = np.asarray(gsw)
        assert np.all((g > 300.0) & (g < 0.8 * 1361.0))
        assert np.asarray(jnp.sum(tend * cam.CP * rho * dz, -1)).min() > 0.0

    def test_cloud_shades_surface(self):
        t, p, rho, dz, qv, qc = _columns()
        mu = jnp.full((t.shape[0],), 0.7)
        _, gsw_clear = cam.cam_sw(qv, qc, rho, dz, mu)
        qc2 = qc.at[:, 3:5].set(8e-4)
        _, gsw_cloud = cam.cam_sw(qv, qc2, rho, dz, mu)
        assert np.all(np.asarray(gsw_cloud) < 0.75 * np.asarray(gsw_clear))

    def test_delta_eddington_physical(self):
        """Layer R/T stay in [0,1] and R+T <= 1 for absorbing layers."""
        tau = jnp.asarray([[0.1, 1.0, 10.0, 30.0]])
        w0 = jnp.full_like(tau, 0.99)
        g = jnp.full_like(tau, 0.85)
        rdir, tdir, rdif, tdif, e0 = cam._delta_eddington(
            tau, w0, g, jnp.asarray([[0.8]]))
        for a in (rdir, tdir, rdif, tdif):
            v = np.asarray(a)
            assert np.all((v >= 0.0) & (v <= 1.0))
        assert np.all(np.asarray(rdif + tdif) <= 1.0 + 1e-9)


class TestRadar:
    def test_rain_matches_analytic(self):
        """dBZ of 1 g/kg rain at rho=1.2 equals the closed-form exponential
        PSD value (independent re-derivation in the test)."""
        rho_a, q = 1.2, 1.0e-3
        lam = (np.pi * 1000.0 * radar.N0_RAIN / (rho_a * q)) ** 0.25
        z_mm6 = 720.0 * radar.N0_RAIN / lam ** 7 * 1e18
        expect = 10.0 * np.log10(z_mm6)
        got = float(radar.refl_10cm(jnp.asarray([[rho_a]]),
                                    jnp.asarray([[q]]))[0, 0])
        np.testing.assert_allclose(got, expect, atol=1e-6)
        # sanity: 1 g/kg rain is a solid convective echo
        assert 35.0 < got < 55.0

    def test_monotone_in_content(self):
        rho_a = jnp.full((1, 5), 1.0)
        q = jnp.asarray([[1e-5, 1e-4, 5e-4, 1e-3, 5e-3]])
        dbz = np.asarray(radar.refl_10cm(rho_a, q))[0]
        assert np.all(np.diff(dbz) > 0.0)

    def test_bright_band(self):
        """Wet (melting) snow reflects more than dry snow at the same
        content (the module_mp_radar melting-layer enhancement)."""
        rho_a = jnp.ones((1, 2))
        qs = jnp.full((1, 2), 5e-4)
        qr = jnp.zeros((1, 2))
        t = jnp.asarray([[270.0, 275.0]])      # dry | wet
        dbz = np.asarray(radar.refl_10cm(rho_a, qr, qs=qs, t=t))[0]
        assert dbz[1] > dbz[0] + 5.0           # ~6.5 dB dielectric jump

    def test_composite_is_column_max(self):
        rho_a = jnp.ones((2, 4))
        qr = jnp.asarray([[0.0, 1e-3, 1e-4, 0.0],
                          [1e-5, 0.0, 0.0, 2e-3]])
        dbz = radar.refl_10cm(rho_a, qr)
        comp = np.asarray(radar.composite_reflectivity(dbz))
        np.testing.assert_allclose(comp, np.asarray(dbz).max(-1))


class TestFrozenSurfaces:
    def test_seaice_skin_capped_and_basal_flux(self):
        from mpas_tpu.cores.atmosphere.physics import noah
        n = 3
        out = noah.noah_seaice(jnp.full((n,), 272.0),
                               jnp.full((n, 4), 271.0),
                               jnp.full((n,), 0.02),
                               gsw=jnp.full((n,), 500.0),
                               glw=jnp.full((n,), 320.0),
                               hfx=jnp.zeros((n,)), lh=jnp.zeros((n,)),
                               dt=3600.0)
        assert np.all(np.asarray(out["tsk"]) <= 273.15 + 1e-9)
        assert np.all(np.asarray(out["snow_melt"]) > 0.0)
        # ocean warms the cold ice base
        assert np.all(np.asarray(out["basal_flux"]) > 0.0)

    def test_glacial_cold_column_no_melt(self):
        from mpas_tpu.cores.atmosphere.physics import noah
        n = 2
        out = noah.noah_glacial(jnp.full((n,), 250.0),
                                jnp.full((n, 4), 245.0),
                                jnp.full((n,), 1.0),
                                gsw=jnp.full((n,), 100.0),
                                glw=jnp.full((n,), 180.0),
                                hfx=jnp.full((n,), 10.0),
                                lh=jnp.full((n,), 5.0), dt=3600.0)
        assert np.all(np.asarray(out["snow_melt"]) == 0.0)
        assert np.all(np.asarray(out["tsk"]) < 273.15)
        assert np.all(np.isfinite(np.asarray(out["tslb"])))


class TestManagerDispatch:
    @pytest.mark.slow
    def test_cam_scheme_and_frozen_masks_in_suite(self):
        """physics_step with config_radiation_scheme='cam' and xice/isice
        masks set: the CAM path and the per-point frozen-surface dispatch
        run through the full manager coupling."""
        import __graft_entry__ as ge
        from mpas_tpu.cores.atmosphere.physics.manager import (
            PhysicsConfig, init_physics_state, physics_step)
        from mpas_tpu.ops.reconstruct import build_reconstruct_coeffs

        grid, gridj, cfg, carry, state, diag = ge._atm_setup(np.float64)
        m = gridj.mesh
        coeffs = build_reconstruct_coeffs(m)
        pcfg = PhysicsConfig(config_radiation_scheme="cam",
                             config_lsm_scheme="noah")
        nz = carry.state.theta_m.shape[1]
        st = carry.state
        if st.scalars.shape[-1] < 2:
            sc = jnp.concatenate(
                [jnp.maximum(st.scalars, 0.0),
                 jnp.zeros_like(st.scalars[..., :1])], axis=-1)
            st = st.replace(scalars=sc)
        phys = init_physics_state(m.nCells, nz, lsm_scheme="noah")
        lat = np.asarray(m.latCell)
        xice = jnp.asarray(np.where(lat < -1.2, 0.8, 0.0))   # polar ice
        isice = jnp.asarray(np.where(lat > 1.2, 1.0, 0.0))   # glacial cap
        phys = phys.replace(xice=xice, isice=isice,
                            tsk=jnp.asarray(
                                np.where(np.abs(lat) > 1.2, 265.0, 288.0)),
                            tslb=jnp.asarray(np.where(
                                np.abs(lat)[:, None] > 1.2, 263.0, 288.0)))
        th1, sc1, u1, phys1 = physics_step(
            gridj, pcfg, m, coeffs, st, carry.diag, phys, 300.0)
        assert bool(jnp.all(jnp.isfinite(th1)))
        assert bool(jnp.all(jnp.isfinite(phys1.tsk)))
        # frozen surfaces stay at/below freezing
        frozen = np.abs(lat) > 1.2
        assert np.all(np.asarray(phys1.tsk)[frozen] <= 273.15 + 1e-6)
