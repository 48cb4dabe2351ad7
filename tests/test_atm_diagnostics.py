"""Atmosphere diagnostics: isobaric interp, convective indices, PV,
soundings, manager alarms.

Parity model: src/core_atmosphere/diagnostics/* behavior on analytic
columns (exact interpolation of linear-in-logp fields; CAPE signs; PV of a
barotropic vortex ~ f term)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from mpas_tpu.constants import cp, p0, rgas
from mpas_tpu.cores.atmosphere.diagnostics.isobaric import (
    interp_to_pressure, mslp, compute_isobaric)
from mpas_tpu.cores.atmosphere.diagnostics.convective import (cape_cin,
                                                              lcl_height)
from mpas_tpu.cores.atmosphere.diagnostics.pv import (ertel_pv,
                                                      theta_on_pv_surface)
from mpas_tpu.cores.atmosphere.diagnostics.manager import (
    DiagnosticsManager, sounding)


@pytest.fixture(scope="module")
def jw():
    grid, gridj, cfg, carry, state, diag = ge._atm_setup(np.float64, n=8,
                                                         nz=16)
    return gridj, cfg, carry


class TestIsobaric:
    def test_interp_exact_for_linear_in_logp(self):
        nz = 20
        p = jnp.broadcast_to(
            jnp.exp(jnp.linspace(np.log(1.0e5), np.log(1.0e4), nz)),
            (4, nz))
        f = 3.0 * jnp.log(p) + 1.0
        levels = (90000.0, 50000.0, 20000.0)
        out = interp_to_pressure(p, f, levels)
        expect = 3.0 * np.log(np.asarray(levels)) + 1.0
        assert np.allclose(np.asarray(out), expect[None, :], rtol=1e-12)

    def test_below_surface_is_nan(self):
        nz = 10
        p = jnp.broadcast_to(
            jnp.exp(jnp.linspace(np.log(9.0e4), np.log(1.0e4), nz)), (2, nz))
        out = interp_to_pressure(p, p, (95000.0,))
        assert np.all(np.isnan(np.asarray(out)))

    def test_mslp_reduces_to_sfc_pressure_at_sea_level(self):
        p = float(mslp(jnp.asarray(101325.0), jnp.asarray(288.0),
                       jnp.asarray(0.0)))
        assert p == pytest.approx(101325.0)
        p_hill = float(mslp(jnp.asarray(90000.0), jnp.asarray(281.0),
                            jnp.asarray(1000.0)))
        assert 99000.0 < p_hill < 104000.0

    def test_on_jw_state(self, jw):
        gridj, cfg, carry = jw
        out = compute_isobaric(gridj, carry.state, carry.diag)
        t850 = np.asarray(out["temperature_isobaric"][:, 1])
        valid = ~np.isnan(t850)
        assert valid.sum() > 0
        assert np.all(t850[valid] > 200.0)
        assert np.all(t850[valid] < 320.0)
        assert np.all(np.asarray(out["mslp"]) > 90000.0)


class TestConvective:
    def test_cape_zero_for_isothermal(self):
        nz = 20
        z = jnp.broadcast_to(jnp.linspace(50.0, 12000.0, nz), (3, nz))
        t = jnp.full((3, nz), 260.0)
        p = 1.0e5 * jnp.exp(-z / 7000.0)
        qv = jnp.full((3, nz), 1e-4)
        cape, cin = cape_cin(t, qv, p, z)
        assert np.all(np.asarray(cape) < 20.0)
        assert np.all(np.asarray(cin) <= 0.0)

    def test_lcl_zero_when_saturated(self):
        lcl = lcl_height(jnp.asarray([280.0]), jnp.asarray([0.2]),
                         jnp.asarray([1.0e5]))
        assert float(lcl[0]) == 0.0


class TestPV:
    def test_jw_pv_has_f_scale(self, jw):
        """JW initial state: PV ~ f * (-g dtheta/dp) ~ 0.1-2 PVU in the
        troposphere, larger aloft."""
        gridj, cfg, carry = jw
        pv = ertel_pv(gridj, gridj.mesh, carry.state, carry.diag)
        pvn = np.asarray(pv)
        trop = pvn[:, 2:8]
        assert np.isfinite(trop).all()
        # northern hemisphere cells should have positive PV
        nh = np.asarray(gridj.mesh.latCell) > 0.3
        assert np.mean(trop[nh] > 0.0) > 0.9

    def test_theta_on_pv_surface_monotone_case(self):
        pv = jnp.broadcast_to(jnp.linspace(0.1, 8.0, 10), (4, 10))
        th = jnp.broadcast_to(jnp.linspace(300.0, 500.0, 10), (4, 10))
        out = theta_on_pv_surface(pv, th, target=2.0)
        # 2 PVU falls between levels; theta must be within range and match
        # the linear interpolation
        assert np.all(np.asarray(out) > 330.0)
        assert np.all(np.asarray(out) < 360.0)


class TestManager:
    def test_alarms_and_history(self, jw):
        gridj, cfg, carry = jw
        mgr = DiagnosticsManager(members={"convective": 600.0, "pv": 1200.0})
        mgr.init()
        for t in [0.0, 600.0, 1200.0]:
            mgr.compute_due(gridj, gridj.mesh, carry.state, carry.diag, t)
        assert len(mgr.history["convective"]) == 3
        assert len(mgr.history["pv"]) == 2

    def test_sounding_extraction(self, jw):
        gridj, cfg, carry = jw
        snd = sounding(gridj, gridj.mesh, carry.state, carry.diag,
                       (0.7, 1.0))
        assert snd["pressure_hpa"][0] > snd["pressure_hpa"][-1]
        assert np.all(np.diff(snd["height_m"]) > 0.0)
        assert -120.0 < snd["temperature_c"][0] < 60.0


class TestReflectivityDiagnostic:
    def test_reflectivity_member(self, jw):
        """refl_10cm diagnostic through the manager: the dry JW state has
        no hydrometeors, so the composite sits at the -30 dBZ floor; with
        injected rain the echo appears where the rain is."""
        import jax.numpy as jnp
        gridj, cfg, carry = jw
        st = carry.state
        ns = st.scalars.shape[-1]
        if ns < 3:
            pad = jnp.zeros(st.scalars.shape[:-1] + (3 - ns,),
                            st.scalars.dtype)
            st = st.replace(scalars=jnp.concatenate(
                [jnp.maximum(st.scalars, 0.0), pad], axis=-1))
        mgr = DiagnosticsManager(members={"reflectivity": 600.0})
        mgr.init()
        mgr.compute_all(gridj, gridj.mesh, st, carry.diag)
        _, out = mgr.history["reflectivity"][0]
        assert out["refl_10cm_max"].max() <= -29.0     # dry: floor
        sc = st.scalars.at[:, 2, 2].set(1.0e-3)        # rain at level 2
        st2 = st.replace(scalars=sc)
        mgr.compute_all(gridj, gridj.mesh, st2, carry.diag)
        _, out2 = mgr.history["reflectivity"][1]
        assert out2["refl_10cm_max"].max() > 30.0      # convective echo
