"""CAM3 radiation engine anchors (radcswmx/radclwmx fidelity).

Parity model: physics_wrf/module_ra_cam.F radcswmx (:5514) / radclwmx
(:4565) / raddedmx (:7333) / radabs (:2032), module_ra_cam_support.F
trcab/trcpth/trcplk/cldems/reltab/reitab.

Published-value anchors used here:
- Slingo (1989) table 1: band-1 liquid extinction tau/LWP = a + b/re.
- Ebert & Curry (1992): ice extinction a + b/re.
- Kiehl & Briegleb (1991)-class CO2: instantaneous clear-sky 2xCO2 OLR
  reduction of a few W/m2 (canonical ~3-5.5 pre-adjustment, tropical
  column on the higher side).
- CH4+N2O combined clear-sky greenhouse contribution ~ O(1) W/m2.
- Maximum-overlap configuration weights: total cloud cover = max(cld)
  (the defining property of radcswmx's single-region overlap).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.physics import cam3
from mpas_tpu.cores.atmosphere.physics import cam3_data as D


def _tropical(n=1, nz=30):
    """Tropical-ish sounding, TOP-DOWN arrays for the engine."""
    psfc = 1.013e5
    pint = jnp.linspace(20.0e2, psfc, nz + 1)[None, :] * jnp.ones((n, 1))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    # temperature: 300 K surface, moist-adiabat-ish to 200 K tropopause
    t = jnp.clip(300.0 * (pmid / psfc) ** 0.19, 200.0, 300.0)
    qv = jnp.clip(0.018 * (pmid / psfc) ** 3.0, 2e-6, 1.0)
    o3 = jnp.asarray(
        np.interp(np.asarray(pmid[0]) / 100.0,
                  [20.0, 100.0, 300.0, 1000.0],
                  [8.0e-6, 0.3e-6, 0.06e-6, 0.04e-6]))[None, :] \
        * jnp.ones((n, 1)) * 48.0 / 28.97
    cld = jnp.zeros_like(pmid)
    zero = jnp.zeros_like(pmid)
    rel = jnp.full_like(pmid, 10.0)
    rei = jnp.full_like(pmid, 30.0)
    return pint, pmid, t, qv, o3, cld, zero, rel, rei


class TestCloudOptics:
    def test_slingo_band1_extinction(self):
        """Slingo 1989: tau/LWP = a1 + b1/re; re=10um -> 0.1587 m2/g."""
        got = D.ABARL[0] + D.BBARL[0] / 10.0
        np.testing.assert_allclose(got, 0.15867, rtol=1e-4)

    def test_ebert_curry_ice(self):
        """E&C 1992: a + b/re at re=30 um = 0.08448 m2/g."""
        got = D.ABARI[0] + D.BBARI[0] / 30.0
        np.testing.assert_allclose(got, 0.0844813, rtol=1e-4)

    def test_reitab_matches_table(self):
        t = jnp.asarray([[180.5, 233.0, 273.0]])
        re = np.asarray(cam3.reitab(t))[0]
        # 180.5 K: halfway between first two entries
        np.testing.assert_allclose(re[0], 0.5 * (5.92779 + 6.26422),
                                   rtol=1e-6)
        np.testing.assert_allclose(re[1], D.RETAB[233 - 180], rtol=1e-6)

    def test_cldems_range(self):
        e = cam3.cldems(jnp.asarray([0.0, 5.0, 500.0]),
                        jnp.zeros(3), jnp.full(3, 30.0))
        v = np.asarray(e)
        assert v[0] == 0.0 and 0.3 < v[1] < 0.8 and v[2] > 0.999

    def test_spectral_weights_sum(self):
        """frcsol*psf sums to ~1 (the full solar constant is spent)."""
        np.testing.assert_allclose(np.sum(D.FRCSOL * D.PSF), 1.0,
                                   rtol=2e-3)


class TestOverlap:
    def test_max_overlap_weights(self):
        cld = jnp.asarray([[0.0, 0.3, 0.0, 0.7, 0.2]])
        pres, w = cam3._max_overlap_configs(cld)
        w = np.asarray(w)[0]
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
        # clear-sky weight = 1 - max cloud
        np.testing.assert_allclose(w[0], 0.3, atol=1e-12)
        # all-cloud config weight = min nonzero cloud
        pres = np.asarray(pres)[0]
        full = pres.sum(-1) == 3
        np.testing.assert_allclose(w[full].sum(), 0.2, atol=1e-12)

    def test_overcast_single_layer(self):
        cld = jnp.asarray([[0.0, 1.0, 0.0]])
        pres, w = cam3._max_overlap_configs(cld)
        w = np.asarray(w)[0]
        pres = np.asarray(pres)[0]
        # all weight is on configs containing the cloud
        assert w[~pres[:, 1]].sum() < 1e-12


class TestSW:
    def test_clear_sky_budget_overhead_sun(self):
        """Overhead sun, tropical clear sky: TOA albedo ~7-14%, column
        absorption 180-320 W/m2 (ICRCCM-genre clear-sky ranges)."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        out = cam3.radcswmx(pint, pmid, t, qv, o3, cld, zero, zero,
                            rel, rei, jnp.ones(1), jnp.full(1, 0.07),
                            jnp.full(1, 0.07))
        solin = float(out["solin"][0])
        alb = 1.0 - float(out["fsntoa"][0]) / solin
        absorbed = float(out["fsntoa"][0]) - float(out["fsns"][0])
        assert 0.05 < alb < 0.16, alb
        assert 180.0 < absorbed < 320.0, absorbed
        # clear-sky diagnostics equal all-sky when no clouds
        np.testing.assert_allclose(float(out["fsnsc"][0]),
                                   float(out["fsns"][0]), rtol=1e-5)

    def test_energy_conservation(self):
        """Column SW heating integral equals flux convergence."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        cld = cld.at[:, 20:22].set(0.5)
        lwp = zero.at[:, 20:22].set(60.0)
        out = cam3.radcswmx(pint, pmid, t, qv, o3, cld, lwp, zero,
                            rel, rei, jnp.full(1, 0.6), jnp.full(1, 0.2),
                            jnp.full(1, 0.2))
        col = float(jnp.sum(out["qrs"] * cam3.CP
                            * (pint[:, 1:] - pint[:, :-1])
                            / cam3.GRAV_SI))
        conv = float(out["fsnt"][0]) - float(out["fsns"][0])
        np.testing.assert_allclose(col, conv, rtol=2e-3)

    def test_cloud_albedo_effect(self):
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        out0 = cam3.radcswmx(pint, pmid, t, qv, o3, cld, zero, zero,
                             rel, rei, jnp.full(1, 0.8),
                             jnp.full(1, 0.07), jnp.full(1, 0.07))
        cld1 = cld.at[:, 22:25].set(0.9)
        lwp = zero.at[:, 22:25].set(100.0)
        out1 = cam3.radcswmx(pint, pmid, t, qv, o3, cld1, lwp, zero,
                             rel, rei, jnp.full(1, 0.8),
                             jnp.full(1, 0.07), jnp.full(1, 0.07))
        # thick stratus: surface flux cut by more than half; TOA albedo up
        assert float(out1["fsds"][0]) < 0.5 * float(out0["fsds"][0])
        assert float(out1["fsntoa"][0]) < 0.75 * float(out0["fsntoa"][0])
        # clear-sky diagnostic unchanged by the cloud
        np.testing.assert_allclose(float(out1["fsntoac"][0]),
                                   float(out0["fsntoac"][0]), rtol=1e-5)

    def test_ozone_uv_absorption(self):
        """Removing ozone brightens the surface: the Hartley/Huggins UV
        intervals absorb ~2-5% of TOA insolation in a tropical column."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        args = (pint, pmid, t, qv)
        out1 = cam3.radcswmx(*args, o3, cld, zero, zero, rel, rei,
                             jnp.ones(1), jnp.full(1, 0.07),
                             jnp.full(1, 0.07))
        out0 = cam3.radcswmx(*args, o3 * 0.0, cld, zero, zero, rel, rei,
                             jnp.ones(1), jnp.full(1, 0.07),
                             jnp.full(1, 0.07))
        d = float(out0["fsds"][0]) - float(out1["fsds"][0])
        assert 15.0 < d < 90.0, d

    def test_delta_eddington_conservative(self):
        """w0 -> 1: R+T -> 1 (no absorption) in the raddedmx forms."""
        tau = jnp.asarray([0.5, 2.0, 8.0])
        w0 = jnp.full(3, 0.999999)
        g = jnp.full(3, 0.85)
        rdir, tdir, rdif, tdif, e0 = cam3._sw_layer_props(
            tau, w0, g, g ** 2, jnp.asarray(0.9))
        np.testing.assert_allclose(np.asarray(rdif + tdif), 1.0, atol=5e-4)

    def test_adding_two_layer_analytic(self):
        """Adding two identical purely-diffuse layers matches the closed
        form R12 = R + T^2 R/(1-R^2)."""
        R, T = 0.3, 0.6
        rdir = jnp.full((1, 2), R)
        tdir = jnp.full((1, 2), T)
        rdif = jnp.full((1, 2), R)
        tdif = jnp.full((1, 2), T)
        explay = jnp.zeros((1, 2))   # no direct beam survives
        exptdn, rdndif, tdntot, rupdir, rupdif = cam3._adding(
            rdir, tdir, rdif, tdif, explay,
            jnp.zeros(1), jnp.zeros(1))
        got = float(rupdif[0, 0])
        expect = R + T * T * R / (1.0 - R * R)
        np.testing.assert_allclose(got, expect, rtol=1e-6)


class TestLW:
    def test_co2_doubling_forcing(self):
        """Instantaneous clear-sky OLR drop for 2xCO2: 2-7 W/m2
        (Kiehl-Briegleb-class 15um band)."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        lwups = jnp.asarray([0.985 * 5.670374e-8 * 301.0 ** 4])
        base = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                             lwups, co2vmr=3.55e-4)
        dbl = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                            lwups, co2vmr=7.10e-4)
        d = float(base["flut"][0]) - float(dbl["flut"][0])
        assert 1.5 < d < 8.0, d

    def test_trace_gas_greenhouse(self):
        """Removing CH4+N2O+CFCs raises OLR by ~0.5-5 W/m2."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        lwups = jnp.asarray([0.985 * 5.670374e-8 * 301.0 ** 4])
        base = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                             lwups)
        off = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                            lwups, n2ovmr=0.0, ch4vmr=0.0,
                            cfc11vmr=0.0, cfc12vmr=0.0)
        d = float(off["flut"][0]) - float(base["flut"][0])
        assert 0.3 < d < 6.0, d

    def test_ozone_stratospheric_heating(self):
        """The 9.6um O3 band warms (or reduces cooling in) the layers
        holding the ozone maximum relative to a no-O3 run."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        lwups = jnp.asarray([0.985 * 5.670374e-8 * 301.0 ** 4])
        w = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                          lwups)
        wo = cam3.radclwmx(pint, pmid, t, qv, o3 * 0.0, cld, zero, zero,
                           rei, lwups)
        dq = np.asarray(w["qrl"] - wo["qrl"])[0]
        assert dq[:6].mean() > 0.0   # upper levels gain heating from O3

    def test_tropical_clear_sky_olr(self):
        """Tropical clear-sky OLR in the canonical 270-300 W/m2 window
        and GLW in the tropical 350-430 range."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        lwups = jnp.asarray([0.985 * 5.670374e-8 * 301.0 ** 4])
        out = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                            lwups)
        olr = float(out["flut"][0])
        glw = float(out["flwds"][0])
        assert 260.0 < olr < 305.0, olr
        assert 340.0 < glw < 440.0, glw

    def test_cloud_lw_forcing(self):
        """A high cold cloud slashes OLR; a low cloud boosts GLW."""
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical()
        lwups = jnp.asarray([0.985 * 5.670374e-8 * 301.0 ** 4])
        base = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                             lwups)
        hi = cld.at[:, 6:8].set(1.0)
        cwp = zero.at[:, 6:8].set(100.0)
        fice = zero.at[:, 6:8].set(1.0)
        out = cam3.radclwmx(pint, pmid, t, qv, o3, hi, cwp, fice, rei,
                            lwups)
        assert float(out["flut"][0]) < float(base["flut"][0]) - 40.0
        lo = cld.at[:, 26:28].set(1.0)
        cwp2 = zero.at[:, 26:28].set(100.0)
        out2 = cam3.radclwmx(pint, pmid, t, qv, o3, lo, cwp2, zero, rei,
                             lwups)
        assert float(out2["flwds"][0]) > float(base["flwds"][0]) + 10.0
        # clear-sky diagnostics track the no-cloud run
        np.testing.assert_allclose(float(out["flutc"][0]),
                                   float(base["flut"][0]), rtol=1e-5)

    def test_energy_closure(self):
        pint, pmid, t, qv, o3, cld, zero, rel, rei = _tropical(n=3)
        lwups = jnp.full(3, 0.985 * 5.670374e-8 * 301.0 ** 4)
        out = cam3.radclwmx(pint, pmid, t, qv, o3, cld, zero, zero, rei,
                            lwups)
        col = np.asarray(jnp.sum(
            out["qrl"] * cam3.CP * (pint[:, 1:] - pint[:, :-1])
            / cam3.GRAV_SI, -1))
        conv = np.asarray(out["flns"] - out["flnt"])
        np.testing.assert_allclose(col, conv, rtol=1e-5)
