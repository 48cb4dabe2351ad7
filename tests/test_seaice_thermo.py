"""Multilayer sea-ice thermodynamics (BL99/mushy) + delta-Eddington SW.

ref capabilities: ice_therm_bl99.F90 / ice_therm_mushy.F90 /
ice_shortwave.F90 (dEdd) / ice_therm_vertical.F90.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice import thermo_vertical as tv


@pytest.fixture(scope="module")
def cfg_bl99():
    return SeaiceConfig(config_thermo_type="bl99")


@pytest.fixture(scope="module")
def cfg_mushy():
    return SeaiceConfig(config_thermo_type="mushy")


def test_enthalpy_roundtrip_bl99(cfg_bl99):
    S = jnp.asarray(tv.bl99_salinity_profile(7))
    T = jnp.linspace(-25.0, -1.5, 7)
    q = tv.enthalpy_ice_bl99(cfg_bl99, T, S)
    T2 = tv.temperature_ice_bl99(cfg_bl99, q, S)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-8)
    assert np.all(np.asarray(q) < 0.0)


def test_enthalpy_roundtrip_mushy(cfg_mushy):
    S = jnp.full((7,), 3.0)
    T = jnp.linspace(-25.0, -1.0, 7)
    q = tv.enthalpy_mush(cfg_mushy, T, S)
    T2 = tv.temperature_mush(cfg_mushy, q, S)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-6)


def test_enthalpy_monotone_in_T(cfg_bl99):
    S = jnp.full((50,), 3.2)
    T = jnp.linspace(-30.0, -0.5, 50)
    q = np.asarray(tv.enthalpy_ice_bl99(cfg_bl99, T, S))
    assert np.all(np.diff(q) > 0.0)   # warmer ice = higher enthalpy


def test_snow_enthalpy_roundtrip(cfg_bl99):
    T = jnp.linspace(-30.0, 0.0, 8)
    q = tv.enthalpy_snow(cfg_bl99, T)
    T2 = tv.temperature_snow(cfg_bl99, q)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-9)


def _columns(cfg, n=6, ncat=3, nilyr=7, T0=-10.0):
    a = jnp.full((n, ncat), 0.3)
    h = jnp.asarray(np.linspace(0.5, 2.5, ncat))[None, :] * jnp.ones((n, 1))
    vi = a * h
    vs = a * 0.1
    T_s = jnp.full((n, ncat), T0)
    q_i, q_s = tv.init_enthalpy(cfg, n, ncat, nilyr=nilyr, T_init=T0 / 2)
    return a, vi, vs, T_s, q_i, q_s


def test_cold_growth(cfg_bl99):
    """Very cold atmosphere, no sun: basal congelation growth."""
    a, vi, vs, T_s, q_i, q_s = _columns(cfg_bl99, T0=-25.0)
    n, ncat = a.shape
    sw = jnp.zeros((n, 1))
    lw = jnp.full((n, 1), 180.0)   # cold sky
    ta = jnp.full((n, 1), -30.0)
    fo = jnp.full((n, 1), 0.5)
    a2, vi2, vs2, ts2, qi2, qs2, d = tv.thermo_multilayer(
        cfg_bl99, a, vi, vs, T_s, q_i, q_s, sw, lw, ta, fo, dt=3600.0)
    assert np.all(np.asarray(vi2) >= np.asarray(vi) - 1e-12)
    assert np.asarray(d["basalGrowth"]).min() > 0.0
    assert np.all(np.isfinite(np.asarray(qi2)))
    # temperatures implied by the new enthalpy stay physical
    S = jnp.asarray(tv.bl99_salinity_profile(7))
    T = np.asarray(tv.temperature_ice_bl99(cfg_bl99, qi2,
                                           jnp.broadcast_to(S, qi2.shape)))
    assert T.min() > -60.0 and T.max() <= 0.0


def test_warm_melt(cfg_bl99):
    """Hot atmosphere + strong sun: surface melt, snow goes first."""
    a, vi, vs, T_s, q_i, q_s = _columns(cfg_bl99, T0=-2.0)
    n, ncat = a.shape
    sw = jnp.full((n, 1), 600.0)
    lw = jnp.full((n, 1), 340.0)
    ta = jnp.full((n, 1), 5.0)
    fo = jnp.full((n, 1), 10.0)
    dt = 6 * 3600.0
    a2, vi2, vs2, ts2, qi2, qs2, d = tv.thermo_multilayer(
        cfg_bl99, a, vi, vs, T_s, q_i, q_s, sw, lw, ta, fo, dt=dt)
    assert np.sum(np.asarray(vs2)) < np.sum(np.asarray(vs))  # snow melted
    assert np.asarray(d["surfaceMelt"]).max() > 0.0
    assert np.all(np.asarray(ts2) <= 1e-6)                   # Ts capped


def test_equilibrium_flux_consistency(cfg_bl99):
    """With a steady cold surface, after many steps the conductive flux
    through the column approaches steady state (linear-in-1/k profile):
    growth rate decays as the ice thickens (Stefan-like behavior)."""
    cfg = cfg_bl99
    a = jnp.ones((1, 1)) * 0.9
    vi = a * 0.5
    vs = a * 0.0
    T_s = jnp.full((1, 1), -20.0)
    q_i, q_s = tv.init_enthalpy(cfg, 1, 1, nilyr=7, T_init=-10.0)
    sw = jnp.zeros((1, 1))
    lw = jnp.full((1, 1), 150.0)
    ta = jnp.full((1, 1), -30.0)
    fo = jnp.zeros((1, 1))
    growth = []
    dt = 6 * 3600.0
    for _ in range(20):
        a, vi, vs, T_s, q_i, q_s, d = tv.thermo_multilayer(
            cfg, a, vi, vs, T_s, q_i, q_s, sw, lw, ta, fo, dt=dt)
        growth.append(float(d["basalGrowth"][0]))
    assert growth[0] > 0.0
    # thicker ice conducts less -> growth decreases monotonically-ish
    assert growth[-1] < growth[0]
    assert float(vi[0, 0]) > 0.45


def test_mushy_runs_and_grows(cfg_mushy):
    a, vi, vs, T_s, q_i, q_s = _columns(cfg_mushy, T0=-15.0)
    n, _ = a.shape
    sw = jnp.zeros((n, 1))
    lw = jnp.full((n, 1), 180.0)
    ta = jnp.full((n, 1), -25.0)
    fo = jnp.full((n, 1), 0.5)
    a2, vi2, vs2, ts2, qi2, qs2, d = tv.thermo_multilayer(
        cfg_mushy, a, vi, vs, T_s, q_i, q_s, sw, lw, ta, fo, dt=3600.0)
    assert np.all(np.isfinite(np.asarray(qi2)))
    assert np.asarray(d["basalGrowth"]).min() >= 0.0
    assert np.sum(np.asarray(vi2)) > np.sum(np.asarray(vi))


def test_dedd_albedo_physical():
    from mpas_tpu.cores.seaice.shortwave_dedd import dedd_shortwave
    cfg = SeaiceConfig()
    h_i = jnp.asarray([[0.1, 1.0, 3.0]])
    h_s = jnp.asarray([[0.0, 0.0, 0.3]])
    alb, absl, thru = dedd_shortwave(cfg, h_i, h_s, nilyr=7)
    alb = np.asarray(alb)
    absl = np.asarray(absl)
    thru = np.asarray(thru)
    # all fractions in [0,1]; energy closes: alb + sum(abs) + thru +
    # surface-absorbed = 1 -> alb + interior + thru <= 1
    assert np.all(alb > 0.0) and np.all(alb < 1.0)
    assert np.all(absl >= -1e-9)
    assert np.all(thru >= -1e-9)
    assert np.all(alb + absl.sum(-1) + thru <= 1.0 + 1e-6)
    # snow-covered thick ice is brightest; thin bare ice is darkest
    assert alb[0, 2] > alb[0, 1] > alb[0, 0]
    # thin ice transmits more to the ocean than thick ice
    assert thru[0, 0] > thru[0, 1] >= thru[0, 2]


def test_dedd_energy_budget_in_thermo(cfg_bl99):
    """dEdd-coupled thermo runs and melts less than the crude-albedo path
    under the same strong sun over snow (dEdd snow albedo ~0.85)."""
    cfg_dedd = SeaiceConfig(config_thermo_type="bl99",
                            config_shortwave_type="dedd")
    from mpas_tpu.cores.seaice.shortwave_dedd import dedd_shortwave
    a, vi, vs, T_s, q_i, q_s = _columns(cfg_bl99, T0=-3.0)
    vs = a * 0.3   # deep snow
    n, _ = a.shape
    h_i = vi / a
    h_s = vs / a
    alb, fabs, fthru = dedd_shortwave(cfg_dedd, h_i, h_s, 7)
    sw = jnp.full((n, 1), 500.0)
    out = tv.thermo_multilayer(
        cfg_dedd, a, vi, vs, T_s, q_i, q_s, sw,
        jnp.full((n, 1), 300.0), jnp.full((n, 1), 2.0),
        jnp.full((n, 1), 2.0), dt=3600.0,
        sw_abs_lyr=fabs * sw[..., None], albedo=alb, sw_through=fthru * sw)
    assert np.all(np.isfinite(np.asarray(out[4])))


def test_column_step_dispatch_multilayer():
    """column_physics_step with bl99 + dedd wired through SeaiceState."""
    from mpas_tpu.cores.seaice.column import column_physics_step
    from mpas_tpu.cores.seaice.state import SeaiceForcing, SeaiceState

    cfg = SeaiceConfig(config_thermo_type="bl99",
                       config_shortwave_type="dedd",
                       config_n_categories=3)
    n = 5
    a = jnp.full((n, 3), 0.25)
    h = jnp.asarray([0.5, 1.5, 3.0])[None, :] * jnp.ones((n, 1))
    q_i, q_s = tv.init_enthalpy(cfg, n, 3, nilyr=7, T_init=-6.0)
    state = SeaiceState(
        iceAreaCategory=a, iceVolumeCategory=a * h,
        snowVolumeCategory=a * 0.05,
        surfaceTemperature=jnp.full((n, 3), -12.0),
        uVelocity=jnp.zeros((n,)), vVelocity=jnp.zeros((n,)),
        stress11=jnp.zeros((n,)), stress22=jnp.zeros((n,)),
        stress12=jnp.zeros((n,)), iceEnthalpy=q_i, snowEnthalpy=q_s)
    z = jnp.zeros((n,))
    forcing = SeaiceForcing(
        uAirVelocity=z, vAirVelocity=z,
        airTemperature=jnp.full((n,), -20.0),
        shortwaveDown=jnp.full((n,), 50.0),
        longwaveDown=jnp.full((n,), 200.0),
        uOceanVelocity=z, vOceanVelocity=z,
        seaSurfaceTemperature=jnp.full((n,), -1.8),
        oceanHeatFlux=jnp.full((n,), 2.0),
        sshGradientU=z, sshGradientV=z)
    out = column_physics_step(cfg, state, forcing, dt=3600.0)
    assert np.all(np.isfinite(np.asarray(out.iceVolumeCategory)))
    assert np.all(np.isfinite(np.asarray(out.iceEnthalpy)))
    # growth under cold forcing
    assert (np.sum(np.asarray(out.iceVolumeCategory))
            > np.sum(np.asarray(state.iceVolumeCategory)) - 1e-9)


class TestZSalinityAndOrbital:
    """Prognostic vertical salinity (ref: ice_zsalinity.F90 +
    ice_therm_mushy.F90 gravity drainage) and orbital coszen
    (ref: ice_orbital.F90:35-96)."""

    def _setup(self, nC=6, nCat=3, nilyr=7):
        import jax.numpy as jnp
        from mpas_tpu.cores.seaice.zsalinity import stable_profile
        S0 = jnp.broadcast_to(
            jnp.asarray(stable_profile(nilyr) + 6.0),
            (nC, nCat, nilyr))            # salty young-ice profile
        h = jnp.full((nC, nCat), 1.0)
        return S0, h

    def test_gravity_drainage_desalinates_toward_stable(self):
        import jax.numpy as jnp
        import numpy as np
        from mpas_tpu.cores.seaice.config import SeaiceConfig
        from mpas_tpu.cores.seaice.zsalinity import (stable_profile,
                                                     zsalinity_step)
        cfg = SeaiceConfig()
        S0, h = self._setup()
        sss = jnp.full(S0.shape[0], 34.0)
        S = S0
        for _ in range(50):
            S, fz = zsalinity_step(cfg, S, h, jnp.zeros_like(h),
                                   jnp.zeros_like(h), sss, 3600.0)
        # salinity decreased everywhere toward the stable shape
        assert float(jnp.max(S)) < float(jnp.max(S0))
        tgt = stable_profile(S.shape[-1])
        err0 = float(jnp.mean(jnp.abs(S0 - tgt[None, None])))
        err1 = float(jnp.mean(jnp.abs(S - tgt[None, None])))
        assert err1 < err0
        assert np.all(np.asarray(fz) >= 0.0)

    def test_salt_conservation_flux_matches_column_loss(self):
        import jax.numpy as jnp
        from mpas_tpu.cores.seaice.config import SeaiceConfig
        from mpas_tpu.cores.seaice.zsalinity import zsalinity_step
        cfg = SeaiceConfig()
        S0, h = self._setup()
        sss = jnp.full(S0.shape[0], 34.0)
        S1, fz = zsalinity_step(cfg, S0, h, jnp.zeros_like(h),
                                jnp.zeros_like(h), sss, 3600.0)
        nilyr = S0.shape[-1]
        layer_h = h[..., None] / nilyr
        lost = cfg.rho_ice * jnp.sum(layer_h * (S0 - S1),
                                     axis=(-1, -2)) / 1000.0
        import numpy as np
        np.testing.assert_allclose(np.asarray(fz), np.asarray(lost),
                                   rtol=1e-10)

    def test_growth_entrapment_raises_bottom_salinity(self):
        import jax.numpy as jnp
        from mpas_tpu.cores.seaice.config import SeaiceConfig
        from mpas_tpu.cores.seaice.zsalinity import (KEFF_GROWTH,
                                                     zsalinity_step)
        cfg = SeaiceConfig()
        S0, h = self._setup()
        S0 = S0 * 0.0 + 2.0                      # old fresh ice
        sss = jnp.full(S0.shape[0], 34.0)
        grow = jnp.full(h.shape, 2.0e-6)         # ~17 cm/day growth
        S1, _ = zsalinity_step(cfg, S0, h, grow, jnp.zeros_like(h),
                               sss, 3600.0)
        assert float(S1[..., -1].mean()) > float(S0[..., -1].mean())
        assert float(S1.max()) <= KEFF_GROWTH * 34.0 + 1e-6

    def test_flushing_desalinates_under_melt(self):
        import jax.numpy as jnp
        from mpas_tpu.cores.seaice.config import SeaiceConfig
        from mpas_tpu.cores.seaice.zsalinity import zsalinity_step
        cfg = SeaiceConfig()
        S0, h = self._setup()
        sss = jnp.full(S0.shape[0], 34.0)
        no_melt, _ = zsalinity_step(cfg, S0, h, jnp.zeros_like(h),
                                    jnp.zeros_like(h), sss, 3600.0)
        melt, _ = zsalinity_step(cfg, S0, h, jnp.zeros_like(h),
                                 jnp.full(h.shape, 0.05), sss, 3600.0)
        assert float(melt.mean()) < float(no_melt.mean())

    def test_coszen_geometry(self):
        """Noon overhead sun at the subsolar latitude; polar night in
        winter; value range [-1, 1] (ref: compute_coszen)."""
        import jax.numpy as jnp
        import numpy as np
        from mpas_tpu.cores.seaice.orbital import (compute_coszen,
                                                   solar_declination)
        # June solstice (~day 172): declination ~ +23.4 deg
        d = float(solar_declination(172.0))
        assert abs(np.degrees(d) - 23.44) < 1.0
        # December solstice: ~ -23.4
        d2 = float(solar_declination(355.0))
        assert abs(np.degrees(d2) + 23.44) < 1.5
        # noon UTC at lon=0: hour angle 0; lat = decl -> coszen ~ 1
        cz = float(compute_coszen(jnp.asarray(d), jnp.asarray(0.0),
                                  172.0, 43200.0))
        assert cz > 0.995
        # polar night: 80N in December, any hour
        for sec in (0.0, 21600.0, 43200.0, 64800.0):
            cz = float(compute_coszen(jnp.deg2rad(80.0), jnp.asarray(0.0),
                                      355.0, sec))
            assert cz < 0.0

    def test_column_step_with_zsalinity(self):
        """Full column step evolves iceSalinity when enabled."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from mpas_tpu.cores.seaice.config import SeaiceConfig
        from mpas_tpu.cores.seaice.core import run_steps
        from mpas_tpu.cores.seaice.init_square import init_square
        from mpas_tpu.cores.seaice.zsalinity import stable_profile
        from mpas_tpu.mesh.planar import box_hex_mesh
        m = box_hex_mesh(6, 6, 20000.0)
        cfg = SeaiceConfig(config_dt=600.0, config_use_zsalinity=True,
                           config_n_ice_layers=7)
        grid, state, forcing = init_square(m, cfg)
        nCat = state.iceAreaCategory.shape[-1]
        S0 = jnp.broadcast_to(
            jnp.asarray(stable_profile(7) + 4.0),
            (m.nCells, nCat, 7))
        state = state.replace(iceSalinity=S0)
        out = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                        jax.tree.map(jnp.asarray, state),
                        jax.tree.map(jnp.asarray, forcing), 3)
        S = np.asarray(out.iceSalinity)
        assert np.all(np.isfinite(S))
        assert S.min() >= 0.1 - 1e-9
        assert not np.allclose(S, np.asarray(S0))

    def test_prognostic_salinity_couples_to_thermo(self):
        """With zsalinity on, the evolving salinity profile feeds the
        thermo (conductivity/liquidus) — a saltier column conducts less
        and melts at a lower temperature, so trajectories diverge from
        the fixed-profile run (ref: ice_therm_mushy.F90 Sin coupling)."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from mpas_tpu.cores.seaice.config import SeaiceConfig
        from mpas_tpu.cores.seaice.core import run_steps
        from mpas_tpu.cores.seaice.init_square import init_square
        from mpas_tpu.mesh.planar import box_hex_mesh
        m = box_hex_mesh(6, 6, 20000.0)
        cfg = SeaiceConfig(config_dt=600.0, config_use_zsalinity=True,
                           config_thermo_type="mushy",
                           config_n_ice_layers=7)
        grid, state, forcing = init_square(m, cfg)
        nCat = state.iceAreaCategory.shape[-1]
        from mpas_tpu.cores.seaice import thermo_vertical as tv
        q_i, q_s = tv.init_enthalpy(cfg, m.nCells, nCat, nilyr=7,
                                    T_init=-8.0)
        state = state.replace(iceEnthalpy=q_i, snowEnthalpy=q_s)
        S_salty = jnp.full((m.nCells, nCat, 7), 12.0)
        st_salty = state.replace(iceSalinity=S_salty)
        st_fresh = state.replace(iceSalinity=jnp.full_like(S_salty, 1.0))
        G = jax.tree.map(jnp.asarray, grid)
        F = jax.tree.map(jnp.asarray, forcing)
        o1 = run_steps(G, cfg, jax.tree.map(jnp.asarray, st_salty), F, 4)
        o2 = run_steps(G, cfg, jax.tree.map(jnp.asarray, st_fresh), F, 4)
        q1 = np.asarray(o1.iceEnthalpy)
        q2 = np.asarray(o2.iceEnthalpy)
        assert np.all(np.isfinite(q1)) and np.all(np.isfinite(q2))
        assert float(np.max(np.abs(q1 - q2))) > 0.0
