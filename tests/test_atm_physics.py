"""Kessler microphysics + supercell moist dynamics tests.

ref test strategy: the reference validates moist physics through the
squall-line/supercell idealized cases (SURVEY §4; mpas_init_atm_cases.F:1313)
— a warm bubble in a conditionally unstable sheared sounding must produce an
updraft, cloud water, then surface rain, while conserving total water.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_supercell import init_supercell
from mpas_tpu.cores.atmosphere.physics.kessler import kessler, sediment_rain
from mpas_tpu.cores.atmosphere.time_integration import init_carry, run_steps
from mpas_tpu.mesh.planar import planar_hex_mesh


class TestKessler:
    def _column(self, nz=20, nc=3):
        z = np.linspace(0.0, 10e3, nz + 1)
        dz = np.diff(z)[None, :] * np.ones((nc, 1))
        zmid = 0.5 * (z[:-1] + z[1:])
        pii_ = (1.0 - 0.7 * zmid / 3.0e4)[None, :] * np.ones((nc, 1))
        rho = 1.2 * pii_ ** 2.5
        return dz, pii_, rho

    def test_saturation_adjustment_conserves_water(self):
        dz, pii_, rho = self._column()
        nc, nz = rho.shape
        theta = 300.0 * np.ones((nc, nz))
        qv = 0.028 * np.exp(-np.arange(nz) / 6.0)[None, :] * np.ones((nc, 1))
        qc = np.zeros((nc, nz))
        qr = np.zeros((nc, nz))
        th, qv2, qc2, qr2, rain = jax.jit(kessler)(
            jnp.asarray(theta), jnp.asarray(qv), jnp.asarray(qc),
            jnp.asarray(qr), jnp.asarray(rho), jnp.asarray(pii_),
            jnp.asarray(dz), 10.0)
        assert float(qc2.max()) > 1e-4          # condensation happened
        assert float((th - theta).max()) > 0.5  # latent heating
        tot0 = float((qv * rho * dz).sum())
        tot1 = float(((qv2 + qc2 + qr2) * rho * dz).sum()) \
            + float(rain.sum()) * 1000.0
        assert abs(tot1 - tot0) / tot0 < 1e-12

    def test_subsaturated_column_is_inert(self):
        dz, pii_, rho = self._column()
        nc, nz = rho.shape
        theta = 310.0 * np.ones((nc, nz))
        qv = 1e-4 * np.ones((nc, nz))
        z = jnp.zeros((nc, nz))
        th, qv2, qc2, qr2, rain = jax.jit(kessler)(
            jnp.asarray(theta), jnp.asarray(qv), z, z,
            jnp.asarray(rho), jnp.asarray(pii_), jnp.asarray(dz), 10.0)
        np.testing.assert_allclose(np.asarray(th), theta)
        np.testing.assert_allclose(np.asarray(qv2), qv)
        assert float(jnp.abs(qc2).max()) == 0.0
        assert float(rain.max()) == 0.0

    def test_sedimentation_moves_rain_down_and_out(self):
        dz, _, rho = self._column()
        nc, nz = rho.shape
        qr = np.zeros((nc, nz))
        qr[:, nz // 2] = 0.005
        qr_new, rain = jax.jit(sediment_rain)(
            jnp.asarray(qr), jnp.asarray(rho), jnp.asarray(dz), 600.0)
        qr_new, rain = np.asarray(qr_new), np.asarray(rain)
        # center of mass moved down
        zmid = np.arange(nz)
        com0 = (qr * zmid).sum() / qr.sum()
        com1 = (qr_new * rho * zmid).sum() / max((qr_new * rho).sum(), 1e-30)
        assert com1 < com0
        # mass balance: column rain water + fallout conserved
        m0 = float((qr * rho * dz).sum(axis=1)[0])
        m1 = float((qr_new * rho * dz).sum(axis=1)[0]) \
            + float(rain[0]) * 1000.0
        assert abs(m1 - m0) / m0 < 1e-12
        assert rain[0] > 0.0                    # some reached the surface
        assert float(qr_new.min()) >= -1e-15


@pytest.fixture(scope="module")
def supercell_run():
    mesh = planar_hex_mesh(16, 16, 2000.0)
    cfg = AtmConfig(config_dt=12.0, config_nvertlevels=16,
                    config_len_disp=2000.0, config_xnutr=0.0,
                    config_microp_scheme="mp_kessler")
    grid, state, diag = init_supercell(mesh, cfg, case=5)
    gj = jax.tree.map(jnp.asarray, grid)
    carry0 = init_carry(gj, cfg, jax.tree.map(jnp.asarray, state),
                        jax.tree.map(jnp.asarray, diag), cfg.config_dt)
    carry = run_steps(gj, cfg, carry0, cfg.config_dt, 100)  # 20 min
    return grid, cfg, carry0, carry


class TestSupercell:
    def test_initial_state_balanced(self, supercell_run):
        grid, cfg, carry0, _ = supercell_run
        # one step from the balanced+bubble state must not blow up w
        gj = jax.tree.map(jnp.asarray, grid)
        c1 = run_steps(gj, cfg, carry0, cfg.config_dt, 1)
        assert float(jnp.abs(c1.state.w).max()) < 1.0

    def test_updraft_and_rain_develop(self, supercell_run):
        _, _, _, carry = supercell_run
        w = np.asarray(carry.state.w)
        assert np.isfinite(w).all()
        assert w.max() > 5.0                    # convective updraft
        sc = np.asarray(carry.state.scalars)
        assert sc[..., 1].max() > 1e-4          # cloud water formed
        assert sc[..., 2].max() > 1e-4          # rain formed
        assert sc.min() > -1e-10                # monotonic transport held

    def test_total_water_conserved(self, supercell_run):
        grid, _, carry0, carry = supercell_run
        dz = np.asarray(grid.zgrid[:, 1:] - grid.zgrid[:, :-1])
        area = np.asarray(grid.mesh.areaCell)[:, None]

        def water_mass(c):
            rho_dry = np.asarray(c.state.rho_zz) * np.asarray(grid.zz)
            q = np.asarray(c.state.scalars).sum(-1)
            col = (rho_dry * q * dz * area).sum()
            rain = (np.asarray(c.rainnc) * 1000.0
                    * np.asarray(grid.mesh.areaCell)).sum()
            return col + rain

        m0, m1 = water_mass(carry0), water_mass(carry)
        assert abs(m1 - m0) / m0 < 1e-7

    def test_dry_columns_unperturbed_before_wave_arrival(self, supercell_run):
        grid, cfg, carry0, _ = supercell_run
        # after 1 step, cells far from the bubble keep their sounding theta
        gj = jax.tree.map(jnp.asarray, grid)
        c1 = run_steps(gj, cfg, carry0, cfg.config_dt, 1)
        th0 = np.asarray(carry0.state.theta_m)
        th1 = np.asarray(c1.state.theta_m)
        x = np.asarray(grid.mesh.xCell)
        far = np.abs(x - 0.5 * x.max()) > 0.4 * x.max()
        assert np.abs(th1[far] - th0[far]).max() < 1e-2


class TestWsm6Dycore:
    def test_supercell_with_wsm6(self):
        """Full moist dycore with the 6-category scheme: stable, conserves
        total water, and produces ice-phase species aloft (the supercell
        sounding is below freezing above ~4 km)."""
        mesh = planar_hex_mesh(12, 12, 2000.0)
        cfg = AtmConfig(config_dt=12.0, config_nvertlevels=16,
                        config_len_disp=2000.0, config_xnutr=0.0,
                        config_microp_scheme="mp_wsm6")
        grid, state, diag = init_supercell(mesh, cfg, case=5)
        # widen the scalar array from (qv,qc,qr) to the 6 WSM6 species
        sc = np.asarray(state.scalars)
        sc6 = np.concatenate([sc, np.zeros_like(sc)], axis=-1)
        state = state.replace(scalars=jnp.asarray(sc6))
        gj = jax.tree.map(jnp.asarray, grid)
        carry0 = init_carry(gj, cfg, jax.tree.map(jnp.asarray, state),
                            jax.tree.map(jnp.asarray, diag), cfg.config_dt)
        q0 = float(jnp.sum(carry0.state.scalars.sum(-1)
                           * carry0.state.rho_zz * gj.zz
                           * (gj.zgrid[:, 1:] - gj.zgrid[:, :-1])
                           * gj.mesh.areaCell[:, None]))
        carry = run_steps(gj, cfg, carry0, cfg.config_dt, 50)   # 10 min
        assert bool(jnp.all(jnp.isfinite(carry.state.theta_m)))
        assert bool(jnp.all(jnp.isfinite(carry.state.scalars)))
        q1 = float(jnp.sum(carry.state.scalars.sum(-1)
                           * carry.state.rho_zz * gj.zz
                           * (gj.zgrid[:, 1:] - gj.zgrid[:, :-1])
                           * gj.mesh.areaCell[:, None])) \
            + float(jnp.sum(carry.rainnc * 1000.0 * gj.mesh.areaCell))
        assert q1 == pytest.approx(q0, rel=5e-2)


class TestWsm6FullProcessSet:
    """Hong-Lim 2006 process physics (ref module_mp_wsm6.F): water and
    energy conservation, regime-correct process activation."""

    def _cols(self, t_c, qv=None, qc=0.0, qr=0.0, qi=0.0, qs=0.0, qg=0.0,
              rh=None):
        import mpas_tpu.cores.atmosphere.physics.wsm6 as w6
        nC, nz = 4, 8
        p = jnp.linspace(9.5e4, 3.0e4, nz)[None, :] * jnp.ones((nC, 1))
        t = jnp.full((nC, nz), t_c + 273.15)
        rho = p / (287.0 * t)
        exner = (p / 1.0e5) ** (287.0 / 1004.5)
        th = t / exner
        dz = jnp.full((nC, nz), 500.0)
        qsat = w6._qsat_liq(t, p)
        if qv is None:
            qv = (rh if rh is not None else 0.8) * qsat
        mk = lambda x: jnp.full((nC, nz), x) if np.isscalar(x) else x
        return (th, mk(qv), mk(qc), mk(qr), mk(qi), mk(qs), mk(qg),
                rho, exner, p, dz)

    def _total_water(self, out, rho, dz, rain):
        qv, qc, qr, qi, qs, qg = out[1:7]
        col = jnp.sum((qv + qc + qr + qi + qs + qg) * rho * dz, axis=-1)
        return col + rain * 1000.0

    def test_water_conserved(self):
        from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6
        args = self._cols(-5.0, qc=8e-4, qr=3e-4, qi=1e-4, qs=2e-4,
                          qg=1e-4)
        th, qv, qc, qr, qi, qs, qg, rho, exner, p, dz = args
        w0 = jnp.sum((qv + qc + qr + qi + qs + qg) * rho * dz, axis=-1)
        out = wsm6(th, qv, qc, qr, qi, qs, qg, rho, exner, p, dz, 10.0)
        w1 = self._total_water(out, rho, dz, out[7])
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w0),
                                   rtol=1e-9)

    def test_warm_rain_autoconversion_and_accretion(self):
        from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6
        args = self._cols(15.0, qc=2e-3, qr=1e-4)
        out = wsm6(*args, 30.0)
        qc1, qr1 = out[2], out[3]
        assert float(jnp.mean(qc1)) < float(jnp.mean(args[2]))  # qc drains
        assert float(out[7].sum()) >= 0.0

    def test_cold_cloud_glaciates_and_snows(self):
        from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6
        # supersaturated wrt ice at -20C: ice initiates and grows
        args = self._cols(-20.0, rh=1.0, qi=5e-5, qs=1e-4)
        out = wsm6(*args, 30.0)
        assert float(jnp.mean(out[4] + out[5])) \
            > float(jnp.mean(args[4] + args[5]))

    def test_homogeneous_freezing_below_minus40(self):
        from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6
        args = self._cols(-45.0, qc=5e-4)
        out = wsm6(*args, 10.0)
        assert float(jnp.max(out[2])) < 1e-7     # all cloud froze
        assert float(jnp.mean(out[4])) > 4e-4    # ... into cloud ice

    def test_snow_melts_in_warm_layer(self):
        from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6
        args = self._cols(8.0, qs=5e-4)
        th0 = args[0]
        out = wsm6(*args, 60.0)
        assert float(jnp.mean(out[5])) < float(jnp.mean(args[5]))
        assert float(jnp.mean(out[3])) > 0.0         # melt -> rain
        assert float(jnp.mean(out[0])) < float(jnp.mean(th0))  # cools

    def test_biggs_freezing_makes_graupel(self):
        from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6
        args = self._cols(-15.0, qr=1e-3)
        out = wsm6(*args, 60.0)
        assert float(jnp.mean(out[6])) > float(jnp.mean(args[6]))

    def test_sedimentation_rains_out(self):
        from mpas_tpu.cores.atmosphere.physics.wsm6 import wsm6
        args = self._cols(10.0, qr=2e-3)
        out = wsm6(*args, 120.0)
        assert float(out[7].mean()) > 0.0            # surface rain
