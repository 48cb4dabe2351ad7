"""Ocean init-mode configurations: overflow, internal waves, cosine bell.

Parity model: the compass test groups for these configurations
(overflow default, internal_waves default, cosine bell transport)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.mesh.sphere import icosahedral_mesh
from mpas_tpu.cores.ocean.core import OcnConfig, run_steps
from mpas_tpu.cores.ocean.init_configs import (init_cosine_bell,
                                               init_internal_waves,
                                               init_overflow)


def _dev(grid, state):
    return jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state)


class TestOverflow:
    def test_dense_plume_sinks_and_conserves(self):
        m = channel_hex_mesh(6, 16, 5000.0)
        grid, state = init_overflow(m, nz=12)
        grid, state = _dev(grid, state)
        cfg = OcnConfig(config_dt=20.0, config_vert_mix_scheme="cvmix")
        area = grid.mesh.areaCell[:, None]
        vol0 = float(jnp.sum(state.layerThickness * area))
        out = run_steps(grid, cfg, state, 90)    # 30 min
        vol1 = float(jnp.sum(out.layerThickness * area))
        assert vol1 == pytest.approx(vol0, rel=1e-12)
        assert bool(jnp.all(jnp.isfinite(out.u)))
        # gravity current spins up
        assert float(jnp.max(jnp.abs(out.u))) > 0.01


class TestInternalWaves:
    def test_waves_oscillate_stably(self):
        m = channel_hex_mesh(6, 20, 5000.0)
        grid, state = init_internal_waves(m, nz=12)
        grid, state = _dev(grid, state)
        cfg = OcnConfig(config_dt=30.0)
        heat0 = float(jnp.sum(state.layerThickness * state.tracers[..., 0]
                              * grid.mesh.areaCell[:, None]))
        out = run_steps(grid, cfg, state, 120)
        heat1 = float(jnp.sum(out.layerThickness * out.tracers[..., 0]
                              * grid.mesh.areaCell[:, None]))
        assert heat1 == pytest.approx(heat0, rel=1e-12)
        umax = float(jnp.max(jnp.abs(out.u)))
        assert 1e-4 < umax < 1.0        # waves radiate, nothing blows up

    def test_interface_is_displaced(self):
        m = channel_hex_mesh(6, 20, 5000.0)
        grid, state = init_internal_waves(m, nz=12)
        t = np.asarray(state.tracers[..., 0])
        y = np.asarray(m.yCell)
        mid = np.argmin(np.abs(y - 0.5 * (y.min() + y.max())))
        edge = np.argmin(y)
        # interface raised in the center => cold water lifted => the center
        # column is colder at mid depth than the channel edge
        k = 7
        assert t[mid, k] < t[edge, k] - 0.5


class TestCosineBell:
    def test_bell_advects_and_stays_bounded(self):
        mesh = icosahedral_mesh(12, lloyd_iters=2).scaled(6371000.0)
        grid, state = init_cosine_bell(mesh, nz=3)
        grid, state = _dev(grid, state)
        cfg = OcnConfig(config_dt=600.0, config_time_integrator="RK4",
                        config_mom_del2=0.0, config_tracer_del2=0.0,
                        config_bottom_drag_coeff=0.0)
        area = grid.mesh.areaCell[:, None]
        bell0 = state.tracers[..., 2]
        mass0 = float(jnp.sum(bell0 * state.layerThickness * area))
        com0 = float(jnp.sum(grid.mesh.lonCell[:, None] * bell0 * area))
        out = run_steps(grid, cfg, state, 72)    # 12 h of rotation
        bell = out.tracers[..., 2]
        mass1 = float(jnp.sum(bell * out.layerThickness * area))
        assert mass1 == pytest.approx(mass0, rel=1e-10)
        assert float(jnp.min(bell)) > -0.2      # bounded undershoot
        assert float(jnp.max(bell)) < 1.2
        # the bell moved eastward: lon center of mass increased
        com1 = float(jnp.sum(grid.mesh.lonCell[:, None] * bell * area))
        assert com1 != pytest.approx(com0, rel=1e-6)


# ---------------------------------------------------------------------------
# round-2 breadth: lock_exchange, sea_mount, ziso, soma, isomip,
# sub_ice_shelf_2D, cvmix_WSwSBF, global_ocean (idealized) + partial
# bottom cells / level masks
# ---------------------------------------------------------------------------

from mpas_tpu.cores.ocean.init_configs import (init_cvmix_wswsbf,
                                               init_global_ocean_idealized,
                                               init_isomip,
                                               init_lock_exchange,
                                               init_sea_mount, init_soma,
                                               init_sub_ice_shelf_2d,
                                               init_ziso)


def _run_conserves(grid, state, steps=30, dt=30.0, forcing=None, **cfgkw):
    grid = jax.tree.map(jnp.asarray, grid)
    state = jax.tree.map(jnp.asarray, state)
    cfg = OcnConfig(config_dt=dt, **cfgkw)
    area = grid.mesh.areaCell[:, None]
    live = grid.cellMask if grid.cellMask is not None else 1.0
    vol0 = float(jnp.sum(state.layerThickness * live * area))
    if forcing is not None:
        out = run_steps(grid, cfg, state, steps,
                        jax.tree.map(jnp.asarray, forcing))
    else:
        out = run_steps(grid, cfg, state, steps)
    vol1 = float(jnp.sum(out.layerThickness * live * area))
    assert np.isfinite(np.asarray(out.u)).all()
    assert np.isfinite(np.asarray(out.tracers)).all()
    assert vol1 == pytest.approx(vol0, rel=1e-10)
    return grid, out


class TestLockExchange:
    def test_gravity_currents_form(self):
        m = channel_hex_mesh(6, 16, 500.0)
        grid, state = init_lock_exchange(m, nz=10)
        grid, out = _run_conserves(grid, state, steps=60, dt=5.0)
        assert float(jnp.max(jnp.abs(out.u))) > 0.05   # fronts moving


class TestSeaMount:
    def test_masks_follow_bathymetry(self):
        m = channel_hex_mesh(10, 12, 8000.0)
        grid, state = init_sea_mount(m, nz=12)
        mlc = np.asarray(grid.maxLevelCell)
        assert mlc.min() >= 2 and mlc.max() == 12
        assert mlc.min() < 12                    # seamount shallower
        cm = np.asarray(grid.cellMask)
        assert (cm.sum(-1) == mlc).all()
        # dead levels carry epsilon thickness
        h = np.asarray(state.layerThickness)
        k = np.arange(12)[None, :]
        assert (h[k >= mlc[:, None]] < 1.0).all()

    def test_resting_state_stays_nearly_at_rest(self):
        """The classic sigma-coordinate PGF error test: z-level partial
        bottom cells must keep spurious currents small."""
        m = channel_hex_mesh(10, 12, 8000.0)
        grid, state = init_sea_mount(m, nz=12)
        grid, out = _run_conserves(grid, state, steps=60, dt=20.0)
        assert float(jnp.max(jnp.abs(out.u))) < 0.05


class TestZiso:
    def test_spinup_under_wind(self):
        m = channel_hex_mesh(8, 16, 20000.0)
        grid, state, forcing = init_ziso(m, nz=10)
        grid, out = _run_conserves(grid, state, steps=40, dt=60.0,
                                   forcing=forcing)
        assert float(jnp.max(jnp.abs(out.u))) > 1e-4   # wind spins it up


class TestSoma:
    def test_basin_on_sphere(self):
        m = icosahedral_mesh(12, lloyd_iters=2)
        grid, state, forcing = init_soma(m, nz=8)
        mlc = np.asarray(grid.maxLevelCell)
        assert mlc.min() >= 2 and mlc.max() > mlc.min()  # bowl + rim
        _run_conserves(grid, state, steps=20, dt=120.0, forcing=forcing)


class TestIceShelfCavities:
    def test_isomip_draft_and_column(self):
        m = channel_hex_mesh(6, 12, 10000.0)
        grid, state, extras = init_isomip(m, nz=10)
        assert (np.asarray(extras["landIceDraft"]) <= 0.0).all()
        assert (np.asarray(extras["landIcePressure"]) >= 0.0).all()
        _run_conserves(grid, state, steps=30, dt=60.0)

    def test_sub_ice_shelf_2d(self):
        m = channel_hex_mesh(4, 16, 5000.0)
        grid, state, extras = init_sub_ice_shelf_2d(m, nz=10)
        draft = np.asarray(extras["landIceDraft"])
        assert draft.min() < -400.0 and draft.max() == 0.0
        _run_conserves(grid, state, steps=30, dt=30.0)


class TestCvmixWSwSBF:
    def test_mixed_layer_deepens(self):
        m = channel_hex_mesh(4, 6, 10000.0)
        grid, state, forcing = init_cvmix_wswsbf(m, nz=20)
        grid2, out = _run_conserves(grid, state, steps=40, dt=300.0,
                                    forcing=forcing,
                                    config_vert_mix_scheme="cvmix")
        # surface cooling + wind must erode the stratification near-surface
        T0 = np.asarray(state.tracers)[..., 0]
        T1 = np.asarray(out.tracers)[..., 0]
        dT0 = T0[:, 0] - T0[:, 3]
        dT1 = T1[:, 0] - T1[:, 3]
        assert dT1.mean() < dT0.mean()


class TestGlobalOceanIdealized:
    def test_aquaplanet_steps_stably(self):
        m = icosahedral_mesh(12, lloyd_iters=2)
        grid, state, forcing = init_global_ocean_idealized(m, nz=10)
        mlc = np.asarray(grid.maxLevelCell)
        assert mlc.max() == 10 and mlc.min() >= 2
        _run_conserves(grid, state, steps=20, dt=120.0, forcing=forcing)


class TestIso:
    """ISO idealized Southern Ocean (ref: mpas_ocn_init_iso.F)."""

    def test_channel_features_and_stability(self):
        from mpas_tpu.cores.ocean.init_configs import init_iso
        m = icosahedral_mesh(12, lloyd_iters=2)
        grid, state, forcing = init_iso(m, nz=8)
        lat = np.asarray(grid.mesh.latCell)
        mlc = np.asarray(grid.maxLevelCell)
        inside = (lat > -70 * np.pi / 180) & (lat < -50 * np.pi / 180)
        # walls shallow, channel deep, and the ridge/shelf give relief
        if inside.any() and (~inside).any():
            assert mlc[inside].max() > mlc[~inside].max()
            assert mlc[inside].max() > mlc[inside].min()
        # wind jet confined to the channel
        tau = np.asarray(forcing.windStressZonal)
        assert tau[~inside].max() == 0.0 and tau[inside].max() > 0.1
        _run_conserves(grid, state, steps=20, dt=120.0, forcing=forcing)

    def test_feature_flags_compose(self):
        from mpas_tpu.cores.ocean.init_configs import init_iso
        m = icosahedral_mesh(12, lloyd_iters=2)
        g_flat, _, _ = init_iso(m, nz=8, ridge=False, plateau=False,
                                shelf=False, cont_slope=False,
                                embayment=False, depression=False)
        g_full, _, _ = init_iso(m, nz=8)
        # flat variant: uniform channel depth; full variant has relief
        lat = np.asarray(m.latCell)
        inside = (lat > -70 * np.pi / 180) & (lat < -50 * np.pi / 180)
        if inside.sum() > 4:
            flat_range = np.ptp(np.asarray(g_flat.bottomDepth)[inside])
            full_range = np.ptp(np.asarray(g_full.bottomDepth)[inside])
            assert full_range > flat_range
