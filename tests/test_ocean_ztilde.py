"""z-tilde ALE: frequency-filtered thickness prognostics + min/max filter.

Parity model: mpas_ocn_thick_ale.F (ocn_ALE_thickness incl.
newHighFreqThickness and the min/max two-sweep filter) and
mpas_ocn_tendency.F ocn_tend_freq_filtered_thickness (Leclair & Madec
2011 z-tilde).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.ocean.core import OcnConfig, OcnState, rk4_step
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
from mpas_tpu.cores.ocean.ztilde import min_max_thickness_filter
from mpas_tpu.mesh.planar import channel_hex_mesh


@pytest.fixture(scope="module")
def channel_zt():
    m = channel_hex_mesh(8, 26, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    grid = jax.tree.map(jnp.asarray, grid)
    state = jax.tree.map(jnp.asarray, state)
    z = jnp.zeros_like(state.layerThickness)
    state = state.replace(lowFreqDivergence=z, highFreqThickness=z)
    return grid, state


class TestZTilde:
    pytestmark = pytest.mark.slow
    def test_stable_and_volume_conserving(self, channel_zt):
        grid, state = channel_zt
        cfg = OcnConfig(config_dt=30.0,
                        config_use_freq_filtered_thickness=True)
        area = grid.mesh.areaCell[:, None]
        vol0 = float(jnp.sum(state.layerThickness * area))

        @jax.jit
        def steps(s):
            def body(s, _):
                return rk4_step(grid, cfg, s, cfg.config_dt), 0.0
            return jax.lax.scan(body, s, None, length=120)[0]

        out = steps(state)
        assert bool(jnp.all(jnp.isfinite(out.u)))
        assert bool(jnp.all(jnp.isfinite(out.highFreqThickness)))
        vol1 = float(jnp.sum(out.layerThickness * area))
        # hhf redistributes volume within columns; the column-sum change
        # is bounded by the (small) restore/filter terms
        assert abs(vol1 - vol0) / vol0 < 1e-6

    def test_hhf_absorbs_high_frequency_divergence(self, channel_zt):
        """A spun-up front generates internal motions: hhf must become
        nonzero (the z-tilde DOF is active) while staying a small
        fraction of the layer thickness."""
        grid, state = channel_zt
        cfg = OcnConfig(config_dt=30.0,
                        config_use_freq_filtered_thickness=True)

        @jax.jit
        def steps(s):
            def body(s, _):
                return rk4_step(grid, cfg, s, cfg.config_dt), 0.0
            return jax.lax.scan(body, s, None, length=240)[0]

        out = steps(state)
        hhf = np.abs(np.asarray(out.highFreqThickness))
        h = np.asarray(out.layerThickness)
        assert hhf.max() > 0.0
        assert hhf.max() < 0.5 * h.max()

    def test_zstar_path_unchanged(self, channel_zt):
        """With the flag off, the legacy 3-tuple tendency path runs and
        the extra state fields are ignored."""
        grid, state = channel_zt
        cfg = OcnConfig(config_dt=30.0)
        out = rk4_step(grid, cfg, state, 30.0)
        assert bool(jnp.all(jnp.isfinite(out.u)))


class TestMinMaxFilter:
    def test_conserves_column_volume_and_enforces_bounds(self, channel_zt):
        grid, _ = channel_zt
        cfg = OcnConfig(config_min_thickness=5.0,
                        config_max_thickness_factor=1.5)
        resting = np.asarray(grid.restingThickness)
        rng = np.random.default_rng(3)
        # strongly perturbed thickness violating both bounds
        h = resting * rng.uniform(0.1, 3.0, resting.shape)
        h_f = np.asarray(min_max_thickness_filter(grid, cfg,
                                                  jnp.asarray(h)))
        mask = np.asarray(grid.cellMask) if grid.cellMask is not None \
            else np.ones_like(h)
        np.testing.assert_allclose((h_f * mask).sum(axis=1),
                                   (h * mask).sum(axis=1), rtol=1e-12)
        live = mask > 0
        # all but the top layer obey the bounds (top absorbs remainder)
        interior = live.copy()
        interior[:, 0] = False
        assert np.all(h_f[interior] >= cfg.config_min_thickness - 1e-9)
        assert np.all(
            h_f[interior] <= np.maximum(
                1.5 * resting[interior], cfg.config_min_thickness) + 1e-9)

    def test_noop_when_within_bounds(self, channel_zt):
        grid, state = channel_zt
        cfg = OcnConfig(config_min_thickness=0.001,
                        config_max_thickness_factor=100.0)
        h = state.layerThickness
        h_f = min_max_thickness_filter(grid, cfg, h)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h),
                                   atol=1e-12)
