"""Mountain-wave case: terrain-following metrics + gravity-wave response.

Parity model: init_atm_case_mtn_wave (mpas_init_atm_cases.F:1898) — the
terrain-following grid must be consistent (zz*dz(zgrid)=dzeta), the
balanced state at rest over terrain must stay quiet without flow, and
cross-ridge flow must launch vertically propagating waves (w != 0 above
the ridge, bounded amplitude)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import planar_hex_mesh
from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_mtn_wave import HM, init_mtn_wave
from mpas_tpu.cores.atmosphere.time_integration import init_carry, run_steps


@pytest.fixture(scope="module")
def mtn():
    # 2-km grid over a 64-km channel; dt=10s (acoustic-limited over terrain)
    mesh = planar_hex_mesh(32, 8, 2000.0)
    cfg = AtmConfig(config_dt=10.0, config_nvertlevels=20,
                    config_len_disp=2000.0, config_zd=14000.0,
                    config_xnutr=0.1)
    # resolved ridge at dx=2km: envelope 10 km, wavelength 16 km
    grid, state, diag = init_mtn_wave(mesh, cfg, xa=10000.0, xla=16000.0)
    return mesh, cfg, grid, state, diag


class TestTerrainGrid:
    def test_coordinate_consistency(self, mtn):
        mesh, cfg, grid, state, diag = mtn
        zz = np.asarray(grid.zz)
        zg = np.asarray(grid.zgrid)
        dzw = np.asarray(grid.vert.dzw)
        assert np.allclose(zz * (zg[:, 1:] - zg[:, :-1]), dzw[None, :],
                           rtol=1e-12)
        # surface follows the terrain, top is flat at ZT
        hx = zg[:, 0]
        assert hx.max() == pytest.approx(HM, rel=0.15)
        assert np.allclose(zg[:, -1], 21000.0)

    def test_zxu_slope_peaks_at_ridge_flanks(self, mtn):
        mesh, cfg, grid, state, diag = mtn
        zxu = np.asarray(grid.zxu)
        assert np.max(np.abs(zxu[:, 0])) > 0.01     # ~250m over 4km waves
        # slope decays with height (coordinate decay)
        assert np.max(np.abs(zxu[:, -1])) < 0.2 * np.max(np.abs(zxu[:, 0]))

    def test_state_at_rest_stays_quiet(self, mtn):
        """No flow: hydrostatically balanced over terrain => tiny w."""
        mesh, cfg, grid, state, diag = mtn
        grid, state, diag = jax.tree.map(jnp.asarray, (grid, state, diag))
        state0 = state.replace(u=state.u * 0.0)
        diag0 = diag.replace(ru=diag.ru * 0.0)
        carry = init_carry(grid, cfg, state0, diag0, cfg.config_dt)
        out = run_steps(grid, cfg, carry, jnp.asarray(cfg.config_dt), 60)
        wmax = float(jnp.max(jnp.abs(out.state.w)))
        assert np.isfinite(wmax)
        assert wmax < 0.15          # m/s; residual imbalance only

    def test_flow_launches_mountain_waves(self, mtn):
        mesh, cfg, grid, state, diag = mtn
        gj, sj, dj = jax.tree.map(jnp.asarray, (grid, state, diag))
        carry = init_carry(gj, cfg, sj, dj, cfg.config_dt)
        out = run_steps(gj, cfg, carry, jnp.asarray(cfg.config_dt), 180)
        w = np.asarray(out.state.w)
        assert np.isfinite(w).all()
        # waves over the ridge: w significant in mid-levels near the ridge
        x = np.asarray(mesh.xCell)
        xc = 0.5 * (x.min() + x.max())
        near = np.abs(x - xc) < 24000.0
        wmax_near = np.abs(w[near, 5:15]).max()
        wmax_far = np.abs(w[~near, 5:15]).max()
        assert wmax_near > 0.05                 # waves exist
        assert wmax_near < 10.0                 # bounded
        assert wmax_near > 1.5 * wmax_far       # localized over the ridge
