"""First-order (Blatter-Pattyn) Stokes velocity solver.

Parity model: the ISMIP-HOM benchmark genres the reference exercises
through the Albany/FELIX external solver (Interface_velocity_solver.cpp
velocity_solver_solve_fo) — a laterally uniform slab must reproduce the
analytic SIA profile (FO == SIA exactly in that limit), basal sliding
must follow the linear friction law, and the periodic-bump experiment A
response must weaken as the wavelength shrinks (membrane stresses), the
published ISMIP-HOM slope (Pattyn et al. 2008).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.landice.fo_stokes import build_fo_geom, solve_fo_stokes
from mpas_tpu.mesh.planar import planar_hex_mesh

YR = 3.15576e7
RHO_G = 910.0 * 9.81
A_GLEN = 1e-16 / YR          # Pa^-3 s^-1
ALPHA = np.tan(np.radians(0.5))


def _slab(nx=8, dc=2000.0, H=1000.0, beta2=1e12, nz=16):
    mesh = planar_hex_mesh(nx, nx, dc)
    geom = build_fo_geom(mesh)
    thick = jnp.full((mesh.nCells,), H)
    surf = jnp.zeros((mesh.nCells,))
    u, v, res = solve_fo_stokes(
        geom, thick, surf, A_GLEN, beta2, RHO_G, nz=nz,
        picard_iters=14, cg_iters=200,
        slope=(jnp.asarray(-ALPHA), jnp.asarray(0.0)))
    return mesh, np.asarray(u) * YR, np.asarray(v) * YR, float(res)


class TestSlabLimit:
    pytestmark = pytest.mark.slow
    def test_matches_analytic_sia(self):
        """Uniform slab: FO == SIA analytically; the discrete solution
        must land within discretization error of
        u_s = 0.5 A (rho g sin a)^3 H^4 (plus the linear-sliding u_b)."""
        H = 1000.0
        mesh, u, v, res = _slab(H=H)
        u_sfc = u[:, 0].mean()
        u_bed = u[:, -1].mean()
        tau_d = RHO_G * ALPHA * H
        u_slide = tau_d / 1e12 * YR
        u_sia = 0.5 * A_GLEN * (RHO_G * ALPHA) ** 3 * H ** 4 * YR
        assert abs(u_bed - u_slide) < 0.35 * u_slide + 0.1
        assert abs((u_sfc - u_bed) - u_sia) < 0.25 * u_sia
        # horizontally uniform and downslope
        assert u[:, 0].std() < 1e-6 * abs(u_sfc)
        assert np.abs(v).max() < 1e-6 * abs(u_sfc)
        # shear concentrated near the bed (quartic-like profile)
        du_top = u[:, 0].mean() - u[:, u.shape[1] // 2].mean()
        du_bot = u[:, u.shape[1] // 2].mean() - u[:, -1].mean()
        assert du_bot > 2.0 * du_top

    def test_exp_c_linear_sliding(self):
        """Softer bed -> sliding dominates: u_b ~= tau_d / beta^2."""
        H = 1000.0
        beta2 = 5e9
        mesh, u, v, res = _slab(H=H, beta2=beta2)
        tau_d = RHO_G * ALPHA * H
        u_slide = tau_d / beta2 * YR
        assert u_slide > 100.0                 # sliding-dominated setup
        assert abs(u[:, -1].mean() - u_slide) < 0.15 * u_slide


class TestIsmipHomA:
    pytestmark = pytest.mark.slow
    def _bump_run(self, L, n=10, nz=10):
        mesh = planar_hex_mesh(n, n, L / n)
        geom = build_fo_geom(mesh)
        x = np.asarray(mesh.xCell)
        y = np.asarray(mesh.yCell)
        w = 2.0 * np.pi / L
        # ISMIP-HOM A: linear surface (mean slope), sinusoidal bed bumps
        thick = jnp.asarray(1000.0 - 500.0 * np.sin(w * x) * np.sin(w * y))
        surf = jnp.zeros((mesh.nCells,))
        u, v, _ = solve_fo_stokes(
            geom, thick, surf, A_GLEN, 1e12, RHO_G, nz=nz,
            picard_iters=12, cg_iters=180,
            slope=(jnp.asarray(-ALPHA), jnp.asarray(0.0)))
        us = np.asarray(u[:, 0]) * YR
        return (us.max() - us.min()) / max(us.mean(), 1e-9)

    def test_velocity_variation_decreases_with_wavelength(self):
        """The published ISMIP-HOM A slope: membrane stresses smooth the
        response over the bumps as L shrinks, so the normalized surface
        velocity variation must drop monotonically 160 km -> 40 km ->
        10 km (Pattyn et al. 2008, The Cryosphere 2, fig. 5 genre)."""
        var160 = self._bump_run(160e3)
        var40 = self._bump_run(40e3)
        var10 = self._bump_run(10e3)
        assert var160 > var40 > var10
        assert var10 < 0.5 * var160


class TestCoreIntegration:
    pytestmark = pytest.mark.slow
    def test_fe_step_with_fo_solver(self):
        from mpas_tpu.cores.landice.config import LiConfig
        from mpas_tpu.cores.landice.core import fe_step
        from mpas_tpu.cores.landice.init_dome import init_halfar
        mesh = planar_hex_mesh(10, 10, 2000.0)
        cfg = LiConfig(config_velocity_solver="FO", config_nvertlevels=6,
                       config_fo_picard_iters=6, config_fo_cg_iters=60,
                       config_dt=0.01 * YR)
        grid, state, _ = init_halfar(mesh, cfg, h0=800.0, r0=8000.0)
        out = fe_step(grid, cfg, state, cfg.config_dt)
        h = np.asarray(out.thickness)
        assert np.isfinite(h).all() and (h >= 0.0).all()
        u = np.asarray(out.normalVelocity)
        assert np.isfinite(u).all()
        assert np.abs(u).max() > 0.0            # dome spreads
        # volume conserved up to calving/boundary effects on this step
        v0 = float(jnp.sum(state.thickness * grid.mesh.areaCell))
        v1 = float(jnp.sum(out.thickness * grid.mesh.areaCell))
        assert abs(v1 - v0) / v0 < 0.05
