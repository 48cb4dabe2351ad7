"""C++ external velocity-solver interface: lifecycle, triangulation,
FO solve parity against the analytic formula and the JAX SIA solver.

Parity model: Interface_velocity_solver.cpp lifecycle
(set_grid_data -> compute_2d_grid -> extrude -> solve_fo -> export)."""

import numpy as np
import pytest

from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.cores.landice.config import LiConfig
from mpas_tpu.cores.landice.core import make_grid, sia_velocity
from mpas_tpu.cores.landice.external import ExternalVelocitySolver
from mpas_tpu.cores.landice.init_dome import init_halfar

import jax.numpy as jnp


@pytest.fixture(scope="module")
def solver_setup():
    mesh = box_hex_mesh(14, 14, 4000.0)
    cfg = LiConfig(config_nvertlevels=4)
    grid, state, t0 = init_halfar(mesh, cfg, h0=500.0, r0=20000.0)
    sv = ExternalVelocitySolver(mesh, n_layers=4, cfg=cfg)
    return mesh, cfg, grid, state, sv


class TestInterface:
    def test_triangulation_counts(self, solver_setup):
        mesh, cfg, grid, state, sv = solver_setup
        mask = np.ones(mesh.nVertices, dtype=np.int32)
        n = sv.compute_2d_grid(mask)
        assert n > 0
        tri, tv = sv.triangles()
        assert tri.shape == (n, 3)
        # every triangle has three distinct cells
        assert np.all(tri[:, 0] != tri[:, 1])
        assert np.all(tri[:, 1] != tri[:, 2])
        # masked-out vertices are excluded
        n2 = sv.compute_2d_grid(np.zeros(mesh.nVertices, dtype=np.int32))
        assert n2 == 0

    def test_solve_fo_matches_analytic_formula(self, solver_setup):
        mesh, cfg, grid, state, sv = solver_setup
        th = np.asarray(state.thickness)
        bed = np.zeros(mesh.nCells)
        u = sv.solve_fo(th, bed)
        assert u.shape == (mesh.nEdges, 5)

        # recompute the built-in formula in numpy (surface interface)
        coe = np.asarray(mesh.cellsOnEdge)
        s = bed + th
        dsdn = (s[coe[:, 1]] - s[coe[:, 0]]) / np.asarray(mesh.dcEdge)
        h = 0.5 * (th[coe[:, 0]] + th[coe[:, 1]])
        n = cfg.config_flowlaw_exponent
        coef = 2.0 * cfg.config_default_flowParamA \
            * (cfg.rho_ice * cfg.gravity) ** n / (n + 1.0)
        expect = -coef * np.abs(dsdn) ** (n - 1.0) * dsdn * h ** (n + 1.0)
        has_ice = (th[coe[:, 0]] > 1.0) | (th[coe[:, 1]] > 1.0)
        both = has_ice & (coe[:, 0] != coe[:, 1])
        assert np.allclose(u[both, 0], expect[both], rtol=1e-12)
        # bed interface: no sliding
        assert np.all(u[:, -1] == 0.0)

    def test_solve_fo_agrees_with_jax_sia(self, solver_setup):
        """Same physics, different slope treatment (the JAX path adds the
        tangential slope component): depth-averaged speeds must agree to
        within the tangent-slope effect."""
        mesh, cfg, grid, state, sv = solver_setup
        th = np.asarray(state.thickness)
        u_cpp = sv.solve_fo(th, np.zeros(mesh.nCells))
        u_jax = np.asarray(sia_velocity(grid, cfg,
                                        jnp.asarray(th),
                                        jnp.asarray(state.temperature)))
        sel = np.abs(u_jax[:, 0]) > 1e-9
        assert sel.sum() > 20
        ratio = np.abs(u_cpp[sel, 0]) / np.abs(u_jax[sel, 0])
        # C++ (normal-slope only) <= JAX (full slope) and within 3x
        assert np.median(ratio) > 0.3
        assert np.median(ratio) < 1.5
        # direction always matches (downslope)
        assert np.all(np.sign(u_cpp[sel, 0]) == np.sign(u_jax[sel, 0]))

    def test_finalize_resets(self, solver_setup):
        mesh, cfg, grid, state, sv = solver_setup
        sv.finalize()
        # re-init works after finalize
        sv2 = ExternalVelocitySolver(mesh, n_layers=4, cfg=cfg)
        assert sv2.compute_2d_grid(np.ones(mesh.nVertices,
                                           dtype=np.int32)) > 0
