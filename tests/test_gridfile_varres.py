"""Real-mesh ingestion (grid.nc contract) + variable-resolution generation.

ref: the mesh file catalogue src/core_sw/Registry.xml:54-167 (reader must
accept exactly what the reference's bootstrap reads,
mpas_bootstrapping.F:79-423); mesh scaling atm_compute_mesh_scaling
(mpas_atm_core.F:927-967).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.gridfile import mesh_from_netcdf, mesh_to_netcdf
from mpas_tpu.mesh.build import compute_mesh_scaling


@pytest.fixture(scope="module")
def icos8():
    from mpas_tpu.mesh.sphere import icosahedral_mesh
    return icosahedral_mesh(8, lloyd_iters=2)


class TestGridFileRoundTrip:
    def test_sphere_roundtrip_exact(self, icos8, tmp_path):
        p = str(tmp_path / "grid.nc")
        mesh_to_netcdf(icos8, p)
        m2 = mesh_from_netcdf(p)
        for nm in ("areaCell", "dvEdge", "dcEdge", "edgeSignOnCell",
                   "edgeSignOnVertex", "divW", "keW", "curlW", "triskM",
                   "kiteAreasOnCell", "kiteAreasOnVertex", "angleEdge",
                   "invAreaCell", "meshDensity"):
            a = np.asarray(getattr(icos8, nm), dtype=np.float64)
            b = np.asarray(getattr(m2, nm), dtype=np.float64)
            assert np.max(np.abs(a - b)) < 1e-12, nm
        for nm in ("cellsOnEdge", "edgesOnCell", "verticesOnCell",
                   "cellsOnVertex", "edgesOnVertex", "edgeSlotOnCell",
                   "nEdgesOnCell", "nEdgesOnEdge"):
            assert np.array_equal(np.asarray(getattr(icos8, nm)),
                                  np.asarray(getattr(m2, nm))), nm
        assert m2.on_sphere and abs(m2.sphere_radius - 1.0) < 1e-12

    def test_tangential_operator_semantic_match(self, icos8, tmp_path):
        # weightsOnEdge/edgesOnEdge layouts differ (file packs rows); the
        # TRiSK tangential operator they encode must be identical
        p = str(tmp_path / "grid.nc")
        mesh_to_netcdf(icos8, p)
        m2 = mesh_from_netcdf(p)
        u = np.random.default_rng(0).normal(size=icos8.nEdges)

        def tang(m):
            return np.sum(np.asarray(m.weightsOnEdge)
                          * u[np.asarray(m.edgesOnEdge)], axis=1)

        assert np.max(np.abs(tang(icos8) - tang(m2))) < 1e-12

    def test_planar_boundary_roundtrip(self, tmp_path):
        from mpas_tpu.mesh.planar import channel_hex_mesh
        m = channel_hex_mesh(8, 6, 1000.0)
        p = str(tmp_path / "chan.nc")
        mesh_to_netcdf(m, p)
        m2 = mesh_from_netcdf(p)
        for nm in ("boundaryEdge", "boundaryCell", "triskM", "divW"):
            a = np.asarray(getattr(m, nm), dtype=np.float64)
            b = np.asarray(getattr(m2, nm), dtype=np.float64)
            assert np.max(np.abs(a - b)) < 1e-12, nm
        assert not m2.on_sphere
        assert abs(m2.x_period - m.x_period) < 1e-9

    def test_sw_run_equivalence(self, icos8, tmp_path):
        # the model must produce the same trajectory from the file mesh
        from mpas_tpu.cores.sw import test_cases as tc
        from mpas_tpu.cores.sw.config import SWConfig
        from mpas_tpu.cores.sw.time_integration import run_steps
        from mpas_tpu.mesh.mesh import to_device
        p = str(tmp_path / "grid.nc")
        mesh_to_netcdf(icos8, p)
        m2 = mesh_from_netcdf(p)
        cfg = SWConfig(config_dt=900.0, config_test_case=5)
        outs = []
        for m in (icos8, m2):
            ms, state, h_s = tc.test_case_5(m)
            out = run_steps(to_device(ms), cfg,
                            jax.tree.map(jnp.asarray, state),
                            jnp.asarray(np.asarray(h_s)), 5)
            outs.append(np.asarray(out.h))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=1e-12)


class TestMeshScaling:
    def test_reference_formula(self, icos8):
        rho = 0.5 + 0.5 * np.random.default_rng(1).uniform(
            size=icos8.nCells)
        m = icos8.replace(meshDensity=rho)
        m = compute_mesh_scaling(m, True)
        coe = np.asarray(m.cellsOnEdge)
        rho_e = 0.5 * (rho[coe[:, 0]] + rho[coe[:, 1]])
        np.testing.assert_allclose(np.asarray(m.meshScalingDel2),
                                   rho_e ** -0.25, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(m.meshScalingDel4),
                                   rho_e ** -0.75, rtol=1e-12)

    def test_disabled_gives_ones(self, icos8):
        m = compute_mesh_scaling(
            icos8.replace(meshDensity=np.full(icos8.nCells, 0.3)), False)
        assert np.all(np.asarray(m.meshScalingDel2) == 1.0)


@pytest.mark.slow
class TestVariableResolution:
    @pytest.fixture(scope="class")
    def varres(self):
        from mpas_tpu.mesh.varres import variable_res_mesh
        return variable_res_mesh(1200, iterations=20, seed=0)

    def test_refinement_ratio(self, varres):
        w = 2.0 * np.sqrt(np.asarray(varres.areaCell) / np.pi)
        rho = np.asarray(varres.meshDensity)
        fine = w[rho > 0.9].mean()
        coarse = w[rho < 0.02].mean()
        assert coarse / fine > 2.0, (fine, coarse)
        # SCVT equidistribution h ~ rho^-1/4 within ~25%
        q = w * rho ** 0.25
        assert q.std() / q.mean() < 0.25

    def test_no_degenerate_edges(self, varres):
        dv = np.asarray(varres.dvEdge)
        assert dv.min() > 0.05 * np.median(dv)

    def test_scaling_filled(self, varres):
        s2 = np.asarray(varres.meshScalingDel2)
        assert s2.min() >= 1.0 - 1e-9 and s2.max() > 2.0

    def test_jw_steps_stably(self, varres):
        from mpas_tpu.cores.atmosphere.config import AtmConfig
        from mpas_tpu.cores.atmosphere.init_jw import init_jw
        from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                                run_steps)
        w = 2.0 * np.sqrt(np.asarray(varres.areaCell) / np.pi) * 6.371e6
        cfg = AtmConfig(config_nvertlevels=10, config_dt=450.0,
                        config_len_disp=float(w.min()),
                        config_h_ScaleWithMesh=True)
        grid, state, diag = init_jw(varres, cfg, case=2)
        carry = init_carry(grid, cfg, state, diag, cfg.config_dt)
        out = run_steps(grid, cfg, carry, cfg.config_dt, 12)
        u = np.asarray(out.state.u)
        assert np.isfinite(u).all()
        assert np.abs(u).max() < 150.0
