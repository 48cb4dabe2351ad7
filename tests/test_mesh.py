"""Mesh construction invariants and TRiSK weight correctness.

Parity model: the geometry/connectivity consistency the reference gets from
its external mesh generator plus the in-operator unit tests of
mpas_geometry_utils.F (ref: SURVEY.md §4 item 1).
"""

import numpy as np
import pytest


def _edge_frames(mesh):
    ang = np.asarray(mesh.angleEdge)
    if mesh.on_sphere:
        lat, lon = np.asarray(mesh.latEdge), np.asarray(mesh.lonEdge)
        east = np.stack([-np.sin(lon), np.cos(lon), np.zeros_like(lon)], -1)
        north = np.stack([-np.sin(lat) * np.cos(lon),
                          -np.sin(lat) * np.sin(lon), np.cos(lat)], -1)
    else:
        n = mesh.nEdges
        east = np.tile([1.0, 0.0, 0.0], (n, 1))
        north = np.tile([0.0, 1.0, 0.0], (n, 1))
    nvec = np.cos(ang)[:, None] * east + np.sin(ang)[:, None] * north
    tvec = -np.sin(ang)[:, None] * east + np.cos(ang)[:, None] * north
    return nvec, tvec


class TestPlanarHex:
    def test_counts(self, hex_mesh_small):
        m = hex_mesh_small
        assert m.nCells == 64
        assert m.nEdges == 3 * m.nCells
        assert m.nVertices == 2 * m.nCells
        assert m.vertexDegree == 3

    def test_areas_tile_domain(self, hex_mesh_small):
        m = hex_mesh_small
        total = m.x_period * m.y_period
        assert np.isclose(np.sum(m.areaCell), total, rtol=1e-12)
        assert np.isclose(np.sum(m.areaTriangle), total, rtol=1e-12)
        assert np.isclose(np.sum(m.kiteAreasOnVertex), total, rtol=1e-12)
        assert np.isclose(np.sum(m.kiteAreasOnCell), total, rtol=1e-12)

    def test_uniform_hex_geometry(self, hex_mesh_small):
        m = hex_mesh_small
        dc = 1000.0
        assert np.allclose(m.dcEdge, dc, rtol=1e-9)
        assert np.allclose(m.dvEdge, dc / np.sqrt(3.0), rtol=1e-9)
        assert np.allclose(m.areaCell, dc * dc * np.sqrt(3.0) / 2.0, rtol=1e-9)

    def test_trisk_uniform_flow(self, hex_mesh_small):
        """Tangential reconstruction of uniform flow must be exact."""
        m = hex_mesh_small
        nvec, tvec = _edge_frames(m)
        V = np.array([3.0, 1.7, 0.0])
        u = nvec @ V
        v_true = tvec @ V
        v_rec = np.sum(np.asarray(m.weightsOnEdge)
                       * u[np.asarray(m.edgesOnEdge)], axis=1)
        assert np.max(np.abs(v_rec - v_true)) < 1e-12

    def test_uniform_flow_div_curl_zero(self, hex_mesh_small):
        m = hex_mesh_small
        nvec, _ = _edge_frames(m)
        u = nvec @ np.array([3.0, 1.7, 0.0])
        div = np.sum(np.asarray(m.edgeSignOnCell)
                     * (u * np.asarray(m.dvEdge))[np.asarray(m.edgesOnCell)],
                     axis=1) * np.asarray(m.invAreaCell)
        circ = np.sum(np.asarray(m.edgeSignOnVertex)
                      * (u * np.asarray(m.dcEdge))[np.asarray(m.edgesOnVertex)],
                      axis=1)
        assert np.max(np.abs(div)) < 1e-12
        assert np.max(np.abs(circ)) < 1e-9


class TestSphere:
    def test_counts(self, sphere_mesh_small):
        m = sphere_mesh_small
        assert m.nCells == 642
        assert m.nEdges == 1920
        assert m.nVertices == 1280

    def test_areas_tile_sphere(self, sphere_mesh_small):
        m = sphere_mesh_small
        assert np.isclose(np.sum(m.areaCell), 4 * np.pi, rtol=1e-10)
        assert np.isclose(np.sum(m.areaTriangle), 4 * np.pi, rtol=1e-10)

    def test_pentagon_count(self, sphere_mesh_small):
        n_pent = int(np.sum(np.asarray(sphere_mesh_small.nEdgesOnCell) == 5))
        assert n_pent == 12  # icosahedral grid: exactly 12 pentagons

    def test_solid_body_rotation_ops(self, sphere_mesh_small, sphere_mesh_medium):
        """div(solid body)=0, vorticity=2*Omega_z*z; errors shrink with dx."""
        errs = []
        for m in (sphere_mesh_small, sphere_mesh_medium):
            nvec, tvec = _edge_frames(m)
            P = np.stack([m.xEdge, m.yEdge, m.zEdge], -1)
            V = np.cross([0.0, 0.0, 1.0], P)
            u = np.sum(V * nvec, -1)
            div = np.sum(np.asarray(m.edgeSignOnCell)
                         * (u * np.asarray(m.dvEdge))[np.asarray(m.edgesOnCell)],
                         axis=1) * np.asarray(m.invAreaCell)
            vort = np.sum(
                np.asarray(m.edgeSignOnVertex)
                * (u * np.asarray(m.dcEdge))[np.asarray(m.edgesOnVertex)],
                axis=1) * np.asarray(m.invAreaTriangle)
            v_rec = np.sum(np.asarray(m.weightsOnEdge)
                           * u[np.asarray(m.edgesOnEdge)], axis=1)
            v_true = np.sum(V * tvec, -1)
            errs.append((np.abs(div).max(),
                         np.abs(vort - 2 * np.asarray(m.zVertex)).max(),
                         np.abs(v_rec - v_true).max()))
        for coarse, fine in zip(errs[0], errs[1]):
            assert fine < coarse  # converging with resolution
        assert errs[1][0] < 2e-3
        assert errs[1][1] < 1e-2

    def test_scaled(self, sphere_mesh_small):
        from mpas_tpu.constants import a
        m = sphere_mesh_small.scaled(a)
        assert np.isclose(np.sum(m.areaCell), 4 * np.pi * a * a, rtol=1e-10)
        assert np.isclose(np.asarray(m.dcEdge).mean()
                          / np.asarray(sphere_mesh_small.dcEdge).mean(), a)


class TestConventions:
    def test_vertices_on_edge_tangent_convention(self, hex_mesh_small):
        """t = k x n and verticesOnEdge[e,0]->[e,1] along +t."""
        m = hex_mesh_small
        nvec, tvec = _edge_frames(m)
        v1 = np.asarray(m.verticesOnEdge)[:, 0]
        v2 = np.asarray(m.verticesOnEdge)[:, 1]
        P = np.stack([np.asarray(m.xVertex), np.asarray(m.yVertex),
                      np.asarray(m.zVertex)], -1)
        d = P[v2] - P[v1]
        for k, L in ((0, m.x_period), (1, m.y_period)):
            d[:, k] -= L * np.round(d[:, k] / L)
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        assert np.allclose(np.sum(dn * tvec, axis=1), 1.0, atol=1e-9)

    def test_edge_sign_on_cell(self, hex_mesh_small):
        m = hex_mesh_small
        coe = np.asarray(m.cellsOnEdge)
        eoc = np.asarray(m.edgesOnCell)
        sign = np.asarray(m.edgeSignOnCell)
        for c in range(0, m.nCells, 7):
            for j in range(int(m.nEdgesOnCell[c])):
                e = eoc[c, j]
                expect = 1.0 if coe[e, 0] == c else -1.0
                assert sign[c, j] == expect
