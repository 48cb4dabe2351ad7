"""Operator library tests: RBF reconstruction, splines, geometry, matrix.

Parity model: the in-operator unit tests of the reference library
(ref: mpas_geometry_utils.F:834+, mpas_spline_interpolation.F:419,
mpas_vector_reconstruction.F usage in every core)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.mesh import to_device
from mpas_tpu.ops.reconstruct import build_reconstruct_coeffs, reconstruct
from mpas_tpu.ops import geometry as geo
from mpas_tpu.ops.spline import (cubic_spline_coefficients,
                                 interpolate_cubic_spline)
from mpas_tpu.ops.matrix import tridiagonal_solve, rotation_about_axis_3d


class TestRBFReconstruction:
    def test_uniform_flow_exact_plane(self, hex_mesh_small):
        m = hex_mesh_small
        coeffs = build_reconstruct_coeffs(m)
        md = to_device(m)
        ang = np.asarray(m.angleEdge)
        V = np.array([3.0, -1.7, 0.0])
        u = jnp.asarray(np.cos(ang) * V[0] + np.sin(ang) * V[1])
        vx, vy, vz, zon, mer = reconstruct(md, jnp.asarray(coeffs), u)
        assert np.allclose(np.asarray(vx), V[0], atol=1e-10)
        assert np.allclose(np.asarray(vy), V[1], atol=1e-10)
        assert np.allclose(np.asarray(zon), V[0], atol=1e-10)
        assert np.allclose(np.asarray(mer), V[1], atol=1e-10)

    def test_solid_body_sphere(self, sphere_mesh_small):
        m = sphere_mesh_small
        coeffs = build_reconstruct_coeffs(m)
        md = to_device(m)
        ang = np.asarray(m.angleEdge)
        lat, lon = np.asarray(m.latEdge), np.asarray(m.lonEdge)
        east = np.stack([-np.sin(lon), np.cos(lon), np.zeros_like(lon)], -1)
        north = np.stack([-np.sin(lat) * np.cos(lon),
                          -np.sin(lat) * np.sin(lon), np.cos(lat)], -1)
        nvec = np.cos(ang)[:, None] * east + np.sin(ang)[:, None] * north
        P = np.stack([m.xEdge, m.yEdge, m.zEdge], -1)
        V = np.cross([0.0, 0.0, 1.0], P)   # zonal solid body
        u = jnp.asarray(np.sum(V * nvec, -1))
        vx, vy, vz, zon, mer = reconstruct(md, jnp.asarray(coeffs), u)
        zon_true = np.cos(np.asarray(m.latCell))
        err = np.abs(np.asarray(zon) - zon_true).max()
        assert err < 0.02                     # 2nd-order at 642 cells
        assert np.abs(np.asarray(mer)).max() < 0.02

    def test_multilevel(self, hex_mesh_small):
        m = hex_mesh_small
        coeffs = jnp.asarray(build_reconstruct_coeffs(m))
        md = to_device(m)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((m.nEdges, 4)))
        vx, vy, vz, zon, mer = reconstruct(md, coeffs, u)
        assert vx.shape == (m.nCells, 4)
        for k in range(4):
            vxk, *_ = reconstruct(md, coeffs, u[:, k])
            assert np.allclose(np.asarray(vx[:, k]), np.asarray(vxk))


class TestSpline:
    def test_reproduces_cubic_between_nodes(self):
        x = jnp.linspace(0.0, 1.0, 12)
        y = 3 * x ** 2 - x        # a spline with natural BCs fits quadratics
        y2 = cubic_spline_coefficients(x, y)
        xe = jnp.linspace(0.05, 0.95, 37)
        ye = interpolate_cubic_spline(x, y, y2, xe)
        assert np.abs(np.asarray(ye - (3 * xe ** 2 - xe))).max() < 5e-3

    def test_exact_at_nodes(self):
        x = jnp.asarray(np.sort(np.random.default_rng(1).uniform(0, 10, 9)))
        y = jnp.sin(x)
        y2 = cubic_spline_coefficients(x, y)
        ye = interpolate_cubic_spline(x, y, y2, x[1:-1])
        assert np.allclose(np.asarray(ye), np.asarray(y[1:-1]), atol=1e-12)

    def test_batched(self):
        x = jnp.linspace(0.0, 1.0, 8)
        y = jnp.stack([x ** 2, jnp.sin(x)], axis=0)
        y2 = cubic_spline_coefficients(jnp.broadcast_to(x, y.shape), y)
        assert y2.shape == y.shape


class TestGeometry:
    def test_sphere_distance_quarter(self):
        d = geo.sphere_distance(0.0, 0.0, 0.0, jnp.pi / 2, radius=2.0)
        assert abs(float(d) - jnp.pi) < 1e-12

    def test_triangle_area_octant(self):
        p1 = jnp.array([1.0, 0.0, 0.0])
        p2 = jnp.array([0.0, 1.0, 0.0])
        p3 = jnp.array([0.0, 0.0, 1.0])
        a = geo.triangle_signed_area_sphere(p1, p2, p3)
        assert abs(float(a) - jnp.pi / 2) < 1e-12

    def test_wachspress_partition_of_unity(self):
        hexv = np.stack([np.cos(np.linspace(0, 2 * np.pi, 7)[:-1]),
                         np.sin(np.linspace(0, 2 * np.pi, 7)[:-1])], -1)
        w = geo.wachspress_coordinates(jnp.asarray(hexv),
                                       jnp.array([0.1, 0.2]))
        assert abs(float(jnp.sum(w)) - 1.0) < 1e-12
        # linear precision: sum w_i v_i = p
        p = jnp.sum(w[:, None] * hexv, axis=0)
        assert np.allclose(np.asarray(p), [0.1, 0.2], atol=1e-12)

    def test_point_walk(self, sphere_mesh_small):
        m = sphere_mesh_small
        target = 123
        p = np.array([m.xCell[target], m.yCell[target], m.zCell[target]])
        found = geo.point_in_cell_walk(m, p, start_cell=0)
        assert found == target


class TestMatrix:
    def test_tridiagonal_vs_dense(self):
        rng = np.random.default_rng(2)
        n = 9
        a = rng.uniform(0.1, 0.5, n)
        b = rng.uniform(2.0, 3.0, n)
        c = rng.uniform(0.1, 0.5, n)
        d = rng.standard_normal(n)
        A = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
        x_ref = np.linalg.solve(A, d)
        x = tridiagonal_solve(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(c), jnp.asarray(d))
        assert np.allclose(np.asarray(x), x_ref, atol=1e-12)

    def test_rotation(self):
        R = rotation_about_axis_3d(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        v = R @ jnp.array([1.0, 0.0, 0.0])
        assert np.allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-12)
