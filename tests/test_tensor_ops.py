"""Tensor-operations library tests.

Mirrors the reference's in-file test harness
(src/operators/mpas_tensor_operations.F:787 mpas_test_tensor): analytic
velocity fields with known strain rates on a planar mesh, rotation
round-trips, and the divergence of a constant tensor vanishing on a
periodic mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import planar_hex_mesh
from mpas_tpu.ops import tensor as T

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def mesh():
    return planar_hex_mesh(10, 10, 1000.0)


@pytest.fixture(scope="module")
def bases(mesh):
    return T.edge_basis_vectors(mesh)


def _away_from_seam(mesh, margin=1.6e3):
    """Cells whose stencils do not cross the periodic seam (the analytic
    test fields are linear, hence not periodic; the reference harness
    uses bounded planes with boundary cells excluded instead)."""
    x = np.asarray(mesh.xCell)
    y = np.asarray(mesh.yCell)
    return ((x > margin) & (x < mesh.x_period - margin)
            & (y > margin) & (y < mesh.y_period - margin))


def _edge_velocities(mesh, bases, vfun):
    """Project an analytic planar velocity field onto edge normal and
    tangent directions. vfun(x, y) -> (vx, vy)."""
    en, et, _ = bases
    x = np.asarray(mesh.xEdge)
    y = np.asarray(mesh.yEdge)
    vx, vy = vfun(x, y)
    v = np.stack([vx, vy, np.zeros_like(vx)], -1)
    un = np.sum(v * en, -1)[:, None]      # nz = 1
    ut = np.sum(v * et, -1)[:, None]
    return jnp.asarray(un), jnp.asarray(ut)


class TestSym6:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((5, 3, 3))
        sym = 0.5 * (a + np.swapaxes(a, -1, -2))
        t6 = T.matrix_3x3_to_sym6(jnp.asarray(sym))
        back = T.sym6_to_3x3(t6)
        np.testing.assert_allclose(np.asarray(back), sym, atol=1e-14)

    def test_symmetrizes(self):
        a = jnp.asarray(np.arange(9.0).reshape(3, 3))
        t6 = T.matrix_3x3_to_sym6(a)
        # off-diagonals averaged (ref mpas_matrix_operations.F:278)
        assert float(t6[3]) == pytest.approx(0.5 * (1.0 + 3.0))
        assert float(t6[5]) == pytest.approx(0.5 * (2.0 + 6.0))


class TestStrainRate:
    def _strain(self, mesh, bases, vfun):
        en, et, _ = bases
        un, ut = _edge_velocities(mesh, bases, vfun)
        outer = T.outer_product_edge(un, ut, jnp.asarray(en),
                                     jnp.asarray(et))
        return np.asarray(T.strain_rate_r3_cell(mesh, outer))

    def test_linear_x(self, mesh, bases):
        """v = (x, 0): strain rate xx = 1, rest 0 (ref test 'linear_x')."""
        s = self._strain(mesh, bases, lambda x, y: (x, np.zeros_like(x)))
        interior = _away_from_seam(mesh)
        np.testing.assert_allclose(s[interior, 0, 0], 1.0, atol=1e-9)
        for comp in (1, 2, 3, 4, 5):
            np.testing.assert_allclose(s[interior, 0, comp], 0.0,
                                       atol=1e-9)

    def test_pure_shear(self, mesh, bases):
        """v = (y, x): strain xy = 1, diagonals 0."""
        s = self._strain(mesh, bases, lambda x, y: (y, x))
        interior = _away_from_seam(mesh)
        np.testing.assert_allclose(s[interior, 0, 3], 1.0, atol=1e-9)
        np.testing.assert_allclose(s[interior, 0, 0], 0.0, atol=1e-9)
        np.testing.assert_allclose(s[interior, 0, 1], 0.0, atol=1e-9)

    def test_solid_rotation_strain_free(self, mesh, bases):
        """v = (-y, x): rigid rotation has zero strain rate."""
        s = self._strain(mesh, bases, lambda x, y: (-y, x))
        interior = _away_from_seam(mesh)
        np.testing.assert_allclose(s[interior, 0], 0.0, atol=1e-9)


class TestTensorDivergence:
    def test_constant_tensor_divergence_free(self, mesh, bases):
        en, _, _ = bases
        t6 = jnp.broadcast_to(
            jnp.asarray([1.0, 2.0, 3.0, 0.5, 0.25, 0.125]),
            (mesh.nEdges, 1, 6))
        div = T.divergence_of_tensor_r3_cell(mesh, t6, jnp.asarray(en))
        interior = np.ones(mesh.nCells, bool)   # exact on a closed mesh
        np.testing.assert_allclose(np.asarray(div)[interior], 0.0,
                                   atol=1e-9)

    def test_linear_tensor_divergence(self, mesh, bases):
        """T = diag(x, 0, 0)*s: div T = (s, 0, 0) (constant)."""
        en, _, _ = bases
        scale = 1e-3
        x = jnp.asarray(np.asarray(mesh.xEdge))
        z = jnp.zeros_like(x)
        t6 = jnp.stack([scale * x, z, z, z, z, z], -1)[:, None, :]
        div = np.asarray(
            T.divergence_of_tensor_r3_cell(mesh, t6, jnp.asarray(en)))
        interior = _away_from_seam(mesh)
        np.testing.assert_allclose(div[interior, 0, 0], scale, rtol=1e-6)
        np.testing.assert_allclose(div[interior, 0, 1], 0.0, atol=1e-12)


class TestRotations:
    def test_edge_2d_roundtrip(self, mesh, bases):
        en, et, _ = bases
        rng = np.random.default_rng(1)
        t3 = jnp.asarray(rng.standard_normal((mesh.nEdges, 1, 3)))
        t6 = T.tensor_edge_2d_to_r3(t3, jnp.asarray(en), jnp.asarray(et))
        back = T.tensor_edge_r3_to_2d(t6, jnp.asarray(en),
                                      jnp.asarray(et))
        np.testing.assert_allclose(np.asarray(back), np.asarray(t3),
                                   atol=1e-12)

    def test_lonlat_roundtrip(self):
        rng = np.random.default_rng(2)
        lon = jnp.asarray(rng.uniform(0, 2 * np.pi, 7))
        lat = jnp.asarray(rng.uniform(-1.4, 1.4, 7))
        t3 = jnp.asarray(rng.standard_normal((7, 3)))
        t6 = T.tensor_lonlat_to_r3(t3, lon, lat)
        back = T.tensor_r3_to_lonlat(t6, lon, lat)
        np.testing.assert_allclose(np.asarray(back), np.asarray(t3),
                                   atol=1e-12)

    def test_lonlatr_roundtrip(self):
        rng = np.random.default_rng(3)
        lon = jnp.asarray(rng.uniform(0, 2 * np.pi, 4))
        lat = jnp.asarray(rng.uniform(-1.4, 1.4, 4))
        m = jnp.asarray(rng.standard_normal((4, 3, 3)))
        r3 = T.tensor_lonlatr_to_r3(m, lon, lat)
        back = T.tensor_r3_to_lonlatr(r3, lon, lat)
        np.testing.assert_allclose(np.asarray(back), np.asarray(m),
                                   atol=1e-12)

    def test_basis_orthonormal(self):
        z, m, v = T.zonal_meridional_vectors(jnp.asarray(0.7),
                                             jnp.asarray(0.3))
        for a in (z, m, v):
            assert float(jnp.linalg.norm(a)) == pytest.approx(1.0)
        assert float(jnp.dot(z, m)) == pytest.approx(0.0, abs=1e-14)
        np.testing.assert_allclose(np.asarray(jnp.cross(z, m)),
                                   np.asarray(v), atol=1e-14)
