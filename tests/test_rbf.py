"""RBF interpolation library tests.

Parity model: the reference validates RBF machinery through its consumers
(vector reconstruction of known flows) and polynomial-reproduction
properties (constant/linear augmentation reproduces constant/linear
fields exactly — ref mpas_rbf_interpolation.F design notes :44-106).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.ops import rbf


class TestKernel:
    def test_inverse_multiquadric(self):
        r2 = jnp.asarray([0.0, 1.0, 3.0])
        v, dvr, d2v = rbf.rbf_derivs(r2)
        assert np.allclose(np.asarray(v), [1.0, 1.0 / np.sqrt(2.0), 0.5])
        # finite-difference check of derivatives wrt r
        r = np.sqrt(np.asarray([0.5, 1.7]))
        eps = 1e-6
        for ri in r:
            f = lambda rr: 1.0 / np.sqrt(1.0 + rr * rr)
            d_num = (f(ri + eps) - f(ri - eps)) / (2 * eps)
            _, dvr_i, _ = rbf.rbf_derivs(jnp.asarray(ri * ri))
            assert abs(float(dvr_i) * ri - d_num) < 1e-6


class TestScalar2D:
    def test_linear_basis_reproduces_linear_field(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.standard_normal((12, 2)))
        f = 2.0 + 3.0 * pts[:, 0] - 1.5 * pts[:, 1]
        coeffs = rbf.loc_2d_scalar_lin_coeffs(pts, f, 1.0)
        for ep in (jnp.asarray([0.3, -0.2]), jnp.asarray([1.5, 2.0])):
            val, fx, fy, *_ = rbf.loc_2d_scalar_lin_eval_with_derivs(
                coeffs, ep, pts, 1.0)
            expect = 2.0 + 3.0 * float(ep[0]) - 1.5 * float(ep[1])
            assert abs(float(val) - expect) < 1e-8
            assert abs(float(fx) - 3.0) < 1e-6
            assert abs(float(fy) + 1.5) < 1e-6

    def test_const_basis_reproduces_constant(self):
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.standard_normal((9, 2)))
        f = jnp.full((9,), 4.25)
        coeffs = rbf.loc_2d_scalar_const_coeffs(pts, f, 0.7)
        val, fx, fy, *_ = rbf.loc_2d_scalar_const_eval_with_derivs(
            coeffs, jnp.asarray([0.1, 0.9]), pts, 0.7)
        assert abs(float(val) - 4.25) < 1e-8
        assert abs(float(fx)) < 1e-7 and abs(float(fy)) < 1e-7


class TestScalar3D:
    def test_dirichlet_interpolates_smooth_field(self):
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.uniform(-1, 1, (20, 3)))
        dest = jnp.asarray([0.05, -0.1, 0.0])
        c = rbf.func_3d_scalar_dir_coeffs(pts, dest, 1.0, basis="lin")
        f = lambda x: 1.0 + x[..., 0] - 2.0 * x[..., 1] + 0.5 * x[..., 2]
        val = float(jnp.sum(c * f(pts)))
        assert abs(val - float(f(dest))) < 1e-8    # linear reproduced

    def test_dirichlet_neumann_consistency(self):
        """For a linear field, Neumann coefficients driven by the exact
        normal derivative at interface points must reproduce the value."""
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-1, 1, (16, 3)))
        is_if = jnp.asarray([True] * 4 + [False] * 12)
        nrm = jnp.asarray(np.tile([0.0, 0.0, 1.0], (16, 1)))
        dest = jnp.asarray([0.0, 0.0, 0.2])
        grad = np.array([1.0, -2.0, 0.5])
        f = pts @ jnp.asarray(grad) + 3.0
        dfdn = jnp.full((16,), grad[2])            # n = z-hat
        cd, cn = rbf.func_3d_scalar_dir_neu_coeffs(pts, is_if, nrm, dest,
                                                   1.0, basis="lin")
        val_d = float(jnp.sum(cd * f))
        mixed = jnp.where(is_if, dfdn, f)
        val_n = float(jnp.sum(cn * mixed))
        expect = float(dest @ jnp.asarray(grad) + 3.0)
        assert abs(val_d - expect) < 1e-7
        assert abs(val_n - expect) < 5e-2          # RBF-accurate, not exact
        # degenerate case: no interface points -> both coefficient sets
        # must coincide exactly (the Neumann matrix reduces to Dirichlet)
        no_if = jnp.zeros((16,), bool)
        cd2, cn2 = rbf.func_3d_scalar_dir_neu_coeffs(pts, no_if, nrm, dest,
                                                     1.0, basis="lin")
        assert np.allclose(np.asarray(cd2), np.asarray(cn2), atol=1e-12)


class TestVectorReconstruction:
    def test_constant_vector_exact(self, sphere_mesh_small):
        """A uniform 3-D vector field sampled as edge normals reconstructs
        exactly at cell centers (constant augmentation)."""
        mesh = sphere_mesh_small
        nrm, _, _ = rbf.interp_initialize(mesh)
        v = np.array([0.3, -1.1, 0.7])
        u = jnp.asarray(nrm @ v)
        coeffs = rbf.reconstruct_init(mesh)
        ux, uy, uz, _, _ = rbf.reconstruct(mesh, coeffs, u)
        # tangent-plane projection: only the tangential part is recoverable
        xc = np.stack([np.asarray(mesh.xCell), np.asarray(mesh.yCell),
                       np.asarray(mesh.zCell)], -1)
        vert = xc / np.linalg.norm(xc, axis=-1, keepdims=True)
        v_t = v[None, :] - vert * (vert @ v)[:, None]
        got = np.stack([np.asarray(ux), np.asarray(uy), np.asarray(uz)], -1)
        err = np.linalg.norm(got - v_t, axis=-1)
        assert err.max() < 5e-2 * np.linalg.norm(v)

    def test_solid_body_rotation_zonal(self, sphere_mesh_small):
        """Edge-normal samples of a solid-body zonal flow reconstruct the
        zonal component (ref: the standard mpas_reconstruct validation)."""
        mesh = sphere_mesh_small
        nrm, _, _ = rbf.interp_initialize(mesh)
        late = np.asarray(mesh.latEdge)
        lone = np.asarray(mesh.lonEdge)
        u0 = 10.0
        # zonal unit vector at edges
        ez = np.stack([-np.sin(lone), np.cos(lone),
                       np.zeros_like(lone)], -1)
        vfield = u0 * np.cos(late)[:, None] * ez
        u = jnp.asarray(np.sum(vfield * nrm, -1))
        coeffs = rbf.reconstruct_init(mesh)
        _, _, _, uzonal, umerid = rbf.reconstruct(mesh, coeffs, u)
        latc = np.asarray(mesh.latCell)
        expect = u0 * np.cos(latc)
        err = np.abs(np.asarray(uzonal) - expect)
        assert err.max() < 0.05 * u0
        assert np.abs(np.asarray(umerid)).max() < 0.05 * u0

    def test_multilevel_field(self, sphere_mesh_small):
        mesh = sphere_mesh_small
        coeffs = rbf.reconstruct_init(mesh)
        rng = np.random.default_rng(4)
        u = jnp.asarray(rng.standard_normal((mesh.nEdges, 4)))
        ux, uy, uz, uzon, umer = rbf.reconstruct(mesh, coeffs, u)
        assert ux.shape == (mesh.nCells, 4)
        assert np.isfinite(np.asarray(uzon)).all()
