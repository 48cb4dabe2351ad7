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


class TestVectorFreeSlip:
    """Free-slip (Dirichlet-normal / tangent-Neumann) vector variants
    (ref: mpas_rbf_interp_func_3D_vec_const_tan_neu_comp_coeffs :1189-1236,
    planar :1286-1352, system :1571-1617)."""

    def _setup(self, rng):
        # interior source points above a wall at y=0, plus wall points
        interior = np.array([[0.3, 0.8], [1.1, 0.6], [0.7, 1.3],
                             [1.6, 1.0], [0.1, 1.5]])
        wall = np.array([[0.4, 0.0], [1.2, 0.0]])
        ang = rng.uniform(0, 2 * np.pi, size=len(interior))
        uv_int = np.stack([np.cos(ang), np.sin(ang)], -1)
        pts, uvs, tang, nidx = [], [], [], []
        for p, u in zip(interior, uv_int):
            pts.append(p); uvs.append(u); tang.append(False); nidx.append(0)
        for p in wall:
            i_n = len(pts)
            pts.append(p); uvs.append([0.0, 1.0])      # wall normal (y)
            tang.append(False); nidx.append(i_n)
            pts.append(p); uvs.append([1.0, 0.0])      # wall tangent (x)
            tang.append(True); nidx.append(i_n)
        return (np.asarray(pts), np.asarray(uvs, dtype=float),
                np.asarray(tang), np.asarray(nidx))

    def _reference_coeffs(self, pts, tang, nidx, uvs, dest, alpha):
        """Literal numpy transcription of the reference routine
        (:1189-1236 + :1571-1617) as the parity oracle."""
        n, d = pts.shape
        M = np.zeros((n + d, n + d))
        rhs = np.zeros((n + d, d))
        for j in range(n):
            if tang[j]:
                for i in range(n):
                    r2 = np.sum((pts[i] - pts[j]) ** 2) / alpha ** 2
                    nv = uvs[nidx[j]]
                    ndx = np.sum(nv * (pts[j] - pts[i]))
                    v = 1.0 / np.sqrt(1.0 + r2)
                    dphi_over_r = -(v ** 3) / alpha ** 2
                    M[i, j] = dphi_over_r * ndx * np.dot(uvs[i], uvs[j])
            else:
                for i in range(n):
                    r2 = np.sum((pts[i] - pts[j]) ** 2) / alpha ** 2
                    M[i, j] = np.dot(uvs[i], uvs[j]) / np.sqrt(1.0 + r2)
        for i in range(n):
            M[n:, i] = uvs[i]
            if not tang[i]:
                M[i, n:] = uvs[i]
        for k in range(d):
            rhs[n + k, k] = 1.0
        for j in range(n):
            r2 = np.sum((dest - pts[j]) ** 2) / alpha ** 2
            rhs[j, :] = uvs[j] / np.sqrt(1.0 + r2)
        return np.linalg.solve(M, rhs)[:n]

    def test_matches_reference_transcription(self):
        rng = np.random.default_rng(7)
        pts, uvs, tang, nidx = self._setup(rng)
        dest = np.array([0.9, 0.4])
        c = rbf.func_3d_vec_const_tan_neu_coeffs(
            jnp.asarray(pts), jnp.asarray(tang), jnp.asarray(nidx),
            jnp.asarray(uvs), jnp.asarray(dest), alpha=0.8)
        c_ref = self._reference_coeffs(pts, tang, nidx, uvs, dest, 0.8)
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-10)

    def test_normal_constant_exact(self):
        """A constant field orthogonal to every tangent direction is in the
        scheme's exact reproduction space (the constant-basis block)."""
        rng = np.random.default_rng(7)
        pts, uvs, tang, nidx = self._setup(rng)
        u0 = np.array([0.0, 0.9])   # wall-normal constant
        vals = np.where(tang, 0.0, uvs @ u0)
        dest = np.array([0.9, 0.4])
        c = rbf.func_3d_vec_const_tan_neu_coeffs(
            jnp.asarray(pts), jnp.asarray(tang), jnp.asarray(nidx),
            jnp.asarray(uvs), jnp.asarray(dest), alpha=0.8)
        got = np.asarray(c).T @ vals
        np.testing.assert_allclose(got, u0, atol=1e-9)

    def test_reduces_to_dirichlet_without_tangents(self):
        rng = np.random.default_rng(8)
        pts = rng.uniform(0, 2, size=(7, 2))
        ang = rng.uniform(0, 2 * np.pi, size=7)
        uvs = np.stack([np.cos(ang), np.sin(ang)], -1)
        tang = np.zeros(7, bool)
        nidx = np.zeros(7, np.int64)
        dest = np.array([1.0, 1.0])
        c_fs = rbf.func_3d_vec_const_tan_neu_coeffs(
            jnp.asarray(pts), jnp.asarray(tang), jnp.asarray(nidx),
            jnp.asarray(uvs), jnp.asarray(dest), alpha=0.9)
        c_dir = rbf.func_3d_vector_const_dir_coeffs(
            jnp.asarray(pts), jnp.asarray(uvs), jnp.asarray(dest),
            alpha=0.9)
        np.testing.assert_allclose(np.asarray(c_fs), np.asarray(c_dir),
                                   atol=1e-12)

    def test_free_slip_shear_reconstruction(self):
        """Free-slip shear u=(a*y, 0): wall data are u.n=0 and du_t/dn=a;
        the reconstruction must recover the shear sign and magnitude to
        leading order at an interior point."""
        rng = np.random.default_rng(7)
        pts, uvs, tang, nidx = self._setup(rng)
        a = 2.0
        field = lambda p: np.array([a * p[1], 0.0])
        vals = np.empty(len(pts))
        for j in range(len(pts)):
            if tang[j]:
                vals[j] = a * uvs[j][0]     # du/dn . u_t = a
            else:
                vals[j] = field(pts[j]) @ uvs[j]
        dest = np.array([0.9, 0.5])
        c = rbf.func_3d_vec_const_tan_neu_coeffs(
            jnp.asarray(pts), jnp.asarray(tang), jnp.asarray(nidx),
            jnp.asarray(uvs), jnp.asarray(dest), alpha=0.8)
        got = np.asarray(c).T @ vals
        expect = field(dest)
        assert abs(got[0] - expect[0]) < 0.35 * abs(expect[0])
        assert abs(got[1]) < 0.35 * abs(expect[0])

    def test_planar_variant_matches_2d(self):
        """The planar variant in a tilted embedding equals the 2-D solve
        mapped through the basis (ref :1286-1352 projection chain)."""
        rng = np.random.default_rng(9)
        pts2, uvs2, tang, nidx = self._setup(rng)
        b1 = np.array([1.0, 0.0, 1.0]) / np.sqrt(2.0)
        b2 = np.array([0.0, 1.0, 0.0])
        basis = np.stack([b1, b2])
        dest2 = np.array([0.9, 0.4])
        c2 = rbf.func_3d_vec_const_tan_neu_coeffs(
            jnp.asarray(pts2), jnp.asarray(tang), jnp.asarray(nidx),
            jnp.asarray(uvs2), jnp.asarray(dest2), alpha=0.8)
        c3 = rbf.func_3d_plane_vec_const_tan_neu_coeffs(
            jnp.asarray(pts2 @ basis), jnp.asarray(tang),
            jnp.asarray(nidx), jnp.asarray(uvs2 @ basis),
            jnp.asarray(dest2 @ basis), jnp.asarray(basis), alpha=0.8)
        np.testing.assert_allclose(np.asarray(c3),
                                   np.asarray(c2) @ basis, atol=1e-10)
