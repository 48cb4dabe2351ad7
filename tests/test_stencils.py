"""TRiSK stencil operator tests (jitted path), vs analytic fields.

Parity model: the operator-level unit tests embedded in the reference
operators library (ref: mpas_geometry_utils.F:834+, mpas_vector_operations.F:901).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.mesh.mesh import to_device
from mpas_tpu.ops import stencils as st


def _frames(mesh):
    ang = np.asarray(mesh.angleEdge)
    lat, lon = np.asarray(mesh.latEdge), np.asarray(mesh.lonEdge)
    if mesh.on_sphere:
        east = np.stack([-np.sin(lon), np.cos(lon), np.zeros_like(lon)], -1)
        north = np.stack([-np.sin(lat) * np.cos(lon),
                          -np.sin(lat) * np.sin(lon), np.cos(lat)], -1)
    else:
        east = np.tile([1.0, 0.0, 0.0], (mesh.nEdges, 1))
        north = np.tile([0.0, 1.0, 0.0], (mesh.nEdges, 1))
    nvec = np.cos(ang)[:, None] * east + np.sin(ang)[:, None] * north
    tvec = -np.sin(ang)[:, None] * east + np.cos(ang)[:, None] * north
    return nvec, tvec


def test_divergence_theorem_discrete(sphere_mesh_small):
    """Area-integrated divergence of any edge field is exactly zero."""
    m = to_device(sphere_mesh_small)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(m.nEdges))
    div = jax.jit(st.edge_divergence, static_argnums=())(m, u)
    total = jnp.sum(div * m.areaCell)
    assert abs(float(total)) < 1e-10


def test_curl_theorem_discrete(sphere_mesh_small):
    """Area-integrated vorticity of any edge field is exactly zero (closed)."""
    m = to_device(sphere_mesh_small)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(m.nEdges))
    vort = st.edge_curl(m, u)
    total = jnp.sum(vort * m.areaTriangle)
    assert abs(float(total)) < 1e-10


def test_grad_of_constant_is_zero(sphere_mesh_small):
    m = to_device(sphere_mesh_small)
    g = st.cell_gradient_n(m, jnp.full((m.nCells,), 7.3))
    assert float(jnp.max(jnp.abs(g))) < 1e-12


def test_remap_constancy(sphere_mesh_small):
    """Kite remaps and edge means preserve constants exactly."""
    m = to_device(sphere_mesh_small)
    c = jnp.full((m.nCells,), 2.5)
    assert np.allclose(st.cell_to_vertex_kite(m, c), 2.5, atol=1e-12)
    assert np.allclose(st.cell_to_edge_mean(m, c), 2.5, atol=1e-12)
    v = jnp.full((m.nVertices,), -1.25)
    assert np.allclose(st.vertex_to_cell_kite(m, v), -1.25, atol=1e-12)
    assert np.allclose(st.vertex_to_edge_mean(m, v), -1.25, atol=1e-12)


def test_multilevel_fields(sphere_mesh_small):
    """Operators broadcast over trailing (vertical) dims identically."""
    m = to_device(sphere_mesh_small)
    rng = np.random.default_rng(2)
    u1 = rng.standard_normal(m.nEdges)
    u2 = rng.standard_normal(m.nEdges)
    stacked = jnp.stack([u1, u2], axis=-1)           # (nEdges, 2)
    for op in (st.edge_divergence, st.edge_curl, st.tangential_velocity,
               st.kinetic_energy_cell):
        a = op(m, stacked)
        b0 = op(m, jnp.asarray(u1))
        b1 = op(m, jnp.asarray(u2))
        assert np.allclose(a[..., 0], b0, atol=1e-12)
        assert np.allclose(a[..., 1], b1, atol=1e-12)


def test_ke_positive_and_consistent(sphere_mesh_small):
    """KE of uniform flow ~ 0.5*|V|^2 (TRiSK KE is exact on uniform grids
    only in the planar limit; on the sphere allow discretization error)."""
    m = to_device(sphere_mesh_small)
    nvec, _ = _frames(sphere_mesh_small)
    P = np.stack([sphere_mesh_small.xEdge, sphere_mesh_small.yEdge,
                  sphere_mesh_small.zEdge], -1)
    V = np.cross([0.0, 0.0, 1.0], P)
    u = jnp.asarray(np.sum(V * nvec, -1))
    ke = st.kinetic_energy_cell(m, u)
    z = np.asarray(sphere_mesh_small.zCell)
    ke_true = 0.5 * (1.0 - z * z)  # |W x p|^2/2 with W=z_hat
    err = np.abs(np.asarray(ke) - ke_true)
    assert err.max() < 0.05


def test_tangential_velocity_jit(hex_mesh_small):
    m = to_device(hex_mesh_small)
    nvec, tvec = _frames(hex_mesh_small)
    V = np.array([1.0, -2.0, 0.0])
    u = jnp.asarray(nvec @ V)
    v = jax.jit(st.tangential_velocity)(m, u)
    assert np.allclose(np.asarray(v), tvec @ V, atol=1e-12)
