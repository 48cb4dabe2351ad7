"""Lagrangian particle tracking (LIGHT equivalent).

Parity model: LIGHT behavior — particles follow the resolved flow; uniform
flow advects at flow speed; the cell search tracks the particle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.analysis.particles import ParticleTracker
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(16, 16, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=4)
    return (jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state))


def test_uniform_flow_advects_at_flow_speed(channel):
    grid, state = channel
    m = grid.mesh
    u0 = 0.5
    un = u0 * jnp.cos(m.angleEdge) * (1.0 - m.boundaryEdge)
    u = jnp.broadcast_to(un[:, None], state.u.shape)

    xs = np.asarray(m.xCell)[[40, 80, 120]]
    ys = np.asarray(m.yCell)[[40, 80, 120]]
    tr = ParticleTracker(m, xs, ys)
    dt = 1800.0
    x0 = np.asarray(tr.state.x).copy()
    for _ in range(20):
        tr.step(u, dt)
    dx = (np.asarray(tr.state.x) - x0) % m.x_period
    expect = u0 * dt * 20 % m.x_period
    # boundary-edge masking slightly reduces the reconstructed interior
    # speed near walls; interior particles track the flow closely
    assert np.allclose(dx, expect, rtol=0.1)
    # y unchanged under pure zonal flow
    assert np.allclose(np.asarray(tr.state.y), ys, atol=200.0)


def test_cell_tracking_follows_particle(channel):
    grid, state = channel
    m = grid.mesh
    un = 1.0 * jnp.cos(m.angleEdge) * (1.0 - m.boundaryEdge)
    u = jnp.broadcast_to(un[:, None], state.u.shape)
    i0 = 80
    tr = ParticleTracker(m, np.asarray(m.xCell)[[i0]],
                         np.asarray(m.yCell)[[i0]])
    assert int(tr.state.cell[0]) == i0
    for _ in range(30):
        tr.step(u, 1800.0)
    c = int(tr.state.cell[0])
    # containing cell center is within one spacing of the particle
    d = np.hypot((float(m.xCell[c]) - float(tr.state.x[0])
                  + 0.5 * m.x_period) % m.x_period - 0.5 * m.x_period,
                 float(m.yCell[c]) - float(tr.state.y[0]))
    assert d < 10000.0


def test_sampling_returns_containing_cell_value(channel):
    grid, state = channel
    m = grid.mesh
    tr = ParticleTracker(m, np.asarray(m.xCell)[[5, 50]],
                         np.asarray(m.yCell)[[5, 50]])
    f = jnp.arange(m.nCells, dtype=jnp.float64)
    out = np.asarray(tr.sample(f))
    assert out[0] == 5.0 and out[1] == 50.0


def test_sphere_solid_body_rotation():
    """LIGHT on the sphere (ref: 3-D cartesian positions + tangent-plane
    stepping): under solid-body rotation u = omega*R*cos(lat), particles
    advance in longitude at omega, hold latitude, and stay on the
    sphere."""
    from mpas_tpu.mesh.sphere import icosahedral_mesh
    mesh = icosahedral_mesh(8, lloyd_iters=1)
    m = jax.tree.map(jnp.asarray, mesh)
    R = m.sphere_radius
    omega = 1.0e-6                      # rad/s
    # normal velocity of zonal solid-body flow at edges
    u_zon = omega * R * jnp.cos(m.latEdge)
    un = u_zon * jnp.cos(m.angleEdge)
    u = jnp.broadcast_to(un[:, None], (m.nEdges, 3))

    cells = [10, 200, 400]
    xs = np.asarray(m.xCell)[cells]
    ys = np.asarray(m.yCell)[cells]
    zs = np.asarray(m.zCell)[cells]
    lat0 = np.arcsin(zs / R)
    lon0 = np.arctan2(ys, xs)
    tr = ParticleTracker(m, xs, ys, z0=zs)
    dt = 3600.0
    n = 24
    for _ in range(n):
        tr.step(u, dt)
    X = np.asarray(tr.state.x)
    Y = np.asarray(tr.state.y)
    Z = np.asarray(tr.state.z3)
    r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    assert np.allclose(r, R, rtol=1e-10)            # stays on the sphere
    lat1 = np.arcsin(Z / r)
    lon1 = np.arctan2(Y, X)
    dlon = (lon1 - lon0 + np.pi) % (2 * np.pi) - np.pi
    # interpolated speed on the coarse 642-cell mesh is within ~15%
    assert np.allclose(dlon, omega * dt * n, rtol=0.2)
    assert np.allclose(lat1, lat0, atol=0.03)


def test_fixed_z_level_mode(channel):
    """fixedZLevel vertical treatment: the sampled layer follows the
    prescribed depth through the thickness column."""
    grid, state = channel
    m = grid.mesh
    h = state.layerThickness                       # (nC, nz)
    htot = float(jnp.sum(h[0]))
    nz = h.shape[1]
    xs = np.asarray(m.xCell)[[50]]
    ys = np.asarray(m.yCell)[[50]]
    # depth in the middle of the bottom layer
    d_bot = htot * (nz - 0.5) / nz
    tr = ParticleTracker(m, xs, ys, vertical_mode="fixedZLevel",
                         depth=np.asarray([d_bot]))
    u = jnp.zeros((m.nEdges, nz))
    tr.step(u, 600.0, layer_thickness=h)
    assert int(tr.state.layer[0]) == nz - 1
    tr2 = ParticleTracker(m, xs, ys, vertical_mode="fixedZLevel",
                          depth=np.asarray([0.1 * htot / nz]))
    tr2.step(u, 600.0, layer_thickness=h)
    assert int(tr2.state.layer[0]) == 0


def test_isopycnal_mode(channel):
    """isopycnal treatment: the particle relocates to the layer whose
    potential density matches its target."""
    grid, state = channel
    m = grid.mesh
    nz = state.layerThickness.shape[1]
    # synthetic stable density profile, uniform in the horizontal
    rho_prof = 1025.0 + 0.5 * jnp.arange(nz)
    rho = jnp.broadcast_to(rho_prof, (m.nCells, nz))
    xs = np.asarray(m.xCell)[[60]]
    ys = np.asarray(m.yCell)[[60]]
    tgt = float(rho_prof[2])
    tr = ParticleTracker(m, xs, ys, vertical_mode="isopycnal",
                         target_rho=np.asarray([tgt]))
    tr.step(jnp.zeros((m.nEdges, nz)), 600.0,
            layer_thickness=state.layerThickness, density=rho)
    assert int(tr.state.layer[0]) == 2


def test_passive_float_mode(channel):
    """passiveFloat: the particle depth advects with the vertical
    velocity (upwelling shoals the particle)."""
    grid, state = channel
    m = grid.mesh
    nz = state.layerThickness.shape[1]
    htot = float(jnp.sum(state.layerThickness[0]))
    xs = np.asarray(m.xCell)[[70]]
    ys = np.asarray(m.yCell)[[70]]
    tr = ParticleTracker(m, xs, ys, vertical_mode="passiveFloat",
                         depth=np.asarray([0.6 * htot]))
    w_up = jnp.full((m.nCells, nz + 1), 1.0e-3)     # m/s upward
    d0 = float(tr.state.depth[0])
    tr.step(jnp.zeros((m.nEdges, nz)), 3600.0,
            layer_thickness=state.layerThickness, w_vert=w_up)
    assert float(tr.state.depth[0]) < d0
