"""Incremental-remapping sea-ice transport.

Parity model: mpas_seaice_advection_incremental_remap.F correctness
properties — conservation, uniform-field preservation (free-stream),
monotonicity from the limited reconstruction, lower diffusion than upwind.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.remap import (advect_incremental_remap,
                                         _departure_triangles)
from mpas_tpu.cores.seaice.advection import advect_upwind
from mpas_tpu.cores.seaice.state import make_grid, zero_state
from mpas_tpu.mesh.planar import box_hex_mesh


@pytest.fixture(scope="module")
def setup():
    mesh = box_hex_mesh(16, 16, 10000.0)
    cfg = SeaiceConfig(config_n_categories=1,
                       config_advection_type="incremental_remap")
    grid = make_grid(mesh)
    return mesh, cfg, grid


def _state_with(mesh, cfg, a_field, u=0.2, v=0.0):
    st = zero_state(mesh, cfg.config_n_categories)
    a = jnp.asarray(a_field)[:, None]
    st = st.replace(
        iceAreaCategory=a,
        iceVolumeCategory=a * 1.5,
        snowVolumeCategory=a * 0.1,
        surfaceTemperature=jnp.full_like(a, -5.0),
        uVelocity=jnp.full((mesh.nVertices,), u),
        vVelocity=jnp.full((mesh.nVertices,), v))
    return st


def test_departure_flux_uniform_velocity(setup):
    """Uniform u: summed triangle flux area per edge = u.n dv dt exactly."""
    mesh, cfg, grid = setup
    u0, v0 = 0.3, -0.2
    dt = 1800.0
    uu = jnp.full((mesh.nVertices,), u0)
    vv = jnp.full((mesh.nVertices,), v0)
    fa, qx, qy = _departure_triangles(grid, uu, vv, dt)
    un = u0 * np.cos(np.asarray(mesh.angleEdge)) \
        + v0 * np.sin(np.asarray(mesh.angleEdge))
    expect = un * np.asarray(mesh.dvEdge) * dt
    open_e = np.asarray(mesh.boundaryEdge) <= 0
    got = np.asarray(jnp.sum(fa, axis=1))
    np.testing.assert_allclose(got[open_e], expect[open_e], rtol=1e-10)


def test_uniform_field_free_stream(setup):
    """A uniform tracer field stays uniform away from the walls."""
    mesh, cfg, grid = setup
    a0 = np.full(mesh.nCells, 0.8)
    st = _state_with(mesh, cfg, a0, u=0.25, v=0.1)
    out = advect_incremental_remap(grid, cfg, st, dt=1800.0)
    # interior cells (no boundary edge) remain exactly uniform
    be = np.asarray(mesh.boundaryEdge) > 0
    bnd_cell = np.zeros(mesh.nCells, dtype=bool)
    coe = np.asarray(mesh.cellsOnEdge)
    bnd_cell[coe[be].ravel()] = True
    a1 = np.asarray(out.iceAreaCategory[:, 0])
    np.testing.assert_allclose(a1[~bnd_cell], 0.8, rtol=1e-12)
    h1 = np.asarray(out.iceVolumeCategory[:, 0])[~bnd_cell] / a1[~bnd_cell]
    np.testing.assert_allclose(h1, 1.5, rtol=1e-12)


def test_conservation(setup):
    """Total a*areaCell and volume*areaCell conserved (closed walls)."""
    mesh, cfg, grid = setup
    rng = np.random.default_rng(0)
    xc = np.asarray(mesh.xCell)
    yc = np.asarray(mesh.yCell)
    a0 = 0.3 + 0.3 * np.exp(
        -((xc - xc.mean()) ** 2 + (yc - yc.mean()) ** 2) / (3e4) ** 2)
    del rng
    st = _state_with(mesh, cfg, a0, u=0.3, v=0.15)
    area = np.asarray(mesh.areaCell)
    m0 = float(jnp.sum(st.iceAreaCategory[:, 0] * mesh.areaCell))
    v0 = float(jnp.sum(st.iceVolumeCategory[:, 0] * mesh.areaCell))
    out = st
    for _ in range(20):
        out = advect_incremental_remap(grid, cfg, out, dt=1800.0)
    m1 = float(jnp.sum(out.iceAreaCategory[:, 0] * mesh.areaCell))
    v1 = float(jnp.sum(out.iceVolumeCategory[:, 0] * mesh.areaCell))
    del area
    assert abs(m1 - m0) / m0 < 1e-10
    assert abs(v1 - v0) / v0 < 1e-10


def test_less_diffusive_than_upwind(setup):
    """After advecting a bump, IR keeps a sharper peak than upwind."""
    mesh, cfg, grid = setup
    xc = np.asarray(mesh.xCell)
    yc = np.asarray(mesh.yCell)
    a0 = 0.1 + 0.7 * np.exp(
        -((xc - 0.35 * xc.max()) ** 2 + (yc - 0.5 * yc.max()) ** 2)
        / (2.5e4) ** 2)
    st = _state_with(mesh, cfg, a0, u=0.5, v=0.0)
    o_ir = st
    o_up = st
    for _ in range(30):
        o_ir = advect_incremental_remap(grid, cfg, o_ir, dt=1800.0)
        o_up = advect_upwind(grid, cfg, o_up, dt=1800.0)
    pk_ir = float(jnp.max(o_ir.iceAreaCategory))
    pk_up = float(jnp.max(o_up.iceAreaCategory))
    assert pk_ir > pk_up + 0.02
    # and monotone-ish: no large overshoot above the initial max
    assert pk_ir <= a0.max() + 1e-6


def test_enthalpy_tracers_ride_volume(setup):
    """Layer enthalpies advect with volume and stay bounded."""
    mesh, cfg, grid = setup
    from mpas_tpu.cores.seaice import thermo_vertical as tv
    cfg2 = SeaiceConfig(config_n_categories=1, config_thermo_type="bl99",
                        config_advection_type="incremental_remap")
    xc = np.asarray(mesh.xCell)
    a0 = 0.2 + 0.5 * (xc < xc.mean())
    st = _state_with(mesh, cfg2, a0, u=0.4, v=0.0)
    q_i, q_s = tv.init_enthalpy(cfg2, mesh.nCells, 1, nilyr=5,
                                T_init=-8.0)
    st = st.replace(iceEnthalpy=q_i, snowEnthalpy=q_s)
    out = st
    for _ in range(10):
        out = advect_incremental_remap(grid, cfg2, out, dt=1800.0)
    qi = np.asarray(out.iceEnthalpy)
    assert np.all(np.isfinite(qi))
    # enthalpy density stays within the initial range where ice exists
    vi = np.asarray(out.iceVolumeCategory)
    sel = vi[..., None] > 1e-6
    q0 = np.asarray(q_i)
    assert qi[sel[..., 0].nonzero()[0]].min() >= q0.min() * 1.05
