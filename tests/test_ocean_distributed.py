"""Ocean sharded-step correctness: decomposition invariance of the
split-explicit integrator (the compass decomp_test genre for the
baroclinic channel, ref: SURVEY.md §4; exchange choreography per
mpas_ocn_time_integration_split.F:771,1282-1290)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.ocean.core import OcnConfig, OcnState, run_steps
from mpas_tpu.cores.ocean.distributed import (OCN_HALO_DEPTH,
                                              make_run_steps_ocn,
                                              shard_ocn_grid,
                                              shard_ocn_state)
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.parallel.partition import sfc_partition
from mpas_tpu.parallel.runner import device_mesh, gather_field
from mpas_tpu.cores.ocean import core as ocn_core


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(8, 26, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    state = OcnState(u=state.u, layerThickness=state.layerThickness,
                     tracers=state.tracers,
                     ubtr=np.zeros(m.nEdges, dtype=np.asarray(state.u).dtype))
    return m, grid, state


def _distributed_run(mesh, grid, state, cfg, n_parts, n_steps):
    part = sfc_partition(mesh, n_parts)
    socn = shard_ocn_grid(grid, part)
    dmesh = device_mesh(n_parts)
    st = shard_ocn_state(socn, state)
    grid_d = jax.tree.map(jnp.asarray, socn.grid)
    smesh_d = jax.tree.map(jnp.asarray, socn.smesh)
    out = make_run_steps_ocn(socn, cfg, dmesh)(grid_d, smesh_d, st, n_steps)
    return {
        "u": gather_field(socn.smesh, out.u, "edge", mesh.nEdges),
        "h": gather_field(socn.smesh, out.layerThickness, "cell",
                          mesh.nCells),
        "tr": gather_field(socn.smesh, out.tracers, "cell", mesh.nCells),
    }


@pytest.mark.slow
def test_single_shard_bitwise(channel):
    """The sharded machinery with 1 part must reproduce the single-device
    trajectory bitwise (the reference's MPI-off dmpar stub path,
    mpas_dmpar.F:5257 — same code, no communication)."""
    mesh, grid, state = channel
    cfg = OcnConfig(config_dt=60.0, config_time_integrator="split_explicit")
    ref = run_steps(jax.tree.map(jnp.asarray, grid),
                    cfg, jax.tree.map(jnp.asarray, state), 2)
    got = _distributed_run(mesh, grid, state, cfg, 1, 2)
    assert np.array_equal(got["u"], np.asarray(ref.u))
    assert np.array_equal(got["h"], np.asarray(ref.layerThickness))


# Tolerances: decomposition reorders local arrays, and XLA's reduction
# tiling on the different local shapes reassociates sums (~1e-13/step in
# f64, verified: 1-shard is bitwise); the near-CFL barotropic subcycles
# amplify that to ~5e-10 abs over 12 steps. The compass decomp_test genre
# is likewise tolerance-based, not bitwise.
@pytest.mark.parametrize("integrator",
                         [pytest.param("split_explicit",
                                       marks=pytest.mark.slow), "RK4"])
@pytest.mark.parametrize("n_parts", [4])
def test_decomp_invariance(channel, integrator, n_parts):
    mesh, grid, state = channel
    cfg = OcnConfig(config_dt=60.0, config_time_integrator=integrator)
    ref = run_steps(jax.tree.map(jnp.asarray, grid),
                    cfg, jax.tree.map(jnp.asarray, state), 12)
    got = _distributed_run(mesh, grid, state, cfg, n_parts, 12)
    np.testing.assert_allclose(got["u"], np.asarray(ref.u),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(got["h"], np.asarray(ref.layerThickness),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(got["tr"], np.asarray(ref.tracers),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_decomp_invariance_8(channel):
    mesh, grid, state = channel
    cfg = OcnConfig(config_dt=60.0,
                    config_time_integrator="split_explicit")
    ref = run_steps(jax.tree.map(jnp.asarray, grid),
                    cfg, jax.tree.map(jnp.asarray, state), 24)
    got = _distributed_run(mesh, grid, state, cfg, 8, 24)
    np.testing.assert_allclose(got["h"], np.asarray(ref.layerThickness),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(got["u"], np.asarray(ref.u),
                               rtol=1e-5, atol=1e-7)


def test_subcycle_exchange_is_depth_restricted(channel):
    """The barotropic subcycle must exchange the restricted depth-2
    schedule, not the full halo (ref: haloLayers-restricted subcycleFields,
    mpas_ocn_time_integration_split.F:771) — asserted by message-size
    accounting like tests/test_distributed.py traffic test."""
    mesh, grid, state = channel
    part = sfc_partition(mesh, 4)
    socn = shard_ocn_grid(grid, part)
    sm = socn.smesh
    # depth-2 schedules must move strictly less than the full schedule
    assert 2 in sm.cell_nx and 2 in sm.edge_nx
    assert sm.cell_nx[2].volume < sm.cell_nx[OCN_HALO_DEPTH].volume
    assert sm.edge_nx[2].volume < sm.edge_nx[OCN_HALO_DEPTH].volume
