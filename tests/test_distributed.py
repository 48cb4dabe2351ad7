"""Distributed-layer correctness: decomposition invariance + reductions.

The analogue of the reference's compass decomp_test (4-proc vs 8-proc output
comparison; ref: SURVEY.md §4: decomp_test/config_driver.xml) and the
test-core halo exchange correctness test (mpas_test_core_halo_exch.F), run
on a virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.mesh import to_device
from mpas_tpu.cores.sw import test_cases as tc
from mpas_tpu.cores.sw.config import SWConfig
from mpas_tpu.cores.sw.distributed import SW_HALO_DEPTH, make_run_steps
from mpas_tpu.cores.sw.state import SWState
from mpas_tpu.cores.sw.time_integration import run_steps
from mpas_tpu.parallel.layout import build_sharded_mesh
from mpas_tpu.parallel.partition import (partition_stats, sfc_partition)
from mpas_tpu.parallel.runner import (device_mesh, gather_field,
                                      scatter_field)


def _distributed_run(mesh, state, h_s, cfg, n_parts, n_steps):
    part = sfc_partition(mesh, n_parts)
    sm = build_sharded_mesh(mesh, part, halo_depth=SW_HALO_DEPTH)
    dmesh = device_mesh(n_parts)
    st = SWState(u=jnp.asarray(scatter_field(sm, state.u, "edge")),
                 h=jnp.asarray(scatter_field(sm, state.h, "cell")),
                 tracers=jnp.asarray(scatter_field(sm, state.tracers, "cell")))
    hs = jnp.asarray(scatter_field(sm, h_s, "cell"))
    smd = jax.tree.map(jnp.asarray, sm)
    out = make_run_steps(sm, cfg, dmesh)(smd, st, hs, n_steps)
    return (gather_field(sm, out.h, "cell", mesh.nCells),
            gather_field(sm, out.u, "edge", mesh.nEdges),
            gather_field(sm, out.tracers, "cell", mesh.nCells))


@pytest.fixture(scope="module")
def tc5_setup(sphere_mesh_small):
    mesh, state, h_s = tc.test_case_5(sphere_mesh_small)
    cfg = SWConfig(config_dt=900.0, config_test_case=5)
    ref = run_steps(to_device(mesh), cfg,
                    jax.tree.map(jnp.asarray, state), jnp.asarray(h_s), 5)
    return mesh, state, h_s, cfg, ref


@pytest.mark.parametrize("n_parts", [2, 4, 8])
def test_decomp_invariance(tc5_setup, n_parts):
    """N-shard run matches the single-device run on owned entities."""
    mesh, state, h_s, cfg, ref = tc5_setup
    h_g, u_g, tr_g = _distributed_run(mesh, state, h_s, cfg, n_parts, 5)
    h_scale = np.max(np.abs(np.asarray(ref.h)))
    u_scale = np.max(np.abs(np.asarray(ref.u)))
    assert np.max(np.abs(h_g - np.asarray(ref.h))) / h_scale < 1e-13
    assert np.max(np.abs(u_g - np.asarray(ref.u))) / u_scale < 1e-12
    assert np.max(np.abs(tr_g - np.asarray(ref.tracers))) < 1e-12


def test_partition_balance(sphere_mesh_small):
    part = sfc_partition(sphere_mesh_small, 8)
    stats = partition_stats(sphere_mesh_small, part)
    assert stats["imbalance"] < 1.05
    # SFC partitions should cut far fewer edges than random assignment
    rng = np.random.default_rng(0)
    rand = rng.integers(0, 8, sphere_mesh_small.nCells)
    rand_stats = partition_stats(sphere_mesh_small, rand)
    assert stats["cut_edges"] < 0.5 * rand_stats["cut_edges"]


def test_weighted_partition(sphere_mesh_small):
    """Cell weights shift the balance (variable-resolution load balancing)."""
    w = np.ones(sphere_mesh_small.nCells)
    w[: sphere_mesh_small.nCells // 4] = 4.0
    part = sfc_partition(sphere_mesh_small, 4, weights=w)
    loads = np.bincount(part, weights=w)
    assert loads.max() / loads.mean() < 1.35


def test_halo_exchange_unit(sphere_mesh_small):
    """Exchange alone reproduces owner values in halos (halo-exch test core
    parity; ref: mpas_test_core_halo_exch.F)."""
    import functools
    from jax.sharding import PartitionSpec as P
    from mpas_tpu.parallel.runner import AXIS, halo_exchange, shard_leaves
    shard_map = jax.shard_map

    mesh = sphere_mesh_small
    n_parts = 4
    part = sfc_partition(mesh, n_parts)
    sm = build_sharded_mesh(mesh, part, halo_depth=2)
    dmesh = device_mesh(n_parts)

    # global cell field = global index; scatter only owned values
    glob = np.arange(mesh.nCells, dtype=np.float64)
    stacked = scatter_field(sm, glob, "cell")
    # corrupt halos
    mask = np.asarray(sm.owned_cell_mask)
    corrupted = np.where(mask > 0, stacked, -1.0)

    def fn(xch_st, f_st):
        xch = shard_leaves(xch_st)
        f = shard_leaves(f_st)
        return halo_exchange(xch, f)[None]

    out = jax.jit(shard_map(
        fn, mesh=dmesh,
        in_specs=(jax.tree.map(lambda _: P(AXIS), sm.cell_xch), P(AXIS)),
        out_specs=P(AXIS)))(jax.tree.map(jnp.asarray, sm.cell_xch),
                            jnp.asarray(corrupted))
    out = np.asarray(out)
    slots = np.asarray(sm.cell_global)
    valid = slots >= 0
    assert np.array_equal(out[valid], glob[slots[valid]])
