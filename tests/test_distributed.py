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


@pytest.mark.parametrize("n_parts", [2,
                                     pytest.param(4, marks=pytest.mark.slow),
                                     pytest.param(8, marks=pytest.mark.slow)])
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


class TestNeighborExchangeSchedules:
    """Neighbor-schedule exchange properties (ref: per-neighbor
    irecv/pack/isend, mpas_dmpar.F:5263-5301; layer-restricted exchanges,
    mpas_atm_time_integration.F:792,845)."""

    def _smesh(self, mesh, n_parts=4, depth=4):
        part = sfc_partition(mesh, n_parts)
        return build_sharded_mesh(mesh, part, halo_depth=depth)

    def test_acoustic_traffic_reduction(self, sphere_mesh_medium):
        """Layer-1 cell exchange (the acoustic-loop refresh) must move
        <= 1/4 the slots of the full-depth exchange, and the full-depth
        neighbor schedule must move fewer slots than the padded all-pairs
        all_to_all schedule."""
        sm = self._smesh(sphere_mesh_medium)
        full = sm.halo_depth
        v1 = sm.cell_nx[1].volume
        vfull = sm.cell_nx[full].volume
        assert v1 > 0 and vfull > v1
        assert v1 <= vfull / 3.0       # one ring out of `full` rings
        # round 1 moved P*P*S padded slots per acoustic exchange (all_to_all
        # to every pair); the layer-1 schedule must cut that by >= 4x
        a2a_volume = sm.cell_xch.send_idx.shape[0] ** 2 \
            * sm.cell_xch.msg_size
        assert v1 <= a2a_volume / 4.0
        assert vfull < a2a_volume

    def test_rounds_are_partial_permutations(self, sphere_mesh_small):
        sm = self._smesh(sphere_mesh_small)
        for nx in list(sm.cell_nx.values()) + list(sm.edge_nx.values()):
            for perm in nx.perms:
                srcs = [q for q, _ in perm]
                dsts = [p for _, p in perm]
                assert len(set(srcs)) == len(srcs)
                assert len(set(dsts)) == len(dsts)

    def test_neighbor_exchange_matches_all_to_all(self, sphere_mesh_small):
        """Both exchange implementations must produce identical owned+halo
        values for a full-depth refresh of a global field."""
        from mpas_tpu.parallel.layout import ShardedMesh
        from mpas_tpu.parallel.runner import (AXIS, halo_exchange,
                                              neighbor_halo_exchange,
                                              scatter_field, shard_leaves)
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        mesh = sphere_mesh_small
        sm = self._smesh(mesh, n_parts=4)
        rng = np.random.default_rng(7)
        gfield = rng.standard_normal((mesh.nCells, 3))
        stacked = jnp.asarray(scatter_field(sm, gfield, "cell"))
        # corrupt halo slots so the exchange has to do the work
        corrupted = jnp.where(
            jnp.asarray(sm.owned_cell_mask)[..., None] > 0, stacked, -99.0)
        dmesh = device_mesh(4)

        def _run_a2a(x_st, xch_st):
            return halo_exchange(shard_leaves(xch_st),
                                 shard_leaves(x_st))[None]

        def _run_nx(x_st, nx_st):
            return neighbor_halo_exchange(shard_leaves(nx_st),
                                          shard_leaves(x_st))[None]

        spec = P(AXIS)
        a2a = jax.jit(shard_map(
            _run_a2a, mesh=dmesh,
            in_specs=(spec, jax.tree.map(lambda _: spec, sm.cell_xch)),
            out_specs=spec))(corrupted, jax.tree.map(jnp.asarray,
                                                     sm.cell_xch))
        nxd = sm.cell_nx[sm.halo_depth]
        nx = jax.jit(shard_map(
            _run_nx, mesh=dmesh,
            in_specs=(spec, jax.tree.map(lambda _: spec, nxd)),
            out_specs=spec))(corrupted, jax.tree.map(jnp.asarray, nxd))
        # compare on live slots (dead pad slots may hold garbage)
        live = np.asarray(sm.cell_global) >= 0
        assert np.array_equal(np.asarray(a2a)[live], np.asarray(nx)[live])
