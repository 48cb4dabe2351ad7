"""Multi-host (DCN) hierarchy: two-level partition + host-aware mesh.

The virtual analogue of a 2-host x 4-chip pod slice on the 8-device CPU
mesh (SURVEY.md §5.8 hierarchical aggregation; real DCN is untestable in
this environment — the abstraction and the traffic placement are)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.sphere import icosahedral_mesh
from mpas_tpu.parallel.partition import (hierarchical_sfc_partition,
                                         inter_host_edge_cut, sfc_partition)
from mpas_tpu.parallel.runner import device_mesh_hierarchical


@pytest.fixture(scope="module")
def mesh():
    return icosahedral_mesh(16, lloyd_iters=2)     # 2562 cells


def test_partition_is_balanced_and_complete(mesh):
    part = hierarchical_sfc_partition(mesh, n_hosts=2, chips_per_host=4)
    assert part.min() == 0 and part.max() == 7
    counts = np.bincount(part, minlength=8)
    assert counts.max() <= 1.2 * counts.min()

    # level-1 consistency: a device's cells live on its host's level-1 part
    host = sfc_partition(mesh, 2)
    np.testing.assert_array_equal(part // 4, host)


def test_hierarchical_placement_cuts_dcn_traffic(mesh):
    """The point of the hierarchy: with the same 8 shards, host-clustered
    placement must cross the host boundary (DCN) with far fewer mesh edges
    than an unclustered assignment of the same shards to hosts."""
    part_h = hierarchical_sfc_partition(mesh, 2, 4)
    dcn_h, total_h = inter_host_edge_cut(mesh, part_h, 2, 4)
    # adversarial placement: interleave the 8 SFC shards across hosts
    part_flat = sfc_partition(mesh, 8)
    interleave = np.array([0, 4, 1, 5, 2, 6, 3, 7])  # shard -> device
    part_bad = interleave[part_flat]
    dcn_b, total_b = inter_host_edge_cut(mesh, part_bad, 2, 4)
    assert dcn_h < 0.5 * dcn_b, (dcn_h, dcn_b)
    assert dcn_h < total_h                      # most traffic stays on ICI


@pytest.mark.slow
def test_sw_decomp_invariance_on_hierarchical_mesh(mesh):
    """The full distributed SW step over the host-major device mesh with
    the two-level partition reproduces the single-device trajectory."""
    from mpas_tpu.cores.sw import test_cases as tc
    from mpas_tpu.cores.sw.config import SWConfig
    from mpas_tpu.cores.sw.distributed import SW_HALO_DEPTH, make_run_steps
    from mpas_tpu.cores.sw.state import SWState
    from mpas_tpu.cores.sw.time_integration import run_steps
    from mpas_tpu.mesh.mesh import to_device
    from mpas_tpu.parallel.layout import build_sharded_mesh
    from mpas_tpu.parallel.runner import gather_field, scatter_field

    mesh_s, state, h_s = tc.test_case_5(mesh)
    cfg = SWConfig(config_dt=600.0, config_test_case=5)
    ref = run_steps(to_device(mesh_s), cfg,
                    jax.tree.map(jnp.asarray, state),
                    jnp.asarray(np.asarray(h_s)), 10)

    part = hierarchical_sfc_partition(mesh_s, 2, 4)
    sm = build_sharded_mesh(mesh_s, part, halo_depth=SW_HALO_DEPTH)
    dmesh = device_mesh_hierarchical(2, 4)
    st = SWState(u=jnp.asarray(scatter_field(sm, state.u, "edge")),
                 h=jnp.asarray(scatter_field(sm, state.h, "cell")),
                 tracers=jnp.asarray(scatter_field(sm, state.tracers,
                                                   "cell")))
    hs = jnp.asarray(scatter_field(sm, np.asarray(h_s), "cell"))
    smd = jax.tree.map(jnp.asarray, sm)
    out = make_run_steps(sm, cfg, dmesh)(smd, st, hs, 10)
    h_got = gather_field(sm, out.h, "cell", mesh_s.nCells)
    np.testing.assert_allclose(h_got, np.asarray(ref.h),
                               rtol=1e-9, atol=1e-9)
