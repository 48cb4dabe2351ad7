"""Distributed (multi-device) shallow-water stepping via shard_map.

Parallel strategy re-designed from the reference's per-stage halo exchanges
of diagnostics + tendencies (ref: sw_rk4 halo calls,
mpas_sw_time_integration.F:131-137,153-157): instead of exchanging five
diagnostic/tendency fields per RK stage, each shard exchanges only the three
*prognostic* fields once per stage and recomputes diagnostics redundantly in
a deep halo (halo_depth >= 4 covers the full tendency stencil radius). On
TPU this trades cheap redundant VPU compute in the halo ring for a 5x
reduction in exchange count — exchanges ride one fused all_to_all over ICI.
Owned entities are bitwise identical to the single-shard computation
(enforced by tests/test_distributed.py decomp-invariance, the analogue of
the reference's compass decomp_test, SURVEY.md §4).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from mpas_tpu.cores.sw.config import SWConfig
from mpas_tpu.cores.sw.state import SWState
from mpas_tpu.cores.sw.time_integration import (_RK_SUBSTEP, _RK_WEIGHTS,
                                                _stage)
from mpas_tpu.parallel.layout import ShardedMesh
from mpas_tpu.parallel.runner import (AXIS, neighbor_halo_exchange,
                                      shard_leaves)

SW_HALO_DEPTH = 4  # tendency stencil radius of the TRiSK SW scheme


def _exchange_state(smesh_l, state: SWState) -> SWState:
    cell_nx = smesh_l.cell_nx[SW_HALO_DEPTH]
    edge_nx = smesh_l.edge_nx[SW_HALO_DEPTH]
    return SWState(
        u=neighbor_halo_exchange(edge_nx, state.u),
        h=neighbor_halo_exchange(cell_nx, state.h),
        tracers=neighbor_halo_exchange(cell_nx, state.tracers))


def rk4_step_local(smesh_l: ShardedMesh, cfg: SWConfig, state: SWState,
                   h_s, dt) -> SWState:
    """One RK4 step on a shard; same math as the single-device rk4_step with
    one prognostic exchange per stage."""
    mesh = smesh_l.mesh
    state = _exchange_state(smesh_l, state)
    u0, h0 = state.u, state.h
    ct0 = state.tracers * h0[:, None]

    u_acc, h_acc, ct_acc = u0, h0, ct0
    provis = state
    for stage in range(4):
        tend_u, tend_h, tend_ct = _stage(mesh, cfg, provis, dt, h_s)

        u_acc = u_acc + dt * _RK_WEIGHTS[stage] * tend_u
        h_acc = h_acc + dt * _RK_WEIGHTS[stage] * tend_h
        ct_acc = ct_acc + dt * _RK_WEIGHTS[stage] * tend_ct

        if stage < 3:
            w = dt * _RK_SUBSTEP[stage]
            hp = h0 + w * tend_h
            provis = SWState(u=u0 + w * tend_u, h=hp,
                             tracers=(ct0 + w * tend_ct) / hp[:, None])
            provis = _exchange_state(smesh_l, provis)

    # dead padded cell slots keep h == 0; avoid 0/0 in the decouple
    h_safe = jnp.where(h_acc == 0, 1.0, h_acc)
    return SWState(u=u_acc, h=h_acc, tracers=ct_acc / h_safe[:, None])


def make_run_steps(smesh: ShardedMesh, cfg: SWConfig, dmesh):
    """Build a jitted (state_stacked, h_s_stacked, n_steps) -> state_stacked
    runner over the given jax device mesh."""
    spec_all = P(AXIS)

    def _run(smesh_st, state_st, hs_st, n_steps, dt):
        smesh_l = shard_leaves(smesh_st)
        state_l = shard_leaves(state_st)
        hs_l = shard_leaves(hs_st)

        def body(s, _):
            return rk4_step_local(smesh_l, cfg, s, hs_l, dt), None

        final, _ = jax.lax.scan(body, state_l, None, length=n_steps)
        return jax.tree.map(lambda a: a[None], final)

    def run(smesh_st, state_st, hs_st, n_steps):
        dt = jnp.asarray(cfg.config_dt, dtype=jnp.asarray(hs_st).dtype)
        fn = shard_map(
            functools.partial(_run, n_steps=n_steps, dt=dt),
            mesh=dmesh,
            in_specs=(jax.tree.map(lambda _: spec_all, smesh_st),
                      jax.tree.map(lambda _: spec_all, state_st),
                      spec_all),
            out_specs=jax.tree.map(lambda _: spec_all, state_st),
            check_vma=False)
        return fn(smesh_st, state_st, hs_st)

    return jax.jit(run, static_argnums=(3,))
