"""Distributed (multi-device) ocean stepping via shard_map.

The split-explicit integrator is the reference's communication-stress path:
per barotropic subcycle it reuses a fused, depth-restricted exchange group
on ssh + normalBarotropicVelocity (ref: mpas_ocn_exch_group_reuse usage,
mpas_ocn_time_integration_split.F:771) and a full 'finalBtrFields' group
after subcycling (:1282-1290). Here those become static neighbor-schedule
ppermutes fired from the exchange hooks inside split_step (core.py):
depth-2 ssh/ubtr refresh inside the lax.scan subcycle body, full-depth
refreshes elsewhere. Columns stay shard-local (the vertical rides the lane
dimension) exactly as in the atm/sw sharded cores (SURVEY.md §5.7-5.8).

Decomposition invariance (the compass decomp_test analogue) is enforced by
tests/test_ocean_distributed.py: 1-shard vs N-shard trajectories of the
baroclinic channel must agree to near-roundoff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mpas_tpu.cores.ocean.core import OcnConfig, OcnGrid, OcnState, \
    ocn_timestep
from mpas_tpu.parallel.layout import ShardedMesh, build_sharded_mesh
from mpas_tpu.parallel.runner import (AXIS, ShardExchange, scatter_field,
                                      shard_leaves)

# full tendency stencil radius (ref halo depth: config_num_halos=3,
# core_ocean/Registry.xml:153; +1 covers the TRiSK fperp double-ring)
OCN_HALO_DEPTH = 4


@struct.dataclass
class ShardedOcn:
    grid: OcnGrid          # stacked (P, ...) local grids
    smesh: ShardedMesh


def shard_ocn_grid(grid: OcnGrid, part, halo_depth: int = OCN_HALO_DEPTH
                   ) -> ShardedOcn:
    """Per-shard local OcnGrids from a global one (host-side, once)."""
    smesh = build_sharded_mesh(grid.mesh, part, halo_depth=halo_depth)

    def sc(x, kind):
        return scatter_field(smesh, np.asarray(x), kind)

    bd = sc(grid.bottomDepth, "cell")
    rt = sc(grid.restingThickness, "cell")
    local = OcnGrid(
        mesh=smesh.mesh,
        # dead padded slots: benign positive depths/thicknesses so the
        # ssh/thickness algebra on them stays finite (they are never read
        # by owned stencils and never gathered back)
        restingThickness=np.where(rt == 0.0, 1.0, rt),
        bottomDepth=np.where(bd == 0.0, 1.0, bd),
        maxLevelCell=sc(grid.maxLevelCell, "cell"),
        nz=grid.nz,
        cellMask=(sc(grid.cellMask, "cell")
                  if grid.cellMask is not None else None),
        edgeMask=(sc(grid.edgeMask, "edge")
                  if grid.edgeMask is not None else None),
        surfacePressure=(sc(grid.surfacePressure, "cell")
                         if grid.surfacePressure is not None else None),
    )
    return ShardedOcn(grid=local, smesh=smesh)


def shard_ocn_state(socn: ShardedOcn, state: OcnState) -> OcnState:
    sm = socn.smesh

    def c(x):
        return jnp.asarray(scatter_field(sm, np.asarray(x), "cell"))

    def e(x):
        return jnp.asarray(scatter_field(sm, np.asarray(x), "edge"))

    h = np.asarray(scatter_field(sm, np.asarray(state.layerThickness),
                                 "cell"))
    return OcnState(
        u=e(state.u),
        layerThickness=jnp.asarray(np.where(h == 0.0, 1.0, h)),
        tracers=c(state.tracers),
        ubtr=e(state.ubtr if state.ubtr is not None
               else np.zeros(np.asarray(state.u).shape[0])),
        lowFreqDivergence=(c(state.lowFreqDivergence)
                           if state.lowFreqDivergence is not None else None),
        highFreqThickness=(c(state.highFreqThickness)
                           if state.highFreqThickness is not None else None),
    )


def make_run_steps_ocn(socn: ShardedOcn, cfg: OcnConfig, dmesh):
    """Jitted distributed runner: (grid_st, smesh_st, state_st, n_steps) ->
    state_st. Exchange choreography: full-depth prognostic refresh at each
    step entry (the reference's start-of-step exchanges,
    mpas_ocn_time_integration_split.F:214-268), then the split/RK4 hook
    exchanges inside the integrator."""
    spec = P(AXIS)

    def _run(grid_st, smesh_st, state_st, n_steps, dt):
        grid_l = jax.tree.map(lambda a: a.reshape(a.shape[1:]), grid_st)
        smesh_l = shard_leaves(smesh_st)
        state_l = shard_leaves(state_st)
        xch = ShardExchange(smesh_l.cell_nx, smesh_l.edge_nx,
                            socn.smesh.halo_depth)

        def refresh(s: OcnState) -> OcnState:
            return OcnState(
                u=xch.edge(s.u),
                layerThickness=xch.cell(s.layerThickness),
                tracers=xch.cell(s.tracers),
                ubtr=xch.edge(s.ubtr),
                lowFreqDivergence=(xch.cell(s.lowFreqDivergence)
                                   if s.lowFreqDivergence is not None
                                   else None),
                highFreqThickness=(xch.cell(s.highFreqThickness)
                                   if s.highFreqThickness is not None
                                   else None))

        def body(s, _):
            s = refresh(s)
            return ocn_timestep(grid_l, cfg, s, dt, xch=xch), None

        final, _ = jax.lax.scan(body, state_l, None, length=n_steps)
        return jax.tree.map(lambda a: a[None], final)

    def run(grid_st, smesh_st, state_st, n_steps):
        dt = jnp.asarray(cfg.config_dt,
                         dtype=jnp.asarray(state_st.layerThickness).dtype)
        fn = shard_map(
            functools.partial(_run, n_steps=n_steps, dt=dt),
            mesh=dmesh,
            in_specs=(jax.tree.map(lambda _: spec, grid_st),
                      jax.tree.map(lambda _: spec, smesh_st),
                      jax.tree.map(lambda _: spec, state_st)),
            out_specs=jax.tree.map(lambda _: spec, state_st),
            check_vma=False)
        return fn(grid_st, smesh_st, state_st)

    return jax.jit(run, static_argnums=(3,))
