"""Distributed (multi-device) land-ice stepping via shard_map.

The land-ice forward core is halo-light by construction: one FE step's
stencil is the SIA velocity (surface-slope gradient at edges + TRiSK
tangential reconstruct, depth-2 in cells) feeding a divergence at owned
cells (depth-1 in edges); the thermal column solve and calving are
shard-local (SURVEY §5.7). The reference exchanges thickness/temperature
once per timestep before the velocity solve
(ref: mpas_li_time_integration_fe.F halo-update group on
thickness/temperature ahead of li_velocity_solve) — here that is one
fused full-depth cell exchange at step entry; everything downstream runs
on the halo'd copy and owners are gathered at the end.

Scope: the SIA velocity solver and the fo/centered advection branches
(the reference default dome/Halfar configuration). The FO Stokes solve is
a globally coupled CG system and the IR advection carries cross-entity
departure stencils — both are later sharding milestones, matching the
reference's own practice of running the external Stokes solve on a
separate (Albany) partition.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mpas_tpu.cores.landice.config import LiConfig
from mpas_tpu.cores.landice.core import LiGrid, LiState, fe_step
from mpas_tpu.parallel.layout import ShardedMesh, build_sharded_mesh
from mpas_tpu.parallel.runner import (AXIS, ShardExchange, scatter_field,
                                      shard_leaves)

LANDICE_HALO_DEPTH = 3

_CELL_STATE = ("thickness", "temperature", "calvingFlux", "waterFrac",
               "basalMeltRate")
_EDGE_STATE = ("normalVelocity",)


@struct.dataclass
class ShardedLandice:
    grid: LiGrid                # every array leaf stacked (P, ...)
    smesh: ShardedMesh


def shard_li_grid(grid: LiGrid, cfg: LiConfig, part,
                  halo_depth: int = LANDICE_HALO_DEPTH) -> ShardedLandice:
    smesh = build_sharded_mesh(grid.mesh, part, halo_depth=halo_depth)
    n_parts = smesh.n_parts
    bed = scatter_field(smesh, np.asarray(grid.bedTopography), "cell")
    tile = lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                      (n_parts,) + np.asarray(a).shape)
    fo_geom = None
    if cfg.config_velocity_solver == "FO":
        # Distributed Krylov structure: per-shard LSQ-gradient geometry
        # rebuilt from the local mesh (owned+closed-stencil rows match
        # the global build exactly), halo import before each operator
        # apply, globally-psum'd inner products — the same decomposition
        # the reference's external Albany solve uses over its own
        # partition (Interface_velocity_solver.cpp extruded-grid blocks).
        from mpas_tpu.cores.landice.fo_stokes import build_fo_geom
        per_shard = [build_fo_geom(
            jax.tree.map(lambda a, p=p: np.asarray(a)[p], smesh.mesh))
            for p in range(n_parts)]
        fo_geom = jax.tree.map(lambda *xs: jnp.stack(xs), *per_shard)
    local = LiGrid(mesh=smesh.mesh,
                   bedTopography=jnp.asarray(bed),
                   layerInterfaceSigma=tile(grid.layerInterfaceSigma),
                   layerSigmaFraction=tile(grid.layerSigmaFraction),
                   fo_geom=fo_geom)
    return ShardedLandice(grid=local, smesh=smesh)


def shard_li_state(sli: ShardedLandice, state: LiState) -> LiState:
    kw = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            kw[f.name] = None
            continue
        kind = "edge" if f.name in _EDGE_STATE else "cell"
        kw[f.name] = jnp.asarray(
            scatter_field(sli.smesh, np.asarray(v), kind))
    return LiState(**kw)


def make_run_steps_li(sli: ShardedLandice, cfg: LiConfig, dmesh):
    """Jitted distributed runner:
    (grid_st, smesh_st, state_st, n_steps) -> state_st."""
    spec = P(AXIS)

    def _run(grid_st, smesh_st, state_st, n_steps, dt):
        grid_l = jax.tree.map(lambda a: a.reshape(a.shape[1:]), grid_st)
        smesh_l = shard_leaves(smesh_st)
        state_l = shard_leaves(state_st)
        xch = ShardExchange(smesh_l.cell_nx, smesh_l.edge_nx,
                            sli.smesh.halo_depth)

        def refresh(s: LiState) -> LiState:
            # one fused full-depth cell exchange per step (the FE step's
            # entire halo need; calvingFlux/normalVelocity are pure
            # owned-cell diagnostics and are never read through the halo)
            return s.replace(thickness=xch.cell(s.thickness),
                             temperature=xch.cell(s.temperature))

        def body(s, _):
            return fe_step(grid_l, cfg, refresh(s), dt, xch=xch,
                           owned=smesh_l.owned_cell_mask), None

        if cfg.config_thermal_solver == "enthalpy" \
                and state_l.waterFrac is None:
            state_l = state_l.replace(
                waterFrac=jnp.zeros_like(state_l.temperature),
                basalMeltRate=jnp.zeros_like(state_l.thickness))
        final, _ = jax.lax.scan(body, state_l, None, length=n_steps)
        return jax.tree.map(lambda a: a[None], final)

    def run(grid_st, smesh_st, state_st, n_steps):
        dt = jnp.asarray(cfg.config_dt,
                         dtype=jnp.asarray(state_st.thickness).dtype)
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
