"""Distributed (multi-device) sea-ice stepping via shard_map.

The EVP elastic subcycle is the sea-ice core's communication-stress path
(ref: per-subcycle uVelocity/vVelocity exchanges inside
seaice_run_velocity_solver, mpas_seaice_velocity_solver.F:2326-2485):
here they become depth-2 vertex-field ppermutes fired from the exchange
hook inside solve_velocities (velocity.py), mirroring the ocean
barotropic 'subcycleFields' choreography. Transport + column physics
consume the per-step full-depth cell-field refresh at step entry.

Both stress-divergence schemes shard: the weak scheme's geometry scatters
as plain cell/vertex fields; the variational corner tensors are rebuilt
per shard from the local mesh (see shard_seaice_grid), matching the
reference's block-local variational init.
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

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.core import seaice_timestep
from mpas_tpu.cores.seaice.state import (SeaiceForcing, SeaiceGrid,
                                         SeaiceState)
from mpas_tpu.parallel.layout import ShardedMesh, build_sharded_mesh
from mpas_tpu.parallel.runner import (AXIS, ShardExchange, scatter_field,
                                      shard_leaves)

SEAICE_HALO_DEPTH = 3


@struct.dataclass
class ShardedSeaice:
    grid: SeaiceGrid
    smesh: ShardedMesh


_CELL_STATE = ("iceAreaCategory", "iceVolumeCategory",
               "snowVolumeCategory", "surfaceTemperature",
               "stress11", "stress22", "stress12", "iceEnthalpy",
               "snowEnthalpy", "pondArea", "pondDepth", "pondLid",
               "levelIceArea", "levelIceVolume", "iceAge",
               "firstYearArea", "brineHeight", "algaeIce", "nitrateIce",
               "silicateIce", "snowGrainRadius", "snowDensity",
               "iceSalinity")
_VERTEX_STATE = ("uVelocity", "vVelocity")
_VERTEX_FORCING = ("sshGradientU", "sshGradientV")


def shard_seaice_grid(grid: SeaiceGrid, part,
                      halo_depth: int = SEAICE_HALO_DEPTH,
                      variational_basis: str = "wachspress"
                      ) -> ShardedSeaice:
    smesh = build_sharded_mesh(grid.mesh, part, halo_depth=halo_depth)

    def sc(x, kind):
        return scatter_field(smesh, np.asarray(x), kind)

    var = None
    if grid.variational is not None:
        # The variational basis tensors are a pure per-cell function of
        # local geometry (build_variational_coeffs loops cells over their
        # own vertex polygons), so each shard rebuilds them from its own
        # padded local mesh: values on owned+halo cells/vertices match the
        # global build exactly; dead-slot polygons are degenerate and get
        # NaN-sanitized (their contributions are masked by valid_on_v /
        # zeroed edgeSign weights downstream). Mirrors the reference,
        # which also builds the variational integrals per block after
        # decomposition (seaice_init_velocity_solver_variational runs on
        # the block-local mesh).
        from mpas_tpu.cores.seaice.variational import (
            build_variational_coeffs)
        per_shard = []
        for p in range(smesh.n_parts):
            mesh_p = jax.tree.map(lambda a, p=p: np.asarray(a)[p],
                                  smesh.mesh)
            import warnings
            with np.errstate(all="ignore"), warnings.catch_warnings():
                # dead-slot polygons are degenerate by construction
                warnings.simplefilter("ignore", RuntimeWarning)
                vc = build_variational_coeffs(mesh_p,
                                              basis=variational_basis)
            vc = jax.tree.map(
                lambda a: np.nan_to_num(np.asarray(a), nan=0.0,
                                        posinf=0.0, neginf=0.0), vc)
            per_shard.append(vc)
        var = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                           *per_shard)

    local = SeaiceGrid(
        mesh=smesh.mesh,
        normalPolygonE=sc(grid.normalPolygonE, "cell"),
        normalPolygonN=sc(grid.normalPolygonN, "cell"),
        normalTriangleE=sc(grid.normalTriangleE, "vertex"),
        normalTriangleN=sc(grid.normalTriangleN, "vertex"),
        tanLatCellOverR=sc(grid.tanLatCellOverR, "cell"),
        tanLatVertexOverR=sc(grid.tanLatVertexOverR, "vertex"),
        interiorVertex=sc(grid.interiorVertex, "vertex"),
        variational=var,
        # global scalar, replicated (the reference's dmpar_min result)
        dvEdgeMin=None if grid.dvEdgeMin is None else jnp.broadcast_to(
            jnp.asarray(grid.dvEdgeMin), (smesh.n_parts,)))
    return ShardedSeaice(grid=local, smesh=smesh)


def _shard_tree(smesh, obj, kinds_cell, kinds_vertex):
    kw = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if v is None:
            kw[f.name] = None
            continue
        kind = "vertex" if f.name in kinds_vertex else "cell"
        kw[f.name] = jnp.asarray(scatter_field(smesh, np.asarray(v), kind))
    return type(obj)(**kw)


def shard_seaice_state(ssi: ShardedSeaice, state: SeaiceState) -> SeaiceState:
    return _shard_tree(ssi.smesh, state, _CELL_STATE, _VERTEX_STATE)


def shard_seaice_forcing(ssi: ShardedSeaice,
                         forcing: SeaiceForcing) -> SeaiceForcing:
    return _shard_tree(ssi.smesh, forcing, (), _VERTEX_FORCING)


def make_run_steps_seaice(ssi: ShardedSeaice, cfg: SeaiceConfig, dmesh):
    """Jitted distributed runner: (grid_st, smesh_st, state_st,
    forcing_st, n_steps) -> state_st."""
    spec = P(AXIS)

    def _run(grid_st, smesh_st, state_st, forcing_st, n_steps, dt):
        grid_l = jax.tree.map(lambda a: a.reshape(a.shape[1:]), grid_st)
        smesh_l = shard_leaves(smesh_st)
        state_l = shard_leaves(state_st)
        forcing_l = shard_leaves(forcing_st)
        xch = ShardExchange(smesh_l.cell_nx, smesh_l.edge_nx,
                            ssi.smesh.halo_depth,
                            vertex_nx=smesh_l.vertex_nx)

        def refresh(s: SeaiceState) -> SeaiceState:
            kw = {}
            for f in dataclasses.fields(s):
                v = getattr(s, f.name)
                if v is None:
                    kw[f.name] = None
                elif f.name in _VERTEX_STATE:
                    kw[f.name] = xch.vertex(v)
                else:
                    kw[f.name] = xch.cell(v)
            return SeaiceState(**kw)

        def body(s, _):
            s = refresh(s)
            s, _d = seaice_timestep(grid_l, cfg, s, forcing_l, dt, xch=xch)
            return s, None

        final, _ = jax.lax.scan(body, state_l, None, length=n_steps)
        return jax.tree.map(lambda a: a[None], final)

    def run(grid_st, smesh_st, state_st, forcing_st, n_steps):
        dt = jnp.asarray(cfg.config_dt,
                         dtype=jnp.asarray(state_st.uVelocity).dtype)
        fn = shard_map(
            functools.partial(_run, n_steps=n_steps, dt=dt),
            mesh=dmesh,
            in_specs=(jax.tree.map(lambda _: spec, grid_st),
                      jax.tree.map(lambda _: spec, smesh_st),
                      jax.tree.map(lambda _: spec, state_st),
                      jax.tree.map(lambda _: spec, forcing_st)),
            out_specs=jax.tree.map(lambda _: spec, state_st),
            check_vma=False)
        return fn(grid_st, smesh_st, state_st, forcing_st)

    return jax.jit(run, static_argnums=(4,))
