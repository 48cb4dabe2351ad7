"""Distributed (multi-device) atmosphere stepping via shard_map.

The srk3 driver already exposes exchange hooks at exactly the reference's
halo-exchange points (ref: the ~15 mpas_dmpar_exch_halo_field calls per
dynamics substep, mpas_atm_time_integration.F:666-1288); here those hooks
become static neighbor-schedule ppermute halo refreshes over the device
mesh (parallel.layout.NeighborExchange), with acoustic-loop exchanges
restricted to halo layer 1 (ref: mpas_atm_time_integration.F:792,845).
Cell columns stay shard-local (the vertical rides the lane dimension), so
every exchange moves whole columns — the same decomposition the reference
uses (SURVEY.md §5.7).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.setup import AtmGrid, VerticalGrid
from mpas_tpu.cores.atmosphere.state import AtmDiag, AtmState
from mpas_tpu.cores.atmosphere.time_integration import (AtmCarry, init_carry,
                                                        run_steps_xch)
from mpas_tpu.parallel.layout import ShardedMesh, build_sharded_mesh
from mpas_tpu.parallel.runner import (AXIS, ShardExchange, scatter_field,
                                      shard_leaves)

ATM_HALO_DEPTH = 4

# kept name for in-module uses; the shared implementation lives in
# parallel.runner (also used by the ocean sharded step)
_ShardExchange = ShardExchange


@struct.dataclass
class ShardedAtm:
    grid: AtmGrid          # stacked (P, ...) local grids
    smesh: ShardedMesh


def shard_atm_grid(grid: AtmGrid, part, halo_depth: int = ATM_HALO_DEPTH
                   ) -> ShardedAtm:
    """Build per-shard local AtmGrids from a global one."""
    smesh = build_sharded_mesh(grid.mesh, part, halo_depth=halo_depth)
    Pn = smesh.n_parts
    cell_slots = np.asarray(smesh.cell_global)
    edge_slots = np.asarray(smesh.edge_global)

    # local g2l for remapping advCellsForEdge (edge rows -> cell columns)
    adv_local = np.zeros((Pn,) + (len(edge_slots[0]),)
                         + np.asarray(grid.advCellsForEdge).shape[1:],
                         dtype=np.int32)
    adv_mask = np.zeros(adv_local.shape, dtype=bool)
    advC = np.asarray(grid.advCellsForEdge)
    # masks for the factored-advection tensors (cell stencil columns and
    # per-side edge weights on missing-neighbor slots)
    have_factored = grid.d2_bmat is not None
    if have_factored:
        cocG = np.asarray(grid.mesh.cellsOnCell)
        coeG = np.asarray(grid.mesh.cellsOnEdge)
        nCl = cell_slots.shape[1]
        nEl = edge_slots.shape[1]
        d2_cell_mask = np.zeros((Pn, nCl, cocG.shape[1] + 1), dtype=bool)
        d2w_mask = np.zeros((Pn, nEl, 2), dtype=bool)
    for p in range(Pn):
        g2l = {int(g): i for i, g in enumerate(cell_slots[p]) if g >= 0}
        rows = edge_slots[p]
        sub = advC[np.maximum(rows, 0)]
        flat = sub.ravel()
        lf = np.fromiter((g2l.get(int(x), -1) for x in flat),
                         dtype=np.int64, count=flat.size).reshape(sub.shape)
        dead = (rows < 0)[:, None] | (lf < 0)
        adv_local[p] = np.where(dead, 0, lf)
        adv_mask[p] = dead
        if have_factored:
            crows = cell_slots[p]
            subc = cocG[np.maximum(crows, 0)]
            flatc = subc.ravel()
            lc = np.fromiter((g2l.get(int(x), -1) for x in flatc),
                             dtype=np.int64,
                             count=flatc.size).reshape(subc.shape)
            cmiss = (crows < 0)[:, None] | (lc < 0)
            d2_cell_mask[p] = np.concatenate(
                [(crows < 0)[:, None], cmiss], axis=1)
            for s in range(2):
                ce = coeG[np.maximum(rows, 0), s]
                le = np.fromiter((g2l.get(int(x), -1) for x in ce),
                                 dtype=np.int64, count=ce.size)
                d2w_mask[p, :, s] = (rows < 0) | (le < 0)

    def sc(x, kind):
        return scatter_field(smesh, np.asarray(x), kind)

    adv_coefs = sc(grid.adv_coefs, "edge")
    adv_coefs3 = sc(grid.adv_coefs_3rd, "edge")
    adv_coefs = np.where(adv_mask, 0.0, adv_coefs)
    adv_coefs3 = np.where(adv_mask, 0.0, adv_coefs3)
    if have_factored:
        d2_bmat_l = np.where(d2_cell_mask[:, :, None, :], 0.0,
                             sc(grid.d2_bmat, "cell"))
        d2w_l = np.where(d2w_mask[..., None], 0.0, sc(grid.d2w, "edge"))
    else:
        d2_bmat_l = None
        d2w_l = None

    local_grid = AtmGrid(
        mesh=smesh.mesh,
        vert=grid.vert,                       # 1-D vertical data: replicated
        zgrid=sc(grid.zgrid, "cell"), zz=sc(grid.zz, "cell"),
        zxu=sc(grid.zxu, "edge"), dss=sc(grid.dss, "cell"),
        # slot-major (mE, nC, K): shard the cell axis (axis 1)
        zb_cell=sc(np.asarray(grid.zb_cell).transpose(1, 0, 2),
                   "cell").transpose(0, 2, 1, 3),
        zb3_cell=sc(np.asarray(grid.zb3_cell).transpose(1, 0, 2),
                    "cell").transpose(0, 2, 1, 3),
        advCellsForEdge=adv_local, adv_coefs=adv_coefs,
        adv_coefs_3rd=adv_coefs3,
        d2_bmat=d2_bmat_l, d2w=d2w_l, adv_beta=grid.adv_beta,
        # edge-valued content on cell rows: row reorder only; dead slots
        # are killed by the masked edgeSignOnCell of the sharded mesh
        d2w_own=(sc(grid.d2w_own, "cell")
                 if grid.d2w_own is not None else None),
        d2w_opp=(sc(grid.d2w_opp, "cell")
                 if grid.d2w_opp is not None else None),
        adv_sside=(sc(grid.adv_sside, "cell")
                   if grid.adv_sside is not None else None),
        dv_cell=(sc(grid.dv_cell, "cell")
                 if grid.dv_cell is not None else None),
        defc_a=sc(grid.defc_a, "cell"), defc_b=sc(grid.defc_b, "cell"),
        recon_zonal=sc(grid.recon_zonal, "cell"),
        recon_merid=sc(grid.recon_merid, "cell"),
        rho_base=sc(grid.rho_base, "cell"),
        theta_base=sc(grid.theta_base, "cell"),
        rtheta_base=sc(grid.rtheta_base, "cell"),
        exner_base=sc(grid.exner_base, "cell"),
        pressure_base=sc(grid.pressure_base, "cell"),
        u_init=grid.u_init, v_init=grid.v_init,
        t_init=sc(grid.t_init, "cell"))
    # guard divisions on dead slots
    eb = np.asarray(local_grid.exner_base)
    local_grid = local_grid.replace(
        zz=np.where(np.asarray(local_grid.zz) == 0.0, 1.0,
                    np.asarray(local_grid.zz)),
        exner_base=np.where(eb == 0.0, 1.0, eb),
        rtheta_base=np.where(np.asarray(local_grid.rtheta_base) == 0.0, 1.0,
                             np.asarray(local_grid.rtheta_base)),
        rho_base=np.where(np.asarray(local_grid.rho_base) == 0.0, 1.0,
                          np.asarray(local_grid.rho_base)))
    return ShardedAtm(grid=local_grid, smesh=smesh)


def shard_atm_state(satm: ShardedAtm, state: AtmState, diag: AtmDiag):
    sm = satm.smesh

    def c(x):
        return jnp.asarray(scatter_field(sm, np.asarray(x), "cell"))

    def e(x):
        return jnp.asarray(scatter_field(sm, np.asarray(x), "edge"))

    st = AtmState(u=e(state.u), w=c(state.w), theta_m=c(state.theta_m),
                  rho_zz=np.where(np.asarray(scatter_field(
                      sm, np.asarray(state.rho_zz), "cell")) == 0.0, 1.0,
                      scatter_field(sm, np.asarray(state.rho_zz), "cell")),
                  scalars=c(state.scalars))
    st = st.replace(rho_zz=jnp.asarray(st.rho_zz))
    dg = AtmDiag(ru=e(diag.ru), rw=c(diag.rw), rho_p=c(diag.rho_p),
                 rtheta_p=c(diag.rtheta_p), exner=c(diag.exner),
                 pressure_p=c(diag.pressure_p), ruAvg=e(diag.ruAvg),
                 wwAvg=c(diag.wwAvg))
    # dead cells: keep exner/theta-safe values to avoid 0**x and 0/0
    exn = np.asarray(dg.exner)
    dg = dg.replace(exner=jnp.asarray(np.where(exn == 0.0, 1.0, exn)))
    thm = np.asarray(st.theta_m)
    st = st.replace(theta_m=jnp.asarray(np.where(thm == 0.0, 300.0, thm)))
    return st, dg


def make_run_steps_atm(satm: ShardedAtm, cfg: AtmConfig, dmesh):
    """Jitted distributed runner: (grid_st, carry_st, n_steps) -> carry_st."""
    spec = P(AXIS)

    def _squeeze_grid(grid_st):
        def f(path, a):
            names = {getattr(p, "name", "") for p in path}
            if names & {"vert", "u_init", "v_init"}:
                return a           # replicated: full shape inside shard_map
            return a.reshape(a.shape[1:])
        return jax.tree_util.tree_map_with_path(f, grid_st)

    def _run(grid_st, smesh_st, carry_st, n_steps, dt):
        grid_l = _squeeze_grid(grid_st)
        smesh_l = shard_leaves(smesh_st)
        carry_l = shard_leaves(carry_st)
        xch = _ShardExchange(smesh_l.cell_nx, smesh_l.edge_nx,
                             satm.smesh.halo_depth)
        out = run_steps_xch(grid_l, cfg, carry_l, dt, n_steps, xch)
        return jax.tree.map(lambda a: a[None], out)

    def _grid_specs(grid_st):
        """Shard all stacked local arrays; replicate 1-D vertical metadata
        (vert.*, u_init, v_init have no shard axis)."""
        def leaf_spec(path, _):
            names = {getattr(p, "name", "") for p in path}
            if names & {"vert", "u_init", "v_init"}:
                return P()
            return spec
        return jax.tree_util.tree_map_with_path(leaf_spec, grid_st)

    def run(grid_st, smesh_st, carry_st, n_steps):
        dt = jnp.asarray(cfg.config_dt, dtype=jnp.asarray(
            carry_st.state.theta_m).dtype)
        fn = shard_map(
            functools.partial(_run, n_steps=n_steps, dt=dt),
            mesh=dmesh,
            in_specs=(_grid_specs(grid_st),
                      jax.tree.map(lambda _: spec, smesh_st),
                      jax.tree.map(lambda _: spec, carry_st)),
            out_specs=jax.tree.map(lambda _: spec, carry_st),
            check_vma=False)
        return fn(grid_st, smesh_st, carry_st)

    return jax.jit(run, static_argnums=(3,))
