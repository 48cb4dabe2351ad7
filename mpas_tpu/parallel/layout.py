"""Shard layout construction: global mesh + partition -> per-device local
meshes with halos and static exchange schedules.

TPU-native equivalent of the reference block creator + multihalo exchange
list machinery (ref: src/framework/mpas_block_creator.F:52-1376 builds
nHalos-deep cell halos, edge/vertex halos, send/recv/copy lists and
reindexes global->local connectivity; src/framework/mpas_dmpar.F:2065 turns
exchange lists into per-neighbor buffers). Redesign for SPMD over a JAX
device mesh:

- Every shard gets identically *padded* local arrays (static shapes for XLA):
  layout per entity kind is [owned .. pad][halo .. pad], with one guaranteed
  dead slot at the end of the owned region used as a scatter dump.
- Halo exchange is compiled into the step function as gather -> all_to_all ->
  gather (a permutation that splices received values into halo slots), so
  there is no scatter and no dynamic shapes anywhere.
- Connectivity referencing entities outside a shard's local set is remapped
  to slot 0 with zeroed weights/signs — values computed at such outermost
  halo entities are garbage, exactly like the reference's halo semantics
  between exchanges; owned entities are exact provided halo_depth covers the
  stencil radius.

All of this runs once on the host (numpy), like the reference bootstrap.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
from flax import struct

from mpas_tpu.mesh.mesh import Mesh

_CELL_FIELDS = ["xCell", "yCell", "zCell", "latCell", "lonCell", "areaCell",
                "invAreaCell", "meshDensity", "fCell", "boundaryCell"]
_EDGE_FIELDS = ["xEdge", "yEdge", "zEdge", "latEdge", "lonEdge", "dvEdge",
                "dcEdge", "invDvEdge", "invDcEdge", "angleEdge", "fEdge",
                "boundaryEdge", "meshScalingDel2", "meshScalingDel4"]
_VERTEX_FIELDS = ["xVertex", "yVertex", "zVertex", "latVertex", "lonVertex",
                  "areaTriangle", "invAreaTriangle", "fVertex",
                  "boundaryVertex"]


@struct.dataclass
class HaloExchange:
    """Static all-to-all exchange schedule for one entity kind."""
    send_idx: Any    # (P, P, S) local indices to send: [me, dest, slot]
    perm: Any        # (P, n_local) gather permutation over
    #                  concat(local[:owned_pad], recv_flat)
    owned_pad: int = struct.field(pytree_node=False)   # owned-region size
    msg_size: int = struct.field(pytree_node=False)    # S


@struct.dataclass
class NeighborExchange:
    """Static neighbor-schedule exchange: R ppermute rounds, each moving
    one exact-size message between matched (src, dst) pairs.

    TPU-native equivalent of the reference's per-neighbor irecv/pack/isend
    halo exchange (ref: mpas_dmpar.F:5263-5301) with haloLayers depth
    restriction (ref: the haloLayersIn argument; layer-1-only exchanges in
    the acoustic loop, mpas_atm_time_integration.F:792,845). Unlike the
    all-pairs all_to_all fallback, traffic goes only to actual mesh
    neighbors and only for the requested halo layers.
    """
    send_idx: Any    # tuple of R arrays (P, S_r): local slots to send
    splice: Any      # (P, n_local) gather over concat(field, recv_0..R-1)
    perms: Any = struct.field(pytree_node=False)   # R tuples of (src, dst)
    sizes: Any = struct.field(pytree_node=False)   # (S_0, ..., S_{R-1})
    volume: int = struct.field(pytree_node=False)  # total real slots moved


@struct.dataclass
class ShardedMesh:
    """Per-shard local meshes (stacked on a leading shard axis) + schedules."""
    mesh: Mesh                  # every array leaf has leading dim P
    cell_xch: HaloExchange
    edge_xch: HaloExchange
    owned_cell_mask: Any        # (P, nCellsLocal) 1.0 on owned, 0 elsewhere
    owned_edge_mask: Any
    owned_vertex_mask: Any
    cell_global: Any            # (P, nCellsLocal) int32 global ids (pad -> -1)
    edge_global: Any
    vertex_global: Any
    n_parts: int = struct.field(pytree_node=False)
    halo_depth: int = struct.field(pytree_node=False)
    # depth -> neighbor-schedule exchange (keys: 1, 2, halo_depth)
    cell_nx: Any = None
    edge_nx: Any = None
    vertex_nx: Any = None


def _halo_layers(mesh, part, p, depth):
    """Owned cells + halo layers for part p via cellsOnCell adjacency."""
    coc = np.asarray(mesh.cellsOnCell)
    mask = np.asarray(mesh.edgesOnCellMask) > 0
    owned = np.where(part == p)[0]
    local = set(owned.tolist())
    layers = [owned]
    frontier = owned
    for _ in range(depth):
        cand = coc[frontier][mask[frontier]]
        nxt = np.array(sorted(set(np.unique(cand).tolist()) - local),
                       dtype=np.int64)
        layers.append(nxt)
        local |= set(nxt.tolist())
        frontier = nxt
    return layers


def _greedy_rounds(edges):
    """Decompose directed (src, dst) message edges into ppermute rounds:
    each round is a partial permutation (<=1 outgoing and <=1 incoming per
    device). Greedy largest-message-first matching; R ~ max degree."""
    remaining = sorted(edges.items(), key=lambda kv: -len(kv[1][0]))
    rounds = []
    while remaining:
        used_src, used_dst, this, rest = set(), set(), [], []
        for (q, p), msg in remaining:
            if q not in used_src and p not in used_dst:
                used_src.add(q)
                used_dst.add(p)
                this.append(((q, p), msg))
            else:
                rest.append(((q, p), msg))
        rounds.append(this)
        remaining = rest
    return rounds


def _build_neighbor_xch(P, slots, g2l_list, owners, slot_layer, depth,
                        n_local):
    """Build a NeighborExchange refreshing halo slots with layer <= depth."""
    edges = {}
    for p in range(P):
        sl = slots[p]
        lay = slot_layer[p]
        for li in range(n_local):
            g = sl[li]
            if g < 0 or lay[li] < 0 or lay[li] > depth:
                continue
            q = int(owners[g])
            if q == p:
                continue
            sends, dests = edges.setdefault((q, p), ([], []))
            sends.append(g2l_list[q][int(g)])
            dests.append(li)

    rounds = _greedy_rounds(edges)
    sizes = tuple(max(len(m[0]) for _, m in rnd) for rnd in rounds)
    send_idx = []
    splice = np.tile(np.arange(n_local, dtype=np.int32), (P, 1))
    offset = n_local
    volume = 0
    for r, rnd in enumerate(rounds):
        S = sizes[r]
        si = np.zeros((P, S), dtype=np.int32)
        for (q, p), (sends, dests) in rnd:
            si[q, :len(sends)] = sends
            splice[p, np.asarray(dests, dtype=np.int64)] = \
                offset + np.arange(len(dests), dtype=np.int64)
            volume += len(sends)
        send_idx.append(si)
        offset += S
    perms = tuple(tuple(qp for qp, _ in rnd) for rnd in rounds)
    return NeighborExchange(send_idx=tuple(send_idx), splice=splice,
                            perms=perms, sizes=sizes, volume=volume)


def build_sharded_mesh(mesh: Mesh, part, halo_depth: int = 3) -> ShardedMesh:
    """Partition a global Mesh into P padded local meshes + exchanges."""
    part = np.asarray(part)
    P = int(part.max()) + 1
    nC, nE, nV = mesh.nCells, mesh.nEdges, mesh.nVertices
    coe = np.asarray(mesh.cellsOnEdge)
    voe = np.asarray(mesh.verticesOnEdge)
    eoc = np.asarray(mesh.edgesOnCell)
    eocm = np.asarray(mesh.edgesOnCellMask) > 0
    nEoC = np.asarray(mesh.nEdgesOnCell)

    # entity owners: edge/vertex owned by the part of its first cell
    edge_owner = part[coe[:, 0]]
    cov = np.asarray(mesh.cellsOnVertex)
    covm = np.asarray(mesh.cellsOnVertexMask) > 0
    first_cell = np.where(covm[:, 0], cov[:, 0], 0)
    vertex_owner = part[first_cell]

    # --- local entity sets per part ---------------------------------------
    cell_locs, edge_locs, vert_locs = [], [], []
    # per part: gid -> halo layer
    cell_layer_maps, edge_layer_maps, vert_layer_maps = [], [], []
    owned_counts = {"cell": [], "edge": [], "vertex": []}
    for p in range(P):
        layers = _halo_layers(mesh, part, p, halo_depth)
        owned_cells = layers[0]
        halo_cells = np.concatenate(layers[1:]) if halo_depth else \
            np.array([], dtype=np.int64)
        lmap = {}
        for li, lay in enumerate(layers):
            for g in lay:
                lmap[int(g)] = li
        cell_layer_maps.append(lmap)
        # canonical halo order: by (owner part, global id)
        halo_cells = halo_cells[np.lexsort((halo_cells,
                                            part[halo_cells]))]
        cells = np.concatenate([owned_cells, halo_cells])
        cell_locs.append(cells)
        owned_counts["cell"].append(len(owned_cells))

        # edges/vertices adjacent to any local cell
        es = np.unique(eoc[cells][eocm[cells]])
        # edge halo layer = min layer of its locally-present cells (ref:
        # block creator builds nHalos+1 edge halo layers keyed off the
        # cell layers, mpas_block_creator.F:734)
        emap = {}
        for g in es:
            ls = [lmap[int(c)] for c in coe[g] if int(c) in lmap]
            emap[int(g)] = min(ls) if ls else halo_depth
        edge_layer_maps.append(emap)
        own_e = es[edge_owner[es] == p]
        halo_e = es[edge_owner[es] != p]
        halo_e = halo_e[np.lexsort((halo_e, edge_owner[halo_e]))]
        edge_locs.append(np.concatenate([own_e, halo_e]))
        owned_counts["edge"].append(len(own_e))

        vs = np.unique(voe[edge_locs[p]])
        # vertex halo layer = min layer of its locally-present cells (the
        # edge-layer rule applied to the vertex's cell fan)
        vmap = {}
        for g in vs:
            ls = [lmap[int(c)] for c, m in zip(cov[g], covm[g])
                  if m and int(c) in lmap]
            vmap[int(g)] = min(ls) if ls else halo_depth
        vert_layer_maps.append(vmap)
        own_v = vs[vertex_owner[vs] == p]
        halo_v = vs[vertex_owner[vs] != p]
        halo_v = halo_v[np.lexsort((halo_v, vertex_owner[halo_v]))]
        vert_locs.append(np.concatenate([own_v, halo_v]))
        owned_counts["vertex"].append(len(own_v))

    # --- padded sizes (uniform across shards; +1 dead slot in owned) ------
    OWN_C = max(owned_counts["cell"]) + 1
    OWN_E = max(owned_counts["edge"]) + 1
    OWN_V = max(owned_counts["vertex"]) + 1
    HALO_C = max(len(c) - o for c, o in zip(cell_locs, owned_counts["cell"]))
    HALO_E = max(len(e) - o for e, o in zip(edge_locs, owned_counts["edge"]))
    HALO_V = max(len(v) - o for v, o in zip(vert_locs, owned_counts["vertex"]))
    NCL, NEL, NVL = OWN_C + HALO_C, OWN_E + HALO_E, OWN_V + HALO_V

    # --- slotted local id lists + global->local maps ----------------------
    def slot(locs_p, owned_n, OWN, NL):
        """Return padded local list (global ids, -1 for dead slots)."""
        out = np.full(NL, -1, dtype=np.int64)
        out[:owned_n] = locs_p[:owned_n]
        out[OWN:OWN + (len(locs_p) - owned_n)] = locs_p[owned_n:]
        return out

    cell_slots = [slot(cell_locs[p], owned_counts["cell"][p], OWN_C, NCL)
                  for p in range(P)]
    edge_slots = [slot(edge_locs[p], owned_counts["edge"][p], OWN_E, NEL)
                  for p in range(P)]
    vert_slots = [slot(vert_locs[p], owned_counts["vertex"][p], OWN_V, NVL)
                  for p in range(P)]

    def g2l(slots_p):
        return {int(g): i for i, g in enumerate(slots_p) if g >= 0}

    cell_g2l = [g2l(s) for s in cell_slots]
    edge_g2l = [g2l(s) for s in edge_slots]
    vert_g2l = [g2l(s) for s in vert_slots]

    # --- exchanges (slot-ordered locs) ------------------------------------
    def build_xch(slots, g2l_list, owners, OWN, NL):
        send_lists = [[[] for _ in range(P)] for _ in range(P)]
        dest_lists = [[[] for _ in range(P)] for _ in range(P)]
        for p in range(P):
            for li, g in enumerate(slots[p]):
                if g < 0:
                    continue
                q = int(owners[g])
                if q != p:
                    send_lists[q][p].append(g2l_list[q][int(g)])
                    dest_lists[p][q].append(li)
        S = max(1, max(len(send_lists[q][p]) for q in range(P)
                       for p in range(P)))
        send_idx = np.zeros((P, P, S), dtype=np.int32)
        perm = np.zeros((P, NL), dtype=np.int32)
        for p in range(P):
            perm[p, :] = np.minimum(np.arange(NL), OWN - 1)
            for q in range(P):
                sl = send_lists[p][q]
                send_idx[p, q, :len(sl)] = sl
                for s, li in enumerate(dest_lists[p][q]):
                    perm[p, li] = OWN + q * S + s
        return HaloExchange(send_idx=send_idx, perm=perm, owned_pad=OWN,
                            msg_size=S)

    cell_xch = build_xch(cell_slots, cell_g2l, part, OWN_C, NCL)
    edge_xch = build_xch(edge_slots, edge_g2l, edge_owner, OWN_E, NEL)

    # --- per-depth neighbor-schedule exchanges ----------------------------
    def slot_layers(slots, layer_maps):
        out = []
        for p in range(P):
            lay = np.full(len(slots[p]), -1, dtype=np.int32)
            for li, g in enumerate(slots[p]):
                if g >= 0:
                    lay[li] = layer_maps[p].get(int(g), -1)
            out.append(lay)
        return out

    cell_slot_layer = slot_layers(cell_slots, cell_layer_maps)
    edge_slot_layer = slot_layers(edge_slots, edge_layer_maps)
    vert_slot_layer = slot_layers(vert_slots, vert_layer_maps)
    depths = sorted({1, min(2, halo_depth), halo_depth})
    cell_nx = {d: _build_neighbor_xch(P, cell_slots, cell_g2l, part,
                                      cell_slot_layer, d, NCL)
               for d in depths}
    edge_nx = {d: _build_neighbor_xch(P, edge_slots, edge_g2l, edge_owner,
                                      edge_slot_layer, d, NEL)
               for d in depths}
    vertex_nx = {d: _build_neighbor_xch(P, vert_slots, vert_g2l,
                                        vertex_owner, vert_slot_layer, d,
                                        NVL)
                 for d in depths}

    # --- local mesh arrays -------------------------------------------------
    dtype = np.asarray(mesh.areaCell).dtype
    fields = {}

    def take1(global_arr, slots, fill=0.0):
        g = np.asarray(global_arr)
        out = np.stack([np.where((s >= 0)[(...,) + (None,) * (g.ndim - 1)]
                                 if g.ndim > 1 else (s >= 0),
                                 g[np.maximum(s, 0)], fill)
                        for s in slots])
        return out

    for name in _CELL_FIELDS:
        fields[name] = take1(getattr(mesh, name), cell_slots)
    for name in _EDGE_FIELDS:
        fields[name] = take1(getattr(mesh, name), edge_slots)
    for name in _VERTEX_FIELDS:
        fields[name] = take1(getattr(mesh, name), vert_slots)
    # avoid 1/0 explosions on dead slots
    for name in ("invAreaCell", "invAreaTriangle", "invDvEdge", "invDcEdge"):
        fields[name] = np.nan_to_num(fields[name], posinf=0.0, neginf=0.0)

    def remap_conn(global_conn, row_slots, col_g2l, weights_to_zero):
        """Remap a (n_row_global, k) index array to local, zeroing weights
        whose target is not shard-local."""
        conn = np.asarray(global_conn)
        out = np.zeros((P,) + (len(row_slots[0]),) + conn.shape[1:],
                       dtype=np.int32)
        miss = np.zeros(out.shape, dtype=bool)
        for p in range(P):
            rs = row_slots[p]
            sub = conn[np.maximum(rs, 0)]
            l = np.zeros_like(sub)
            mp = col_g2l[p]
            flat = sub.ravel()
            lf = np.fromiter((mp.get(int(g), -1) for g in flat),
                             dtype=np.int64, count=flat.size)
            l = lf.reshape(sub.shape)
            dead = (rs < 0)[:, None] | (l < 0)
            out[p] = np.where(dead, 0, l)
            miss[p] = dead
        return out, miss

    # connectivity + weight zeroing
    eoc_l, eoc_miss = remap_conn(mesh.edgesOnCell, cell_slots, edge_g2l, None)
    coc_l, coc_miss = remap_conn(mesh.cellsOnCell, cell_slots, cell_g2l, None)
    voc_l, voc_miss = remap_conn(mesh.verticesOnCell, cell_slots, vert_g2l,
                                 None)
    coe_l, coe_miss = remap_conn(mesh.cellsOnEdge, edge_slots, cell_g2l, None)
    voe_l, voe_miss = remap_conn(mesh.verticesOnEdge, edge_slots, vert_g2l,
                                 None)
    eoe_l, eoe_miss = remap_conn(mesh.edgesOnEdge, edge_slots, edge_g2l, None)
    cov_l, cov_miss = remap_conn(mesh.cellsOnVertex, vert_slots, cell_g2l,
                                 None)
    eov_l, eov_miss = remap_conn(mesh.edgesOnVertex, vert_slots, edge_g2l,
                                 None)

    def local_rows(arr2d, row_slots, miss=None, extra_zero=None):
        out = take1(arr2d, row_slots)
        if miss is not None:
            out = np.where(miss, 0.0, out)
        return out

    fields["edgesOnCell"] = eoc_l
    fields["cellsOnCell"] = coc_l
    fields["verticesOnCell"] = voc_l
    fields["cellsOnEdge"] = coe_l
    fields["verticesOnEdge"] = voe_l
    fields["edgesOnEdge"] = eoe_l
    fields["cellsOnVertex"] = cov_l
    fields["edgesOnVertex"] = eov_l
    fields["nEdgesOnCell"] = take1(mesh.nEdgesOnCell, cell_slots, 0)
    fields["nEdgesOnEdge"] = take1(mesh.nEdgesOnEdge, edge_slots, 0)

    fields["edgesOnCellMask"] = local_rows(mesh.edgesOnCellMask, cell_slots,
                                           eoc_miss)
    fields["divW"] = local_rows(mesh.divW, cell_slots, eoc_miss)
    fields["keW"] = local_rows(mesh.keW, cell_slots, eoc_miss)
    fields["curlW"] = local_rows(mesh.curlW, vert_slots, eov_miss)
    fields["edgeSignOnCell"] = local_rows(mesh.edgeSignOnCell, cell_slots,
                                          eoc_miss)
    fields["kiteAreasOnCell"] = local_rows(mesh.kiteAreasOnCell, cell_slots,
                                           voc_miss)
    fields["edgeSignOnVertex"] = local_rows(mesh.edgeSignOnVertex, vert_slots,
                                            eov_miss)
    fields["cellsOnVertexMask"] = local_rows(mesh.cellsOnVertexMask,
                                             vert_slots, cov_miss)
    fields["kiteAreasOnVertex"] = local_rows(mesh.kiteAreasOnVertex,
                                             vert_slots, cov_miss)
    fields["weightsOnEdge"] = local_rows(mesh.weightsOnEdge, edge_slots,
                                         eoe_miss)
    # cell-assembled TRiSK: per-cell matrix rides cell rows (weights are
    # slot-indexed, unaffected by reindexing); zero rows of deep-halo
    # cells with missing edges so their contraction contributes nothing
    triskM_l = take1(mesh.triskM, cell_slots)
    triskM_l = np.where(eoc_miss[..., :, None], 0.0, triskM_l)
    triskM_l = np.where(eoc_miss[..., None, :], 0.0, triskM_l)
    fields["triskM"] = triskM_l
    # slot positions are invariant under remapping (edge order within a
    # cell's edgesOnCell row is preserved)
    fields["edgeSlotOnCell"] = take1(mesh.edgeSlotOnCell, edge_slots)
    # gradient across an edge with a missing cell would be garbage; the
    # boundaryEdge mask already zeroes real boundaries — missing-cell edges
    # are deep-halo only, values there are garbage by design.

    int_fields = {"cellsOnEdge", "verticesOnEdge", "edgesOnCell",
                  "nEdgesOnCell", "cellsOnCell", "verticesOnCell",
                  "cellsOnVertex", "edgesOnVertex", "edgesOnEdge",
                  "nEdgesOnEdge", "edgeSlotOnCell"}
    for k, v in fields.items():
        if k in int_fields:
            fields[k] = v.astype(np.int32)
        else:
            fields[k] = v.astype(dtype)

    local_mesh = Mesh(
        nCells=NCL, nEdges=NEL, nVertices=NVL,
        maxEdges=mesh.maxEdges, maxEdges2=mesh.maxEdges2,
        vertexDegree=mesh.vertexDegree, on_sphere=mesh.on_sphere,
        sphere_radius=mesh.sphere_radius, x_period=mesh.x_period,
        y_period=mesh.y_period, **fields)

    def owned_mask(slots, owned_n):
        out = np.zeros((P, len(slots[0])), dtype=dtype)
        for p in range(P):
            out[p, :owned_n[p]] = 1.0
        return out

    return ShardedMesh(
        mesh=local_mesh, cell_xch=cell_xch, edge_xch=edge_xch,
        cell_nx=cell_nx, edge_nx=edge_nx, vertex_nx=vertex_nx,
        owned_cell_mask=owned_mask(cell_slots, owned_counts["cell"]),
        owned_edge_mask=owned_mask(edge_slots, owned_counts["edge"]),
        owned_vertex_mask=owned_mask(vert_slots, owned_counts["vertex"]),
        cell_global=np.stack(cell_slots).astype(np.int32),
        edge_global=np.stack(edge_slots).astype(np.int32),
        vertex_global=np.stack(vert_slots).astype(np.int32),
        n_parts=P, halo_depth=halo_depth)
