"""Runtime halo exchange + scatter/gather + reductions for sharded runs.

TPU-native equivalent of mpas_dmpar's runtime surface (ref:
src/framework/mpas_dmpar.F): halo exchange (:4666+) becomes a static
gather -> all_to_all -> permutation-gather compiled into the step function;
global reductions (:730-1371) become psum over owned-masked sums. The
all_to_all carries every shard pair's maximal message (schedule is static);
on real hardware XLA lowers it onto ICI. Exchange *groups* (ref: :6541+) are
free here: multiple fields exchanged together simply stack into one
all_to_all payload by fusing within jit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.parallel.layout import (HaloExchange, NeighborExchange,
                                      ShardedMesh)

AXIS = "shard"


def neighbor_halo_exchange(nx: NeighborExchange, field,
                           axis_name: str = AXIS):
    """Refresh halo slots via static neighbor-schedule ppermute rounds.

    field: (n_local, ...) shard-local. Each round is one lax.ppermute with
    an exact-size message between matched (src, dst) neighbor pairs (ref:
    the irecv/pack/isend per-neighbor loop, mpas_dmpar.F:5263-5301).
    Non-neighbor pairs move nothing — unlike the all_to_all fallback's
    maximal all-pairs message. Depth restriction is baked into the
    schedule at layout time (pick the right nx from ShardedMesh.cell_nx /
    edge_nx). Scatter-free: received buffers concat behind the field and
    a precomputed gather splices them into place; XLA's scheduler can
    overlap the permutes with independent interior compute.
    """
    parts = [field]
    for r, perm in enumerate(nx.perms):
        send = field[nx.send_idx[r]]
        parts.append(jax.lax.ppermute(send, axis_name, perm))
    if len(parts) == 1:
        return field
    combined = jnp.concatenate(parts, axis=0)
    return combined[nx.splice]


class ShardExchange:
    """Depth-selectable neighbor-schedule exchanges (ref: the haloLayers
    argument of mpas_dmpar_exch_halo_field*; e.g. layer-1-only exchanges
    inside the atm acoustic loop, mpas_atm_time_integration.F:792,845, and
    the ocean barotropic subcycle's restricted 'subcycleFields' group,
    mpas_ocn_time_integration_split.F:771)."""

    def __init__(self, cell_nx, edge_nx, full_depth, vertex_nx=None):
        self._c = cell_nx       # {depth: NeighborExchange}
        self._e = edge_nx
        self._v = vertex_nx
        self._full = full_depth

    @staticmethod
    def _pick(table, depth, full):
        d = full if depth is None else min(depth, full)
        if d in table:
            return table[d]
        for k in sorted(table):
            if k >= d:
                return table[k]
        return table[max(table)]

    def cell(self, x, depth=None):
        return neighbor_halo_exchange(self._pick(self._c, depth, self._full),
                                      x)

    def edge(self, x, depth=None):
        return neighbor_halo_exchange(self._pick(self._e, depth, self._full),
                                      x)

    def vertex(self, x, depth=None):
        return neighbor_halo_exchange(self._pick(self._v, depth, self._full),
                                      x)


def halo_exchange(xch: HaloExchange, field, axis_name: str = AXIS,
                  depth=None):
    """Refresh halo slots of a local field from their owners.

    field: (n_local, ...) shard-local. Returns same shape with halo slots
    overwritten by owner values. Pure gathers + one all_to_all.

    `depth` restricts the refresh to the innermost halo layers (ref:
    mpas_dmpar haloLayers argument; the acoustic loop exchanges layer 1
    only, mpas_atm_time_integration.F:792,845). The all_to_all schedule
    here is maximal/static, so depth currently only documents intent; the
    neighbor-schedule exchange in neighbors.py honors it.
    """
    send = field[xch.send_idx]                      # (P, S, ...)
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    recv_flat = recv.reshape((-1,) + field.shape[1:])  # (P*S, ...)
    combined = jnp.concatenate([field[:xch.owned_pad], recv_flat], axis=0)
    return combined[xch.perm]


def psum_owned(local_vals, owned_mask, axis_name: str = AXIS):
    """Global sum of a per-entity local field over owned entities."""
    m = owned_mask.reshape(owned_mask.shape + (1,) * (local_vals.ndim - 1))
    return jax.lax.psum(jnp.sum(local_vals * m), axis_name)


def pmax_owned(local_vals, owned_mask, axis_name: str = AXIS):
    m = owned_mask.reshape(owned_mask.shape + (1,) * (local_vals.ndim - 1))
    return jax.lax.pmax(jnp.max(jnp.where(m > 0, local_vals, -jnp.inf)),
                        axis_name)


# ---------------------------------------------------------------------------
# host-side scatter/gather between global and stacked-local fields
# ---------------------------------------------------------------------------

_KIND_SLOTS = {"cell": "cell_global", "edge": "edge_global",
               "vertex": "vertex_global"}


def scatter_field(smesh: ShardedMesh, global_field, kind: str):
    """Global (n, ...) -> stacked local (P, n_local, ...)."""
    slots = np.asarray(getattr(smesh, _KIND_SLOTS[kind]))
    g = np.asarray(global_field)
    out = g[np.maximum(slots, 0)]
    dead = (slots < 0).reshape(slots.shape + (1,) * (g.ndim - 1))
    return np.where(dead, 0, out)


def gather_field(smesh: ShardedMesh, stacked, kind: str, n_global: int):
    """Stacked local (P, n_local, ...) -> global (n, ...) from owned slots."""
    slots = np.asarray(getattr(smesh, _KIND_SLOTS[kind]))
    mask = np.asarray({"cell": smesh.owned_cell_mask,
                       "edge": smesh.owned_edge_mask,
                       "vertex": smesh.owned_vertex_mask}[kind]) > 0
    stacked = np.asarray(stacked)
    out = np.zeros((n_global,) + stacked.shape[2:], dtype=stacked.dtype)
    for p in range(smesh.n_parts):
        sel = mask[p]
        out[slots[p, sel]] = stacked[p, sel]
    return out


def device_mesh(n_parts: int):
    devs = jax.devices()
    if len(devs) < n_parts:
        raise RuntimeError(f"need {n_parts} devices, have {len(devs)}")
    return jax.make_mesh((n_parts,), (AXIS,), devices=devs[:n_parts])


def shard_leaves(tree):
    """Squeeze the leading block dim shard_map leaves carry."""
    return jax.tree.map(lambda a: a.reshape(a.shape[1:]), tree)


def device_mesh_hierarchical(n_hosts: int, chips_per_host: int):
    """Flat shard axis with host-major device ordering (device = host *
    chips_per_host + chip). Pair with
    partition.hierarchical_sfc_partition so neighbor-schedule ppermutes
    between same-host shards ride ICI and only coarse host-boundary
    messages cross DCN; XLA routes each collective-permute pair over the
    fastest fabric connecting the two devices, so the win is entirely in
    the placement (SURVEY.md §5.8)."""
    n = n_hosts * chips_per_host
    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(f"need {n} devices, have {len(devs)}")
    # prefer true host grouping when the platform exposes it
    try:
        devs = sorted(devs[:n], key=lambda d: (d.process_index, d.id))
    except Exception:
        devs = devs[:n]
    return jax.make_mesh((n,), (AXIS,), devices=devs)
