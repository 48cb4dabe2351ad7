"""Cell-graph partitioning across TPU devices.

TPU-native replacement for the reference's METIS-file-driven block
decomposition (ref: src/framework/mpas_block_decomp.F:51-160 reads
`graph.info.part.N` and assigns cells->blocks->procs). Two methods:

- Space-filling-curve (Morton) partition computed natively — the default;
  contiguous SFC chunks give compact shards with small halo surface, and
  cell weights (e.g. from meshDensity on variable-resolution meshes) balance
  load (BASELINE.md scaling target).
- `graph.info.part.N` reader for drop-in parity with reference run dirs.
"""

from __future__ import annotations

import numpy as np


def _morton_key(points, bits=21):
    """Interleave-bit Morton key of 3D points normalized to the unit cube."""
    p = np.asarray(points, dtype=np.float64)
    lo = p.min(axis=0)
    span = np.maximum(p.max(axis=0) - lo, 1e-300)
    q = np.clip(((p - lo) / span) * (2 ** bits - 1), 0,
                2 ** bits - 1).astype(np.uint64)
    key = np.zeros(p.shape[0], dtype=np.uint64)
    for b in range(bits):
        for d in range(3):
            key |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) \
                << np.uint64(3 * b + d)
    return key


def sfc_partition(mesh, n_parts: int, weights=None):
    """Morton-SFC partition of cells into n_parts contiguous chunks.

    weights: optional per-cell cost (defaults to 1); chunk boundaries are
    placed on the cumulative weight so variable-resolution meshes balance.
    Returns int array (nCells,) of part ids.
    """
    pts = np.stack([np.asarray(mesh.xCell), np.asarray(mesh.yCell),
                    np.asarray(mesh.zCell)], axis=-1)
    order = np.argsort(_morton_key(pts), kind="stable")
    w = np.ones(mesh.nCells) if weights is None else np.asarray(weights)
    cw = np.cumsum(w[order])
    total = cw[-1]
    part_of_sorted = np.minimum(
        (cw / total * n_parts - 1e-12).astype(np.int64), n_parts - 1)
    part = np.empty(mesh.nCells, dtype=np.int64)
    part[order] = part_of_sorted
    return part


def read_metis_partition(path: str, n_cells: int):
    """Read a reference-format partition file: one part id per line
    (ref: mpas_block_decomp.F:101-120)."""
    part = np.loadtxt(path, dtype=np.int64)
    if part.shape[0] != n_cells:
        raise ValueError(
            f"partition file has {part.shape[0]} entries, mesh has {n_cells}")
    return part


def partition_stats(mesh, part):
    """Cut edges and balance info (for logging/partition-quality tests)."""
    coe = np.asarray(mesh.cellsOnEdge)
    interior = np.asarray(mesh.boundaryEdge) == 0
    cut = np.sum(part[coe[interior, 0]] != part[coe[interior, 1]])
    counts = np.bincount(part)
    return {"cut_edges": int(cut), "max_cells": int(counts.max()),
            "min_cells": int(counts.min()),
            "imbalance": float(counts.max() / counts.mean())}


def hierarchical_sfc_partition(mesh, n_hosts: int, chips_per_host: int,
                               weights=None):
    """Two-level SFC partition for multi-host pods: cells -> hosts (level
    1), then each host's cells -> its chips (level 2). Device ids are
    host-major (device = host * chips_per_host + chip), matching
    device_mesh ordering, so heavy nearest-neighbor halo traffic stays
    within a host's ICI domain and only the coarse host boundaries cross
    DCN (SURVEY.md §5.8 hierarchical aggregation; the reference's
    analogue is the multi-block-per-rank proc map of
    mpas_block_decomp.F:643 mpas_build_block_proc_list).

    Returns int array (nCells,) of device ids in [0, n_hosts*chips_per_host).
    """
    host = sfc_partition(mesh, n_hosts, weights=weights)
    part = np.empty(mesh.nCells, dtype=np.int64)
    w = np.ones(mesh.nCells) if weights is None else np.asarray(weights)
    pts = np.stack([np.asarray(mesh.xCell), np.asarray(mesh.yCell),
                    np.asarray(mesh.zCell)], axis=-1)
    key = _morton_key(pts)
    for h in range(n_hosts):
        sel = np.where(host == h)[0]
        order = sel[np.argsort(key[sel], kind="stable")]
        cw = np.cumsum(w[order])
        chip = np.minimum((cw / cw[-1] * chips_per_host - 1e-12)
                          .astype(np.int64), chips_per_host - 1)
        part[order] = h * chips_per_host + chip
    return part


def inter_host_edge_cut(mesh, part, n_hosts: int, chips_per_host: int):
    """Count mesh edges whose two cells live on different hosts — the
    DCN-crossing halo traffic proxy (vs the total cut = all inter-device
    edges). Returns (dcn_cut, total_cut)."""
    coe = np.asarray(mesh.cellsOnEdge)
    interior = np.asarray(mesh.boundaryEdge) == 0
    p1, p2 = part[coe[:, 0]], part[coe[:, 1]]
    cut = interior & (p1 != p2)
    h1, h2 = p1 // chips_per_host, p2 // chips_per_host
    dcn = cut & (h1 != h2)
    return int(dcn.sum()), int(cut.sum())
