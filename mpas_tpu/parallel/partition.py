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
