"""GWDO static fields from high-resolution topography.

ref: src/core_init_atmosphere/mpas_init_atm_gwd.F — computes the subgrid
orography statistics consumed by the gravity-wave-drag scheme
(module_bl_gwdo genre): for each grid cell, from the high-res terrain
samples inside a box of ~cell-diameter around the cell center:

  var2d : variance of the subgrid terrain (m^2 -> stored as std dev)
  con   : "convexity" (normalized 4th moment / kurtosis of anomalies)
  oa1-4 : orographic asymmetry in W-E, S-N, SW-NE, NW-SE directions
  ol1-4 : effective orographic length (fraction of terrain above the
          box mean along each of the 4 directions)

All statistics are computed vectorized over cells with a fixed (static)
sample-box size, matching the reference's per-cell box scans.
"""

from __future__ import annotations

import numpy as np


def _box_samples(topo, i_c, j_c, half):
    """Gather (2*half)^2 samples around fractional centers (clamped)."""
    ny, nx = topo.shape
    di = np.arange(-half, half)
    jj = np.clip(j_c[:, None] + di[None, :], 0, ny - 1).astype(int)
    ii = np.clip(i_c[:, None] + di[None, :], 0, nx - 1).astype(int)
    # (nCells, nbox_y, nbox_x)
    return topo[jj[:, :, None], ii[:, None, :]]


def gwd_statics(topo, i_c, j_c, half: int = 8):
    """Compute the 10 GWDO static fields for every cell.

    topo: (ny, nx) high-res terrain; i_c/j_c: fractional indices of cell
    centers in that grid (from llxy/_latlon_ij); half: half-width of the
    sampling box in gridpoints.
    Returns dict(var2d, con, oa1..oa4, ol1..ol4) each (nCells,).
    ref: compute_{var,con,oa,ol} in mpas_init_atm_gwd.F.
    """
    h = _box_samples(np.asarray(topo, dtype=np.float64),
                     np.asarray(i_c), np.asarray(j_c), half)
    n = h.shape[1]
    mean = h.mean(axis=(1, 2))
    anom = h - mean[:, None, None]
    var = (anom ** 2).mean(axis=(1, 2))
    std = np.sqrt(np.maximum(var, 0.0))
    # convexity: kurtosis of anomalies (ref compute_con)
    con = np.where(var > 1.0,
                   (anom ** 4).mean(axis=(1, 2)) / np.maximum(var ** 2,
                                                              1e-9),
                   0.0)

    # orographic asymmetry OA (ref compute_oa): normalized difference of
    # the count of above-mean points between the two half-boxes along
    # each direction
    above = (anom > 0.0).astype(np.float64)
    half_n = n // 2

    def oa(mask_hi, mask_lo):
        nhi = (above * mask_hi).sum(axis=(1, 2))
        nlo = (above * mask_lo).sum(axis=(1, 2))
        tot = nhi + nlo
        return np.where(tot > 0, (nhi - nlo) / np.maximum(tot, 1.0), 0.0)

    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    west = (ii < half_n)[None]
    south = (jj < half_n)[None]
    swne = ((ii + jj) < n)[None]
    nwse = ((ii - jj) < 0)[None]
    oa1 = oa(~west, west)          # W-E
    oa2 = oa(~south, south)        # S-N
    oa3 = oa(~swne, swne)          # SW-NE
    oa4 = oa(~nwse, nwse)          # NW-SE

    # effective orographic length OL (ref compute_ol): fraction of points
    # above mean+std along the center rows/columns/diagonals
    crit = (mean + std)[:, None, None]
    high = (h > crit).astype(np.float64)
    ol1 = high[:, half_n - 1:half_n + 1, :].mean(axis=(1, 2))   # along x
    ol2 = high[:, :, half_n - 1:half_n + 1].mean(axis=(1, 2))   # along y
    diag_mask = (np.abs(ii - jj) <= 1)[None]
    ol3 = (high * diag_mask).sum(axis=(1, 2)) \
        / np.maximum(diag_mask.sum(), 1)
    adiag_mask = (np.abs(ii + jj - (n - 1)) <= 1)[None]
    ol4 = (high * adiag_mask).sum(axis=(1, 2)) \
        / np.maximum(adiag_mask.sum(), 1)

    return {"var2d": std, "con": con, "oa1": oa1, "oa2": oa2, "oa3": oa3,
            "oa4": oa4, "ol1": ol1, "ol2": ol2, "ol3": ol3, "ol4": ol4}
