"""Static/terrain field interpolation from geogrid tiles.

ref: src/core_init_atmosphere/mpas_init_atm_static.F (1,473 LoC) +
read_geogrid.c: read WPS geographical tiles (terrain, land use, soil
category, ...) and interpolate them onto mesh cells. The tile reader is
native C++ (tools/geogrid/read_geogrid.cpp) via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_TOOL_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                         "tools", "geogrid")
_LIB = os.path.join(_TOOL_DIR, "libgeogrid.so")
_cdll = None


def _lib():
    global _cdll
    if _cdll is None:
        if not os.path.exists(_LIB):
            subprocess.run(["make", "-C", _TOOL_DIR], check=True,
                           capture_output=True)
        _cdll = ctypes.CDLL(_LIB)
        for fn in (_cdll.read_geogrid, _cdll.write_geogrid):
            fn.restype = ctypes.c_int
        _cdll.read_geogrid.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int]
        _cdll.write_geogrid.argtypes = _cdll.read_geogrid.argtypes
    return _cdll


def read_geogrid_tile(path, nx, ny, nz=1, isigned=1, endian=0,
                      scalefactor=1.0, wordsize=2):
    """Read one tile -> (nz, ny, nx) float32 array.
    ref: read_geogrid.c contract (big-endian scaled ints)."""
    out = np.zeros(nx * ny * nz, dtype=np.float32)
    rc = _lib().read_geogrid(
        str(path).encode(), out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, isigned, endian, scalefactor, wordsize)
    if rc != 0:
        raise IOError(f"read_geogrid({path}) failed with code {rc}")
    return out.reshape(nz, ny, nx)


def write_geogrid_tile(path, arr, isigned=1, endian=0, scalefactor=1.0,
                       wordsize=2):
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    nz, ny, nx = arr.shape
    rc = _lib().write_geogrid(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, isigned, endian, scalefactor, wordsize)
    if rc != 0:
        raise IOError(f"write_geogrid({path}) failed with code {rc}")


def interp_static_to_cells(tile, proj, lat_cell_deg, lon_cell_deg,
                           method="bilinear"):
    """Interpolate a (ny, nx) tile to mesh cells through its projection.
    ref: mpas_init_atm_static.F interp loops."""
    from mpas_tpu.cores.init_atmosphere.hinterp import METHODS
    from mpas_tpu.cores.init_atmosphere.llxy import llij
    i, j = llij(proj, lat_cell_deg, lon_cell_deg)
    return METHODS[method](tile, i, j)


# --------------------------------------------------------------------------
# pixel-push aggregation (the static-field interpolation method of
# mpas_init_atm_static.F: every high-res source pixel is assigned to its
# nearest cell and aggregated — mean for terrain (:320-369), dominant
# category for land use / soil category (:420-555))
# --------------------------------------------------------------------------

def _cell_xyz(lat_cell, lon_cell):
    lat = np.asarray(lat_cell)
    lon = np.asarray(lon_cell)
    return np.stack([np.cos(lon) * np.cos(lat),
                     np.sin(lon) * np.cos(lat),
                     np.sin(lat)], axis=-1)


def nearest_cells(lat_pts, lon_pts, lat_cell, lon_cell):
    """Containing cell for each (lat, lon) point (radians).

    The reference walks the cell graph per pixel (nearest_cell,
    mpas_init_atm_static.F); for a Voronoi mesh the containing cell IS
    the nearest generator, so a KD-tree query on the unit sphere is
    exact and vectorizes over all pixels at once.
    """
    from scipy.spatial import cKDTree
    tree = cKDTree(_cell_xyz(lat_cell, lon_cell))
    _, idx = tree.query(_cell_xyz(lat_pts, lon_pts))
    return idx


def pixel_push_mean(lat_pts, lon_pts, values, lat_cell, lon_cell,
                    fill=0.0):
    """Per-cell mean of all source pixels landing in the cell (the TER
    aggregation, mpas_init_atm_static.F:320-369). Points/cells in
    radians; returns (nCells,) and the per-cell hit count."""
    idx = nearest_cells(lat_pts, lon_pts, lat_cell, lon_cell)
    n = len(np.asarray(lat_cell))
    acc = np.bincount(idx, weights=np.asarray(values, np.float64),
                      minlength=n)
    cnt = np.bincount(idx, minlength=n)
    out = np.where(cnt > 0, acc / np.maximum(cnt, 1), fill)
    return out, cnt


def pixel_push_dominant(lat_pts, lon_pts, category, lat_cell, lon_cell,
                        ncat, skip_zero=True, default=1):
    """Dominant (modal) category per cell (the LU_INDEX / SOILCAT_TOP
    aggregation, mpas_init_atm_static.F:420-555). Categories are
    1-based; zero pixels are skipped as in the reference (:418)."""
    cat = np.asarray(category).astype(np.int64)
    lat_pts = np.asarray(lat_pts)
    lon_pts = np.asarray(lon_pts)
    if skip_zero:
        keep = cat > 0
        cat = cat[keep]
        lat_pts = lat_pts[keep]
        lon_pts = lon_pts[keep]
    idx = nearest_cells(lat_pts, lon_pts, lat_cell, lon_cell)
    n = len(np.asarray(lat_cell))
    hist = np.bincount(idx * (ncat + 1) + np.clip(cat, 1, ncat),
                       minlength=n * (ncat + 1)).reshape(n, ncat + 1)
    hist[:, 0] = -1                        # category 0 never wins
    dom = hist.argmax(axis=1)
    dom = np.where(hist.max(axis=1) <= 0, default, dom)
    return dom, hist[:, 1:]


def landuse_consistency(lu_index, soilcat_top, iswater_lu=16,
                        isice_lu=24, iswater_soil=14, isice_soil=16):
    """Water/ice cross-consistency fixups between the dominant land-use
    and soil categories (mpas_init_atm_static.F:561-588): land ice
    forces the ice soil category; a cell that is water in exactly one of
    the two datasets becomes water in both; landmask = not-water.
    Returns (lu_index, soilcat_top, landmask)."""
    lu = np.asarray(lu_index).copy()
    sc = np.asarray(soilcat_top).copy()
    sc = np.where(lu == isice_lu, isice_soil, sc)
    water_mismatch = (lu == iswater_lu) != (sc == iswater_soil)
    lu = np.where(water_mismatch & (lu != iswater_lu), iswater_lu, lu)
    sc = np.where(water_mismatch & (sc != iswater_soil), iswater_soil, sc)
    landmask = (lu != iswater_lu).astype(np.int32)
    return lu, sc, landmask


def soiltemp_adjust(soiltemp, ter, landmask):
    """Deep soil temperature reduced to terrain elevation with the
    standard 6.5 K/km lapse (the reference applies it after the 1-degree
    pull interpolation; water cells stay 0)."""
    out = np.where(np.asarray(landmask) == 1,
                   np.asarray(soiltemp) - 0.0065 * np.asarray(ter), 0.0)
    return out


def monthly_climatology_to_cells(tile, proj, lat_cell_deg, lon_cell_deg,
                                 missing=None):
    """Interpolate a (12, ny, nx) monthly climatology (GREENFRAC /
    ALBEDO12M) to cells with the reference's method fallback sequence
    (FOUR_POINT -> W_AVERAGE16 -> SEARCH; mpas_init_atm_static.F:
    1000-1055). Returns (nCells, 12)."""
    from mpas_tpu.cores.init_atmosphere.hinterp import interp_sequence
    from mpas_tpu.cores.init_atmosphere.llxy import llij
    i, j = llij(proj, lat_cell_deg, lon_cell_deg)
    months = [interp_sequence(np.asarray(tile)[k], i, j, missing=missing)
              for k in range(np.asarray(tile).shape[0])]
    return np.stack(months, axis=-1)


def shd_min_max(greenfrac12):
    """shdmin/shdmax from the monthly green fraction (the Noah
    vegetation-fraction bounds the reference derives)."""
    g = np.asarray(greenfrac12)
    return g.min(axis=-1), g.max(axis=-1)
