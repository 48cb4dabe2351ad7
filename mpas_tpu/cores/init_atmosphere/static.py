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
