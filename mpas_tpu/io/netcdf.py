"""Minimal NetCDF-3 (classic + 64-bit offset) reader/writer.

TPU-native replacement for the reference's PIO/netCDF layer (ref:
src/framework/mpas_io.F wraps PIO for pnetcdf/netcdf I/O). This image has no
netCDF4/xarray; scipy.io.netcdf_file handles the classic format, which is
what MPAS grid.nc / output files use — giving direct interchange with
reference-generated files. A record (unlimited) dimension 'Time' matches the
reference stream convention.
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file


def read_netcdf(path: str, variables=None):
    """Read variables + dims + attrs from a NetCDF file into numpy.

    Dispatches on the file magic: classic NetCDF-3 ('CDF\\x01'/'CDF\\x02')
    via scipy, netCDF4/HDF5 ('\\x89HDF') via the pure-python HDF5 parser
    (io/hdf5.py) — mirroring the reference's multi-iotype open
    (ref: mpas_io.F:144-200 MPAS_IO_{PNETCDF,NETCDF,NETCDF4})."""
    with open(path, "rb") as fh:
        magic = fh.read(8)
    if magic[:4] == b"\x89HDF":
        from mpas_tpu.io.hdf5 import read_hdf5
        return read_hdf5(path, variables)
    out = {}
    with netcdf_file(path, "r", mmap=False) as f:
        dims = dict(f.dimensions)
        names = variables if variables is not None else list(f.variables)
        for name in names:
            v = f.variables[name]
            arr = np.array(v[:])
            # netCDF stores big-endian; JAX only accepts native byte order
            if arr.dtype.byteorder == ">":
                arr = arr.astype(arr.dtype.newbyteorder("="))
            out[name] = arr
        attrs = {k: v for k, v in f._attributes.items()}
    return out, dims, attrs


def write_netcdf(path: str, dims: dict, variables: dict, attrs: dict = None,
                 record_dim: str = "Time"):
    """Write a NetCDF-3 64-bit-offset file.

    dims: {name: size or None (None = record/unlimited)}.
    variables: {name: (dim_names_tuple, ndarray)}.
    """
    with netcdf_file(path, "w", version=2) as f:
        for k, v in (attrs or {}).items():
            setattr(f, k, v)
        for name, size in dims.items():
            f.createDimension(name, size)
        for name, (dnames, arr) in variables.items():
            arr = np.asarray(arr)
            # scipy netcdf supports int32/float32/float64/char
            if arr.dtype == np.int64:
                arr = arr.astype(np.int32)
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            var = f.createVariable(name, arr.dtype, dnames)
            var[:] = arr


def append_record(path_vars: dict, rec_arrays: dict):
    """Helper used by the stream layer to accumulate records in memory before
    a write (scipy's netcdf_file has no true append)."""
    for k, v in rec_arrays.items():
        path_vars.setdefault(k, []).append(np.asarray(v))
