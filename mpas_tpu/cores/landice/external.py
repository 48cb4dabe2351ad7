"""Python driver for the external (C++) velocity-solver interface.

ref: src/core_landice/mode_forward/mpas_li_velocity_external.F (1,269 LoC)
— the Fortran side of the Albany/FELIX coupling: packs MPAS geometry,
calls the Interface_velocity_solver C++ layer, imports normal velocities.
Here the same lifecycle drives tools/velocity_solver/
interface_velocity_solver.cpp through ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_TOOL_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                         "tools", "velocity_solver")
_LIB = os.path.join(_TOOL_DIR, "libvelocitysolver.so")
_cdll = None

_ip = ctypes.POINTER(ctypes.c_int)
_dp = ctypes.POINTER(ctypes.c_double)


def _lib():
    global _cdll
    if _cdll is None:
        if not os.path.exists(_LIB):
            subprocess.run(["make", "-C", _TOOL_DIR], check=True,
                           capture_output=True)
        _cdll = ctypes.CDLL(_LIB)
        _cdll.velocity_solver_compute_2d_grid.restype = ctypes.c_int
        _cdll.velocity_solver_get_n_triangles.restype = ctypes.c_int
    return _cdll


def _i(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.int32))


def _d(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float64))


class ExternalVelocitySolver:
    """Lifecycle wrapper (ref: li_velocity_external_init/solve/finalize)."""

    def __init__(self, mesh, n_layers: int, cfg=None):
        lib = _lib()
        self._lib = lib
        self.mesh = mesh
        self.n_layers = n_layers
        cov = _i(mesh.cellsOnVertex)
        coe = _i(mesh.cellsOnEdge)
        xc, yc = _d(mesh.xCell), _d(mesh.yCell)
        dc = _d(mesh.dcEdge)
        self._keep = (cov, coe, xc, yc, dc)
        lib.velocity_solver_set_grid_data(
            ctypes.byref(ctypes.c_int(mesh.nCells)),
            ctypes.byref(ctypes.c_int(mesh.nEdges)),
            ctypes.byref(ctypes.c_int(mesh.nVertices)),
            ctypes.byref(ctypes.c_int(mesh.vertexDegree)),
            cov.ctypes.data_as(_ip), coe.ctypes.data_as(_ip),
            xc.ctypes.data_as(_dp), yc.ctypes.data_as(_dp),
            dc.ctypes.data_as(_dp))
        if cfg is not None:
            lib.velocity_solver_set_parameters(
                ctypes.byref(ctypes.c_double(cfg.gravity)),
                ctypes.byref(ctypes.c_double(cfg.rho_ice)),
                ctypes.byref(ctypes.c_double(cfg.rho_seawater)),
                ctypes.byref(ctypes.c_double(cfg.config_default_flowParamA)),
                ctypes.byref(ctypes.c_double(cfg.config_flowlaw_exponent)))
        ratios = np.full(n_layers, 1.0 / n_layers)
        lib.velocity_solver_extrude_3d_grid(
            ctypes.byref(ctypes.c_int(n_layers)),
            _d(ratios).ctypes.data_as(_dp))
        area = _d(mesh.areaCell)
        self._keep = self._keep + (area,)
        lib.velocity_solver_set_cell_areas(area.ctypes.data_as(_dp))
        lib.velocity_solver_init_fo()

    def set_fo_options(self, beta2: float, picard_iters: int = 10,
                       cg_iters: int = 120):
        """Basal friction + iteration counts for the native FO solve."""
        self._lib.velocity_solver_set_fo_options(
            ctypes.byref(ctypes.c_double(beta2)),
            ctypes.byref(ctypes.c_int(picard_iters)),
            ctypes.byref(ctypes.c_int(cg_iters)))

    def compute_2d_grid(self, vertices_mask) -> int:
        """Triangulate the dynamic-ice region; returns nTriangles."""
        vm = _i(vertices_mask)
        return int(self._lib.velocity_solver_compute_2d_grid(
            vm.ctypes.data_as(_ip)))

    def triangles(self):
        n = int(self._lib.velocity_solver_get_n_triangles())
        tri = np.zeros(n * 3, dtype=np.int32)
        tv = np.zeros(n, dtype=np.int32)
        self._lib.velocity_solver_get_triangles(
            tri.ctypes.data_as(_ip), tv.ctypes.data_as(_ip))
        return tri.reshape(n, 3), tv

    def solve_fo(self, thickness, bed):
        """FO solve; returns uNormal (nEdges, nLayers+1)."""
        th = _d(thickness)
        bd = _d(bed)
        self._lib.velocity_solver_solve_fo(
            th.ctypes.data_as(_dp), bd.ctypes.data_as(_dp))
        out = np.zeros(self.mesh.nEdges * (self.n_layers + 1))
        self._lib.velocity_solver_export_fo_velocity(
            out.ctypes.data_as(_dp))
        return out.reshape(self.mesh.nEdges, self.n_layers + 1)

    def solve_fo_stokes(self, thickness, bed):
        """Full native FO (Blatter-Pattyn) solve: Picard + CG in C++,
        same discretization as fo_stokes.py. Returns uNormal
        (nEdges, nLayers+1)."""
        th = _d(thickness)
        bd = _d(bed)
        self._lib.velocity_solver_solve_fo_stokes(
            th.ctypes.data_as(_dp), bd.ctypes.data_as(_dp))
        out = np.zeros(self.mesh.nEdges * (self.n_layers + 1))
        self._lib.velocity_solver_export_fo_velocity(
            out.ctypes.data_as(_dp))
        return out.reshape(self.mesh.nEdges, self.n_layers + 1)

    def finalize(self):
        self._lib.velocity_solver_finalize()
