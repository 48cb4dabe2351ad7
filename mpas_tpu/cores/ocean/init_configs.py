"""Additional idealized ocean init-mode configurations.

ref: src/core_ocean/mode_init/ — the reference generates 17 idealized/real
configurations in-model (mpas_ocn_init_<name>.F, each with its own
Registry block). This module carries:

  overflow        — ref: mpas_ocn_init_overflow.F (dense water on a
                    continental-slope ridge; classic DOME-style sill)
  internal_waves  — ref: mpas_ocn_init_internal_waves.F (interior
                    temperature interface displacement in a channel)
  cosine_bell     — ref: mpas_ocn_init_cosine_bell.F (passive-tracer
                    advection on the sphere; the standard transport test)

All share the channel/global state layout of init_channel.py; the
reference's terrain-following level treatment becomes a thin z-star column
with land handled by maxLevelCell (full columns here; partial bottom cells
are a later milestone).
"""

from __future__ import annotations

import numpy as np

from mpas_tpu.constants import pii
from mpas_tpu.cores.ocean.core import OcnGrid, OcnState
from mpas_tpu.mesh.mesh import Mesh


def _uniform_grid(mesh, nz, bottom_depth, dtype, coriolis=0.0):
    nC = mesh.nCells
    h0 = np.full((nC, nz), bottom_depth / nz)
    dtypec = np.asarray(mesh.areaCell).dtype
    mesh = mesh.replace(
        fEdge=np.full(mesh.nEdges, coriolis, dtype=dtypec),
        fVertex=np.full(mesh.nVertices, coriolis, dtype=dtypec),
        fCell=np.full(mesh.nCells, coriolis, dtype=dtypec))
    grid = OcnGrid(mesh=mesh, restingThickness=h0.astype(dtype),
                   bottomDepth=np.full(nC, bottom_depth, dtype=dtype),
                   maxLevelCell=np.full(nC, nz, dtype=np.int32), nz=nz)
    return grid, h0


def init_overflow(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """Dense plume on a slope (ref: mpas_ocn_init_overflow.F): cold water
    south of a front at y = y0 over the full depth; the plume slides under
    the ambient water. Channel mesh (periodic x, walls y)."""
    bottom_depth = 2000.0
    nC = mesh.nCells
    y = np.asarray(mesh.yCell)
    grid, h0 = _uniform_grid(mesh, nz, bottom_depth, dtype)

    t_ambient, t_dense = 10.0, 1.0
    frontal_width = 0.1 * (y.max() - y.min())
    y0 = y.min() + 0.2 * (y.max() - y.min())
    frac = np.clip((y - y0) / frontal_width, 0.0, 1.0)
    T = (t_dense + (t_ambient - t_dense) * frac)[:, None] \
        * np.ones((1, nz))
    S = np.full((nC, nz), 35.0)
    tracers = np.stack([T, S], axis=-1)

    state = OcnState(ubtr=np.zeros(mesh.nEdges, dtype=dtype),
                     u=np.zeros((mesh.nEdges, nz), dtype=dtype),
                     layerThickness=h0.astype(dtype),
                     tracers=tracers.astype(dtype))
    return grid, state


def init_internal_waves(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """Internal-wave channel (ref: mpas_ocn_init_internal_waves.F):
    stratified channel with a mid-depth temperature interface displaced
    upward in the channel center; releases internal gravity waves."""
    bottom_depth = 500.0
    nC = mesh.nCells
    y = np.asarray(mesh.yCell)
    grid, h0 = _uniform_grid(mesh, nz, bottom_depth, dtype)

    z_mid = -(np.arange(nz) + 0.5) * bottom_depth / nz
    t_surf, t_bot = 20.1, 10.1
    interface0 = -0.5 * bottom_depth
    amplitude = 0.3 * bottom_depth          # interface displacement
    y_min, y_max = y.min(), y.max()
    yfrac = (y - y_min) / (y_max - y_min)
    # raised interface in the channel middle (ref: :~200 displacement)
    disp = amplitude * np.exp(-((yfrac - 0.5) / 0.15) ** 2)
    interface = interface0 + disp                      # (nC,)
    width = 0.1 * bottom_depth
    T = t_bot + (t_surf - t_bot) * 0.5 * (
        1.0 + np.tanh((z_mid[None, :] - interface[:, None]) / width))
    S = np.full((nC, nz), 35.0)
    tracers = np.stack([T, S], axis=-1)

    state = OcnState(ubtr=np.zeros(mesh.nEdges, dtype=dtype),
                     u=np.zeros((mesh.nEdges, nz), dtype=dtype),
                     layerThickness=h0.astype(dtype),
                     tracers=tracers.astype(dtype))
    return grid, state


def init_cosine_bell(mesh: Mesh, nz: int = 3, dtype=np.float64):
    """Cosine-bell passive tracer in solid-body rotation on the sphere
    (ref: mpas_ocn_init_cosine_bell.F; Williamson TC1 analogue). Tracer 3
    is the bell; velocity is zonal solid-body rotation."""
    assert mesh.on_sphere
    bottom_depth = 300.0
    nC = mesh.nCells
    grid, h0 = _uniform_grid(mesh, nz, bottom_depth, dtype)

    lat = np.asarray(mesh.latCell)
    lon = np.asarray(mesh.lonCell)
    lat0, lon0 = 0.0, 3.0 * pii / 2.0
    radius = mesh.sphere_radius / 3.0
    r = mesh.sphere_radius * np.arccos(
        np.clip(np.sin(lat0) * np.sin(lat)
                + np.cos(lat0) * np.cos(lat) * np.cos(lon - lon0),
                -1.0, 1.0))
    psi = np.where(r < radius,
                   0.5 * (1.0 + np.cos(pii * r / radius)), 0.0)

    # solid-body zonal flow: u_n = u0 (cos(lat_e) cos(a) ...) with alpha=0
    u0 = 2.0 * pii * mesh.sphere_radius / (24.0 * 86400.0)
    ang = np.asarray(mesh.angleEdge)
    late = np.asarray(mesh.latEdge)
    un = u0 * np.cos(late) * np.cos(ang)
    u = np.broadcast_to(un[:, None], (mesh.nEdges, nz)).copy()

    T = np.full((nC, nz), 15.0)
    S = np.full((nC, nz), 35.0)
    bell = np.broadcast_to(psi[:, None], (nC, nz)).copy()
    tracers = np.stack([T, S, bell], axis=-1)

    state = OcnState(ubtr=np.zeros(mesh.nEdges, dtype=dtype),
                     u=u.astype(dtype),
                     layerThickness=h0.astype(dtype),
                     tracers=tracers.astype(dtype))
    return grid, state
