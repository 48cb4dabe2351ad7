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


# ---------------------------------------------------------------------------
# variable-bathymetry helpers (partial bottom cells + level masks)
# ---------------------------------------------------------------------------

def _pbc_grid(mesh, nz, bottom_depth_cell, max_depth, dtype, coriolis=None,
              min_pbc_fraction=0.25):
    """z-level grid with partial bottom cells over variable bathymetry
    (ref: ocn_init_vertical_grids + the config_min_pbc_fraction treatment
    in mpas_ocn_init_* configs): uniform refBottomDepth, maxLevelCell from
    the local depth, bottom layer partial, dead levels at epsilon
    thickness and excluded by the level masks."""
    from mpas_tpu.cores.ocean.core import build_level_masks
    nC = mesh.nCells
    dz = max_depth / nz
    depth = np.clip(np.asarray(bottom_depth_cell, dtype=np.float64),
                    2.0 * dz, max_depth)
    mlc = np.minimum(np.ceil(depth / dz - 1e-9).astype(np.int64), nz)
    mlc = np.maximum(mlc, 2)
    k = np.arange(nz)
    h0 = np.full((nC, nz), dz)
    # partial bottom layer (at least min_pbc_fraction of dz)
    bottom_partial = np.maximum(depth - (mlc - 1) * dz,
                                min_pbc_fraction * dz)
    h0[k[None, :] == (mlc - 1)[:, None]] = 0.0
    h0 = np.where(k[None, :] == (mlc - 1)[:, None],
                  bottom_partial[:, None], h0)
    eps = 1e-3 * dz
    h0 = np.where(k[None, :] >= mlc[:, None], eps, h0)
    depth_actual = np.sum(np.where(k[None, :] < mlc[:, None], h0, 0.0), -1)

    dtypec = np.asarray(mesh.areaCell).dtype
    if coriolis is not None:
        mesh = mesh.replace(
            fEdge=np.asarray(coriolis(np.asarray(mesh.yEdge),
                                      np.asarray(mesh.latEdge)),
                             dtype=dtypec),
            fVertex=np.asarray(coriolis(np.asarray(mesh.yVertex),
                                        np.asarray(mesh.latVertex)),
                               dtype=dtypec),
            fCell=np.asarray(coriolis(np.asarray(mesh.yCell),
                                      np.asarray(mesh.latCell)),
                             dtype=dtypec))
    cmask, emask = build_level_masks(mesh, mlc, nz, dtype)
    grid = OcnGrid(mesh=mesh, restingThickness=h0.astype(dtype),
                   bottomDepth=depth_actual.astype(dtype),
                   maxLevelCell=mlc.astype(np.int32), nz=nz,
                   cellMask=cmask, edgeMask=emask)
    return grid, h0


def _state(mesh, nz, h0, tracers, dtype, u=None):
    if u is None:
        u = np.zeros((mesh.nEdges, nz))
    return OcnState(ubtr=np.zeros(mesh.nEdges, dtype=dtype),
                    u=np.asarray(u, dtype=dtype),
                    layerThickness=np.asarray(h0, dtype=dtype),
                    tracers=np.asarray(tracers, dtype=dtype))


def init_lock_exchange(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """Dam-break / lock exchange (ref: mpas_ocn_init_lock_exchange.F):
    cold dense water in the left half of a flat-bottomed box, warm in the
    right; fronts propagate as gravity currents."""
    bottom_depth = 20.0
    nC = mesh.nCells
    x = np.asarray(mesh.xCell)
    grid, h0 = _uniform_grid(mesh, nz, bottom_depth, dtype)
    x_mid = 0.5 * (x.min() + x.max())
    T = np.where(x[:, None] < x_mid, 5.0, 30.0) * np.ones((1, nz))
    S = np.full((nC, nz), 35.0)
    return grid, _state(mesh, nz, h0, np.stack([T, S], -1), dtype)


def init_sea_mount(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """Stratified resting state over a Gaussian seamount (ref:
    mpas_ocn_init_sea_mount.F): the classic pressure-gradient-error test —
    a perfectly balanced state must stay at rest over steep topography."""
    max_depth = 5000.0
    nC = mesh.nCells
    x, y = np.asarray(mesh.xCell), np.asarray(mesh.yCell)
    x0, y0 = 0.5 * (x.min() + x.max()), 0.5 * (y.min() + y.max())
    width = 0.15 * (x.max() - x.min())
    depth = max_depth - 0.9 * max_depth * np.exp(
        -((x - x0) ** 2 + (y - y0) ** 2) / width ** 2)
    grid, h0 = _pbc_grid(mesh, nz, depth, max_depth, dtype,
                         coriolis=lambda yy, lat: np.full_like(yy, 1e-4))
    z_mid = -np.cumsum(h0, -1) + 0.5 * h0
    T = 5.0 + 15.0 * np.exp(z_mid / 1000.0)      # exponential stratification
    S = np.full((nC, nz), 35.0)
    return grid, _state(mesh, nz, h0, np.stack([T, S], -1), dtype)


def init_ziso(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """Zonally-periodic Idealized Southern Ocean (ref:
    mpas_ocn_init_ziso.F): beta-plane channel, meridional shelf-slope
    bathymetry, tanh thermocline T(z) = t1 + t2*tanh(z/h1) + mt*z
    (ref :388-389), and a sin^2 westerly wind-stress profile (ref
    :~300 windStressZonal). Returns (grid, state, forcing)."""
    from mpas_tpu.cores.ocean.forcing import OcnSurfaceForcing, zero_forcing
    max_depth = 2500.0
    shelf_depth = 500.0
    nC = mesh.nCells
    y = np.asarray(mesh.yCell)
    ly = y.max() - y.min()
    y_rel = y - y.min()
    # shelf -> deep transition (ref config_ziso_slope_center_position)
    slope_center, slope_half = 0.25 * ly, 0.1 * ly
    depth = shelf_depth + 0.5 * (max_depth - shelf_depth) \
        * (1.0 + np.tanh((y_rel - slope_center) / slope_half))
    f0, beta = -1e-4, 1e-11
    grid, h0 = _pbc_grid(
        mesh, nz, depth, max_depth, dtype,
        coriolis=lambda yy, lat: f0 + beta * (yy - y.min()))
    z_mid = -np.cumsum(h0, -1) + 0.5 * h0
    t1, t2, h1, mt = 6.0, 3.6, 300.0, 0.0
    T = t1 + t2 * np.tanh(z_mid / h1) + mt * z_mid   # (ref :388-389)
    S = np.full((nC, nz), 34.5)
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    # wind stress: tau = tau_max * sin^2(pi * y / Ly) (ref :~300)
    tau_max = 0.2
    tau = tau_max * np.sin(pii * y_rel / ly) ** 2
    f = zero_forcing(nC, dtype=np.asarray(h0).dtype)
    forcing = f.replace(windStressZonal=np.asarray(tau, dtype=dtype))
    return grid, state, forcing


def init_soma(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """SOMA — Simulating Ocean Mesoscale Activity (ref:
    mpas_ocn_init_soma.F): a circular mid-latitude basin on the sphere
    with a shelf rim, bowl bathymetry factor = 1 - r^2/W^2 (ref :252-259),
    exponential-thermocline stratification and a double-gyre zonal wind.
    Returns (grid, state, forcing)."""
    from mpas_tpu.cores.ocean.forcing import zero_forcing
    assert mesh.on_sphere
    from mpas_tpu.constants import omega
    if mesh.sphere_radius < 1e6:         # unit sphere -> Earth radius
        mesh = mesh.scaled(6.371e6)
    bottom_depth, shelf_depth = 2500.0, 100.0
    lat_c, lon_c = 35.0 * pii / 180.0, pii
    domain_width = 1.25e6 / mesh.sphere_radius   # angular basin radius
    nC = mesh.nCells
    lat, lon = np.asarray(mesh.latCell), np.asarray(mesh.lonCell)
    dlat = lat - lat_c
    dlon = (lon - lon_c + pii) % (2.0 * pii) - pii
    dist = np.sqrt(dlat ** 2 + (np.cos(lat_c) * dlon) ** 2)
    factor = 1.0 - dist ** 2 / domain_width ** 2
    # bowl: shelf at the rim, deep in the middle (ref :256)
    depth = shelf_depth + 0.5 * (bottom_depth - shelf_depth) \
        * (1.0 + np.tanh(8.0 * (factor - 0.2)))
    grid, h0 = _pbc_grid(mesh, nz, depth, bottom_depth, dtype,
                         coriolis=lambda yy, lat_: 2.0 * omega
                         * np.sin(lat_))
    z_mid = -np.cumsum(h0, -1) + 0.5 * h0
    # T = Ts + dT*(exp(z/h_th) - 1) genre (ref :335-345 via linear EOS)
    T = 20.0 + 13.0 * (np.exp(z_mid / 300.0) - 1.0)
    S = 34.0 - 2.0 * z_mid / bottom_depth            # (ref :343-344)
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    # double-gyre zonal wind over the basin (ref :360-385)
    tau = 0.1 * np.cos(pii * (lat - lat_c) / (0.5 * domain_width)) \
        * (dist < domain_width)
    f = zero_forcing(nC, dtype=np.asarray(h0).dtype)
    forcing = f.replace(windStressZonal=np.asarray(tau, dtype=dtype))
    return grid, state, forcing


def init_isomip(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """ISOMIP ice-shelf cavity (ref: mpas_ocn_init_isomip.F): a cold
    cavity under a prescribed ice-shelf draft deepening poleward; the
    water column spans [draft, bottom]. Returns (grid, state, extras)
    with extras carrying landIceDraft and landIcePressure."""
    bottom_depth = 900.0
    nC = mesh.nCells
    y = np.asarray(mesh.yCell)
    ly = max(y.max() - y.min(), 1.0)
    yfrac = (y - y.min()) / ly
    # draft: 700 m at the grounding line -> 200 m at the front (ref genre)
    draft = 700.0 - 500.0 * yfrac
    column = bottom_depth - draft                  # water-column thickness
    grid, h0 = _pbc_grid(mesh, nz, column, bottom_depth, dtype,
                         coriolis=lambda yy, lat: np.full_like(yy, -1.4e-4))
    T = np.full((nC, nz), -1.9)                    # near-freezing cavity
    S = np.full((nC, nz), 34.5)
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    rho_i = 918.0
    extras = {"landIceDraft": -draft.astype(dtype),
              "landIcePressure": (rho_i * 9.80616
                                  * draft).astype(dtype)}
    return grid, state, extras


def init_sub_ice_shelf_2d(mesh: Mesh, nz: int = 20, dtype=np.float64):
    """2-D sub-ice-shelf channel (ref: mpas_ocn_init_sub_ice_shelf_2D.F):
    linear ice draft over half the channel, open ocean beyond."""
    bottom_depth = 720.0
    nC = mesh.nCells
    y = np.asarray(mesh.yCell)
    ly = max(y.max() - y.min(), 1.0)
    yfrac = (y - y.min()) / ly
    draft = np.where(yfrac < 0.5, 600.0 * (1.0 - 2.0 * yfrac), 0.0)
    column = bottom_depth - draft
    grid, h0 = _pbc_grid(mesh, nz, column, bottom_depth, dtype,
                         coriolis=lambda yy, lat: np.full_like(yy, -1.4e-4))
    T = np.full((nC, nz), -1.5)
    S = np.full((nC, nz), 34.7)
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    rho_i = 918.0
    extras = {"landIceDraft": -draft.astype(dtype),
              "landIcePressure": (rho_i * 9.80616 * draft).astype(dtype)}
    return grid, state, extras


def init_cvmix_wswsbf(mesh: Mesh, nz: int = 40, dtype=np.float64):
    """Single-column genre: Wind Stress with Surface Buoyancy Forcing
    (ref: mpas_ocn_init_cvmix_WSwSBF.F) — uniformly stratified resting
    column(s) driven by constant wind stress and surface cooling, for
    exercising the vertical-mixing schemes. Returns (grid, state,
    forcing)."""
    from mpas_tpu.cores.ocean.forcing import zero_forcing
    bottom_depth = 400.0
    nC = mesh.nCells
    grid, h0 = _uniform_grid(mesh, nz, bottom_depth, dtype, coriolis=1e-4)
    z_mid = -(np.arange(nz) + 0.5) * bottom_depth / nz
    T = (15.0 + 0.01 * z_mid)[None, :] * np.ones((nC, 1))
    S = np.full((nC, nz), 35.0)
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    f = zero_forcing(nC, dtype=np.asarray(h0).dtype)
    forcing = f.replace(
        windStressZonal=np.full(nC, 0.1, dtype=dtype),
        sensibleHeatFlux=np.full(nC, -75.0, dtype=dtype))
    return grid, state, forcing


def init_global_ocean_idealized(mesh: Mesh, nz: int = 20,
                                dtype=np.float64):
    """Idealized stand-in for the real-data global_ocean configuration
    (ref: mpas_ocn_init_global_ocean.F reads observed T/S/bathymetry from
    files not vendored here): an aqua-planet with analytic large-scale
    bathymetry (deep basins, a shallow circum-equatorial ridge), Levitus-
    like stratification, solid land masses via maxLevelCell at the two
    polar caps, and zonal trade/westerly wind bands. Returns
    (grid, state, forcing)."""
    from mpas_tpu.constants import omega
    from mpas_tpu.cores.ocean.forcing import zero_forcing
    assert mesh.on_sphere
    if mesh.sphere_radius < 1e6:         # unit sphere -> Earth radius
        mesh = mesh.scaled(6.371e6)
    max_depth = 5000.0
    nC = mesh.nCells
    lat, lon = np.asarray(mesh.latCell), np.asarray(mesh.lonCell)
    depth = max_depth - 1500.0 * np.cos(2.0 * lon) ** 2 \
        * np.cos(lat) ** 2 - 800.0 * np.exp(-(lat / 0.15) ** 2)
    # polar "land": shallowest columns (still >= 2 levels — the masks make
    # them near-inert; a true land mask is a later milestone)
    depth = np.where(np.abs(lat) > 80.0 * pii / 180.0,
                     2.0 * max_depth / nz, depth)
    grid, h0 = _pbc_grid(mesh, nz, depth, max_depth, dtype,
                         coriolis=lambda yy, lat_: 2.0 * omega
                         * np.sin(lat_))
    z_mid = -np.cumsum(h0, -1) + 0.5 * h0
    T = 2.0 + 25.0 * np.exp(z_mid / 800.0) * np.cos(lat[:, None]) ** 2
    S = 34.7 + 0.7 * np.exp(z_mid / 1000.0)
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    tau = 0.1 * (np.cos(3.0 * lat) * np.cos(lat))    # trades + westerlies
    f = zero_forcing(nC, dtype=np.asarray(h0).dtype)
    forcing = f.replace(windStressZonal=np.asarray(tau, dtype=dtype))
    return grid, state, forcing


# ---------------------------------------------------------------------------
# ssh / land-ice pressure balance utility
# (ref: mpas_ocn_init_ssh_and_landIcePressure.F:91-420)
# ---------------------------------------------------------------------------

def ssh_and_land_ice_pressure_balance(grid, state, ssh=None,
                                      land_ice_pressure=None,
                                      variable="landIcePressure",
                                      dtype=np.float64):
    """Balance land-ice pressure against SSH so the initial barotropic
    pressure-gradient force under the ice shelf is small (ref:
    ocn_init_ssh_and_landIcePressure_balance,
    mpas_ocn_init_ssh_and_landIcePressure.F:107-420).

    variable='landIcePressure': given ssh (<= 0, the ice draft), compute
      landIcePressure = g * integral of in-situ density from z=ssh to 0
      using the column's upper-layer densities (the reference's effective
      seawater density within the land ice).
    variable='ssh': given landIcePressure, invert the same hydrostatic
      relation for ssh.
    Also squashes the column's layer thicknesses so it spans
    [-bottomDepth, ssh] (the reference's vertical-grid update), scaling
    live layers proportionally. Returns (state', ssh, landIcePressure).
    """
    from mpas_tpu.cores.ocean.core import OcnConfig, equation_of_state
    g = 9.80616
    cfg = OcnConfig(config_eos_type="jm")
    h = np.asarray(state.layerThickness, dtype=np.float64)
    T = np.asarray(state.tracers[..., 0], dtype=np.float64)
    S = np.asarray(state.tracers[..., 1], dtype=np.float64)
    rho = np.asarray(equation_of_state(cfg, T, S))
    rho_top = rho[:, 0]
    if variable == "ssh":
        assert land_ice_pressure is not None
        lip = np.asarray(land_ice_pressure, dtype=np.float64)
        ssh = -lip / (g * np.maximum(rho_top, 1.0))
    else:
        assert ssh is not None
        ssh = np.asarray(ssh, dtype=np.float64)
        lip = g * np.maximum(rho_top, 1.0) * (-ssh)
    # squash live layers so the column spans [-bottomDepth, ssh]
    bd = np.asarray(grid.bottomDepth, dtype=np.float64)
    mlc = np.asarray(grid.maxLevelCell)
    k = np.arange(grid.nz)
    live = k[None, :] < mlc[:, None]
    h_live = np.where(live, h, 0.0)
    col = np.sum(h_live, -1)
    target = np.maximum(bd + ssh, 1e-2)
    scale = target / np.maximum(col, 1e-12)
    h_new = np.where(live, h_live * scale[:, None], h)
    state = state.replace(
        layerThickness=np.asarray(h_new, dtype=dtype))
    return state, ssh.astype(dtype), lip.astype(dtype)


def init_isomip_plus(mesh: Mesh, nz: int = 30, dtype=np.float64,
                     warm: bool = True):
    """ISOMIP+ Ocean0-style cavity (ref: mpas_ocn_init_isomip_plus.F):
    linear-in-depth T/S between (top_temp, top_sal) and (bottom_temp,
    bottom_sal), an ice draft ramp from the grounding line to the open
    front, the ssh/landIcePressure balance applied, and far-field
    restoring masks at the open-ocean end. Returns (grid, state, extras)
    with extras = {landIceDraft, landIcePressure, restoringMask,
    restoringT, restoringS}."""
    bottom_depth = 720.0
    nC = mesh.nCells
    y = np.asarray(mesh.yCell)
    ly = max(y.max() - y.min(), 1.0)
    yfrac = (y - y.min()) / ly
    # ice shelf occupies the first 60% of the domain: draft ramps from
    # 640 m (grounding line) to 0 at the front (ISOMIP+ Ocean0 genre)
    front = 0.6
    draft = np.where(yfrac < front,
                     640.0 * (1.0 - yfrac / front), 0.0)
    grid, h0 = _pbc_grid(mesh, nz, np.full(nC, bottom_depth), bottom_depth,
                         dtype,
                         coriolis=lambda yy, lat: np.full_like(yy, -1.4e-4))
    if warm:
        top_t, bot_t, top_s, bot_s = -1.9, 1.0, 33.8, 34.7
    else:
        top_t, bot_t, top_s, bot_s = -1.9, -1.9, 33.8, 34.55
    z_mid = -np.cumsum(h0, -1) + 0.5 * h0
    frac = np.clip(-z_mid / bottom_depth, 0.0, 1.0)
    T = (1.0 - frac) * top_t + frac * bot_t
    S = (1.0 - frac) * top_s + frac * bot_s
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    state, ssh, lip = ssh_and_land_ice_pressure_balance(
        grid, state, ssh=-draft, variable="landIcePressure", dtype=dtype)
    grid = grid.replace(surfacePressure=lip)
    # far-field (open ocean end) 3-D restoring masks (ref :280-320)
    restoring = np.clip((yfrac - 0.9) / 0.1, 0.0, 1.0)
    extras = {"landIceDraft": (-draft).astype(dtype),
              "landIcePressure": lip,
              "restoringMask": restoring.astype(dtype),
              "restoringT": np.asarray(T, dtype=dtype),
              "restoringS": np.asarray(S, dtype=dtype)}
    return grid, state, extras


def init_periodic_planar(mesh: Mesh, nz: int = 10, dtype=np.float64,
                         velocity_strength: float = 1.0,
                         bottom_depth: float = 1000.0):
    """Doubly periodic planar debug configuration (ref:
    mpas_ocn_init_periodic_planar.F:77-361): uniform T/S, layer
    thicknesses from uniform interface locations, and a divergence-free
    velocity from the vertex streamfunction psi = y * strength
    (u_e = -(psi_v2 - psi_v1)/dvEdge -> uniform +x flow)."""
    nC = mesh.nCells
    grid, h0 = _uniform_grid(mesh, nz, bottom_depth, dtype, coriolis=1e-4)
    T = np.full((nC, nz), 15.0)
    S = np.full((nC, nz), 35.0)
    psi_v = np.asarray(mesh.yVertex, dtype=np.float64) * velocity_strength
    voe = np.asarray(mesh.verticesOnEdge)
    dv = np.asarray(mesh.dvEdge, dtype=np.float64)
    # minimal-image handling of the periodic seam: a psi jump larger than
    # half the period is a wrap, shift by one period
    dpsi = psi_v[voe[:, 1]] - psi_v[voe[:, 0]]
    if mesh.y_period > 0.0:
        p = mesh.y_period * velocity_strength
        dpsi = dpsi - p * np.round(dpsi / p)
    u_e = -(dpsi / np.maximum(dv, 1e-12))[:, None] * np.ones((1, nz))
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype, u=u_e)
    return grid, state


def init_ecosys_column(mesh: Mesh, nz: int = 30, dtype=np.float64):
    """Ecosystem column test (ref: mpas_ocn_init_ecosys_column.F — column
    ecosys state over an idealized stratification; the reference reads
    initial profiles from file, here they are the standard analytic
    equivalents): stratified T/S plus the 8 ecosys-class tracers of
    bgc.EcosysParams (NO3, SiO3, Fe, spN, diatN, zooN, detN, detSi) with
    nutrient-rich deep water and seed plankton in the euphotic zone.
    Returns (grid, state)."""
    bottom_depth = 300.0
    nC = mesh.nCells
    grid, h0 = _uniform_grid(mesh, nz, bottom_depth, dtype)
    z_mid = -np.cumsum(h0, -1) + 0.5 * h0
    T = 4.0 + 16.0 * np.exp(z_mid / 50.0)
    S = np.full((nC, nz), 34.5)
    zf = -z_mid
    no3 = 1.0 + 30.0 * zf / (zf + 100.0)          # nutricline
    sio3 = 2.0 + 60.0 * zf / (zf + 150.0)
    fe = 1e-4 + 5e-4 * zf / (zf + 200.0)          # mmol/m3 (~0.1-0.6 nM)
    eu = np.exp(z_mid / 30.0)                     # euphotic seed profile
    sp = 0.1 * eu
    diat = 0.1 * eu
    zoo = 0.05 * eu
    detn = np.full((nC, nz), 1e-3)
    detsi = np.full((nC, nz), 1e-3)
    tracers = np.stack([T, S, no3, sio3, fe, sp, diat, zoo, detn, detsi],
                       axis=-1)
    return grid, _state(mesh, nz, h0, tracers, dtype)


def init_iso(mesh: Mesh, nz: int = 20, dtype=np.float64,
             ridge: bool = True, plateau: bool = True, shelf: bool = True,
             cont_slope: bool = True, embayment: bool = True,
             depression: bool = True):
    """ISO — Idealized Southern Ocean (ref: mpas_ocn_init_iso.F +
    Registry_iso.xml): a circumpolar channel between south/north wall
    latitudes whose bathymetry composes independently-togglable features
    (meridional ridge, plateau, coastal shelf, continental slope,
    embayment, depression — config_iso_{ridge,plateau,shelf,...}_flag),
    with an exponential thermocline and a zonal wind-stress jet over the
    channel core. The reference's default feature set maps 1:1 onto the
    keyword flags. Returns (grid, state, forcing)."""
    from mpas_tpu.constants import omega
    from mpas_tpu.cores.ocean.forcing import zero_forcing
    assert mesh.on_sphere
    if mesh.sphere_radius < 1e6:
        mesh = mesh.scaled(6.371e6)
    R = mesh.sphere_radius
    d2r = pii / 180.0
    lat = np.asarray(mesh.latCell)
    lon = np.asarray(mesh.lonCell)
    lat_s, lat_n = -70.0 * d2r, -50.0 * d2r       # channel walls
    main_depth = 4000.0

    depth = np.full(mesh.nCells, main_depth)

    def dlon_m(lon0_deg, at_lat):
        d = (lon - lon0_deg * d2r + pii) % (2.0 * pii) - pii
        return d * np.cos(at_lat) * R

    if ridge:
        # meridional ridge: Gaussian in longitude (center 180E, height
        # 2000 m, width 2000 km; Registry_iso.xml:22-32)
        x = dlon_m(180.0, lat)
        depth -= 2000.0 * np.exp(-(x / 1.0e6) ** 2)
    if plateau:
        # radial plateau at (300E, 58S): height 2000 m, radius 200 km,
        # tanh slope over 1000 km (Registry_iso.xml:38-56)
        dx = dlon_m(300.0, -58.0 * d2r)
        dy = (lat - (-58.0 * d2r)) * R
        r = np.sqrt(dx ** 2 + dy ** 2)
        depth -= 2000.0 * 0.5 * (1.0 - np.tanh((r - 2.0e5) / 5.0e5))
    if embayment:
        # deep embayment cut into the coast at (60E, 71S)
        dx = dlon_m(60.0, -71.0 * d2r)
        dy = (lat - (-71.0 * d2r)) * R
        r = np.sqrt(dx ** 2 + dy ** 2)
        emb = r < 5.0e5
    else:
        emb = np.zeros_like(lat, dtype=bool)
    if shelf:
        # coastal shelf along the south wall: 500 m depth over 120 km
        ds = (lat - lat_s) * R
        on_shelf = (ds < 1.2e5) & ~emb
        depth = np.where(on_shelf, 500.0, depth)
        if cont_slope:
            # continental slope from the shelf break at max slope 0.01
            slope_w = (main_depth - 500.0) / 0.01
            ramp = np.clip((ds - 1.2e5) / slope_w, 0.0, 1.0)
            depth = np.where(~on_shelf & ~emb,
                             np.minimum(depth, 500.0 + ramp
                                        * (main_depth - 500.0)), depth)
    if embayment:
        depth = np.where(emb, np.minimum(depth, 2000.0), depth)
    if depression:
        # longitudinal depression north of the embayment (60E band,
        # 72S-65S, width 480 km, 800 m deeper; Registry_iso.xml:102-118)
        dx = np.abs(dlon_m(60.0, -68.0 * d2r))
        band = (dx < 2.4e5) & (lat > -72.0 * d2r) & (lat < -65.0 * d2r)
        depth = np.where(band, depth + 800.0, depth)
    depth = np.clip(depth, 500.0, main_depth + 800.0)
    # walls outside the channel band
    inside = (lat > lat_s) & (lat < lat_n)
    depth = np.where(inside, depth, 2.0 * (main_depth / nz))

    grid, h0 = _pbc_grid(mesh, nz, depth, main_depth + 800.0, dtype,
                         coriolis=lambda yy, lat_: 2.0 * omega
                         * np.sin(lat_))
    z_mid = -np.cumsum(h0, -1) + 0.5 * h0
    # exponential thermocline above cold deep water (ref profile genre)
    T = 0.5 + 6.5 * np.exp(z_mid / 500.0)
    S = 34.0 + 0.6 * (1.0 - np.exp(z_mid / 800.0))
    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)
    # zonal wind jet peaked at the channel core (ACC forcing genre)
    lat_c = 0.5 * (lat_s + lat_n)
    tau = 0.2 * np.cos(0.5 * pii * (lat - lat_c)
                       / (0.5 * (lat_n - lat_s))) ** 2 * inside
    f = zero_forcing(mesh.nCells, dtype=np.asarray(h0).dtype)
    forcing = f.replace(windStressZonal=np.asarray(tau, dtype=dtype))
    return grid, state, forcing
