"""Real-data global-ocean initialization: gridded T/S/topography -> mesh.

ref: src/core_ocean/mode_init/mpas_ocn_init_global_ocean.F (1-3338):
the reference interpolates observed lat/lon/depth temperature/salinity
climatologies and gridded topography onto an arbitrary MPAS mesh —
horizontal interpolation of topography and tracers, depth-level ->
layer-grid vertical interpolation with below-data extrapolation, minimum
depth / minimum-level enforcement, land detection, and wind-stress
interpolation. This module implements that pipeline on a dataset dict;
a real WOA/ETOPO file loads through io.netcdf.read_netcdf (netCDF-3 or
netCDF4) into the same dict shape, and synthetic_woa_dataset() provides
an in-repo dataset of the same form (no observational archives ship in
this image).

Dataset dict contract (all numpy):
  lat (nlat,) radians ascending; lon (nlon,) radians [0, 2pi) ascending
  depth (ndep,) positive meters, ascending
  temperature/salinity (ndep, nlat, nlon)
  topography (nlat, nlon)  negative = ocean floor elevation (ETOPO sign)
  windstress_zonal (nlat, nlon)  [optional]
"""

from __future__ import annotations

import numpy as np

from mpas_tpu.mesh.mesh import Mesh


def synthetic_woa_dataset(nlat=60, nlon=120, ndep=30):
    """A WOA/ETOPO-shaped synthetic dataset: Levitus-like stratification,
    meridional SST gradient, ocean basins with shelves and a mid-ocean
    ridge. Shapes/conventions exactly match what a real-file loader
    produces."""
    lat = np.linspace(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, nlat)
    lon = np.linspace(0.0, 2.0 * np.pi, nlon, endpoint=False)
    depth = np.linspace(5.0, 5300.0, ndep)
    LA, LO = np.meshgrid(lat, lon, indexing="ij")
    topo = -5200.0 + 1200.0 * np.cos(2 * LO) ** 2 * np.cos(LA) ** 2 \
        + 900.0 * np.exp(-((LO - np.pi) / 0.15) ** 2)   # ridge
    # continents: two meridional bands reach above sea level
    topo = np.where((np.abs(LO - 0.6) < 0.25)
                    | (np.abs(LO - 3.8) < 0.3), 300.0, topo)
    z = depth[:, None, None]
    sst = 28.0 * np.cos(LA) ** 2 - 1.0
    T = 2.0 + (sst[None] - 2.0) * np.exp(-z / 800.0)
    S = 34.7 + 0.8 * np.exp(-z / 1000.0) * np.cos(LA)[None] \
        + 0.2 * np.sin(LA[None]) ** 2
    tau = 0.1 * np.cos(3.0 * LA) * np.cos(LA)
    # tidal dissipation concentrated over the ridge (rough topography)
    tidal = 2.0e-3 * np.exp(-((LO - np.pi) / 0.2) ** 2) + 2.0e-4
    return {"lat": lat, "lon": lon, "depth": depth,
            "temperature": T, "salinity": S, "topography": topo,
            "windstress_zonal": tau, "tidal_energy_flux": tidal}


def load_dataset_netcdf(path, names=None):
    """Load a gridded dataset file (netCDF-3 or netCDF4) into the dataset
    dict. names maps dict keys to file variable names (defaults are the
    WOA/ETOPO conventions)."""
    from mpas_tpu.io.netcdf import read_netcdf
    names = dict({"lat": "lat", "lon": "lon", "depth": "depth",
                  "temperature": "t_an", "salinity": "s_an",
                  "topography": "z",
                  "windstress_zonal": "taux"}, **(names or {}))
    v, dims, attrs = read_netcdf(path)
    out = {}
    for k, nm in names.items():
        if nm in v:
            arr = np.asarray(v[nm], dtype=np.float64)
            out[k] = arr
    if np.max(np.abs(out["lat"])) > np.pi:        # degrees -> radians
        out["lat"] = np.deg2rad(out["lat"])
        out["lon"] = np.mod(np.deg2rad(out["lon"]), 2.0 * np.pi)
    return out


def _bilinear(lat_g, lon_g, field, lat_q, lon_q):
    """Bilinear interpolation of field(..., nlat, nlon) at query points,
    periodic in lon (ref: the bilinear branch of
    mpas_init_atm_hinterp-style interpolation used by init_global_ocean)."""
    nlat, nlon = field.shape[-2], field.shape[-1]
    i = np.clip(np.searchsorted(lat_g, lat_q) - 1, 0, nlat - 2)
    wy = np.clip((lat_q - lat_g[i]) / (lat_g[i + 1] - lat_g[i]), 0.0, 1.0)
    dlon = lon_g[1] - lon_g[0]
    j = np.floor((lon_q - lon_g[0]) / dlon).astype(np.int64) % nlon
    jp = (j + 1) % nlon
    wx = np.clip((np.mod(lon_q - lon_g[j], 2.0 * np.pi)) / dlon, 0.0, 1.0)
    f00 = field[..., i, j]
    f01 = field[..., i, jp]
    f10 = field[..., i + 1, j]
    f11 = field[..., i + 1, jp]
    return ((1 - wy) * ((1 - wx) * f00 + wx * f01)
            + wy * ((1 - wx) * f10 + wx * f11))


def init_global_ocean(mesh: Mesh, dataset: dict, nz: int = 40,
                      max_depth: float | None = None,
                      min_ocean_depth: float = 30.0,
                      smoothing_passes: int = 1,
                      dtype=np.float64):
    """Interpolating global-ocean initialization (see module docstring).

    Returns (grid, state, forcing). Land cells (topography above
    -min_ocean_depth) get 2-level inert columns through the level masks —
    the reference's land handling via minimum maxLevelCell
    (ref: mpas_ocn_init_global_ocean.F topography + min-depth blocks)."""
    from mpas_tpu.constants import omega
    from mpas_tpu.cores.ocean.forcing import zero_forcing
    from mpas_tpu.cores.ocean.init_configs import _pbc_grid, _state

    assert mesh.on_sphere, "global ocean requires a spherical mesh"
    if mesh.sphere_radius < 1e6:
        mesh = mesh.scaled(6.371e6)
    lat = np.asarray(mesh.latCell)
    lon = np.mod(np.asarray(mesh.lonCell), 2.0 * np.pi)

    # --- topography -> bottomDepth (ref: the topography interp block) ----
    topo = _bilinear(dataset["lat"], dataset["lon"],
                     dataset["topography"], lat, lon)
    # smoothing passes over cell neighbors (ref:
    # config_global_ocean_topography_smoothing)
    coc = np.asarray(mesh.cellsOnCell)
    nEoC = np.asarray(mesh.nEdgesOnCell)
    valid = np.arange(mesh.maxEdges)[None, :] < nEoC[:, None]
    for _ in range(smoothing_passes):
        nb = np.where(valid, topo[np.maximum(coc, 0)], 0.0)
        topo = 0.5 * topo + 0.5 * nb.sum(1) / np.maximum(valid.sum(1), 1)
    depth = -topo
    land = depth < min_ocean_depth
    if max_depth is None:
        max_depth = float(np.max(dataset["depth"]))
    depth = np.clip(depth, min_ocean_depth, max_depth)

    grid, h0 = _pbc_grid(mesh, nz, np.where(land, 0.0, depth), max_depth,
                         dtype,
                         coriolis=lambda yy, la: 2.0 * omega * np.sin(la))

    # --- T/S: horizontal interp at each data level, then vertical interp
    # to layer mid-depths with below-data nearest extrapolation (ref: the
    # tracer interpolation loops + ocn_init_interpolation_*) -------------
    ddep = np.asarray(dataset["depth"])
    Tq = _bilinear(dataset["lat"], dataset["lon"],
                   dataset["temperature"], lat, lon)     # (ndep, nC)
    Sq = _bilinear(dataset["lat"], dataset["lon"],
                   dataset["salinity"], lat, lon)
    z_mid = np.cumsum(h0, -1) - 0.5 * h0                 # (nC, nz) +down
    T = np.empty_like(z_mid)
    S = np.empty_like(z_mid)
    for k in range(nz):
        zk = z_mid[:, k]
        i = np.clip(np.searchsorted(ddep, zk) - 1, 0, len(ddep) - 2)
        w = np.clip((zk - ddep[i]) / (ddep[i + 1] - ddep[i]), 0.0, 1.0)
        cols = np.arange(mesh.nCells)
        T[:, k] = (1 - w) * Tq[i, cols] + w * Tq[i + 1, cols]
        S[:, k] = (1 - w) * Sq[i, cols] + w * Sq[i + 1, cols]

    state = _state(mesh, nz, h0, np.stack([T, S], -1), dtype)

    if "tidal_energy_flux" in dataset:
        tef = _bilinear(dataset["lat"], dataset["lon"],
                        dataset["tidal_energy_flux"], lat, lon)
        grid = grid.replace(tidalEnergyFlux=np.asarray(
            np.where(land, 0.0, tef), dtype=dtype))
    forcing = zero_forcing(mesh.nCells, dtype)
    if "windstress_zonal" in dataset:
        tau_c = _bilinear(dataset["lat"], dataset["lon"],
                          dataset["windstress_zonal"], lat, lon)
        forcing = forcing.replace(
            windStressZonal=np.asarray(tau_c, dtype=dtype))
    return grid, state, forcing
