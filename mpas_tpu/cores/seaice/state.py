"""Sea-ice grid/state/forcing containers.

ref: src/core_seaice/Registry.xml var_structs `icestate` (iceAreaCategory,
iceVolumeCategory, snowVolumeCategory, ...), `velocity_solver` (uVelocity,
vVelocity, stresses), `atmos_coupling`/`ocean_coupling` forcing fields.
Redesigned as flat struct-of-arrays pytrees; the ITD category dimension is
the trailing (lane) dimension so per-category column physics vectorizes.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from mpas_tpu.mesh.mesh import Mesh


@struct.dataclass
class SeaiceGrid:
    mesh: Mesh
    # outward unit normal of each cell's edges in local (east, north)
    # coordinates: ref normalVectorPolygon (mpas_seaice_mesh.F:713)
    normalPolygonE: Any    # (nCells, maxEdges)
    normalPolygonN: Any    # (nCells, maxEdges)
    # outward unit normal of each vertex dual-triangle side:
    # ref normalVectorTriangle (mpas_seaice_mesh.F:714)
    normalTriangleE: Any   # (nVertices, vertexDegree)
    normalTriangleN: Any   # (nVertices, vertexDegree)
    # metric-term latitudes (zeros on planar meshes)
    tanLatCellOverR: Any   # (nCells,)
    tanLatVertexOverR: Any # (nVertices,)
    # interior-vertex mask (0 at domain-boundary vertices: no-slip walls)
    interiorVertex: Any    # (nVertices,)
    # Wachspress basis tensors for the variational scheme (None = weak-only)
    variational: Any = None
    # global minimum edge length, for the revised-EVP numerical inertia
    # coefficient (ref: seaice_init_evp's dvEdgeMinGlobal dmpar_min,
    # mpas_seaice_velocity_solver_constitutive_relation.F:104-131);
    # computed host-side at grid build so every shard carries the same
    # global value (the analogue of the reference's mpas_dmpar_min_real)
    dvEdgeMin: Any = None


@struct.dataclass
class SeaiceState:
    # ice-thickness-distribution state, per cell per category
    iceAreaCategory: Any      # (nCells, nCat) fractional area
    iceVolumeCategory: Any    # (nCells, nCat) m (volume per unit cell area)
    snowVolumeCategory: Any   # (nCells, nCat) m
    surfaceTemperature: Any   # (nCells, nCat) deg C
    # dynamics state at vertices
    uVelocity: Any            # (nVertices,)
    vVelocity: Any            # (nVertices,)
    # persisted EVP stresses at cells (weak scheme), ref stress11/22/12var
    stress11: Any             # (nCells,)
    stress22: Any             # (nCells,)
    stress12: Any             # (nCells,)
    # multilayer thermodynamics state (None in zero-layer mode):
    # per-layer enthalpies, J/m3 (ref iceEnthalpy/snowEnthalpy tracers)
    iceEnthalpy: Any = None   # (nCells, nCat, nIceLayers)
    snowEnthalpy: Any = None  # (nCells, nCat, nSnowLayers)
    # melt-pond tracers (ref pondArea/pondDepth/pondLidThickness;
    # ice_meltpond_{cesm,lvl,topo}.F90) — None when ponds are off
    pondArea: Any = None      # (nCells, nCat) pond fraction
    pondDepth: Any = None     # (nCells, nCat) m
    pondLid: Any = None       # (nCells, nCat) refrozen lid, m (lvl only)
    # level-ice tracers fed by ridging (ref alvl/vlvl,
    # ice_colpkg_tracers.F90)
    levelIceArea: Any = None  # (nCells, nCat) level fraction of area
    levelIceVolume: Any = None
    # age / first-year tracers (ice_age.F90, ice_firstyear.F90)
    iceAge: Any = None        # (nCells, nCat) seconds
    firstYearArea: Any = None
    # BGC (ice_brine.F90 / ice_algae.F90)
    brineHeight: Any = None   # (nCells, nCat) m from the ice bottom
    # prognostic per-layer bulk salinity (ref: the zsalinity/mushy
    # salinity tracers, ice_zsalinity.F90 / ice_therm_mushy.F90)
    iceSalinity: Any = None   # (nCells, nCat, nIceLayers) psu
    algaeIce: Any = None      # (nCells, nCat) mmol N/m2 skeletal layer
    nitrateIce: Any = None
    silicateIce: Any = None
    # snow metamorphism (grain radius m, effective density kg/m3)
    snowGrainRadius: Any = None
    snowDensity: Any = None


@struct.dataclass
class SeaiceForcing:
    # atmosphere (at cells)
    uAirVelocity: Any         # (nCells,)
    vAirVelocity: Any         # (nCells,)
    airTemperature: Any       # (nCells,) deg C
    shortwaveDown: Any        # (nCells,) W/m2
    longwaveDown: Any         # (nCells,) W/m2
    # ocean (at cells)
    uOceanVelocity: Any       # (nCells,)
    vOceanVelocity: Any       # (nCells,)
    seaSurfaceTemperature: Any  # (nCells,) deg C
    oceanHeatFlux: Any        # (nCells,) W/m2 into the ice bottom
    # sea-surface tilt force components at vertices (m/s2 * mass handled
    # in the solver; ref surface_tilt_* mpas_seaice_velocity_solver.F:1819)
    sshGradientU: Any         # (nVertices,)
    sshGradientV: Any         # (nVertices,)
    # precipitation (ref rainfallRate/snowfallRate atmos coupling fields)
    rainfallRate: Any = None  # (nCells,) kg/m2/s
    snowfallRate: Any = None  # (nCells,) m/s of snow depth
    # aerosol deposition (nCells, nSpecies) kg/m2/s — None = no aerosols
    aerosolDeposition: Any = None


def make_grid(mesh: Mesh, variational: bool = False) -> SeaiceGrid:
    """Precompute the weak-scheme geometry (host-side, once).

    ref: seaice_init_velocity_solver_weak
    (mpas_seaice_velocity_solver_weak.F:49) builds normalVectorPolygon /
    normalVectorTriangle; here both come from angleEdge:
      n_e = (cos a, sin a)  (edge normal, cell1 -> cell2)
      t_e = k x n_e = (-sin a, cos a)  (vertex1 -> vertex2)
      polygon outward normal  = edgeSignOnCell * n_e
      triangle outward normal = -edgeSignOnVertex * t_e
    """
    m = mesh
    ang = np.asarray(m.angleEdge)
    ne = np.cos(ang)
    nn = np.sin(ang)
    te = -nn
    tn = ne

    eoc = np.asarray(m.edgesOnCell)
    sgc = np.asarray(m.edgeSignOnCell, dtype=ne.dtype)
    polyE = sgc * ne[eoc]
    polyN = sgc * nn[eoc]

    eov = np.asarray(m.edgesOnVertex)
    sgv = np.asarray(m.edgeSignOnVertex, dtype=ne.dtype)
    triE = -sgv * te[eov]
    triN = -sgv * tn[eov]

    if m.on_sphere:
        tlc = np.tan(np.asarray(m.latCell)) / m.sphere_radius
        tlv = np.tan(np.asarray(m.latVertex)) / m.sphere_radius
    else:
        tlc = np.zeros(m.nCells)
        tlv = np.zeros(m.nVertices)

    # a vertex is interior iff none of its edges is a boundary edge and it
    # has a full complement of distinct cells
    bnd_e = np.asarray(m.boundaryEdge) > 0
    interior = ~np.any(bnd_e[eov] | (np.asarray(m.edgeSignOnVertex) == 0),
                       axis=1)

    var_coeffs = None
    if variational:
        from mpas_tpu.cores.seaice.variational import (
            build_variational_coeffs)
        var_coeffs = build_variational_coeffs(
            mesh, basis=variational if isinstance(variational, str)
            else "wachspress")
    return SeaiceGrid(
        mesh=mesh,
        normalPolygonE=jnp.asarray(polyE), normalPolygonN=jnp.asarray(polyN),
        normalTriangleE=jnp.asarray(triE), normalTriangleN=jnp.asarray(triN),
        tanLatCellOverR=jnp.asarray(tlc), tanLatVertexOverR=jnp.asarray(tlv),
        interiorVertex=jnp.asarray(interior.astype(ne.dtype)),
        variational=var_coeffs,
        dvEdgeMin=jnp.asarray(
            float(np.min(np.asarray(m.dvEdge)[np.asarray(m.dvEdge) > 0]))),
    )


def zero_state(mesh: Mesh, n_cat: int, dtype=jnp.float64) -> SeaiceState:
    nC, nV = mesh.nCells, mesh.nVertices
    zc = jnp.zeros((nC, n_cat), dtype=dtype)
    zv = jnp.zeros((nV,), dtype=dtype)
    z1 = jnp.zeros((nC,), dtype=dtype)
    return SeaiceState(iceAreaCategory=zc, iceVolumeCategory=zc,
                       snowVolumeCategory=zc, surfaceTemperature=zc,
                       uVelocity=zv, vVelocity=zv,
                       stress11=z1, stress22=z1, stress12=z1)
