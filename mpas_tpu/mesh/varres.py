"""Variable-resolution SCVT mesh generation (density-driven weighted Lloyd).

The reference consumes variable-resolution meshes (e.g. the 60-15 km
refined mesh of BASELINE config 5) generated offline by MPAS-Tools'
density-weighted Lloyd iteration; the model side only reads meshDensity
and scales dissipation by it (ref: atm_compute_mesh_scaling,
mpas_atm_core.F:927; weighted graph partition mpas_block_decomp.F:101-120).
This module makes the framework standalone: it generates refined SCVTs
natively.

Theory (Ringler, Ju & Gunzburger, Ocean Dyn. 2008): for a density function
rho on the sphere, the SCVT equidistributes rho^(1/(d+2)) = rho^(1/4) mass
per cell in d=2, so local cell width h ~ rho^(-1/4); a width ratio R
between coarse and fine regions needs density ratio R^4 (meshDensity is
normalized to 1 in the finest region, matching the MPAS convention).
Weighted Lloyd: each generator moves to the rho-weighted centroid of its
Voronoi region; iterate to convergence. All host-side numpy, run once at
setup — never inside jit.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import SphericalVoronoi

from mpas_tpu.mesh.build import compute_mesh_scaling
from mpas_tpu.mesh.mesh import Mesh
from mpas_tpu.mesh.sphere import (_normalize, _sphere_tri_area,
                                  icosphere_points, sphere_voronoi_mesh)


def circular_refinement_density(center_lat: float, center_lon: float,
                                radius: float, width: float,
                                ratio: float = 4.0):
    """Density function for a circular refinement region (60-15 km style).

    Inside the great-circle cap of `radius` (radians) around the center the
    density is 1 (finest); outside it falls to (1/ratio)^4 across a tanh
    transition band of `width` radians. ratio = coarse/fine cell width
    (60/15 = 4 for the named BASELINE config).
    """
    cx = np.array([np.cos(center_lat) * np.cos(center_lon),
                   np.cos(center_lat) * np.sin(center_lon),
                   np.sin(center_lat)])
    rho_min = float(ratio) ** -4.0

    def rho(pts):
        pts = _normalize(np.asarray(pts, dtype=np.float64))
        dist = np.arccos(np.clip(pts @ cx, -1.0, 1.0))
        t = 0.5 * (1.0 - np.tanh((dist - radius) / max(width, 1e-6)))
        return rho_min + (1.0 - rho_min) * t

    return rho


def sample_points_by_density(n: int, rho, seed: int = 0):
    """Initial generators ~ rho^(1/4)-equidistributed (rejection sampling).

    Sampling by rho^(1/2) (between uniform and the full density) speeds
    Lloyd convergence; the iteration owns the final distribution.
    """
    rng = np.random.default_rng(seed)
    pts = []
    # a small quasi-uniform shell (~15% of n) keeps the coarse region
    # structured; the rest is density-sampled into the refined region
    base = icosphere_points(max(2, int(np.sqrt(0.15 * n / 10.0))))
    need = n - base.shape[0]
    while need > 0:
        cand = rng.normal(size=(4 * max(need, 256), 3))
        cand = _normalize(cand)
        p = rho(cand) ** 0.5
        keep = rng.uniform(size=cand.shape[0]) < p / p.max()
        cand = cand[keep][:need]
        if cand.size:
            pts.append(cand)
            need -= cand.shape[0]
    return np.concatenate([base] + pts, axis=0) if pts else base


def weighted_lloyd(points, rho, iterations: int = 25):
    """Density-weighted Lloyd relaxation toward a variable-resolution SCVT.

    Generator -> rho-weighted centroid of its Voronoi region, where the
    region integral uses the triangle fan about the generator with rho
    evaluated at triangle centroids (2nd-order per iteration; the fixed
    point is what matters).
    """
    pts = _normalize(np.asarray(points, dtype=np.float64))
    for _ in range(iterations):
        sv = SphericalVoronoi(pts, radius=1.0, threshold=1e-10)
        sv.sort_vertices_of_regions()
        # flatten all region triangle fans into one vectorized pass
        lens = np.array([len(r) for r in sv.regions], dtype=np.int64)
        cells = np.repeat(np.arange(pts.shape[0]), lens)
        flat = np.concatenate(sv.regions).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
        pos = np.arange(flat.shape[0]) - np.repeat(offs, lens)
        nxt_pos = np.where(pos + 1 < np.repeat(lens, lens), pos + 1, 0)
        nxt = flat[np.repeat(offs, lens) + nxt_pos]
        v1 = sv.vertices[flat]
        v2 = sv.vertices[nxt]
        gen = pts[cells]
        a = np.abs(_sphere_tri_area(gen, v1, v2))
        cent = _normalize(gen + v1 + v2)
        w = (a * rho(cent))[:, None]
        new = np.zeros_like(pts)
        np.add.at(new, cells, w * cent)
        pts = _normalize(new)
    return pts


def variable_res_mesh(n_points: int, rho=None, iterations: int = 25,
                      seed: int = 0, dtype=np.float64,
                      scale_with_mesh: bool = True,
                      ratio: float = 4.0) -> Mesh:
    """Generate a variable-resolution unit-sphere SCVT Mesh.

    rho defaults to a 4:1 (60-15 km style) circular refinement centered at
    (30N, 90E) of cap radius 30 deg. meshDensity is rho at the cell centers
    normalized to max 1; meshScalingDel2/4 are filled per the reference
    formula (compute_mesh_scaling).
    """
    if rho is None:
        rho = circular_refinement_density(
            center_lat=np.pi / 6.0, center_lon=np.pi / 2.0,
            radius=np.pi / 6.0, width=np.pi / 18.0, ratio=ratio)
    pts = sample_points_by_density(n_points, rho, seed=seed)
    pts = weighted_lloyd(pts, rho, iterations=iterations)
    mesh = sphere_voronoi_mesh(pts, dtype=dtype, merge_tol=0.2)
    density = rho(np.stack([np.asarray(mesh.xCell),
                            np.asarray(mesh.yCell),
                            np.asarray(mesh.zCell)], axis=-1))
    density = density / density.max()
    mesh = mesh.replace(meshDensity=np.asarray(density, dtype=dtype))
    return compute_mesh_scaling(mesh, scale_with_mesh)
