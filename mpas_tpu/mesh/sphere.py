"""Spherical centroidal Voronoi mesh generation (icosahedral family).

Native replacement for the externally generated x1.N quasi-uniform spherical
meshes the reference consumes (grid.nc; e.g. x1.2562 for the 480 km
shallow-water configs, x1.40962 for the 120 km atmosphere baseline).
Cells = generators of a spherical Voronoi diagram; starting from a subdivided
icosahedron (10*n^2+2 generators), optionally Lloyd-relaxed toward a
spherical centroidal Voronoi tessellation (SCVT), matching the construction
of the reference meshes (Ringler et al. 2008 SCVT grids).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import SphericalVoronoi

from mpas_tpu.mesh.build import build_mesh, _normalize, _sphere_tri_area
from mpas_tpu.mesh.mesh import Mesh


def icosahedron_vertices():
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = []
    for s1 in (-1.0, 1.0):
        for s2 in (-phi, phi):
            v.append((0.0, s1, s2))
            v.append((s1, s2, 0.0))
            v.append((s2, 0.0, s1))
    return _normalize(np.asarray(sorted(set(v))))


def _icosahedron_faces(verts):
    """20 triangular faces as vertex index triples (by nearest-neighbor)."""
    n = len(verts)
    d = verts @ verts.T
    # each vertex's 5 nearest neighbors
    nbr = np.argsort(-d, axis=1)[:, 1:6]
    faces = set()
    for i in range(n):
        for j in nbr[i]:
            for k in nbr[j]:
                if k in nbr[i] and i < j < k:
                    faces.add((i, int(j), int(k)))
    assert len(faces) == 20, len(faces)
    return sorted(faces)


def icosphere_points(n: int):
    """10*n^2 + 2 quasi-uniform points from an n-fold subdivided icosahedron."""
    verts = icosahedron_vertices()
    faces = _icosahedron_faces(verts)
    key_to_id = {}
    pts = []

    def add(p):
        key = tuple(np.round(p * 1e10).astype(np.int64))
        pid = key_to_id.get(key)
        if pid is None:
            pid = len(pts)
            key_to_id[key] = pid
            pts.append(p)
        return pid

    for (ia, ib, ic) in faces:
        A, B, C = verts[ia], verts[ib], verts[ic]
        for i in range(n + 1):
            for j in range(n + 1 - i):
                p = _normalize((n - i - j) * A + i * B + j * C)
                add(p)
    pts = np.asarray(pts)
    assert pts.shape[0] == 10 * n * n + 2, pts.shape
    return pts


def lloyd_relax(points, iterations: int = 0):
    """Lloyd iterations toward an SCVT: move generators to region centroids."""
    pts = _normalize(np.asarray(points, dtype=np.float64))
    for _ in range(iterations):
        sv = SphericalVoronoi(pts, radius=1.0, threshold=1e-10)
        sv.sort_vertices_of_regions()
        new = np.empty_like(pts)
        for c, region in enumerate(sv.regions):
            ring = sv.vertices[region]
            # area-weighted centroid from the triangle fan about the generator
            a = _sphere_tri_area(pts[c][None], ring, np.roll(ring, -1, axis=0))
            tri_cent = pts[c][None] + ring + np.roll(ring, -1, axis=0)
            w = np.abs(a)[:, None]
            new[c] = np.sum(w * tri_cent, axis=0)
        pts = _normalize(new)
    return pts


def sphere_voronoi_mesh(points, dtype=np.float64, merge_tol: float = 0.0
                        ) -> Mesh:
    """Build a unit-sphere Voronoi Mesh from generator points.

    merge_tol > 0 additionally merges Voronoi vertices closer than
    merge_tol x the local circumradius (distance to the nearest generator):
    near-cocircular generator quadruples — common on variable-resolution
    SCVTs before full convergence — otherwise produce near-zero dvEdge
    edges that wreck the CFL limit (1/dvEdge rides the pv/circulation
    stencils). The merged vertex sits at the cluster centroid; rings
    collapse the vanished edges.
    """
    pts = _normalize(np.asarray(points, dtype=np.float64))
    sv = SphericalVoronoi(pts, radius=1.0, threshold=1e-10)
    sv.sort_vertices_of_regions()

    nv = len(sv.vertices)
    parent = np.arange(nv, dtype=np.int64)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # exact-coincidence clusters (symmetric configurations)
    key_to_id = {}
    for i, p in enumerate(sv.vertices):
        key = tuple(np.round(p * 1e9).astype(np.int64))
        j = key_to_id.setdefault(key, i)
        if j != i:
            parent[find(i)] = find(j)

    if merge_tol > 0.0:
        from scipy.spatial import cKDTree
        # local scale: distance from each Voronoi vertex to nearest generator
        gen_tree = cKDTree(pts)
        circum, _ = gen_tree.query(sv.vertices, k=1)
        vtree = cKDTree(sv.vertices)
        for i, j in vtree.query_pairs(merge_tol * float(np.max(circum))):
            d = np.linalg.norm(sv.vertices[i] - sv.vertices[j])
            if d <= merge_tol * min(circum[i], circum[j]):
                parent[find(i)] = find(j)

    roots = np.array([find(i) for i in range(nv)], dtype=np.int64)
    uniq, remap = np.unique(roots, return_inverse=True)
    # cluster centroid (on the sphere)
    vxyz = np.zeros((uniq.size, 3))
    np.add.at(vxyz, remap, sv.vertices)
    vxyz = _normalize(vxyz)

    vertices_on_cell = []
    for c, region in enumerate(sv.regions):
        ring = [int(remap[v]) for v in region]
        # collapse merge-repeated neighbors (incl. wraparound)
        ring = [v for k, v in enumerate(ring) if v != ring[k - 1]]
        vertices_on_cell.append(ring)

    return build_mesh(pts, vxyz, vertices_on_cell, on_sphere=True,
                      sphere_radius=1.0, dtype=dtype)


def icosahedral_mesh(n: int, lloyd_iters: int = 4, dtype=np.float64) -> Mesh:
    """Quasi-uniform icosahedral SCVT mesh with 10*n^2+2 cells, unit radius.

    n=16 -> 2562 cells (~480 km on Earth radius); n=64 -> 40962 (~120 km).
    """
    pts = icosphere_points(n)
    pts = lloyd_relax(pts, lloyd_iters)
    return sphere_voronoi_mesh(pts, dtype=dtype)
