"""Geometry utilities on the sphere and plane.

ref: src/operators/mpas_geometry_utils.F — spherical arcs/angles/areas
(:one-liners), Wachspress barycentric coordinates (:1246), point-location
walk (:1026). Array-math (jnp) where used on the compute path, numpy-friendly
elsewhere (everything works under both).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sphere_distance(lat1, lon1, lat2, lon2, radius=1.0):
    """Great-circle distance (ref: mpas_sphere_distance / haversine form)."""
    arg = jnp.sqrt(jnp.sin(0.5 * (lat2 - lat1)) ** 2
                   + jnp.cos(lat1) * jnp.cos(lat2)
                   * jnp.sin(0.5 * (lon2 - lon1)) ** 2)
    return 2.0 * radius * jnp.arcsin(jnp.clip(arg, -1.0, 1.0))


def arc_length(p, q):
    """Arc length between unit vectors (last axis 3)."""
    cr = jnp.linalg.norm(jnp.cross(p, q), axis=-1)
    dt = jnp.sum(p * q, axis=-1)
    return jnp.arctan2(cr, dt)


def sphere_angle(a, b, c):
    """Angle at vertex a of the spherical triangle (a,b,c)
    (ref: sphere_angle in several reference files)."""
    ab = jnp.cross(a, b)
    ac = jnp.cross(a, c)
    nab = ab / jnp.maximum(jnp.linalg.norm(ab, axis=-1, keepdims=True), 1e-30)
    nac = ac / jnp.maximum(jnp.linalg.norm(ac, axis=-1, keepdims=True), 1e-30)
    cosang = jnp.clip(jnp.sum(nab * nac, axis=-1), -1.0, 1.0)
    return jnp.arccos(cosang)


def triangle_signed_area_sphere(p1, p2, p3):
    """Signed spherical excess (ccw positive seen from outside)
    (ref: mpas_triangle_signed_area_sphere)."""
    num = jnp.sum(p1 * jnp.cross(p2, p3), axis=-1)
    den = 1.0 + jnp.sum(p1 * p2, axis=-1) + jnp.sum(p2 * p3, axis=-1) \
        + jnp.sum(p3 * p1, axis=-1)
    return 2.0 * jnp.arctan2(num, den)


def wachspress_coordinates(vertices, point):
    """Wachspress barycentric coordinates of `point` inside the convex
    polygon `vertices` (n, 2|3 planar) — ref: mpas_wachspress_coordinates
    (:1246); used by the sea-ice variational velocity solver.

    Planar formula: w_i = A(prev,i,next) / (A(prev,i,p) * A(i,next,p)),
    normalized."""
    v = jnp.asarray(vertices)
    p = jnp.asarray(point)
    n = v.shape[0]
    prev = jnp.roll(v, 1, axis=0)
    nxt = jnp.roll(v, -1, axis=0)

    def tri_area(a, b, c):
        return 0.5 * ((b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1])
                      - (b[..., 1] - a[..., 1]) * (c[..., 0] - a[..., 0]))

    a_full = tri_area(prev, v, nxt)
    a_prev = tri_area(prev, v, p[None, :])
    a_next = tri_area(v, nxt, p[None, :])
    w = a_full / (a_prev * a_next)
    return w / jnp.sum(w)


def point_in_cell_walk(mesh, point_xyz, start_cell: int = 0,
                       max_steps: int = 200):
    """Host-side point-location walk: step to the neighbor closest to the
    target until converged (ref: mpas_get_cell_point_walk :1026)."""
    cxyz = np.stack([np.asarray(mesh.xCell), np.asarray(mesh.yCell),
                     np.asarray(mesh.zCell)], -1)
    coc = np.asarray(mesh.cellsOnCell)
    nEoC = np.asarray(mesh.nEdgesOnCell)
    p = np.asarray(point_xyz, dtype=float)
    c = int(start_cell)
    for _ in range(max_steps):
        nbrs = coc[c, :nEoC[c]]
        cand = np.concatenate([[c], nbrs])
        d = np.linalg.norm(cxyz[cand] - p, axis=1)
        best = cand[int(np.argmin(d))]
        if best == c:
            return c
        c = int(best)
    return c
