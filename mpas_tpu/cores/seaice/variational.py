"""Variational (Wachspress basis) sea-ice velocity discretization.

ref: src/core_seaice/shared/mpas_seaice_velocity_solver_variational.F +
..._wachspress.F (2,070 LoC) + ..._velocity_solver_variational_shared.F:
strains evaluated AT cell corners from Wachspress basis-function
derivatives; the stress divergence at a vertex comes from the variational
principle, F_u(v) = -(1/A_v) sum_cells sum_corners [ s11 * Sx + s12 * Sy ]
with basis integrals S{x,y}[cell, j, k] = int_cell phi_j d(phi_k)/d{x,y} dA
(ref basisIntegralsU/V + variationalDenominator).

TPU redesign: all basis derivatives/integrals are precomputed host-side in
numpy (once) into dense (nCells, maxEdges, maxEdges) tensors; the device
path is pure einsum/gather — strains per corner and divergence per vertex
with no scatters. Per-cell local coordinates make this exact on planar
meshes; on the sphere the cell is projected onto its tangent plane (the
reference rotates to a pole-centered frame, same approximation class).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from mpas_tpu.mesh.mesh import Mesh


@struct.dataclass
class VariationalCoeffs:
    # basis derivative values at corners: D{x,y}[c, j, k] = d(phi_k)/d{x,y}
    # evaluated at corner j of cell c
    dx: Any                 # (nCells, mE, mE)
    dy: Any                 # (nCells, mE, mE)
    # basis integrals S{x,y}[c, j, k] = int phi_j d(phi_k)/d{x,y} dA
    sx: Any                 # (nCells, mE, mE)
    sy: Any                 # (nCells, mE, mE)
    mass: Any               # (nCells, mE) int phi_j dA
    # vertex stencil: for vertex v and adjacent cell slot i
    cell_on_v: Any          # (nVertices, vertexDegree) cell index
    corner_on_v: Any        # (nVertices, vertexDegree) local corner of v
    valid_on_v: Any         # (nVertices, vertexDegree) 1/0
    area_v: Any             # (nVertices,) variational denominator


def _wachspress(verts):
    """Wachspress basis closure for one convex polygon (n, 2).
    Returns phi(x) -> (n,) and grad(x) -> (n, 2) callables (numpy)."""
    n = len(verts)
    prev = np.roll(verts, 1, axis=0)
    nxt = np.roll(verts, -1, axis=0)

    def tri(a, b, c):
        return 0.5 * ((b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1])
                      - (b[..., 1] - a[..., 1]) * (c[..., 0] - a[..., 0]))

    a_full = tri(prev, verts, nxt)                        # (n,)

    def w_and_grad(p):
        # w_i = A(prev,i,next) * prod_{j != i-1, i} A(v_j, v_j+1, p)
        a_edge = tri(verts, nxt, p[None, :])              # (n,) A_j(p)
        ga_edge = 0.5 * np.stack(
            [verts[:, 1] - nxt[:, 1], nxt[:, 0] - verts[:, 0]], axis=-1)
        w = np.empty(n)
        gw = np.empty((n, 2))
        for i in range(n):
            mask = np.ones(n, dtype=bool)
            mask[i] = False
            mask[(i - 1) % n] = False
            prod = np.prod(a_edge[mask])
            w[i] = a_full[i] * prod
            # grad of the product: sum over included edges
            g = np.zeros(2)
            for j in np.nonzero(mask)[0]:
                others = mask.copy()
                others[j] = False
                g += ga_edge[j] * np.prod(a_edge[others])
            gw[i] = a_full[i] * g
        wsum = w.sum()
        gsum = gw.sum(axis=0)
        phi = w / wsum
        gphi = gw / wsum - np.outer(w, gsum) / (wsum * wsum)
        return phi, gphi

    return w_and_grad


# 6-point degree-4 Dunavant quadrature on the unit triangle
_QP = np.array([
    [0.44594849091597, 0.44594849091597], [0.44594849091597, 0.10810301816807],
    [0.10810301816807, 0.44594849091597], [0.09157621350977, 0.09157621350977],
    [0.09157621350977, 0.81684757298046], [0.81684757298046, 0.09157621350977]])
_QW = np.array([0.22338158967801, 0.22338158967801, 0.22338158967801,
                0.10995174365532, 0.10995174365532, 0.10995174365532])


def _pwl(verts):
    """Piecewise-linear basis closure for one convex polygon (n, 2)
    (ref: mpas_seaice_velocity_solver_pwl.F): the cell is fanned into
    subtriangles from the vertex-average center; basis function j is the
    linear interpolant of nodal values {1 at corner j, 0 at other
    corners, 1/n at the center} on each subtriangle."""
    n = len(verts)
    center = verts.mean(axis=0)
    cval = 1.0 / n

    def w_and_grad(p):
        best = None
        for k in range(n):
            a, b, c = center, verts[k], verts[(k + 1) % n]
            T = np.array([[b[0] - a[0], c[0] - a[0]],
                          [b[1] - a[1], c[1] - a[1]]])
            det = np.linalg.det(T)
            if abs(det) < 1e-30:
                continue
            Tinv = np.linalg.inv(T)
            lam = Tinv @ (p - a)
            l1, l2 = lam
            l0 = 1.0 - l1 - l2
            score = min(l0, l1, l2)
            if best is None or score > best[0]:
                best = (score, k, l0, l1, l2, Tinv)
        _, k, l0, l1, l2, Tinv = best
        g1, g2 = Tinv[0], Tinv[1]
        g0 = -(g1 + g2)
        phi = np.full(n, cval * l0)
        grad = np.tile(cval * g0, (n, 1))
        phi[k] += l1
        grad[k] += g1
        k2 = (k + 1) % n
        phi[k2] += l2
        grad[k2] += g2
        return phi, grad

    return w_and_grad


def build_variational_coeffs(mesh: Mesh,
                             basis: str = "wachspress"
                             ) -> VariationalCoeffs:
    """Host-side precompute (ref: seaice_init_velocity_solver_variational +
    the Wachspress/PWL basis and integral setup,
    config_variational_basis = 'wachspress'|'pwl')."""
    m = mesh
    nC, mE = m.nCells, m.maxEdges
    voc = np.asarray(m.verticesOnCell)
    nEoC = np.asarray(m.nEdgesOnCell)
    xv = np.asarray(m.xVertex)
    yv = np.asarray(m.yVertex)
    zv = np.asarray(m.zVertex) if m.on_sphere else None
    xc = np.asarray(m.xCell)
    yc = np.asarray(m.yCell)

    dx = np.zeros((nC, mE, mE))
    dy = np.zeros((nC, mE, mE))
    sx = np.zeros((nC, mE, mE))
    sy = np.zeros((nC, mE, mE))
    mass = np.zeros((nC, mE))

    if m.on_sphere:
        zc = np.asarray(m.zCell)
        lat = np.asarray(m.latCell)
        lon = np.asarray(m.lonCell)

    for c in range(nC):
        n = int(nEoC[c])
        vids = voc[c, :n]
        if m.on_sphere:
            # project onto the tangent plane at the cell center
            east = np.array([-np.sin(lon[c]), np.cos(lon[c]), 0.0])
            north = np.array([-np.sin(lat[c]) * np.cos(lon[c]),
                              -np.sin(lat[c]) * np.sin(lon[c]),
                              np.cos(lat[c])])
            rel = np.stack([xv[vids] - xc[c], yv[vids] - yc[c],
                            zv[vids] - zc[c]], axis=-1)
            verts = np.stack([rel @ east, rel @ north], axis=-1)
        else:
            vx = xv[vids] - xc[c]
            vy = yv[vids] - yc[c]
            # planar periodic wrap
            if m.x_period > 0:
                vx = (vx + 0.5 * m.x_period) % m.x_period - 0.5 * m.x_period
            if m.y_period > 0:
                vy = (vy + 0.5 * m.y_period) % m.y_period - 0.5 * m.y_period
            verts = np.stack([vx, vy], axis=-1)

        wg = _pwl(verts) if basis == "pwl" \
            else _wachspress(verts)
        # derivatives at corners (nudged slightly inward: Wachspress
        # gradients are singular exactly at the corners)
        centroid = verts.mean(axis=0)
        for j in range(n):
            pj = verts[j] + 1e-6 * (centroid - verts[j])
            _, g = wg(pj)
            dx[c, j, :n] = g[:, 0]
            dy[c, j, :n] = g[:, 1]
        # integrals by fan-triangulation quadrature from the centroid
        for j in range(n):
            a = verts[j]
            b = verts[(j + 1) % n]
            area2 = ((b[0] - a[0]) * (centroid[1] - a[1])
                     - (b[1] - a[1]) * (centroid[0] - a[0]))
            for q, wq in zip(_QP, _QW):
                p = a + q[0] * (b - a) + q[1] * (centroid - a)
                phi, g = wg(p)
                wgt = wq * 0.5 * area2
                sx[c, :n, :n] += wgt * np.outer(phi[:n], g[:n, 0])
                sy[c, :n, :n] += wgt * np.outer(phi[:n], g[:n, 1])
                mass[c, :n] += wgt * phi[:n]

    # vertex stencils: (cell, local corner) pairs per vertex
    vd = m.vertexDegree
    cov = np.asarray(m.cellsOnVertex)
    cell_on_v = np.zeros((m.nVertices, vd), dtype=np.int32)
    corner_on_v = np.zeros((m.nVertices, vd), dtype=np.int32)
    valid = np.zeros((m.nVertices, vd))
    area_v = np.zeros(m.nVertices)
    # build inverse map: for each (cell, corner) the vertex
    for v in range(m.nVertices):
        for i in range(vd):
            c = int(cov[v, i])
            n = int(nEoC[c])
            loc = np.nonzero(voc[c, :n] == v)[0]
            if len(loc) == 1:
                cell_on_v[v, i] = c
                corner_on_v[v, i] = int(loc[0])
                valid[v, i] = 1.0
                area_v[v] += mass[c, int(loc[0])]
    area_v = np.maximum(area_v, 1e-12)

    return VariationalCoeffs(
        dx=jnp.asarray(dx), dy=jnp.asarray(dy),
        sx=jnp.asarray(sx), sy=jnp.asarray(sy), mass=jnp.asarray(mass),
        cell_on_v=jnp.asarray(cell_on_v),
        corner_on_v=jnp.asarray(corner_on_v),
        valid_on_v=jnp.asarray(valid), area_v=jnp.asarray(area_v))


def strain_tensor_variational(mesh: Mesh, coeffs: VariationalCoeffs,
                              u_v, v_v):
    """Strains at cell corners: e[c, j] = sum_k u(v_k) D[c, j, k].
    ref: seaice_strain_tensor_variational."""
    voc = mesh.verticesOnCell
    uc = u_v[voc]                                 # (nC, mE)
    vc = v_v[voc]
    e11 = jnp.einsum("cjk,ck->cj", coeffs.dx, uc)
    e22 = jnp.einsum("cjk,ck->cj", coeffs.dy, vc)
    e12 = 0.5 * (jnp.einsum("cjk,ck->cj", coeffs.dy, uc)
                 + jnp.einsum("cjk,ck->cj", coeffs.dx, vc))
    return e11, e22, e12


def stress_divergence_variational(mesh: Mesh, coeffs: VariationalCoeffs,
                                  s11, s22, s12):
    """Vertex stress divergence from the variational principle.
    ref: seaice_stress_divergence_variational:
      F_u(v) = -(1/A_v) sum_{c in C(v)} sum_j [s11(c,j) Sx(c,j,l)
                                               + s12(c,j) Sy(c,j,l)]
    (s11/s22/s12 are per cell-corner, (nCells, maxEdges))."""
    cv = coeffs.cell_on_v                         # (nV, vd)
    lv = coeffs.corner_on_v
    val = coeffs.valid_on_v

    # gather integral columns: Sx[c, :, l] for each (v, i)
    sx_col = coeffs.sx[cv, :, lv]                 # (nV, vd, mE)
    sy_col = coeffs.sy[cv, :, lv]
    s11g = s11[cv]                                # (nV, vd, mE)
    s22g = s22[cv]
    s12g = s12[cv]

    fu = -jnp.sum(val[..., None] * (s11g * sx_col + s12g * sy_col),
                  axis=(1, 2)) / coeffs.area_v
    fv = -jnp.sum(val[..., None] * (s22g * sy_col + s12g * sx_col),
                  axis=(1, 2)) / coeffs.area_v
    return fu, fv
