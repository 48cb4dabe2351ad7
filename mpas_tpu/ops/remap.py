"""Mesh-generic incremental-remapping transport operators.

ref capability: the geometric flux remapping shared by
src/core_seaice/shared/mpas_seaice_advection_incremental_remap.F and
src/core_landice/mode_forward/mpas_li_advection.F (incremental remapping
branch) — Dukowicz & Baumgardner 2000 departure-region integration of
limited linear reconstructions.

Functions take the bare Mesh (not a core grid) so every core can use
them; see mpas_tpu/cores/seaice/remap.py for the design notes (departure
quads split into signed triangles, 3-point quadrature, upwind-side
assignment, exactness/limits).
"""

from __future__ import annotations

import jax.numpy as jnp

def cell_gradient(mesh, phi, xc, yc):
    """Least-squares linear gradient of a cell field over cellsOnCell,
    van-Leer limited so the reconstruction stays within neighbor bounds.
    phi: (nCells, ...) — gradient over trailing dims batched."""
    coc = mesh.cellsOnCell                      # (nCells, maxEdges)
    # valid-neighbor mask: real edge slot and not a self/pad pointer
    self_ix = jnp.arange(coc.shape[0])[:, None]
    mask = mesh.edgesOnCellMask * (coc != self_ix)
    dx = jnp.where(mask > 0, xc[coc] - xc[:, None], 0.0)
    dy = jnp.where(mask > 0, yc[coc] - yc[:, None], 0.0)

    extra = phi.ndim - 1
    def up(v):  # lift geometry to broadcast over tracer lanes
        return v.reshape(v.shape + (1,) * extra)

    dphi = jnp.where(up(mask) > 0, phi[coc] - phi[:, None], 0.0)
    # normal equations for [gx, gy]
    sxx = jnp.sum(dx * dx, axis=1) + 1e-12
    sxy = jnp.sum(dx * dy, axis=1)
    syy = jnp.sum(dy * dy, axis=1) + 1e-12
    bx = jnp.sum(up(dx) * dphi, axis=1)
    by = jnp.sum(up(dy) * dphi, axis=1)
    det = sxx * syy - sxy * sxy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    gx = (up(syy) * bx - up(sxy) * by) / up(det)
    gy = (up(sxx) * by - up(sxy) * bx) / up(det)

    # van-Leer limiter: scale gradient so the reconstruction at the
    # neighbor-displacement extremes stays within [min, max] of the stencil
    phin_max = jnp.max(jnp.where(up(mask) > 0, phi[coc],
                                 phi[:, None]), axis=1)
    phin_min = jnp.min(jnp.where(up(mask) > 0, phi[coc],
                                 phi[:, None]), axis=1)
    excur = up(dx) * gx[:, None] + up(dy) * gy[:, None]
    exc_max = jnp.max(jnp.where(up(mask) > 0, excur, 0.0), axis=1)
    exc_min = jnp.min(jnp.where(up(mask) > 0, excur, 0.0), axis=1)
    alpha_up = jnp.where(exc_max > 1e-14,
                         (phin_max - phi) / jnp.maximum(exc_max, 1e-14),
                         1.0)
    alpha_dn = jnp.where(exc_min < -1e-14,
                         (phin_min - phi) / jnp.minimum(exc_min, -1e-14),
                         1.0)
    alpha = jnp.clip(jnp.minimum(alpha_up, alpha_dn), 0.0, 1.0)
    return gx * alpha, gy * alpha


def departure_triangles(mesh, u_v, v_v, dt):
    """Per-edge departure quad split into two triangles.

    Returns (signed areas (nEdges, 2), quadrature points x/y
    (nEdges, 2, 3)). Signed area > 0 means flux cell1 -> cell2 (along the
    edge normal). ref: find_departure_points / triangle decomposition in
    mpas_seaice_advection_incremental_remap.F."""
    m = mesh
    voe = m.verticesOnEdge
    xv, yv = m.xVertex, m.yVertex
    x1, y1 = xv[voe[:, 0]], yv[voe[:, 0]]
    x2, y2 = xv[voe[:, 1]], yv[voe[:, 1]]
    # departure points (backward trajectory)
    xd1 = x1 - dt * u_v[voe[:, 0]]
    yd1 = y1 - dt * v_v[voe[:, 0]]
    xd2 = x2 - dt * u_v[voe[:, 1]]
    yd2 = y2 - dt * v_v[voe[:, 1]]

    # edge normal (cell1 -> cell2)
    ne = jnp.cos(m.angleEdge)
    nn = jnp.sin(m.angleEdge)

    def tri(ax, ay, bx, by, cx, cy):
        # signed area positive when wound counter-clockwise
        area = 0.5 * ((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))
        # 3-point (edge midpoint) quadrature nodes
        qx = jnp.stack([0.5 * (ax + bx), 0.5 * (bx + cx), 0.5 * (cx + ax)],
                       axis=-1)
        qy = jnp.stack([0.5 * (ay + by), 0.5 * (by + cy), 0.5 * (cy + ay)],
                       axis=-1)
        return area, qx, qy

    # quad (v1, v2, d2, d1) -> triangles (v1, v2, d2) and (v1, d2, d1).
    a1, qx1, qy1 = tri(x1, y1, x2, y2, xd2, yd2)
    a2, qx2, qy2 = tri(x1, y1, xd2, yd2, xd1, yd1)
    areas = jnp.stack([a1, a2], axis=-1)               # (nEdges, 2)
    qx = jnp.stack([qx1, qx2], axis=-2)                # (nEdges, 2, 3)
    qy = jnp.stack([qy1, qy2], axis=-2)

    # Sign convention: for uniform u the quad (v1,v2,d2,d1) has shoelace
    # area (v2-v1) x (-u dt) = dv dt (u.n) when the vertex order runs
    # along t = k x n (then t x n = -1). flux(cell1->cell2) = +area in
    # that frame; a flipped vertex order flips both the winding and
    # orient, so flux = -area * sign(t x n) is correct for both.
    tx = x2 - x1
    ty = y2 - y1
    orient = jnp.sign(tx * nn - ty * ne + 1e-30)
    flux_areas = -areas * orient[:, None]
    # no transport through closed boundary edges
    open_edge = (m.boundaryEdge <= 0)
    flux_areas = jnp.where(open_edge[:, None], flux_areas, 0.0)
    return flux_areas, qx, qy


def edge_flux(mesh, flux_areas, qx, qy, fields, gxs, gys, xc, yc):
    """Integrate each reconstructed field over the departure triangles.

    fields/gxs/gys: lists of (nCells, ...) values and gradients. The
    source cell per triangle is cell1 when its flux area > 0 else cell2.
    Returns per-field edge fluxes (nEdges, ...): amount crossing from
    cell1 to cell2 (signed)."""
    m = mesh
    coe = m.cellsOnEdge
    src = jnp.where(flux_areas > 0.0, coe[:, 0:1], coe[:, 1:2])  # (nE,2)

    outs = []
    for phi, gx, gy in zip(fields, gxs, gys):
        extra = phi.ndim - 1
        def up(v):
            return v.reshape(v.shape + (1,) * extra)
        # quadrature evaluation of phi at the 3 nodes of both triangles
        phi_s = phi[src]                       # (nE, 2, ...)
        gx_s = gx[src]
        gy_s = gy[src]
        dxq = qx - xc[src][..., None]          # (nE, 2, 3)
        dyq = qy - yc[src][..., None]
        dxq = dxq.reshape(dxq.shape + (1,) * extra)
        dyq = dyq.reshape(dyq.shape + (1,) * extra)
        vals = (phi_s[:, :, None] + gx_s[:, :, None] * dxq
                + gy_s[:, :, None] * dyq)       # (nE,2,3,...)
        integ = up(flux_areas) * jnp.mean(vals, axis=2)
        outs.append(jnp.sum(integ, axis=1))    # sum the two triangles
    return outs


def product_flux(mesh, flux_areas, qx, qy,
                  parent, pgx, pgy, child, cgx, cgy, xc, yc):
    """Flux of the product parent*child (e.g. volume = a*h): evaluate both
    linear reconstructions at the quadrature nodes and integrate their
    product (3-pt rule: exact for the quadratic integrand)."""
    m = mesh
    coe = m.cellsOnEdge
    src = jnp.where(flux_areas > 0.0, coe[:, 0:1], coe[:, 1:2])
    # parent and child may carry different trailing tracer dims (e.g. a
    # scalar thickness parent with layered temperature children); pad both
    # on the right to the common rank
    extra_p = parent.ndim - 1
    extra_c = child.ndim - 1
    extra = max(extra_p, extra_c)

    dxq = qx - xc[src][..., None]
    dyq = qy - yc[src][..., None]
    dxq = dxq.reshape(dxq.shape + (1,) * extra)
    dyq = dyq.reshape(dyq.shape + (1,) * extra)

    def recon(phi, gx, gy, e):
        v = phi[src][:, :, None] + gx[src][:, :, None] \
            * dxq.reshape(dxq.shape[:3] + (1,) * e) \
            + gy[src][:, :, None] * dyq.reshape(dyq.shape[:3] + (1,) * e)
        return v.reshape(v.shape + (1,) * (extra - e))

    p = recon(parent, pgx, pgy, extra_p)
    c = recon(child, cgx, cgy, extra_c)
    fa = flux_areas.reshape(flux_areas.shape + (1,) * extra)
    integ = fa * jnp.mean(p * c, axis=2)
    return jnp.sum(integ, axis=1)


def apply_fluxes(mesh, flux, field):
    """cell update: field -= sum(signed fluxes) / areaCell."""
    eoc = mesh.edgesOnCell
    sgn = mesh.edgeSignOnCell
    extra = field.ndim - 1
    w = sgn.reshape(sgn.shape + (1,) * extra)
    div = jnp.sum(w * flux[eoc], axis=1)
    inv_a = mesh.invAreaCell.reshape(mesh.invAreaCell.shape + (1,) * extra)
    return field - div * inv_a


