"""Host-side atmosphere grid setup: vertical coordinate, advection
coefficients, deformation weights, omega metric terms.

TPU-native equivalents of:
- vertical grid + metric setup (ref: init_atm_case_jw grid-metrics section,
  src/core_init_atmosphere/mpas_init_atm_cases.F:633-700)
- deriv_two quadratic-fit stencils (ref: atm_initialize_advection_rk,
  src/core_init_atmosphere/mpas_atm_advection.F:21-394); local coordinates
  here use the tangent-plane (gnomonic) projection rather than the
  reference's accumulated-angle construction — same quadratic LSQ fit, same
  truncation order.
- adv_coefs compression (ref: atm_adv_coef_compression,
  src/core_atmosphere/mpas_atm_core.F:1113-1266)
- Smagorinsky deformation weights (ref: atm_initialize_deformation_weights,
  mpas_atm_advection.F:744-937)
- zb/zb3 omega metric terms + per-cell copies & signs (ref:
  mpas_init_atm_cases.F:1009-1040, atm_compute_signs mpas_atm_core.F:987)
- w-damping profile dss (ref: atm_compute_damping_coefs mpas_atm_core.F:1077)

Everything here runs once on the host in numpy.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from flax import struct

from mpas_tpu.constants import gravity, pii
from mpas_tpu.mesh.mesh import Mesh

N_ADV = 10  # padded advection stencil size (2 cells + up to 8 distinct nbrs)


@struct.dataclass
class VerticalGrid:
    """1-D vertical coordinate metadata (levels k=0..nz-1, interfaces 0..nz)."""
    nz: int = struct.field(pytree_node=False)
    zw: Any = None      # (nz+1,) nominal zeta interface heights
    dzw: Any = None     # (nz,)
    rdzw: Any = None    # (nz,)
    rdzu: Any = None    # (nz+1,) interface 1/dz (0 at k=0 and k=nz)
    fzm: Any = None     # (nz+1,) interface interpolation weights (0 ends)
    fzp: Any = None     # (nz+1,)
    cf1: float = struct.field(pytree_node=False, default=0.0)
    cf2: float = struct.field(pytree_node=False, default=0.0)
    cf3: float = struct.field(pytree_node=False, default=0.0)


@struct.dataclass
class AtmGrid:
    """Mesh + all static atmosphere grid fields."""
    mesh: Mesh
    vert: VerticalGrid
    zgrid: Any          # (nCells, nz+1) physical interface heights
    zz: Any             # (nCells, nz) d(zeta)/dz
    zxu: Any            # (nEdges, nz) metric slope at edges
    dss: Any            # (nCells, nz) w-damping coefficient
    zb_cell: Any        # (maxEdges, nCells, nz+1) omega metric, slot-major
    zb3_cell: Any       # (maxEdges, nCells, nz+1) (pre-scaled by coef_3rd)
    advCellsForEdge: Any  # (nEdges, N_ADV) int32
    adv_coefs: Any      # (nEdges, N_ADV) includes dvEdge factor
    adv_coefs_3rd: Any  # (nEdges, N_ADV) pre-scaled by config_coef_3rd_order
    defc_a: Any         # (nCells, maxEdges)
    defc_b: Any         # (nCells, maxEdges)
    recon_zonal: Any    # (nCells, maxEdges) LSQ weights: zonal wind at cell
    recon_merid: Any    # (nCells, maxEdges)
    # base state (defined by the initial case)
    rho_base: Any       # (nCells, nz) == rb: base dry density / zz
    theta_base: Any     # (nCells, nz) == tb
    rtheta_base: Any
    exner_base: Any
    pressure_base: Any
    u_init: Any         # (nz,) initial zonal profile (idealized mixing ref)
    v_init: Any
    t_init: Any         # (nCells, nz)
    # cell-assembled advection factorization (build_adv_factored); the
    # indexed advCellsForEdge path above remains as the reference algebra
    d2_bmat: Any = None   # (nCells, 3, maxEdges+1) fxx/fxy/fyy fit rows
    d2w: Any = None       # (nEdges, 2, 3), -dc^2/12*dv baked in
    adv_beta: float = struct.field(pytree_node=False, default=1.0)
    # cell-assembled tendency tensors (build_adv_cell_tensors)
    d2w_own: Any = None   # (nCells, maxEdges, 3), -dc^2/12, no dv
    d2w_opp: Any = None   # (nCells, maxEdges, 3)
    adv_sside: Any = None  # (nCells, maxEdges) +-1 upwind orientation
    dv_cell: Any = None   # (nCells, maxEdges) dvEdge per cell edge


def build_vertical_grid(nz: int, zt: float = 45000.0, stretch: float = 1.5,
                        uniform: bool = True):
    """1-D zeta coordinate (ref: mpas_init_atm_cases.F:636-676)."""
    k = np.arange(nz + 1, dtype=np.float64)
    dz = zt / nz
    sh = (k * dz / zt) ** stretch
    zw = k * dz if uniform else sh * zt
    ah = 1.0 - np.cos(0.5 * pii * k * dz / zt) ** 6
    dzw = zw[1:] - zw[:-1]
    rdzw = 1.0 / dzw
    dzu = np.zeros(nz + 1)
    fzm = np.zeros(nz + 1)
    fzp = np.zeros(nz + 1)
    rdzu = np.zeros(nz + 1)
    dzu[1:nz] = 0.5 * (dzw[1:] + dzw[:-1])
    rdzu[1:nz] = 1.0 / dzu[1:nz]
    fzp[1:nz] = 0.5 * dzw[1:] / dzu[1:nz]
    fzm[1:nz] = 0.5 * dzw[:-1] / dzu[1:nz]
    cof1 = (2.0 * dzu[1] + dzu[2]) / (dzu[1] + dzu[2]) * dzw[0] / dzu[1]
    cof2 = dzu[1] / (dzu[1] + dzu[2]) * dzw[0] / dzu[2]
    cf1 = fzp[1] + cof1
    cf2 = fzm[1] - cof1 - cof2
    cf3 = cof2
    vg = VerticalGrid(nz=nz, zw=zw, dzw=dzw, rdzw=rdzw, rdzu=rdzu,
                      fzm=fzm, fzp=fzp, cf1=float(cf1), cf2=float(cf2),
                      cf3=float(cf3))
    return vg, sh, ah


# ---------------------------------------------------------------------------
# local tangent-plane coordinates + quadratic LSQ (deriv_two)
# ---------------------------------------------------------------------------

def _tangent_coords(mesh: Mesh, origin_xyz, points_xyz):
    """Project points into the tangent plane at origin (angle/arc-preserving
    radially: coordinates are arc-length along great circle, azimuthal angle
    preserved — equivalent to the reference's accumulated-angle coords up to
    ordering)."""
    if mesh.on_sphere:
        o = origin_xyz / np.linalg.norm(origin_xyz, axis=-1, keepdims=True)
        p = points_xyz / np.linalg.norm(points_xyz, axis=-1, keepdims=True)
        z = np.array([0.0, 0.0, 1.0])
        east = np.cross(z, o)
        n = np.linalg.norm(east, axis=-1, keepdims=True)
        if np.any(n < 1e-12):
            east = np.where(n < 1e-12, np.cross([1.0, 0.0, 0.0], o), east)
            n = np.linalg.norm(east, axis=-1, keepdims=True)
        east = east / n
        north = np.cross(o, east)
        d = p - o
        x = np.sum(d * east, axis=-1)
        y = np.sum(d * north, axis=-1)
        # azimuth preserved; radial chord rescaled to great-circle arc length
        chord = np.sqrt(x * x + y * y)
        arc = 2.0 * np.arcsin(np.clip(0.5 * np.linalg.norm(p - o, axis=-1),
                                      -1.0, 1.0))
        scale = np.where(chord > 1e-14, arc / np.maximum(chord, 1e-30), 1.0)
        return x * scale * mesh.sphere_radius, y * scale * mesh.sphere_radius
    d = points_xyz - origin_xyz
    if mesh.x_period > 0:
        d[..., 0] -= mesh.x_period * np.round(d[..., 0] / mesh.x_period)
    if mesh.y_period > 0:
        d[..., 1] -= mesh.y_period * np.round(d[..., 1] / mesh.y_period)
    return d[..., 0], d[..., 1]


def build_cell_fit_matrices(mesh: Mesh):
    """Per-cell quadratic LSQ fit matrices over the stencil
    [cell itself, cellsOnCell(1..nEdgesOnCell)].

    Returns bmats (nCells, 6, maxEdges+1): row m gives the weights of the
    fitted polynomial coefficient m in 1, x, y, x^2, xy, y^2 order; padded
    stencil slots carry zero weight."""
    nC = mesh.nCells
    mE = mesh.maxEdges
    cxyz = np.stack([mesh.xCell, mesh.yCell, mesh.zCell], -1).astype(np.float64)
    coc = np.asarray(mesh.cellsOnCell)
    nEoC = np.asarray(mesh.nEdgesOnCell)
    bmats = np.zeros((nC, 6, mE + 1))
    # vectorized over cells, grouped by stencil size (batched pinv);
    # nondimensionalize by the mean stencil distance: the raw Vandermonde
    # mixes O(1) and O(dx^2) columns (condition ~1e20 in meters), which
    # makes pinv blow up on irregular variable-resolution cells
    for n in np.unique(nEoC):
        n = int(n)
        sel = np.where(nEoC == n)[0]
        nbrs = coc[sel, :n]                               # (G, n)
        xs, ys = _tangent_coords(mesh, cxyz[sel][:, None, :], cxyz[nbrs])
        L = np.sqrt(np.mean(xs * xs + ys * ys, axis=1))   # (G,)
        xs_, ys_ = xs / L[:, None], ys / L[:, None]
        G = sel.size
        A = np.zeros((G, n + 1, 6))
        A[:, 0, 0] = 1.0
        A[:, 1:, 0] = 1.0
        A[:, 1:, 1] = xs_
        A[:, 1:, 2] = ys_
        A[:, 1:, 3] = xs_ * xs_
        A[:, 1:, 4] = xs_ * ys_
        A[:, 1:, 5] = ys_ * ys_
        B = np.linalg.pinv(A)                             # (G, 6, n+1)
        B[:, 1:3, :] /= L[:, None, None]       # fx, fy back to physical
        B[:, 3:6, :] /= (L * L)[:, None, None]
        bmats[sel, :, :n + 1] = B
    return bmats


def _edge_direction_weights(mesh: Mesh):
    """Per-edge per-side directional second-derivative combination weights:
    d2f/dx'^2 along the cell->edge direction = 2cos^2(t)*fxx
    + 2cos(t)sin(t)*fxy + 2sin^2(t)*fyy.  Returns (nEdges, 2, 3)."""
    cxyz = np.stack([mesh.xCell, mesh.yCell, mesh.zCell], -1).astype(np.float64)
    exyz = np.stack([mesh.xEdge, mesh.yEdge, mesh.zEdge], -1).astype(np.float64)
    coe = np.asarray(mesh.cellsOnEdge)
    out = np.zeros((mesh.nEdges, 2, 3))
    for side in range(2):
        cells = coe[:, side]
        xs, ys = _tangent_coords(mesh, cxyz[cells], exyz)
        theta = np.arctan2(ys, xs)
        out[:, side, 0] = 2.0 * np.cos(theta) ** 2
        out[:, side, 1] = 2.0 * np.cos(theta) * np.sin(theta)
        out[:, side, 2] = 2.0 * np.sin(theta) ** 2
    return out


def build_deriv_two(mesh: Mesh, bmats=None):
    """Quadratic-fit second-derivative stencils.

    Returns deriv_two (nEdges, 2, maxEdges+1): for each edge and each of its
    two cells, the directional-second-derivative weights of [cell itself,
    cellsOnCell(1..nEdgesOnCell)] along the cell->edge direction
    (ref: atm_initialize_advection_rk deriv_two fill,
    mpas_atm_advection.F:330-392).
    """
    nE = mesh.nEdges
    mE = mesh.maxEdges
    coe = np.asarray(mesh.cellsOnEdge)
    if bmats is None:
        bmats = build_cell_fit_matrices(mesh)
    dirw = _edge_direction_weights(mesh)       # (nE, 2, 3)
    deriv_two = np.zeros((nE, 2, mE + 1))
    for side in range(2):
        B = bmats[coe[:, side]]                # (nE, 6, mE+1)
        deriv_two[:, side, :] = (dirw[:, side, 0, None] * B[:, 3, :]
                                 + dirw[:, side, 1, None] * B[:, 4, :]
                                 + dirw[:, side, 2, None] * B[:, 5, :])
    return deriv_two


def build_adv_factored(mesh: Mesh, bmats=None):
    """Cell-assembled factorization of the SG11 advection stencil.

    The per-edge 10-wide advCellsForEdge stencil (ref:
    atm_adv_coef_compression, mpas_atm_core.F:1113-1266) factors exactly:
    deriv_two[e,s,:] contracts the per-cell quadratic-fit second-derivative
    rows (fxx, fxy, fyy) with a per-edge 3-vector of direction weights, so
    the high-order edge value becomes
        F_m[c]   = bmats[c, 3+m, :] . psi[stencil(c)]      (cell assembly)
        D2_s[e]  = sum_m d2w[e,s,m] * F_m[coe[e,s]]        (2 row gathers)
        value[e] = dv*0.5*(psi[c1]+psi[c2]) + D2_1 + D2_2
                   + sign(uh)*beta*(D2_1 - D2_2)
    replacing the (nEdges, 10, K) arbitrary gather with one 6-wide
    cellsOnCell gather at cells plus contiguous c1/c2 row gathers — the
    same traffic win as the cell-assembled TRiSK operator (ops/stencils.py).

    Returns (d2_bmat (nCells, 3, maxEdges+1),
             d2w (nEdges, 2, 3) with the -dc^2/12*dv flux factor baked in).
    """
    if bmats is None:
        bmats = build_cell_fit_matrices(mesh)
    d2_bmat = np.ascontiguousarray(bmats[:, 3:6, :])
    dirw = _edge_direction_weights(mesh)
    dc = np.asarray(mesh.dcEdge)
    dv = np.asarray(mesh.dvEdge)
    d2w = dirw * (-(dc ** 2) / 12.0 * dv)[:, None, None]
    return d2_bmat, d2w


def build_adv_cell_tensors(mesh: Mesh):
    """Per-cell copies of the factored advection edge weights, for the fully
    cell-assembled advective-tendency path (advection.py
    advective_tendencies_cell): each cell sees, for each of its edges p,
    its OWN direction weights, the OPPOSITE cell's weights, the upwind-term
    orientation sign, and dvEdge.  Values are edge quantities copied into
    cell rows (a static host-side gather), so the tensors survive shard
    reindexing unchanged.

    Returns (d2w_own (nC, mE, 3), d2w_opp (nC, mE, 3), s_cp (nC, mE),
    dv_cell (nC, mE)); the -dc^2/12 factor is baked in, dvEdge is NOT
    (it rides dv_cell so the divergence weights stay explicit)."""
    dirw = _edge_direction_weights(mesh)
    dc = np.asarray(mesh.dcEdge)
    w = dirw * (-(dc ** 2) / 12.0)[:, None, None]        # (nE, 2, 3)
    eoc = np.asarray(mesh.edgesOnCell)
    coe = np.asarray(mesh.cellsOnEdge)
    nC, mE = eoc.shape
    cells = np.arange(nC)[:, None]
    side_c = (coe[eoc, 0] != cells).astype(np.int64)     # 0 when own side = 0
    d2w_own = w[eoc, side_c]                             # (nC, mE, 3)
    d2w_opp = w[eoc, 1 - side_c]
    s_cp = np.where(side_c == 0, 1.0, -1.0)
    dv_cell = np.asarray(mesh.dvEdge)[eoc]
    return d2w_own, d2w_opp, s_cp, dv_cell


def build_adv_coefs(mesh: Mesh, deriv_two, coef_3rd_order: float):
    """Compress deriv_two into per-edge advection stencils
    (ref: atm_adv_coef_compression, mpas_atm_core.F:1113-1266).
    adv_coefs include the dvEdge factor; adv_coefs_3rd pre-scaled by
    config_coef_3rd_order (ref: atm_couple_coef_3rd_order)."""
    nE = mesh.nEdges
    coc = np.asarray(mesh.cellsOnCell)
    nEoC = np.asarray(mesh.nEdgesOnCell)
    coe = np.asarray(mesh.cellsOnEdge)
    dc = np.asarray(mesh.dcEdge)
    dv = np.asarray(mesh.dvEdge)

    # stencil width: 2 cells + their distinct neighbors; N_ADV (=10) fits
    # maxEdges=6 quasi-uniform meshes, variable-resolution meshes can have
    # 7+-sided cells so the pad adapts (ref dims advCellsForEdge FIFTEEN,
    # core_atmosphere/Registry.xml)
    n_adv = max(N_ADV, 2 * mesh.maxEdges)
    mE = mesh.maxEdges
    c1, c2 = coe[:, 0], coe[:, 1]

    # Vectorized stencil dedup (replaces the per-edge Python loop; same
    # candidate order as the reference, so slot layout and accumulation
    # order — hence bits — are identical):
    # candidates per edge = [c1, c2, coc[c1,:], coc[c2,:]]  (S = 2+2*mE)
    S = 2 + 2 * mE
    cand = np.concatenate([c1[:, None], c2[:, None], coc[c1], coc[c2]],
                          axis=1)                               # (nE, S)
    i_idx = np.arange(mE)[None, :]
    valid = np.concatenate(
        [np.ones((nE, 2), bool), i_idx < nEoC[c1][:, None],
         i_idx < nEoC[c2][:, None]], axis=1)                    # (nE, S)
    # first occurrence of each candidate among the valid slots
    eq = cand[:, :, None] == cand[:, None, :]                   # (nE, S, S)
    earlier = np.tril(np.ones((S, S), bool), -1)[None]
    dup = np.any(eq & earlier & valid[:, None, :], axis=2)
    is_first = valid & ~dup
    slot = np.cumsum(is_first, axis=1) - 1                      # rank if first
    # map every valid candidate to its first occurrence's compressed slot
    first_j = np.argmax(eq & is_first[:, None, :], axis=2)      # (nE, S)
    tgt = np.take_along_axis(slot, first_j, axis=1)             # (nE, S)
    nAdv = np.sum(is_first, axis=1).astype(np.int64)

    advCells = np.zeros((nE, n_adv), dtype=np.int64)
    rows = np.repeat(np.arange(nE), S).reshape(nE, S)
    advCells[rows[is_first], slot[is_first]] = cand[is_first]

    # contributions in the reference's order (c1 self, c1 nbrs, c2 self,
    # c2 nbrs), accumulated slot-wise with np.add.at (ordered, sequential
    # — matches the loop's += order bitwise)
    contrib = np.concatenate(
        [deriv_two[:, 0, 0][:, None], deriv_two[:, 1, 0][:, None],
         deriv_two[:, 0, 1:mE + 1], deriv_two[:, 1, 1:mE + 1]], axis=1)
    sgn3 = np.concatenate(
        [np.ones((nE, 1)), -np.ones((nE, 1)),
         np.ones((nE, mE)), -np.ones((nE, mE))], axis=1)
    order = np.array([0] + list(range(2, 2 + mE))
                     + [1] + list(range(2 + mE, S)))
    a = np.zeros((nE, n_adv))
    a3 = np.zeros((nE, n_adv))
    flat_rows = rows[:, order][valid[:, order]]
    flat_tgt = tgt[:, order][valid[:, order]]
    np.add.at(a, (flat_rows, flat_tgt), contrib[:, order][valid[:, order]])
    np.add.at(a3, (flat_rows, flat_tgt),
              (contrib * sgn3)[:, order][valid[:, order]])
    a *= -(dc ** 2)[:, None] / 12.0
    a3 *= -(dc ** 2)[:, None] / 12.0
    a[np.arange(nE), tgt[:, 0]] += 0.5
    a[np.arange(nE), tgt[:, 1]] += 0.5
    coefs = dv[:, None] * a
    coefs3 = dv[:, None] * a3 * coef_3rd_order
    return (advCells.astype(np.int32), coefs, coefs3, nAdv)


def build_deformation_weights(mesh: Mesh):
    """defc_a/defc_b for the Smagorinsky deformation
    (ref: atm_initialize_deformation_weights, mpas_atm_advection.F:744-937)."""
    nC, mE = mesh.nCells, mesh.maxEdges
    cxyz = np.stack([mesh.xCell, mesh.yCell, mesh.zCell], -1).astype(np.float64)
    vxyz = np.stack([mesh.xVertex, mesh.yVertex, mesh.zVertex],
                    -1).astype(np.float64)
    voc = np.asarray(mesh.verticesOnCell)
    eoc = np.asarray(mesh.edgesOnCell)
    coe = np.asarray(mesh.cellsOnEdge)
    nEoC = np.asarray(mesh.nEdgesOnCell)
    # batched over all cells (was a 40k-iteration Python loop = 11 s of
    # the jw_120km setup): tangent-plane projection of every cell's vertex
    # ring at once, pad slots masked
    j = np.arange(mE)[None, :]
    n = nEoC[:, None]
    valid = j < n
    xs, ys = _tangent_coords(mesh, cxyz[:, None, :],
                             vxyz[voc])                     # (nC, mE)
    jn = np.where(j + 1 < n, j + 1, 0)
    xn = np.take_along_axis(xs, jn, axis=1)
    yn = np.take_along_axis(ys, jn, axis=1)
    terms = 0.25 * (xs + xn) * (yn - ys) - 0.25 * (ys + yn) * (xn - xs)
    area = np.sum(np.where(valid, terms, 0.0), axis=1, keepdims=True)
    dl = np.sqrt((xn - xs) ** 2 + (yn - ys) ** 2)
    theta = np.arctan2(yn - ys, xn - xs)
    ca = dl * (np.cos(theta) ** 2 - np.sin(theta) ** 2) / area
    cb = dl * 2.0 * np.sin(theta) * np.cos(theta) / area
    sign = np.where(coe[eoc, 0] == np.arange(nC)[:, None], 1.0, -1.0)
    defc_a = np.where(valid, ca * sign, 0.0)
    defc_b = np.where(valid, cb * sign, 0.0)
    return defc_a, defc_b


def build_reconstruct_weights(mesh: Mesh):
    """Per-cell least-squares reconstruction of the horizontal wind vector
    from edge-normal components: V = argmin sum_e (V.n_e - u_e)^2 over the
    cell's edges. Returns (w_zonal, w_merid), each (nCells, maxEdges), so
    u_zonal(c) = sum_i w_zonal[c,i]*u[edgesOnCell[c,i]].

    TPU-native replacement for the RBF reconstruction weights
    (ref: mpas_vector_reconstruction.F:51 mpas_init_reconstruct)."""
    nC, mE = mesh.nCells, mesh.maxEdges
    nEoC = np.asarray(mesh.nEdgesOnCell)
    eoc = np.asarray(mesh.edgesOnCell)
    ang = np.asarray(mesh.angleEdge)
    latE, lonE = np.asarray(mesh.latEdge), np.asarray(mesh.lonEdge)
    latC, lonC = np.asarray(mesh.latCell), np.asarray(mesh.lonCell)
    w_zonal = np.zeros((nC, mE))
    w_merid = np.zeros((nC, mE))
    if mesh.on_sphere:
        ee = np.stack([-np.sin(lonE), np.cos(lonE), np.zeros_like(lonE)], -1)
        ne = np.stack([-np.sin(latE) * np.cos(lonE),
                       -np.sin(latE) * np.sin(lonE), np.cos(latE)], -1)
        nvec3 = np.cos(ang)[:, None] * ee + np.sin(ang)[:, None] * ne
        ec = np.stack([-np.sin(lonC), np.cos(lonC), np.zeros_like(lonC)], -1)
        ncv = np.stack([-np.sin(latC) * np.cos(lonC),
                        -np.sin(latC) * np.sin(lonC), np.cos(latC)], -1)
    # batched closed-form pseudo-inverse (was 40k tiny SVDs = 2.7 s of
    # setup): for full-rank tall N, pinv(N) = (N^T N)^{-1} N^T — a 2x2
    # solve per cell
    j = np.arange(mE)[None, :]
    valid = (j < nEoC[:, None]).astype(np.float64)    # (nC, mE)
    if mesh.on_sphere:
        nx = np.einsum("cmk,ck->cm", nvec3[eoc], ec) * valid
        ny = np.einsum("cmk,ck->cm", nvec3[eoc], ncv) * valid
    else:
        nx = np.cos(ang[eoc]) * valid
        ny = np.sin(ang[eoc]) * valid
    g11 = np.sum(nx * nx, axis=1)
    g12 = np.sum(nx * ny, axis=1)
    g22 = np.sum(ny * ny, axis=1)
    det = g11 * g22 - g12 * g12
    w_zonal = (g22[:, None] * nx - g12[:, None] * ny) / det[:, None] * valid
    w_merid = (g11[:, None] * ny - g12[:, None] * nx) / det[:, None] * valid
    return w_zonal, w_merid


def build_zb(mesh: Mesh, vg: VerticalGrid, zgrid, deriv_two,
             theta_adv_order: int, coef_3rd_order: float):
    """Omega metric terms zb/zb3 and their cell-indexed copies
    (ref: mpas_init_atm_cases.F:1009-1040 and atm_compute_signs)."""
    nE, nC, mE = mesh.nEdges, mesh.nCells, mesh.maxEdges
    nzp = vg.nz + 1
    coe = np.asarray(mesh.cellsOnEdge)
    coc = np.asarray(mesh.cellsOnCell)
    nEoC = np.asarray(mesh.nEdgesOnCell)
    eoc = np.asarray(mesh.edgesOnCell)
    dv = np.asarray(mesh.dvEdge)
    dc = np.asarray(mesh.dcEdge)
    areaC = np.asarray(mesh.areaCell)
    c1, c2 = coe[:, 0], coe[:, 1]

    if theta_adv_order == 2:
        z_edge = 0.5 * (zgrid[c1] + zgrid[c2])        # (nE, nz+1)
        z_edge3 = np.zeros((nE, nzp))
    else:
        # d2fdx2 per side over the full interface column
        d2 = np.zeros((2, nE, nzp))
        for side in range(2):
            cells = coe[:, side]
            acc = deriv_two[:, side, 0][:, None] * zgrid[cells]
            for i in range(mE):
                valid = i < nEoC[cells]
                nb = coc[cells, i]
                acc = acc + np.where(valid[:, None],
                                     deriv_two[:, side, i + 1][:, None]
                                     * zgrid[nb], 0.0)
            d2[side] = acc
        z_edge = 0.5 * (zgrid[c1] + zgrid[c2]) \
            - (dc ** 2)[:, None] * (d2[0] + d2[1]) / 12.0
        if theta_adv_order == 3:
            z_edge3 = -(dc ** 2)[:, None] * (d2[0] - d2[1]) / 12.0
        else:
            z_edge3 = np.zeros((nE, nzp))

    zb = np.zeros((nE, 2, nzp))
    zb3 = np.zeros((nE, 2, nzp))
    zb[:, 0, :] = (z_edge - zgrid[c1]) * (dv / areaC[c1])[:, None]
    zb[:, 1, :] = (z_edge - zgrid[c2]) * (dv / areaC[c2])[:, None]
    zb3[:, 0, :] = z_edge3 * (dv / areaC[c1])[:, None]
    zb3[:, 1, :] = z_edge3 * (dv / areaC[c2])[:, None]

    # cell-indexed copies, pre-scaled by coef_3rd_order for zb3.
    # SLOT-MAJOR layout (mE, nC, nz+1): the per-cell edge-slot axis on
    # the free major axis so the omega-metric contractions in
    # set_smlstep_pert_variables / recover_large_step_variables run as
    # rank-2 full-lane FMAs (round-5 layout finding; see advection.py)
    zb_cell = np.zeros((mE, nC, nzp))
    zb3_cell = np.zeros((mE, nC, nzp))
    for i in range(mE):
        valid = i < nEoC
        e = eoc[:, i]
        own_side = np.where(coe[e, 0] == np.arange(nC), 0, 1)
        zb_cell[i] = np.where(valid[:, None], zb[e, own_side, :], 0.0)
        zb3_cell[i] = np.where(valid[:, None],
                               zb3[e, own_side, :] * coef_3rd_order, 0.0)
    return zb_cell, zb3_cell


def build_dss(mesh: Mesh, zgrid, zd: float, xnutr: float):
    """w-damping layer profile (ref: atm_compute_damping_coefs,
    mpas_atm_core.F:1077-1111; the JW init variant uses layer heights,
    mpas_init_atm_cases.F:686-697)."""
    zt = zgrid[:, -1:]
    z = 0.5 * (zgrid[:, :-1] + zgrid[:, 1:])
    dss = np.where(z > zd,
                   xnutr * np.sin(0.5 * pii * (z - zd)
                                  / np.maximum(zt - zd, 1.0)) ** 2, 0.0)
    md = np.asarray(mesh.meshDensity)[:, None]
    return dss / md ** 0.25
