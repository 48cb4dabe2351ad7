"""Cell-assembled high-order advective edge values.

The reference evaluates the Skamarock-Gassmann (2011) 3rd/4th-order edge
value with a per-edge 10-wide indexed stencil (adv_coefs/advCellsForEdge;
ref: mpas_atm_time_integration.F:5020-5035, :3300-3330).  On TPU that
arbitrary (nEdges, 10, K) gather is the dominant HBM cost of the transport
path.  Here the stencil is factored exactly (see setup.build_adv_factored):

  F_m[c]  = d2_bmat[c, m, 0]*psi[c] + sum_i d2_bmat[c, m, 1+i]*psi[coc[c,i]]
  D2_s[e] = sum_m d2w[e, s, m] * F_m[cellsOnEdge[e, s]]
  value   = 0.5*dvEdge*(psi[c1]+psi[c2]) + D2_1 + D2_2
            + sign(uh) * beta * (D2_1 - D2_2)

One 6-wide cellsOnCell gather at cells + two contiguous row gathers at
edges, instead of the 10-wide per-edge gather: ~2.5x less gather traffic
and MXU-friendly static contractions.  Algebraically identical to the
adv_coefs path (exactness test: tests/test_atm_core.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def cell_second_derivatives(grid, psi):
    """Quadratic-fit (fxx, fxy, fyy) at cells of a flattened (nC, K) field.

    Padded cellsOnCell slots carry zero weight in d2_bmat, so the gather of
    slot 0 contributes nothing."""
    g = psi[grid.mesh.cellsOnCell]                    # (nC, mE, K)
    F = jnp.einsum("cmi,cik->cmk", grid.d2_bmat[:, :, 1:], g)
    return F + grid.d2_bmat[:, :, 0, None] * psi[:, None, :]


def edge_value_parts(grid, psi):
    """Returns (base, third) of the high-order edge value for a cell field
    psi with arbitrary trailing dims; combine as base + sign(uh)*third.
    Both include the dvEdge factor (matching adv_coefs)."""
    mesh = grid.mesh
    trailing = psi.shape[1:]
    p = psi.reshape(psi.shape[0], -1)                 # (nC, K)
    F = cell_second_derivatives(grid, p)              # (nC, 3, K)
    cat = jnp.concatenate([p[:, None, :], F], axis=1)  # (nC, 4, K)
    c1 = mesh.cellsOnEdge[:, 0]
    c2 = mesh.cellsOnEdge[:, 1]
    g1 = cat[c1]                                       # (nE, 4, K)
    g2 = cat[c2]
    d21 = jnp.einsum("em,emk->ek", grid.d2w[:, 0], g1[:, 1:])
    d22 = jnp.einsum("em,emk->ek", grid.d2w[:, 1], g2[:, 1:])
    base = 0.5 * mesh.dvEdge[:, None] * (g1[:, 0] + g2[:, 0]) + d21 + d22
    third = grid.adv_beta * (d21 - d22)
    nE = base.shape[0]
    return base.reshape((nE,) + trailing), third.reshape((nE,) + trailing)


def advective_tendencies_cell(grid, fields):
    """Fully cell-assembled horizontal advective tendencies.

    For a tendency that is only ever consumed as a flux divergence
    (theta/w advection in dyn_tend; ref loops :5020-5035, :5199-5214 feeding
    the edgeSignOnCell sums :5185, :5321), the per-edge flux never needs to
    be materialized on edges at all: seen from cell c, edge p's two sides
    are c itself and cellsOnCell[c, p] (slot-aligned by construction;
    mesh/build.py:202-209), so the whole tendency assembles from three
    gathers total — psi at cellsOnCell, the fitted second derivatives F at
    cellsOnCell, and ru at edgesOnCell — shared across ALL fields passed in
    (each gathered row carries every field in its lanes).  TPU gathers pay
    per ROW, not per byte, so batching fields and assembling at cells
    (nC rows, not 3*nC edge rows) is the entire win.

    fields: list of (psi (nC, Ki), ru (nE, Ki)) pairs.
    Returns [ -sum_p edgeSign*dv*ru*value  ] per field, shape (nC, Ki) —
    divide by areaCell at the caller (matching the adv_coefs convention).
    """
    mesh = grid.mesh
    ks = [p.shape[1] for p, _ in fields]

    # ALL operands stay flattened with every field's levels concatenated
    # on the LANE axis (sum ks lanes), and the per-cell edge-slot axis
    # lives on the MAJOR (free) axis: (mE, nC, SK) gathers + rank-2
    # (nC, SK) arithmetic per slot. The round-4 slot-minor formulation
    # ((nC, mE, SK) rank-3 + einsums) paid (8/6)x sublane and (128/53)x
    # lane padding on every rank-3 intermediate plus the dot_general
    # batch-merge reshapes — measured 8.9 ms vs 3.7 ms per sweep for the
    # slot-major form at jw_120km shapes (bench_scripts/slotmajor_ab.py,
    # round 5). Values match to f32 roundoff (FMA reassociation only).
    psi = jnp.concatenate([p for p, _ in fields], axis=1)    # (nC, SK)
    ru = jnp.concatenate([r for _, r in fields], axis=1)     # (nE, SK)
    mE = mesh.cellsOnCell.shape[1]
    cocT = mesh.cellsOnCell.T                                # (mE, nC)
    eocT = mesh.edgesOnCell.T
    g = psi[cocT]                                            # (mE, nC, SK)
    B = grid.d2_bmat                                         # (nC, 3, mE+1)
    F = [sum(B[:, m, 1 + i][:, None] * g[i] for i in range(mE))
         + B[:, m, 0][:, None] * psi for m in range(3)]      # 3 x (nC, SK)
    beta = grid.adv_beta
    tend = 0.0
    for s in range(mE):
        d2own = sum(grid.d2w_own[:, s, m][:, None] * F[m]
                    for m in range(3))
        d2opp = sum(grid.d2w_opp[:, s, m][:, None] * F[m][cocT[s]]
                    for m in range(3))
        ru_s = ru[eocT[s]]
        upw = (beta * grid.adv_sside[:, s])[:, None]
        val = 0.5 * (psi + g[s]) + d2own + d2opp \
            + jnp.sign(ru_s) * upw * (d2own - d2opp)
        wdiv = (mesh.edgeSignOnCell[:, s] * grid.dv_cell[:, s])[:, None]
        tend = tend + wdiv * ru_s * val
    tend = -tend                                             # (nC, SK)
    outs, o = [], 0
    for k in ks:
        outs.append(tend[:, o:o + k])
        o += k
    return outs
