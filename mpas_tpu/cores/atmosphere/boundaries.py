"""Regional (limited-area) boundary machinery: specified + relaxation zones.

ref: src/core_atmosphere/dynamics/mpas_atm_boundaries.F (zone constants
nSpecZone=2, nRelaxZone=5, nBdyZone=7; mask setup :421-520; LBC time
interpolation mpas_atm_get_bdy_state/:239 tend) and the zone tendency
adjustments in mpas_atm_time_integration.F
(atm_bdy_adjust_dynamics_relaxzone_tend :6200-6391 — Rayleigh nudging with
coef (zone-1)/nRelaxZone/(50 dt) plus Laplacian damping of the departure;
atm_bdy_reset_speczone_values :6394 — hard reset in the specified zone).

TPU redesign: masks are precomputed host-side by BFS hop distance from the
limited-area boundary; all zone adjustments are masked elementwise ops.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from mpas_tpu.mesh.mesh import Mesh

# ref: mpas_atm_boundaries.F zone constants
N_SPEC_ZONE = 2
N_RELAX_ZONE = 5
N_BDY_ZONE = N_SPEC_ZONE + N_RELAX_ZONE


@struct.dataclass
class BdyMasks:
    bdyMaskCell: Any    # (nCells,) int32: 0 interior; 1..5 relax; 6..7 spec
    bdyMaskEdge: Any    # (nEdges,)
    specCell: Any       # (nCells,) 1.0 where zone > nRelaxZone
    specEdge: Any       # (nEdges,)
    relaxCoefCell: Any  # (nCells,) (zone-1)/nRelaxZone in relax zone else 0
    relaxCoefEdge: Any  # (nEdges,)


def build_bdy_masks(mesh: Mesh) -> BdyMasks:
    """Zone index by hop distance from the open (boundary) edge of the
    limited-area mesh: hop 1 -> zone N_BDY_ZONE (outermost, specified),
    hop N_BDY_ZONE -> zone 1 (innermost relax ring), deeper -> 0.
    ref: mask setup, mpas_atm_boundaries.F:421-520."""
    nC = mesh.nCells
    coc = np.asarray(mesh.cellsOnCell)
    sgn = np.asarray(mesh.edgeSignOnCell)
    be = np.asarray(mesh.boundaryEdge) > 0
    coe = np.asarray(mesh.cellsOnEdge)

    hop = np.full(nC, 10 ** 6, dtype=np.int64)
    frontier = np.unique(coe[be].ravel())
    hop[frontier] = 1
    for h in range(2, N_BDY_ZONE + 1):
        prev = hop == h - 1
        neigh = coc[prev][sgn[prev] != 0]
        mask = hop[neigh] > h
        hop[neigh[mask]] = h
    zone = np.where(hop <= N_BDY_ZONE, N_BDY_ZONE - hop + 1, 0)

    zone_edge = np.maximum(zone[coe[:, 0]], zone[coe[:, 1]])
    zone_edge = np.where(be, N_BDY_ZONE, zone_edge)

    def coefs(z):
        relax = ((z >= 1) & (z <= N_RELAX_ZONE)).astype(np.float64)
        return relax * np.maximum(z - 1, 0) / N_RELAX_ZONE

    return BdyMasks(
        bdyMaskCell=jnp.asarray(zone.astype(np.int32)),
        bdyMaskEdge=jnp.asarray(zone_edge.astype(np.int32)),
        specCell=jnp.asarray((zone > N_RELAX_ZONE).astype(np.float64)),
        specEdge=jnp.asarray((zone_edge > N_RELAX_ZONE).astype(np.float64)),
        relaxCoefCell=jnp.asarray(coefs(zone)),
        relaxCoefEdge=jnp.asarray(coefs(zone_edge)))


def lbc_interp(lbc_t1, lbc_t2, t1_s: float, t2_s: float, now_s):
    """Linear time interpolation between two LBC states (pytrees).
    ref: mpas_atm_get_bdy_state (mpas_atm_boundaries.F:308)."""
    import jax
    w = jnp.clip((now_s - t1_s) / max(t2_s - t1_s, 1e-9), 0.0, 1.0)
    return jax.tree.map(lambda a, b: (1.0 - w) * a + w * b, lbc_t1, lbc_t2)


def relaxzone_tend(masks: BdyMasks, dt, field, driving, on_edges=False):
    """Rayleigh nudging tendency toward the LBC driving value.
    ref: atm_bdy_adjust_dynamics_relaxzone_tend
    (mpas_atm_time_integration.F:6275-6283):
      tend -= (zone-1)/nRelaxZone/(50 dt) * (field - driving)."""
    coef = masks.relaxCoefEdge if on_edges else masks.relaxCoefCell
    shape = (-1,) + (1,) * (field.ndim - 1)
    return -coef.reshape(shape) / (50.0 * dt) * (field - driving)


def speczone_reset(masks: BdyMasks, field, driving, on_edges=False):
    """Hard reset in the specified zone (ref: atm_bdy_reset_speczone_values
    :6394; also the speczone tend handling :714)."""
    spec = masks.specEdge if on_edges else masks.specCell
    shape = (-1,) + (1,) * (field.ndim - 1)
    s = spec.reshape(shape)
    return field * (1.0 - s) + driving * s
