"""Device-resident unstructured Voronoi mesh container.

TPU-native equivalent of the reference mesh pool (the `mesh` var_struct in each
core's Registry.xml, e.g. ref: src/core_sw/Registry.xml:270 and the field
catalogue read from grid.nc). Design differences from the reference:

- Struct-of-arrays pytree (flax.struct.dataclass), not a hierarchical pool of
  linked field objects. Index arrays are 0-based int32.
- All stencil indirection is expressed as *gathers from the destination
  entity* (edgesOnCell, cellsOnEdge, edgesOnVertex, ...) so that no scatter is
  ever needed on the TPU compute path. Padded slots (beyond nEdgesOnCell etc.)
  point at index 0 and carry zero weight/sign, mirroring the reference's
  "nCells+1 garbage slot" trick (ref: mpas_atm_time_integration.F:2470-2477)
  without growing the arrays.
- Sign conventions (match the reference exactly):
    * normal direction on edge e points from cellsOnEdge[e,0] to
      cellsOnEdge[e,1] (ref: MPAS mesh spec; sw_compute_tend gradient
      `(f(cell2)-f(cell1))/dcEdge`, mpas_sw_time_integration.F:477-498)
    * tangential t = k x n; verticesOnEdge[e,0] -> verticesOnEdge[e,1] points
      along +t (ref: circulation loop mpas_sw_time_integration.F:1188-1193)
    * edgeSignOnCell[c,j] = +1 where cell c is cellsOnEdge[e,0] (outward
      normal), so divergence = sum(sign * u * dvEdge)/areaCell
      (ref: divergence loop, mpas_sw_time_integration.F:1205-1224)
    * edgeSignOnVertex[v,i] = +1 where v is verticesOnEdge[e,1], so
      circulation = sum(sign * u * dcEdge)
      (ref: mpas_sw_time_integration.F:1188-1193)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Mesh:
    # --- static metadata (compile-time constants under jit) ---
    nCells: int = struct.field(pytree_node=False)
    nEdges: int = struct.field(pytree_node=False)
    nVertices: int = struct.field(pytree_node=False)
    maxEdges: int = struct.field(pytree_node=False)
    maxEdges2: int = struct.field(pytree_node=False)
    vertexDegree: int = struct.field(pytree_node=False)
    on_sphere: bool = struct.field(pytree_node=False)
    sphere_radius: float = struct.field(pytree_node=False)
    # planar periodic metadata (0.0 when not periodic / on sphere)
    x_period: float = struct.field(pytree_node=False)
    y_period: float = struct.field(pytree_node=False)

    # --- connectivity (int32, 0-based, padded entries = 0 with zero weight) ---
    cellsOnEdge: Any          # (nEdges, 2)
    verticesOnEdge: Any       # (nEdges, 2)
    edgesOnCell: Any          # (nCells, maxEdges)
    nEdgesOnCell: Any         # (nCells,)
    cellsOnCell: Any          # (nCells, maxEdges)
    verticesOnCell: Any       # (nCells, maxEdges)
    cellsOnVertex: Any        # (nVertices, vertexDegree)
    edgesOnVertex: Any        # (nVertices, vertexDegree)
    edgesOnEdge: Any          # (nEdges, maxEdges2)
    nEdgesOnEdge: Any         # (nEdges,)

    # --- masks / signs (working real dtype) ---
    edgesOnCellMask: Any      # (nCells, maxEdges) 1.0 where valid
    edgeSignOnCell: Any       # (nCells, maxEdges) +1 outward-normal, 0 padded
    edgeSignOnVertex: Any     # (nVertices, vertexDegree) +-1, 0 padded
    cellsOnVertexMask: Any    # (nVertices, vertexDegree)
    boundaryEdge: Any         # (nEdges,) 1.0 on solid-boundary edges
    boundaryCell: Any         # (nCells,) 1.0 for cells touching a boundary
    boundaryVertex: Any       # (nVertices,)

    # --- geometry ---
    xCell: Any
    yCell: Any
    zCell: Any
    latCell: Any
    lonCell: Any
    xEdge: Any
    yEdge: Any
    zEdge: Any
    latEdge: Any
    lonEdge: Any
    xVertex: Any
    yVertex: Any
    zVertex: Any
    latVertex: Any
    lonVertex: Any
    dvEdge: Any               # (nEdges,) distance between edge's vertices
    dcEdge: Any               # (nEdges,) distance between edge's cells
    areaCell: Any             # (nCells,)
    areaTriangle: Any         # (nVertices,) dual-cell area
    kiteAreasOnVertex: Any    # (nVertices, vertexDegree) aligned w/ cellsOnVertex
    kiteAreasOnCell: Any      # (nCells, maxEdges) kite of (cell, verticesOnCell[j])
    angleEdge: Any            # (nEdges,) angle of normal from local east
    weightsOnEdge: Any        # (nEdges, maxEdges2) TRiSK tangential weights
    # cell-assembled TRiSK factorization: the same tangential operator as
    # weightsOnEdge/edgesOnEdge but expressed per cell, so the hot
    # 12-wide edge gather becomes one 6-wide cell gather + a static
    # (maxEdges x maxEdges) contraction + two row gathers.
    # v(e)  = G[c1(e), slot1(e)] + G[c2(e), slot2(e)],
    # G[c,p] = sum_i triskM[c,p,i] * x[edgesOnCell[c,i]]
    triskM: Any               # (nCells, maxEdges, maxEdges), scale-invariant
    edgeSlotOnCell: Any       # (nEdges, 2) int32: slot of e in its cells
    meshDensity: Any          # (nCells,)

    # --- precomputed reciprocals (HBM-bandwidth: avoid divides in kernels) ---
    invAreaCell: Any
    invAreaTriangle: Any
    invDvEdge: Any
    invDcEdge: Any

    # --- precomputed stencil weight bundles (row-aligned with the maps) ---
    # divergence:  sum_j divW[c,j] * x[edgesOnCell[c,j]]   (then * invAreaCell)
    # kinetic en.: sum_j keW[c,j]  * u^2[edgesOnCell[c,j]] (then * invAreaCell)
    # circulation: sum_i curlW[v,i]* u[edgesOnVertex[v,i]]
    # Eliminates the dv/dc gathers inside the hot stencils (they ride the
    # weight arrays instead; ref inner loops mpas_sw_time_integration.F:1205+)
    divW: Any                 # (nCells, maxEdges) = edgeSignOnCell*dvEdge[eoc]
    keW: Any                  # (nCells, maxEdges) = 0.25*dc*dv[eoc]*mask
    curlW: Any                # (nVertices, vertexDegree) = sign*dcEdge[eov]

    # --- Coriolis (stored in mesh pool like the reference grid.nc) ---
    fEdge: Any
    fVertex: Any
    fCell: Any

    # --- variable-resolution mesh scaling (ref: sw_compute_mesh_scaling,
    #     mpas_sw_core.F:347; atm_compute_mesh_scaling mpas_atm_core.F:927) ---
    meshScalingDel2: Any
    meshScalingDel4: Any

    def scaled(self, radius: float) -> "Mesh":
        """Rescale a unit-sphere mesh to the given radius.

        Mirrors the in-place scaling every reference test case performs
        (ref: mpas_sw_test_cases.F:303-318).
        """
        if not self.on_sphere:
            raise ValueError("scaled() only applies to spherical meshes")
        r = radius / self.sphere_radius
        return self.replace(
            sphere_radius=float(radius),
            xCell=self.xCell * r, yCell=self.yCell * r, zCell=self.zCell * r,
            xEdge=self.xEdge * r, yEdge=self.yEdge * r, zEdge=self.zEdge * r,
            xVertex=self.xVertex * r, yVertex=self.yVertex * r,
            zVertex=self.zVertex * r,
            dvEdge=self.dvEdge * r, dcEdge=self.dcEdge * r,
            invDvEdge=self.invDvEdge / r, invDcEdge=self.invDcEdge / r,
            divW=self.divW * r, curlW=self.curlW * r,
            keW=self.keW * r * r,
            areaCell=self.areaCell * r * r,
            areaTriangle=self.areaTriangle * r * r,
            kiteAreasOnVertex=self.kiteAreasOnVertex * r * r,
            kiteAreasOnCell=self.kiteAreasOnCell * r * r,
            invAreaCell=self.invAreaCell / (r * r),
            invAreaTriangle=self.invAreaTriangle / (r * r),
        )

    @property
    def dtype(self):
        return self.areaCell.dtype

    def validate(self):
        """Cheap structural invariants (host-side)."""
        assert self.cellsOnEdge.shape == (self.nEdges, 2)
        assert self.edgesOnCell.shape == (self.nCells, self.maxEdges)
        assert self.weightsOnEdge.shape == (self.nEdges, self.maxEdges2)
        assert int(np.max(np.asarray(self.nEdgesOnCell))) <= self.maxEdges


def to_device(mesh: Mesh, dtype=None) -> Mesh:
    """Move all mesh arrays to the default device, casting reals to dtype."""
    def conv(x):
        x = np.asarray(x)
        if dtype is not None and np.issubdtype(x.dtype, np.floating):
            x = x.astype(dtype)
        return jnp.asarray(x)
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(mesh)
    return jax.tree_util.tree_unflatten(treedef, [conv(l) for l in leaves])
