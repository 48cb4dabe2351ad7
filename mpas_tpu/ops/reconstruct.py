"""RBF vector reconstruction: edge-normal components -> cell-center vectors.

ref: src/operators/mpas_vector_reconstruction.F (mpas_init_reconstruct :51
builds per-cell coefficients through the RBF machinery of
mpas_rbf_interpolation.F; mpas_reconstruct :195/:309 applies them) — the
constant-preserving inverse-multiquadric vector RBF in the cell tangent
plane. Weights are built once on the host; application is a single
edgesOnCell gather-sum (jit/TPU friendly), returning cell-centered
(X,Y,Z) and (zonal, meridional) winds exactly like the reference API.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mpas_tpu.mesh.mesh import Mesh


def _phi(r):
    """Inverse multiquadric kernel (ref: mpas_rbf_interpolation.F)."""
    return 1.0 / np.sqrt(1.0 + r * r)


def build_reconstruct_coeffs(mesh: Mesh):
    """coeffs_reconstruct (nCells, maxEdges, 3): 3-D vector weight of each
    edge's normal velocity in the cell-center reconstruction."""
    nC, mE = mesh.nCells, mesh.maxEdges
    nEoC = np.asarray(mesh.nEdgesOnCell)
    eoc = np.asarray(mesh.edgesOnCell)
    cxyz = np.stack([mesh.xCell, mesh.yCell, mesh.zCell], -1).astype(float)
    exyz = np.stack([mesh.xEdge, mesh.yEdge, mesh.zEdge], -1).astype(float)
    ang = np.asarray(mesh.angleEdge)
    latE, lonE = np.asarray(mesh.latEdge), np.asarray(mesh.lonEdge)
    if mesh.on_sphere:
        ee = np.stack([-np.sin(lonE), np.cos(lonE), np.zeros_like(lonE)], -1)
        ne = np.stack([-np.sin(latE) * np.cos(lonE),
                       -np.sin(latE) * np.sin(lonE), np.cos(latE)], -1)
        normals = np.cos(ang)[:, None] * ee + np.sin(ang)[:, None] * ne
    else:
        normals = np.stack([np.cos(ang), np.sin(ang),
                            np.zeros_like(ang)], -1)

    coeffs = np.zeros((nC, mE, 3))
    for c in range(nC):
        n = int(nEoC[c])
        es = eoc[c, :n]
        d = exyz[es] - cxyz[c]
        if mesh.x_period > 0:
            d[:, 0] -= mesh.x_period * np.round(d[:, 0] / mesh.x_period)
        if mesh.y_period > 0:
            d[:, 1] -= mesh.y_period * np.round(d[:, 1] / mesh.y_period)
        # tangent-plane basis at the cell
        if mesh.on_sphere:
            up = cxyz[c] / np.linalg.norm(cxyz[c])
            t1 = d[0] - np.dot(d[0], up) * up
            t1 /= np.linalg.norm(t1)
            t2 = np.cross(up, t1)
        else:
            t1 = np.array([1.0, 0.0, 0.0])
            t2 = np.array([0.0, 1.0, 0.0])
        P = np.stack([d @ t1, d @ t2], -1)              # (n, 2) locations
        Nv = np.stack([normals[es] @ t1, normals[es] @ t2], -1)  # (n, 2)
        Nv /= np.maximum(np.linalg.norm(Nv, axis=1, keepdims=True), 1e-12)
        alpha = np.mean(np.linalg.norm(P, axis=1))
        # constant-preserving vector RBF system (ref: rbf ..._const_dir):
        # V(x) = sum_j c_j phi(|x-x_j|/a) n_j + d0 ;  V(x_i).n_i = u_i ;
        # sum_j c_j n_j = 0
        r = np.linalg.norm(P[:, None, :] - P[None, :, :], axis=-1) / alpha
        A = np.zeros((n + 2, n + 2))
        A[:n, :n] = _phi(r) * (Nv @ Nv.T)
        A[:n, n:] = Nv
        A[n:, :n] = Nv.T
        rhs = np.zeros((n + 2, n))
        rhs[:n, :n] = np.eye(n)
        X = np.linalg.solve(A, rhs)                     # (n+2, n)
        # evaluate at the cell center (distance |P_j|/alpha)
        phi_c = _phi(np.linalg.norm(P, axis=1) / alpha)  # (n,)
        V2 = (phi_c[:, None] * Nv).T @ X[:n] + X[n:]     # (2, n)
        coeffs[c, :n, :] = (np.outer(V2[0], t1) + np.outer(V2[1], t2)
                            ).reshape(n, 3)
    return coeffs


def reconstruct(mesh: Mesh, coeffs, u_edge):
    """Apply: returns (Vx, Vy, Vz, zonal, meridional) at cells
    (ref: mpas_reconstruct_2d :309)."""
    ue = u_edge[mesh.edgesOnCell]                       # (nC, mE, ...)
    extra = ue.ndim - 2
    w = coeffs.reshape(coeffs.shape[:2] + (1,) * extra + (3,))
    ue_ = ue[..., None]
    V = jnp.sum(w * ue_, axis=1)                        # (nC, ..., 3)
    lat, lon = mesh.latCell, mesh.lonCell
    if mesh.on_sphere:
        east = jnp.stack([-jnp.sin(lon), jnp.cos(lon),
                          jnp.zeros_like(lon)], -1)
        north = jnp.stack([-jnp.sin(lat) * jnp.cos(lon),
                           -jnp.sin(lat) * jnp.sin(lon), jnp.cos(lat)], -1)
    else:
        east = jnp.stack([jnp.ones_like(lon), jnp.zeros_like(lon),
                          jnp.zeros_like(lon)], -1)
        north = jnp.stack([jnp.zeros_like(lat), jnp.ones_like(lat),
                           jnp.zeros_like(lat)], -1)
    shape = (V.shape[0],) + (1,) * extra + (3,)
    zonal = jnp.sum(V * east.reshape(shape), axis=-1)
    merid = jnp.sum(V * north.reshape(shape), axis=-1)
    return V[..., 0], V[..., 1], V[..., 2], zonal, merid
