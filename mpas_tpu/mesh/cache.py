"""Disk cache for built meshes (host-side construction is the slow part)."""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from mpas_tpu.mesh.mesh import Mesh

_STATIC = ["nCells", "nEdges", "nVertices", "maxEdges", "maxEdges2",
           "vertexDegree", "on_sphere", "sphere_radius", "x_period",
           "y_period"]


def cache_dir():
    d = os.environ.get("MPAS_TPU_CACHE",
                       os.path.expanduser("~/.cache/mpas_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def save_mesh(mesh: Mesh, path: str):
    arrays = {}
    for f in dataclasses.fields(mesh):
        if f.name in _STATIC:
            continue
        arrays[f.name] = np.asarray(getattr(mesh, f.name))
    meta = {k: getattr(mesh, k) for k in _STATIC}
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_mesh(path: str) -> Mesh:
    with np.load(path) as z:
        meta = json.loads(str(z["__meta__"]))
        kw = {k: z[k] for k in z.files if k != "__meta__"}
    # derived weight bundles added after a cache was written: reconstruct
    if "divW" not in kw:
        kw["divW"] = kw["edgeSignOnCell"] * kw["dvEdge"][kw["edgesOnCell"]]
        kw["keW"] = 0.25 * kw["edgesOnCellMask"] \
            * (kw["dcEdge"] * kw["dvEdge"])[kw["edgesOnCell"]]
        kw["curlW"] = kw["edgeSignOnVertex"] \
            * kw["dcEdge"][kw["edgesOnVertex"]]
    if "triskM" not in kw:
        # cell-assembled TRiSK fields added after a cache was written:
        # reconstruct from weightsOnEdge / edgesOnEdge connectivity
        eoc = kw["edgesOnCell"].astype(np.int64)
        coe = kw["cellsOnEdge"].astype(np.int64)
        nec = kw["nEdgesOnCell"].astype(np.int64)
        nE = coe.shape[0]
        nC, mE = eoc.shape
        eids = np.arange(nE)
        slot = np.zeros((nE, 2), dtype=np.int64)
        triskM = np.zeros((nC, mE, mE))
        for side in range(2):
            c = coe[:, side]
            cc = np.maximum(c, 0)
            j0 = np.argmax(eoc[cc] == eids[:, None], axis=1)
            slot[:, side] = j0
            necc = np.maximum(nec[cc], 1)
            for j in range(1, mE):
                valid = (c >= 0) & (j <= nec[cc] - 1)
                jj = (j0 + j) % necc
                col = side * (mE - 1) + (j - 1)
                w = kw["weightsOnEdge"][:, col]
                sel = np.where(valid)[0]
                triskM[cc[sel], j0[sel], jj[sel]] = w[sel]
        kw["triskM"] = triskM
        kw["edgeSlotOnCell"] = slot.astype(np.int32)
    return Mesh(**meta, **kw)


def cached(name: str, builder):
    """Build-or-load a mesh by cache key."""
    path = os.path.join(cache_dir(), name + ".npz")
    if os.path.exists(path):
        return load_mesh(path)
    mesh = builder()
    save_mesh(mesh, path)
    return mesh
