"""Sharded checkpoint IO: per-host aggregated restart shards.

TPU-native replacement for the reference's parallel IO aggregation (ref:
PIO iotasks/stride, mpas_framework.F:89-104 + the IO-decomp <-> compute-
decomp alltoall transposes of mpas_dmpar.F:2260-4665): each IO task
writes one file covering a *group* of shards (the iotasks/stride
analogue is group_size), carrying only owned entities plus their global
indices, so reads are gather-free and any reader process count can
reassemble. Format: npz per group + a json manifest (the
Zarr/TensorStore-style layout of SURVEY §2.5 row 7, with numpy as the
container since zarr is not in this image).
"""

from __future__ import annotations

import json
import os

import numpy as np

_KIND_SLOTS = {"cell": "cell_global", "edge": "edge_global",
               "vertex": "vertex_global"}
_KIND_MASKS = {"cell": "owned_cell_mask", "edge": "owned_edge_mask",
               "vertex": "owned_vertex_mask"}


def write_sharded(dirpath: str, smesh, fields: dict, kinds: dict,
                  n_global: dict, group_size: int = 1, attrs: dict = None):
    """Write stacked-local fields as per-group restart shards.

    fields: {name: (P, n_local, ...) stacked array}; kinds: {name:
    'cell'|'edge'|'vertex'}; n_global: {'cell': nCells, ...}. group_size
    shards aggregate into one file (the iotasks/stride analogue: P files
    at 1, P/g files at g)."""
    os.makedirs(dirpath, exist_ok=True)
    P = smesh.n_parts
    groups = [(g, list(range(g, min(g + group_size, P))))
              for g in range(0, P, group_size)]
    manifest = {"n_parts": P, "group_size": group_size,
                "n_global": dict(n_global),
                "kinds": dict(kinds),
                "files": [], "attrs": attrs or {}}
    for g0, members in groups:
        payload = {}
        for kind in set(kinds.values()):
            slots = np.asarray(getattr(smesh, _KIND_SLOTS[kind]))
            mask = np.asarray(getattr(smesh, _KIND_MASKS[kind])) > 0
            idx = np.concatenate([slots[p][mask[p]] for p in members])
            payload[f"__idx_{kind}__"] = idx.astype(np.int64)
        for name, arr in fields.items():
            kind = kinds[name]
            mask = np.asarray(getattr(smesh, _KIND_MASKS[kind])) > 0
            arr = np.asarray(arr)
            payload[name] = np.concatenate(
                [arr[p][mask[p]] for p in members], axis=0)
        fname = f"restart_shard_{g0:04d}.npz"
        np.savez_compressed(os.path.join(dirpath, fname), **payload)
        manifest["files"].append(fname)
    with open(os.path.join(dirpath, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def read_sharded(dirpath: str) -> tuple:
    """Reassemble global fields from a sharded restart directory.

    Returns (fields: {name: (n_global, ...)}, attrs). Gather-free: each
    file carries its global indices; assembly is pure indexed assignment
    (the reference needs an alltoall transpose here, mpas_dmpar.F:2260+).
    """
    with open(os.path.join(dirpath, "manifest.json")) as f:
        manifest = json.load(f)
    fields = {}
    for fname in manifest["files"]:
        with np.load(os.path.join(dirpath, fname)) as z:
            idx = {k[6:-2]: z[k] for k in z.files
                   if k.startswith("__idx_")}
            for name in z.files:
                if name.startswith("__idx_"):
                    continue
                kind = manifest["kinds"][name]
                data = z[name]
                if name not in fields:
                    shape = (manifest["n_global"][kind],) + data.shape[1:]
                    fields[name] = np.zeros(shape, dtype=data.dtype)
                fields[name][idx[kind]] = data
    return fields, manifest["attrs"]
