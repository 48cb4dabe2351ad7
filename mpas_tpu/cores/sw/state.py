"""Shallow-water prognostic state and diagnostic bundle.

Prognostics mirror the reference `state` var_struct (ref: src/core_sw/
Registry.xml:245-269: u, h, tracers with two time levels). Here time levels
are implicit in the functional step (old state in, new state out), so the
state pytree carries one copy.

Shapes: u (nEdges,), h (nCells,), tracers (nCells, nTracers) — single
vertical level (nVertLevels=1 in the reference SW core); the tracer axis is
minor for TPU lane efficiency (the reference uses tracers(nTracers, nVertLevels,
nCells) with tracer-major instead — layout re-designed, same content).
"""

from __future__ import annotations

from typing import Any

from flax import struct


@struct.dataclass
class SWState:
    u: Any          # normal velocity at edges
    h: Any          # fluid thickness at cells
    tracers: Any    # (nCells, nTracers), h-decoupled (mixing ratios)


@struct.dataclass
class SWDiagnostics:
    """Fields computed by solve_diagnostics (ref: the diagnostic members of
    the `state` struct, Registry.xml: v, h_edge, vorticity, divergence, ke,
    pv_edge, pv_vertex, pv_cell, h_vertex, vorticity_cell, gradPVn, gradPVt,
    circulation)."""
    v: Any
    h_edge: Any
    h_vertex: Any
    circulation: Any
    vorticity: Any
    divergence: Any
    ke: Any
    pv_vertex: Any
    pv_edge: Any
    pv_cell: Any
    vorticity_cell: Any
    gradPVn: Any
    gradPVt: Any
