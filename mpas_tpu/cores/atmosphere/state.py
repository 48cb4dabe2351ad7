"""Atmosphere prognostic state + coupled diagnostics.

Prognostics mirror the reference `state` var_struct (ref: src/core_atmosphere/
Registry.xml:470: u, w, theta_m, rho_zz, scalars; two time levels in the
reference, implicit here in the functional step). Layout: levels minor
(lanes); w/rw live on nz+1 interfaces.

AtmDiag carries the coupled diagnostics the reference keeps in the `diag`
pool between steps (ru, rw, rho_p, rtheta_p, exner, pressure_p; ref:
atm_init_coupled_diagnostics, mpas_atm_time_integration.F:5825).
"""

from __future__ import annotations

from typing import Any

from flax import struct


@struct.dataclass
class AtmState:
    u: Any          # (nEdges, nz) normal velocity
    w: Any          # (nCells, nz+1) vertical velocity at interfaces
    theta_m: Any    # (nCells, nz) moist potential temperature
    rho_zz: Any     # (nCells, nz) dry density / d(zeta)/dz
    scalars: Any    # (nCells, nz, nScalars) mixing ratios


@struct.dataclass
class AtmDiag:
    ru: Any         # (nEdges, nz) rho_edge * u
    rw: Any         # (nCells, nz+1) rho * omega (vertical coordinate flux)
    rho_p: Any      # (nCells, nz) perturbation rho_zz
    rtheta_p: Any   # (nCells, nz) perturbation rho*theta_m
    exner: Any      # (nCells, nz)
    pressure_p: Any  # (nCells, nz) perturbation pressure
    ruAvg: Any      # (nEdges, nz) time-averaged ru for scalar transport
    wwAvg: Any      # (nCells, nz+1) time-averaged rho*omega
