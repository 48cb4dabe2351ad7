"""Diagnostics manager: init/update/compute/reset lifecycle.

ref: src/core_atmosphere/diagnostics/mpas_atm_diagnostics_manager.F —
each diagnostic registers hooks; compute runs when its fields are needed
by an output stream (here: on an interval, like the ocean analysis
driver). Includes the soundings writer
(ref: diagnostics/soundings.F — nearest-cell column extraction).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from mpas_tpu.constants import cp, p0, rgas
from mpas_tpu.cores.atmosphere.diagnostics.convective import (
    compute_convective)
from mpas_tpu.cores.atmosphere.diagnostics.isobaric import compute_isobaric
from mpas_tpu.cores.atmosphere.diagnostics.pv import (ertel_pv,
                                                      theta_on_pv_surface)


@dataclasses.dataclass
class DiagnosticsManager:
    """members: {name: interval_seconds}; names from
    {isobaric, convective, pv}."""
    members: Dict[str, float]
    history: Dict[str, list] = dataclasses.field(default_factory=dict)
    _next_due: Dict[str, float] = dataclasses.field(default_factory=dict)

    def init(self):
        for name in self.members:
            if name not in ("isobaric", "convective", "pv",
                            "reflectivity"):
                raise ValueError(f"unknown diagnostic '{name}'")
            self.history[name] = []
            self._next_due[name] = 0.0

    def _compute(self, name, grid, mesh, state, diag):
        if name == "isobaric":
            return {k: np.asarray(v) for k, v in
                    compute_isobaric(grid, state, diag).items()}
        if name == "convective":
            return {k: np.asarray(v) for k, v in
                    compute_convective(grid, state, diag).items()}
        if name == "reflectivity":
            # ref: module_mp_radar.F refl10cm fed by the WSM6/Thompson
            # hydrometeors (qr, qs, qg at scalar slots 2, 4, 5)
            from mpas_tpu.cores.atmosphere.physics.radar import (
                composite_reflectivity, refl_10cm)
            ns = state.scalars.shape[-1]
            rho = grid.zz * state.rho_zz
            qr = jnp.maximum(state.scalars[..., 2], 0.0) if ns > 2 \
                else jnp.zeros_like(rho)
            qs = jnp.maximum(state.scalars[..., 4], 0.0) if ns > 4 else None
            qg = jnp.maximum(state.scalars[..., 5], 0.0) if ns > 5 else None
            qv = jnp.maximum(state.scalars[..., 0], 0.0)
            t = state.theta_m / (1.0 + 1.608 * qv) * diag.exner
            dbz = refl_10cm(rho, qr, qs=qs, qg=qg, t=t)
            return {"refl_10cm": np.asarray(dbz),
                    "refl_10cm_max": np.asarray(
                        composite_reflectivity(dbz))}
        pv = ertel_pv(grid, mesh, state, diag)
        qv = jnp.maximum(state.scalars[..., 0], 0.0) \
            if state.scalars.shape[-1] > 0 else 0.0
        th = state.theta_m / (1.0 + 1.608 * qv) \
            if state.scalars.shape[-1] > 0 else state.theta_m
        return {"ertel_pv": np.asarray(pv),
                "theta_pv": np.asarray(theta_on_pv_surface(pv, th))}

    def compute_due(self, grid, mesh, state, diag, t_seconds: float):
        for name, interval in self.members.items():
            if t_seconds + 1e-9 >= self._next_due[name]:
                self.history[name].append(
                    (t_seconds, self._compute(name, grid, mesh, state,
                                              diag)))
                while self._next_due[name] <= t_seconds + 1e-9:
                    self._next_due[name] += interval

    def compute_all(self, grid, mesh, state, diag, t_seconds: float = 0.0):
        for name in self.members:
            self.history[name].append(
                (t_seconds, self._compute(name, grid, mesh, state, diag)))


def sounding(grid, mesh, state, diag, lat_lon_or_xy, on_sphere=None):
    """Extract the nearest-cell column as a sounding dict
    (ref: diagnostics/soundings.F:1-466)."""
    on_sphere = mesh.on_sphere if on_sphere is None else on_sphere
    if on_sphere:
        la, lo = lat_lon_or_xy
        d = (np.asarray(mesh.latCell) - la) ** 2 \
            + (np.asarray(mesh.lonCell) - lo) ** 2
    else:
        x, y = lat_lon_or_xy
        d = (np.asarray(mesh.xCell) - x) ** 2 \
            + (np.asarray(mesh.yCell) - y) ** 2
    i = int(np.argmin(d))
    qv = np.maximum(np.asarray(state.scalars[i, :, 0]), 0.0) \
        if state.scalars.shape[-1] > 0 else np.zeros(state.theta_m.shape[1])
    th = np.asarray(state.theta_m[i]) / (1.0 + 1.608 * qv)
    ex = np.asarray(diag.exner[i])
    return {
        "cell": i,
        "pressure_hpa": float(p0) / 100.0 * ex ** (cp / rgas),
        "temperature_c": th * ex - 273.15,
        "qv": qv,
        "height_m": 0.5 * (np.asarray(grid.zgrid[i, 1:])
                           + np.asarray(grid.zgrid[i, :-1])),
    }
