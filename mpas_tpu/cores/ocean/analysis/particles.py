"""Lagrangian particle tracking (LIGHT equivalent).

ref: src/core_ocean/analysis_members/ (LIGHT — Lagrangian In-situ Global
High-performance Tracking; mpas_ocn_lagrangian_particle_tracking*.F):
particles carried by the resolved flow, per-particle cell search by
local walking, RK2 time stepping, sampling of fields along trajectories.

TPU redesign: fully vectorized over particles — the containing cell is
tracked per particle and updated by a fixed-iteration local walk over
cellsOnCell (particles move less than one cell per step under the CFL the
dycore already obeys); velocity at the particle is the inverse-distance
weighted cell-center reconstructed velocity of the containing cell and its
neighbors. Planar meshes (x-periodic channels supported); isopycnal/
fixed-depth vertical modes sample a fixed layer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from mpas_tpu.ops.reconstruct import build_reconstruct_coeffs, reconstruct


@struct.dataclass
class ParticleState:
    x: Any          # (nP,)
    y: Any          # (nP,)
    cell: Any       # (nP,) int32 containing (nearest-center) cell
    layer: Any      # (nP,) int32 vertical layer sampled


def _wrap(x, period):
    return jnp.where(period > 0.0, jnp.mod(x, period), x)


def _walk(mesh, x, y, cell, n_iter=2):
    """Fixed-iteration nearest-center walk (ref: LIGHT's particle horizontal
    search; ops.point_in_cell_walk is the host-side generic version)."""
    for _ in range(n_iter):
        cand = jnp.concatenate([cell[:, None], mesh.cellsOnCell[cell]],
                               axis=1)                      # (nP, 1+mE)
        dx = mesh.xCell[cand] - x[:, None]
        dy = mesh.yCell[cand] - y[:, None]
        if mesh.x_period > 0:
            dx = (dx + 0.5 * mesh.x_period) % mesh.x_period \
                - 0.5 * mesh.x_period
        if mesh.y_period > 0:
            dy = (dy + 0.5 * mesh.y_period) % mesh.y_period \
                - 0.5 * mesh.y_period
        d2 = dx * dx + dy * dy
        # padded neighbor slots point at cell 0; make them unattractive
        valid = jnp.concatenate(
            [jnp.ones_like(cell[:, None], dtype=bool),
             mesh.edgeSignOnCell[cell] != 0], axis=1)
        d2 = jnp.where(valid, d2, jnp.inf)
        best = jnp.argmin(d2, axis=1)
        cell = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
    return cell


class ParticleTracker:
    """ref lifecycle: particle init / integrate (RK2) / sample."""

    def __init__(self, mesh, x0, y0, layer=0):
        self.mesh = mesh
        self._coeffs = jnp.asarray(build_reconstruct_coeffs(mesh))
        nP = len(x0)
        cell0 = _walk(mesh, jnp.asarray(x0), jnp.asarray(y0),
                      jnp.zeros(nP, dtype=jnp.int32), n_iter=60)
        self.state = ParticleState(
            x=jnp.asarray(x0), y=jnp.asarray(y0), cell=cell0,
            layer=jnp.full(nP, layer, dtype=jnp.int32))

    def _velocity_at(self, u_edge, ps: ParticleState):
        """Inverse-distance weighted cell-center velocity around the
        containing cell."""
        m = self.mesh
        _, _, _, uz, um = reconstruct(m, self._coeffs, u_edge)
        # uz/um: (nCells, nz); sample the particle layer
        cand = jnp.concatenate([ps.cell[:, None], m.cellsOnCell[ps.cell]],
                               axis=1)
        dx = m.xCell[cand] - ps.x[:, None]
        dy = m.yCell[cand] - ps.y[:, None]
        if m.x_period > 0:
            dx = (dx + 0.5 * m.x_period) % m.x_period - 0.5 * m.x_period
        if m.y_period > 0:
            dy = (dy + 0.5 * m.y_period) % m.y_period - 0.5 * m.y_period
        valid = jnp.concatenate(
            [jnp.ones_like(ps.cell[:, None], dtype=bool),
             m.edgeSignOnCell[ps.cell] != 0], axis=1)
        w = jnp.where(valid, 1.0 / jnp.sqrt(dx * dx + dy * dy + 1.0), 0.0)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        uzc = uz[cand, ps.layer[:, None]]
        umc = um[cand, ps.layer[:, None]]
        return jnp.sum(w * uzc, axis=1), jnp.sum(w * umc, axis=1)

    def step(self, u_edge, dt) -> ParticleState:
        """RK2 (midpoint) advection; returns and stores the new state."""
        m = self.mesh
        ps = self.state
        u1, v1 = self._velocity_at(u_edge, ps)
        mid = ps.replace(x=_wrap(ps.x + 0.5 * dt * u1, m.x_period),
                         y=_wrap(ps.y + 0.5 * dt * v1, m.y_period))
        mid = mid.replace(cell=_walk(m, mid.x, mid.y, mid.cell))
        u2, v2 = self._velocity_at(u_edge, mid)
        x = _wrap(ps.x + dt * u2, m.x_period)
        y = _wrap(ps.y + dt * v2, m.y_period)
        cell = _walk(m, x, y, ps.cell)
        self.state = ParticleState(x=x, y=y, cell=cell, layer=ps.layer)
        return self.state

    def sample(self, field_cell):
        """Sample a cell field at the particle (containing-cell value,
        ref: LIGHT sampling)."""
        return field_cell[self.state.cell]
