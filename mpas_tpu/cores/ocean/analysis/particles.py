"""Lagrangian particle tracking (LIGHT equivalent).

ref: src/core_ocean/analysis_members/
mpas_ocn_lagrangian_particle_tracking.F:1-2808 (+ _interpolations.F,
_reset.F) — LIGHT (Wolfram et al. 2015): particles carried by the
resolved flow with per-particle cell relocation by local walking, RK2
time stepping, a vertical treatment per particle
(indexLevel / fixedZLevel / isopycnal / passiveFloat buoyancy surface),
and sampling of fields along trajectories.

TPU redesign — fully vectorized over particles, no per-particle control
flow:
- horizontal position: planar (x, y) with periodic wrap, or spherical
  3-D Cartesian on the mesh radius with tangent-plane stepping
- relocation: fixed-iteration nearest-center walk over cellsOnCell.
  On a centroidal Voronoi mesh the Voronoi criterion (nearest center)
  IS point-in-polygon, so the walk is the reference's polygon walk
  (ref :1580-1700 particle horizontal search) with the cross-edge test
  replaced by its Voronoi equivalent; iterations bound the walk length
  per step (particles obey the advective CFL the dycore enforces)
- velocity at the particle: inverse-distance weighting of the
  reconstructed cell-center velocities over the containing cell + its
  neighbors (ref's Wachspress-coordinate interpolation degenerates to
  this on near-uniform polygons; documented compression)
- vertical treatments (ref :900-1100 vertical interpolation modes):
  "indexLevel"   — sample a fixed layer index
  "fixedZLevel"  — hold a prescribed depth; the sampled layer follows
                   the evolving layerThickness column
  "passiveFloat" — advect depth with the diagnosed vertical velocity
  "isopycnal"    — relocate to the layer whose potential density
                   matches the particle's target density
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mpas_tpu.ops.reconstruct import build_reconstruct_coeffs, reconstruct


@struct.dataclass
class ParticleState:
    x: Any          # (nP,) planar x or 3-D cartesian X on the sphere
    y: Any          # (nP,)
    z3: Any         # (nP,) sphere: 3rd cartesian component (0 planar)
    cell: Any       # (nP,) int32 containing (nearest-center) cell
    layer: Any      # (nP,) int32 vertical layer sampled
    depth: Any      # (nP,) meters below surface (fixedZ/passive modes)
    target_rho: Any  # (nP,) isopycnal target density (0 if unused)


def _wrap(x, period):
    return jnp.where(period > 0.0, jnp.mod(x, period), x)


def _deltas(mesh, cand, x, y, z3):
    """Per-candidate displacement vectors (periodic/spherical aware)."""
    if mesh.on_sphere:
        dx = mesh.xCell[cand] - x[:, None]
        dy = mesh.yCell[cand] - y[:, None]
        dz = mesh.zCell[cand] - z3[:, None]
        return dx, dy, dz
    dx = mesh.xCell[cand] - x[:, None]
    dy = mesh.yCell[cand] - y[:, None]
    if mesh.x_period > 0:
        dx = (dx + 0.5 * mesh.x_period) % mesh.x_period \
            - 0.5 * mesh.x_period
    if mesh.y_period > 0:
        dy = (dy + 0.5 * mesh.y_period) % mesh.y_period \
            - 0.5 * mesh.y_period
    return dx, dy, jnp.zeros_like(dx)


def _walk(mesh, x, y, z3, cell, n_iter=2):
    """Fixed-iteration nearest-center (Voronoi polygon) walk."""
    for _ in range(n_iter):
        cand = jnp.concatenate([cell[:, None], mesh.cellsOnCell[cell]],
                               axis=1)                      # (nP, 1+mE)
        dx, dy, dz = _deltas(mesh, cand, x, y, z3)
        d2 = dx * dx + dy * dy + dz * dz
        valid = jnp.concatenate(
            [jnp.ones_like(cell[:, None], dtype=bool),
             mesh.edgeSignOnCell[cell] != 0], axis=1)
        d2 = jnp.where(valid, d2, jnp.inf)
        best = jnp.argmin(d2, axis=1)
        cell = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
    return cell


def _layer_from_depth(h_col, depth):
    """Layer index containing `depth` in a thickness column (nP, nz)."""
    zbot = jnp.cumsum(h_col, axis=1)
    k = jnp.sum((depth[:, None] > zbot).astype(jnp.int32), axis=1)
    return jnp.clip(k, 0, h_col.shape[1] - 1)


class ParticleTracker:
    """ref lifecycle: particle init / integrate (RK2) / sample.

    vertical_mode: 'indexLevel' | 'fixedZLevel' | 'passiveFloat' |
    'isopycnal' (ref config_AM_lagrPartTrack_vertical_treatment)."""

    def __init__(self, mesh, x0, y0, layer=0, z0=None, depth=None,
                 vertical_mode="indexLevel", target_rho=None):
        self.mesh = mesh
        self.vertical_mode = vertical_mode
        self._coeffs = jnp.asarray(build_reconstruct_coeffs(mesh))
        nP = len(x0)
        if mesh.on_sphere and z0 is None:
            raise ValueError("sphere particles need z0 (3-D cartesian)")
        z3 = jnp.zeros(nP) if z0 is None else jnp.asarray(z0)
        cell0 = _walk(mesh, jnp.asarray(x0), jnp.asarray(y0), z3,
                      jnp.zeros(nP, dtype=jnp.int32), n_iter=60)
        self.state = ParticleState(
            x=jnp.asarray(x0), y=jnp.asarray(y0), z3=z3, cell=cell0,
            layer=jnp.full(nP, layer, dtype=jnp.int32),
            depth=(jnp.zeros(nP) if depth is None
                   else jnp.asarray(depth)),
            target_rho=(jnp.zeros(nP) if target_rho is None
                        else jnp.asarray(target_rho)))

    # -- interpolation -----------------------------------------------------
    def _idw(self, ps: ParticleState):
        m = self.mesh
        cand = jnp.concatenate([ps.cell[:, None], m.cellsOnCell[ps.cell]],
                               axis=1)
        dx, dy, dz = _deltas(m, cand, ps.x, ps.y, ps.z3)
        valid = jnp.concatenate(
            [jnp.ones_like(ps.cell[:, None], dtype=bool),
             m.edgeSignOnCell[ps.cell] != 0], axis=1)
        w = jnp.where(valid,
                      1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz + 1.0),
                      0.0)
        return cand, w / jnp.sum(w, axis=1, keepdims=True)

    def _velocity_at(self, u_edge, ps: ParticleState):
        """IDW cell-center (zonal, meridional) velocity at the particle
        layer."""
        m = self.mesh
        _, _, _, uz, um = reconstruct(m, self._coeffs, u_edge)
        cand, w = self._idw(ps)
        uzc = uz[cand, ps.layer[:, None]]
        umc = um[cand, ps.layer[:, None]]
        return jnp.sum(w * uzc, axis=1), jnp.sum(w * umc, axis=1)

    def _advance(self, ps: ParticleState, u, v, dt):
        m = self.mesh
        if not m.on_sphere:
            return ps.replace(x=_wrap(ps.x + dt * u, m.x_period),
                              y=_wrap(ps.y + dt * v, m.y_period))
        # tangent-plane step: local east/north unit vectors at the
        # particle (east = z_hat x p_hat normalized, north = p_hat x east)
        r = jnp.sqrt(ps.x ** 2 + ps.y ** 2 + ps.z3 ** 2)
        px, py, pz = ps.x / r, ps.y / r, ps.z3 / r
        en = jnp.sqrt(px * px + py * py) + 1e-30
        ex, ey = -py / en, px / en
        nx = -pz * ey
        ny = pz * ex
        nz_ = px * ey - py * ex
        vx = u * ex + v * nx
        vy = u * ey + v * ny
        vz = v * nz_
        X = ps.x + dt * vx
        Y = ps.y + dt * vy
        Z = ps.z3 + dt * vz
        s = r / jnp.sqrt(X * X + Y * Y + Z * Z)
        return ps.replace(x=X * s, y=Y * s, z3=Z * s)

    # -- vertical treatments ----------------------------------------------
    def _update_layer(self, ps: ParticleState, layer_thickness=None,
                      w_vert=None, density=None, dt=0.0):
        mode = self.vertical_mode
        if mode == "indexLevel" or layer_thickness is None:
            return ps
        h_col = layer_thickness[ps.cell]                 # (nP, nz)
        if mode == "fixedZLevel":
            return ps.replace(layer=_layer_from_depth(h_col, ps.depth))
        if mode == "passiveFloat":
            depth = ps.depth
            if w_vert is not None:
                wcol = w_vert[ps.cell]                   # (nP, nz+1)
                wk = jnp.take_along_axis(
                    wcol, ps.layer[:, None], axis=1)[:, 0]
                depth = jnp.clip(depth - dt * wk, 0.0,
                                 jnp.sum(h_col, axis=1))
            return ps.replace(depth=depth,
                              layer=_layer_from_depth(h_col, depth))
        if mode == "isopycnal":
            rho_col = density[ps.cell]                   # (nP, nz)
            k = jnp.argmin(jnp.abs(rho_col
                                   - ps.target_rho[:, None]), axis=1)
            zbot = jnp.cumsum(h_col, axis=1)
            ztop = zbot - h_col
            zmid = 0.5 * (ztop + zbot)
            d = jnp.take_along_axis(zmid, k[:, None], axis=1)[:, 0]
            return ps.replace(layer=k.astype(jnp.int32), depth=d)
        raise ValueError(f"unknown vertical mode {mode!r}")

    # -- integration -------------------------------------------------------
    def step(self, u_edge, dt, layer_thickness=None, w_vert=None,
             density=None) -> ParticleState:
        """RK2 (midpoint) advection; returns and stores the new state."""
        m = self.mesh
        ps = self.state
        u1, v1 = self._velocity_at(u_edge, ps)
        mid = self._advance(ps, u1, v1, 0.5 * dt)
        mid = mid.replace(cell=_walk(m, mid.x, mid.y, mid.z3, mid.cell))
        u2, v2 = self._velocity_at(u_edge, mid)
        new = self._advance(ps, u2, v2, dt)
        new = new.replace(cell=_walk(m, new.x, new.y, new.z3, new.cell))
        new = self._update_layer(new, layer_thickness=layer_thickness,
                                 w_vert=w_vert, density=density, dt=dt)
        self.state = new
        return new

    # -- sampling ----------------------------------------------------------
    def sample(self, field_cell):
        """Sample a per-cell field at the particle: containing-cell value
        for (nCells,) fields, particle-layer value for (nCells, nz)
        (ref: LIGHT sampling along trajectories)."""
        f = jnp.asarray(field_cell)
        if f.ndim == 1:
            return f[self.state.cell]
        return jnp.take_along_axis(
            f[self.state.cell], self.state.layer[:, None], axis=1)[:, 0]

    def sample_interp(self, field_cell):
        """IDW-interpolated sample (trajectory-smooth variant)."""
        cand, w = self._idw(self.state)
        f = jnp.asarray(field_cell)
        if f.ndim == 1:
            return jnp.sum(w * f[cand], axis=1)
        fl = jnp.take_along_axis(
            f[cand], self.state.layer[:, None, None].repeat(
                cand.shape[1], 1), axis=2)[..., 0]
        return jnp.sum(w * fl, axis=1)
