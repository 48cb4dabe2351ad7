"""Layered hydrostatic ocean core (forward mode).

TPU-native re-design of the MPAS-Ocean forward-mode essentials (ref:
src/core_ocean/mode_forward + shared/):
  thickness tendency  <- ocn_tend_thick (mpas_ocn_tendency.F:107):
                         horizontal flux divergence + z-star ALE transport
  velocity tendency   <- ocn_tend_vel (:204): TRiSK q-term (Ringler 2010),
                         KE gradient, hydrostatic pressure gradient + SSH
                         tilt, vertical advection, del2 mixing, Rayleigh drag
  tracer tendency     <- ocn_tend_tracer (:363): flux-form advection +
                         del2 mixing, monotone-safe 2nd order
  equation of state   <- ocn_equation_of_state_linear
  vertical mixing     <- ocn_vmix implicit solve (mpas_ocn_vmix.F), constant
                         coefficients, via the batched Thomas solver
  RK4 integrator      <- mpas_ocn_time_integration_rk4.F:74
(The split-explicit barotropic/baroclinic integrator of
mpas_ocn_time_integration_split.F is the next milestone; this core carries
the same state and tendency structure it needs.)

Layout: layer k=0 is the surface; u (nEdges, nz), layerThickness
(nCells, nz), tracers (nCells, nz, nT). Vertical transport w_top lives on
interfaces (nCells, nz+1), positive upward, w_top[:, nz] = 0 at the bottom.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mpas_tpu.constants import gravity
from mpas_tpu.mesh.mesh import Mesh
from mpas_tpu.ops import stencils as st
from mpas_tpu.ops.matrix import tridiagonal_solve


@dataclasses.dataclass(frozen=True)
class OcnConfig:
    """ref: src/core_ocean/Registry.xml namelist (subset)."""
    config_dt: float = 300.0
    config_eos_linear_alpha: float = 0.2
    config_eos_linear_beta: float = 0.8
    config_eos_linear_Tref: float = 5.0
    config_eos_linear_Sref: float = 35.0
    config_eos_linear_densityref: float = 1000.0
    config_density0: float = 1026.0
    config_mom_del2: float = 10.0
    config_tracer_del2: float = 10.0
    config_vert_visc: float = 1.0e-4
    config_vert_diff: float = 1.0e-5
    config_bottom_drag_coeff: float = 1.0e-3
    config_apvm_upwinding: float = 0.5
    config_rayleigh_friction: float = 0.0
    config_calendar_type: str = "gregorian_noleap"
    config_start_time: str = "0000-01-01_00:00:00"
    config_run_duration: str = "none"
    config_stop_time: str = "none"
    config_do_restart: bool = False


@struct.dataclass
class OcnState:
    u: Any               # (nEdges, nz) normal velocity
    layerThickness: Any  # (nCells, nz)
    tracers: Any         # (nCells, nz, nT) uncoupled


@struct.dataclass
class OcnGrid:
    mesh: Mesh
    restingThickness: Any   # (nCells, nz)
    bottomDepth: Any        # (nCells,)
    maxLevelCell: Any       # (nCells,) int (full columns here)
    nz: int = struct.field(pytree_node=False)


def equation_of_state_linear(cfg: OcnConfig, T, S):
    """ref: mpas_ocn_equation_of_state_linear.F."""
    return (cfg.config_eos_linear_densityref
            - cfg.config_eos_linear_alpha * (T - cfg.config_eos_linear_Tref)
            + cfg.config_eos_linear_beta * (S - cfg.config_eos_linear_Sref))


def _ale_thickness_tend(grid: OcnGrid, div_hu):
    """z-star ALE: project the column-integrated divergence onto layers by
    resting-thickness weights, return (tend_h, w_top).
    ref: ocn_ale_thickness (mpas_ocn_thick_ale.F) + vertical transport."""
    total_div = jnp.sum(div_hu, axis=-1, keepdims=True)
    wgt = grid.restingThickness \
        / jnp.sum(grid.restingThickness, axis=-1, keepdims=True)
    tend_h = -wgt * total_div
    # continuity per layer: dh/dt = -div_hu - (w_top[k] - w_top[k+1])
    # solve upward from the bottom (w_top[:, nz] = 0)
    resid = -div_hu - tend_h            # = w_top[k] - w_top[k+1]
    w_rev = jnp.cumsum(resid[..., ::-1], axis=-1)[..., ::-1]
    w_top = jnp.concatenate([w_rev, jnp.zeros_like(w_rev[..., :1])], axis=-1)
    return tend_h, w_top


def tendencies(grid: OcnGrid, cfg: OcnConfig, state: OcnState, dt):
    """(tend_u, tend_h, tend_hT) — one evaluation of all terms."""
    mesh = grid.mesh
    nz = grid.nz
    u, h, tr = state.u, state.layerThickness, state.tracers
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    not_bnd = (1.0 - mesh.boundaryEdge)[:, None]

    h_edge = 0.5 * (h[c1] + h[c2])
    uh = u * h_edge

    # --- thickness + ALE vertical transport --------------------------------
    div_hu = jnp.sum(mesh.divW[..., None] * uh[mesh.edgesOnCell], axis=1) \
        * mesh.invAreaCell[:, None]
    tend_h, w_top = _ale_thickness_tend(grid, div_hu)

    # --- diagnostics --------------------------------------------------------
    ke = jnp.sum(mesh.keW[..., None] * (u * u)[mesh.edgesOnCell], axis=1) \
        * mesh.invAreaCell[:, None]
    vorticity = jnp.sum(mesh.curlW[..., None] * u[mesh.edgesOnVertex],
                        axis=1) * mesh.invAreaTriangle[:, None]
    h_vertex = jnp.sum(mesh.kiteAreasOnVertex[..., None]
                       * h[mesh.cellsOnVertex], axis=1) \
        * mesh.invAreaTriangle[:, None]
    pv_vertex = (mesh.fVertex[:, None] + vorticity) / h_vertex
    v1, v2 = mesh.verticesOnEdge[:, 0], mesh.verticesOnEdge[:, 1]
    pv_edge = 0.5 * (pv_vertex[v1] + pv_vertex[v2])
    vt = jnp.sum(mesh.weightsOnEdge[..., None] * u[mesh.edgesOnEdge], axis=1)
    gradPVt = (pv_vertex[v2] - pv_vertex[v1]) * mesh.invDvEdge[:, None]
    pv_edge = pv_edge - cfg.config_apvm_upwinding * vt * dt * gradPVt

    # --- pressure (hydrostatic, linear EOS) --------------------------------
    rho = equation_of_state_linear(cfg, tr[..., 0], tr[..., 1])
    # pressure at layer mid: p[0] = g rho0 h0/2; p[k] = p[k-1]
    #   + g (rho[k-1] h[k-1] + rho[k] h[k]) / 2
    gh = gravity * rho * h
    inc = 0.5 * (gh[:, :-1] + gh[:, 1:])
    p = jnp.cumsum(jnp.concatenate([0.5 * gh[:, :1], inc], axis=1), axis=1)
    # z_mid from SSH downward
    ssh = jnp.sum(h, axis=-1) - grid.bottomDepth
    depth_above = jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1), axis=1)
    z_mid = ssh[:, None] - depth_above - 0.5 * h

    # --- velocity tendency --------------------------------------------------
    eoe = mesh.edgesOnEdge
    workpv = 0.5 * (pv_edge[:, None, :] + pv_edge[eoe])
    q = jnp.sum(mesh.weightsOnEdge[..., None] * uh[eoe] * workpv, axis=1)

    grad = lambda f: (f[c2] - f[c1]) * mesh.invDcEdge[:, None] * not_bnd
    rho_edge = 0.5 * (rho[c1] + rho[c2])
    tend_u = q - grad(ke) \
        - (grad(p) + rho_edge * gravity * grad(z_mid)) / cfg.config_density0

    # vertical advection of u (flux form minus u*divergence)
    w_edge = 0.5 * (w_top[c1] + w_top[c2])              # (nE, nz+1)
    u_int = jnp.concatenate(
        [jnp.zeros_like(u[:, :1]), 0.5 * (u[:, 1:] + u[:, :-1]),
         jnp.zeros_like(u[:, :1])], axis=1)
    flux_u = w_edge * u_int
    dw = w_edge[:, :-1] - w_edge[:, 1:]
    tend_u = tend_u - (flux_u[:, :-1] - flux_u[:, 1:] - u * dw) / h_edge

    # del2 mixing (ref: ocn_vel_hmix_del2)
    if cfg.config_mom_del2 > 0.0:
        divg = jnp.sum(mesh.divW[..., None] * u[mesh.edgesOnCell], axis=1) \
            * mesh.invAreaCell[:, None]
        tend_u = tend_u + cfg.config_mom_del2 * (
            grad(divg) - (vorticity[v2] - vorticity[v1])
            * mesh.invDvEdge[:, None])
    if cfg.config_rayleigh_friction > 0.0:
        tend_u = tend_u - cfg.config_rayleigh_friction * u
    tend_u = tend_u * not_bnd

    # --- tracer tendency (flux form, 2nd order) ----------------------------
    tr_edge = 0.5 * (tr[c1] + tr[c2])
    fl = uh[..., None] * tr_edge
    tend_hT = -jnp.sum(mesh.edgeSignOnCell[..., None, None]
                       * (mesh.dvEdge[:, None, None] * fl)[mesh.edgesOnCell],
                       axis=1) * mesh.invAreaCell[:, None, None]
    tr_int = jnp.concatenate(
        [jnp.zeros_like(tr[:, :1]), 0.5 * (tr[:, 1:] + tr[:, :-1]),
         jnp.zeros_like(tr[:, :1])], axis=1)
    fv = w_top[..., None] * tr_int
    tend_hT = tend_hT - (fv[:, :-1] - fv[:, 1:])
    if cfg.config_tracer_del2 > 0.0:
        gt = (tr[c2] - tr[c1]) * (mesh.invDcEdge * not_bnd[:, 0])[:, None,
                                                                 None]
        hflux = h_edge[..., None] * gt
        tend_hT = tend_hT + cfg.config_tracer_del2 * jnp.sum(
            mesh.edgeSignOnCell[..., None, None]
            * (mesh.dvEdge[:, None, None] * hflux)[mesh.edgesOnCell],
            axis=1) * mesh.invAreaCell[:, None, None]
    return tend_u, tend_h, tend_hT


def implicit_vertical_mix(grid: OcnGrid, cfg: OcnConfig, state: OcnState, dt):
    """Backward-Euler vertical mixing of u and tracers
    (ref: ocn_vmix implicit solves, mpas_ocn_vmix.F)."""
    mesh = grid.mesh
    nz = grid.nz
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]

    def solve(field, h_field, kappa, bottom_drag=0.0):
        # interface diffusivity flux: kappa/dz_int between layers
        hi = 0.5 * (h_field[..., 1:] + h_field[..., :-1])
        g = dt * kappa / hi
        zero = jnp.zeros_like(h_field[..., :1])
        gu = jnp.concatenate([zero, g], axis=-1)       # above-interface coef
        gl = jnp.concatenate([g, zero], axis=-1)       # below-interface coef
        a = -gu / h_field
        c = -gl / h_field
        b = 1.0 - a - c
        if bottom_drag > 0.0:
            # quadratic bottom drag, linearized (ref: ocn_vel_forcing_bottomdrag)
            spd = jnp.abs(field[..., -1])
            b = b.at[..., -1].add(dt * bottom_drag * spd / h_field[..., -1])
        return tridiagonal_solve(a, b, c, field)

    h_edge = 0.5 * (state.layerThickness[c1] + state.layerThickness[c2])
    u_new = solve(state.u, h_edge, cfg.config_vert_visc,
                  cfg.config_bottom_drag_coeff)
    tr_new = jnp.stack(
        [solve(state.tracers[..., i], state.layerThickness,
               cfg.config_vert_diff) for i in range(state.tracers.shape[-1])],
        axis=-1)
    return state.replace(u=u_new * (1.0 - mesh.boundaryEdge)[:, None],
                         tracers=tr_new)


_RK_W = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
_RK_S = (0.5, 0.5, 1.0, 0.0)


def rk4_step(grid: OcnGrid, cfg: OcnConfig, state: OcnState, dt) -> OcnState:
    """ref: mpas_ocn_time_integration_rk4.F:74 — same pool choreography as
    the SW core, with implicit vertical mixing applied after the RK update."""
    u0, h0 = state.u, state.layerThickness
    hT0 = state.tracers * h0[..., None]
    u_acc, h_acc, hT_acc = u0, h0, hT0
    provis = state
    for stage in range(4):
        tu, th, thT = tendencies(grid, cfg, provis, dt)
        u_acc = u_acc + dt * _RK_W[stage] * tu
        h_acc = h_acc + dt * _RK_W[stage] * th
        hT_acc = hT_acc + dt * _RK_W[stage] * thT
        if stage < 3:
            w = dt * _RK_S[stage]
            hp = h0 + w * th
            provis = OcnState(u=u0 + w * tu, layerThickness=hp,
                              tracers=(hT0 + w * thT) / hp[..., None])
    out = OcnState(u=u_acc, layerThickness=h_acc,
                   tracers=hT_acc / h_acc[..., None])
    return implicit_vertical_mix(grid, cfg, out, dt)


@functools.partial(jax.jit, static_argnums=(1, 3))
def run_steps(grid: OcnGrid, cfg: OcnConfig, state: OcnState,
              n_steps: int) -> OcnState:
    dt = jnp.asarray(cfg.config_dt, dtype=state.layerThickness.dtype)

    def body(s, _):
        return rk4_step(grid, cfg, s, dt), None

    final, _ = jax.lax.scan(body, state, None, length=n_steps)
    return final
