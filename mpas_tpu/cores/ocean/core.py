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
  split-explicit      <- mpas_ocn_time_integration_split.F:82-1926 —
                         baroclinic predictor iterations + scan-based
                         barotropic subcycling (split_step, below)

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
    # debug/validation mode: driver sweeps the state for
    # non-finite values after every chunk (ref: MPAS_DEBUG,
    # SURVEY §5.2)
    config_debug_checks: bool = False

    config_time_integrator: str = "split_explicit"   # or "RK4"
    # equation of state: "linear" | "jm" (ref: config_eos_type)
    config_eos_type: str = "linear"
    config_eos_linear_alpha: float = 0.2
    config_eos_linear_beta: float = 0.8
    config_eos_linear_Tref: float = 5.0
    config_eos_linear_Sref: float = 35.0
    config_eos_linear_densityref: float = 1000.0
    config_density0: float = 1026.0
    config_mom_del2: float = 10.0
    config_tracer_del2: float = 10.0
    # vertical mixing (ref: config_vert_mix_scheme and the coefficient
    # namelists of mpas_ocn_vmix_coefs_{const,rich,tanh}.F / cvmix)
    config_vert_mix_scheme: str = "const"   # const|rich|tanh|cvmix
    config_vert_visc: float = 1.0e-4
    config_vert_diff: float = 1.0e-5
    config_bkrd_vert_visc: float = 1.0e-4
    config_bkrd_vert_diff: float = 1.0e-5
    config_rich_mix: float = 5.0e-3
    config_convective_visc: float = 1.0
    config_convective_diff: float = 1.0
    config_max_visc_tanh: float = 2.5e-1
    config_min_visc_tanh: float = 1.0e-4
    config_max_diff_tanh: float = 2.5e-2
    config_min_diff_tanh: float = 1.0e-5
    config_tanh_zmid: float = -100.0
    config_tanh_zwidth: float = 100.0
    # CVMix interior schemes (ref: mpas_ocn_vmix_cvmix.F namelists
    # config_use_cvmix_shear / _tidal_mixing / _double_diffusion)
    config_use_cvmix_convection: bool = True
    config_use_cvmix_shear: bool = False
    config_cvmix_shear_mixing_scheme: str = "KPP"   # LMD94 | "PP"
    config_cvmix_shear_kpp_nu_zero: float = 5.0e-3
    config_cvmix_shear_kpp_Ri_zero: float = 0.7
    config_cvmix_shear_kpp_exp: float = 3.0
    config_cvmix_shear_pp_nu_zero: float = 5.0e-3
    config_use_cvmix_tidal_mixing: bool = False
    config_cvmix_tidal_mixing_q: float = 0.33
    config_cvmix_tidal_efficiency: float = 0.2
    config_cvmix_tidal_vertical_decay_scale: float = 500.0
    config_cvmix_tidal_energy_flux: float = 1.0e-3   # W/m2 column default
    config_cvmix_tidal_max: float = 0.05
    config_use_cvmix_double_diffusion: bool = False
    # GM / Redi mesoscale eddy parameterization (ref: mpas_ocn_gm.F +
    # tracer_hmix_Redi namelists)
    config_use_gm: bool = False
    config_gm_constant_kappa: float = 900.0     # m2/s
    config_use_redi: bool = False
    config_redi_kappa: float = 400.0            # m2/s
    config_max_relative_slope: float = 0.01
    config_bottom_drag_coeff: float = 1.0e-3
    config_apvm_upwinding: float = 0.0   # ref: config_apvm_scale_factor = 0
    config_rayleigh_friction: float = 0.0
    # auxiliary tracer groups (ref: mpas_ocn_tracer_ideal_age.F,
    # mpas_ocn_tracer_exponential_decay.F, mpas_ocn_frazil_forcing.F)
    config_use_ideal_age: bool = False
    config_ideal_age_index: int = 2
    config_use_exponential_decay: bool = False
    config_exp_decay_index: int = 2
    config_exp_decay_efolding: float = 30.0 * 86400.0
    config_use_frazil: bool = False
    # split-explicit barotropic mode (ref: Registry.xml:947-991)
    config_n_ts_iter: int = 2
    config_n_bcl_iter_beg: int = 1
    config_n_bcl_iter_mid: int = 2
    config_n_bcl_iter_end: int = 2
    config_btr_dt: float = 15.0          # ref: '0000_00:00:15'
    config_btr_subcycle_loop_factor: int = 2
    config_n_btr_cor_iter: int = 2
    config_btr_gam1_velWt1: float = 0.5
    config_btr_gam2_SSHWt1: float = 1.0
    config_btr_gam3_velWt2: float = 1.0
    config_vel_correction: bool = True
    # --- z-tilde ALE (ref: mpas_ocn_thick_ale.F + the freq-filtered
    # thickness prognostics of mpas_ocn_tendency.F:908) ---
    config_use_freq_filtered_thickness: bool = False
    config_thickness_filter_timescale: float = 5.0    # days
    config_use_highFreqThick_restore: bool = True
    config_highFreqThick_restore_time: float = 30.0   # days
    config_highFreqThick_del2: float = 0.0
    config_use_min_max_thickness: bool = False
    config_max_thickness_factor: float = 6.0
    config_min_thickness: float = 1.0
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
    # split-explicit barotropic mode velocity, persisted between steps
    # (ref: state normalBarotropicVelocity). None on the RK4 path.
    ubtr: Any = None     # (nEdges,)
    # z-tilde prognostics (ref: state lowFreqDivergence /
    # highFreqThickness, Registry.xml; None when z-star only)
    lowFreqDivergence: Any = None   # (nCells, nz)
    highFreqThickness: Any = None   # (nCells, nz)


@struct.dataclass
class OcnGrid:
    mesh: Mesh
    restingThickness: Any   # (nCells, nz)
    bottomDepth: Any        # (nCells,)
    maxLevelCell: Any       # (nCells,) int
    nz: int = struct.field(pytree_node=False)
    # variable-bathymetry level masks (None = full columns everywhere).
    # cellMask[c,k] = 1 for k < maxLevelCell[c]; edgeMask[e,k] = 1 for
    # k < maxLevelEdgeTop[e] = min(maxLevelCell of the two cells) — the
    # reference's maxLevelEdgeTop loop bounds (ref: ocn_init_routines /
    # the k-loop bounds throughout mpas_ocn_tendency.F). Dead levels carry
    # an epsilon thickness and are excluded from every flux.
    cellMask: Any = None    # (nCells, nz)
    edgeMask: Any = None    # (nEdges, nz)
    # surface pressure applied at the top of the pressure integral (ref:
    # the surfacePressure/landIcePressure term of ocn_diagnostics pressure,
    # mpas_ocn_diagnostics.F — land-ice cavities, sea-ice loading)
    surfacePressure: Any = None   # (nCells,)
    # column tidal energy flux (W/m2) for the CVMix tidal-mixing scheme
    # (ref: the tidalEnergyFlux input field of mpas_ocn_vmix_cvmix.F)
    tidalEnergyFlux: Any = None   # (nCells,)


def build_level_masks(mesh, maxLevelCell, nz, dtype=np.float64):
    """(cellMask, edgeMask) from maxLevelCell (host-side, numpy)."""
    mlc = np.asarray(maxLevelCell)
    k = np.arange(nz)
    cell_mask = (k[None, :] < mlc[:, None]).astype(dtype)
    coe = np.asarray(mesh.cellsOnEdge)
    mle = np.minimum(mlc[coe[:, 0]], mlc[coe[:, 1]])
    edge_mask = (k[None, :] < mle[:, None]).astype(dtype)
    return cell_mask, edge_mask


def equation_of_state_linear(cfg: OcnConfig, T, S):
    """ref: mpas_ocn_equation_of_state_linear.F."""
    return (cfg.config_eos_linear_densityref
            - cfg.config_eos_linear_alpha * (T - cfg.config_eos_linear_Tref)
            + cfg.config_eos_linear_beta * (S - cfg.config_eos_linear_Sref))


def equation_of_state(cfg: OcnConfig, T, S):
    """EOS dispatcher: linear or Jackett-McDougall (surface-referenced).
    ref: ocn_equation_of_state_density (mpas_ocn_equation_of_state.F)."""
    if cfg.config_eos_type == "jm":
        from mpas_tpu.cores.ocean.eos import density_jm
        return density_jm(T, S, 0.0)
    return equation_of_state_linear(cfg, T, S)


def _ale_thickness_tend(grid: OcnGrid, div_hu):
    """z-star ALE: project the column-integrated divergence onto layers by
    resting-thickness weights, return (tend_h, w_top).
    ref: ocn_ale_thickness (mpas_ocn_thick_ale.F) + vertical transport."""
    total_div = jnp.sum(div_hu, axis=-1, keepdims=True)
    resting = grid.restingThickness
    if grid.cellMask is not None:
        # dead levels get exactly zero weight, or column volume leaks
        # through their epsilon resting thickness
        resting = resting * grid.cellMask
    wgt = resting / jnp.sum(resting, axis=-1, keepdims=True)
    tend_h = -wgt * total_div
    # continuity per layer: dh/dt = -div_hu - (w_top[k] - w_top[k+1])
    # solve upward from the bottom (w_top[:, nz] = 0)
    resid = -div_hu - tend_h            # = w_top[k] - w_top[k+1]
    w_rev = jnp.cumsum(resid[..., ::-1], axis=-1)[..., ::-1]
    w_top = jnp.concatenate([w_rev, jnp.zeros_like(w_rev[..., :1])], axis=-1)
    return tend_h, w_top


def vel_tendency(grid: OcnGrid, cfg: OcnConfig, u, h, tr, w_top, dt,
                 planetary: bool = True):
    """Velocity tendency T(u, w, p) (ref: ocn_tend_vel,
    mpas_ocn_tendency.F:204).

    planetary=False drops the planetary-vorticity part of the q-term
    (ref: RK4On = 0 in ocn_vel_coriolis_tend for the split-explicit
    integrator, mpas_ocn_vel_coriolis.F — planetary Coriolis is then handled
    by fuperp iterations and the barotropic subcycle)."""
    mesh = grid.mesh
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    v1, v2 = mesh.verticesOnEdge[:, 0], mesh.verticesOnEdge[:, 1]
    not_bnd = (1.0 - mesh.boundaryEdge)[:, None]
    h_edge = 0.5 * (h[c1] + h[c2])
    uh = u * h_edge

    ke = jnp.sum(mesh.keW[..., None] * (u * u)[mesh.edgesOnCell], axis=1) \
        * mesh.invAreaCell[:, None]
    vorticity = jnp.sum(mesh.curlW[..., None] * u[mesh.edgesOnVertex],
                        axis=1) * mesh.invAreaTriangle[:, None]
    h_vertex = jnp.sum(mesh.kiteAreasOnVertex[..., None]
                       * h[mesh.cellsOnVertex], axis=1) \
        * mesh.invAreaTriangle[:, None]
    f_part = mesh.fVertex[:, None] if planetary else 0.0
    pv_vertex = (f_part + vorticity) / h_vertex
    pv_edge = 0.5 * (pv_vertex[v1] + pv_vertex[v2])
    if cfg.config_apvm_upwinding > 0.0:
        from mpas_tpu.ops.stencils import tangential_cell_assembled
        vt = tangential_cell_assembled(mesh, u)
        gradPVt = (pv_vertex[v2] - pv_vertex[v1]) * mesh.invDvEdge[:, None]
        pv_edge = pv_edge - cfg.config_apvm_upwinding * vt * dt * gradPVt

    # hydrostatic pressure at layer mid from the EOS
    rho = equation_of_state(cfg, tr[..., 0], tr[..., 1])
    gh = gravity * rho * h
    inc = 0.5 * (gh[:, :-1] + gh[:, 1:])
    p = jnp.cumsum(jnp.concatenate([0.5 * gh[:, :1], inc], axis=1), axis=1)
    if grid.surfacePressure is not None:
        p = p + grid.surfacePressure[:, None]
    ssh = jnp.sum(h, axis=-1) - grid.bottomDepth
    depth_above = jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1), axis=1)
    z_mid = ssh[:, None] - depth_above - 0.5 * h

    from mpas_tpu.ops.stencils import trisk_q_cell_assembled
    q = trisk_q_cell_assembled(mesh, uh, pv_edge)

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
    tend_u = tend_u - (flux_u[:, :-1] - flux_u[:, 1:] - u * dw) \
        / jnp.maximum(h_edge, 1e-12)

    # del2 mixing (ref: ocn_vel_hmix_del2)
    if cfg.config_mom_del2 > 0.0:
        divg = jnp.sum(mesh.divW[..., None] * u[mesh.edgesOnCell], axis=1) \
            * mesh.invAreaCell[:, None]
        tend_u = tend_u + cfg.config_mom_del2 * (
            grad(divg) - (vorticity[v2] - vorticity[v1])
            * mesh.invDvEdge[:, None])
    if cfg.config_rayleigh_friction > 0.0:
        tend_u = tend_u - cfg.config_rayleigh_friction * u
    if grid.edgeMask is not None:       # no tendency below the bathymetry
        not_bnd = not_bnd * grid.edgeMask
    return tend_u * not_bnd


def tracer_tendency(grid: OcnGrid, cfg: OcnConfig, uh, w_top, h, tr):
    """Thickness-weighted tracer tendency (ref: ocn_tend_tracer,
    mpas_ocn_tendency.F:363): flux-form advection + del2 mixing."""
    mesh = grid.mesh
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    not_bnd = 1.0 - mesh.boundaryEdge
    h_edge = 0.5 * (h[c1] + h[c2])

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
        gt = (tr[c2] - tr[c1]) * (mesh.invDcEdge * not_bnd)[:, None, None]
        if grid.edgeMask is not None:
            gt = gt * grid.edgeMask[..., None]
        hflux = h_edge[..., None] * gt
        tend_hT = tend_hT + cfg.config_tracer_del2 * jnp.sum(
            mesh.edgeSignOnCell[..., None, None]
            * (mesh.dvEdge[:, None, None] * hflux)[mesh.edgesOnCell],
            axis=1) * mesh.invAreaCell[:, None, None]
    return tend_hT


def thickness_tendency(grid: OcnGrid, uh):
    """(div_hu, tend_h, w_top) from edge thickness fluxes (ref:
    ocn_tend_thick + ocn_vert_transport_velocity_top)."""
    mesh = grid.mesh
    div_hu = jnp.sum(mesh.divW[..., None] * uh[mesh.edgesOnCell], axis=1) \
        * mesh.invAreaCell[:, None]
    tend_h, w_top = _ale_thickness_tend(grid, div_hu)
    return div_hu, tend_h, w_top


def tendencies(grid: OcnGrid, cfg: OcnConfig, state: OcnState, dt):
    """(tend_u, tend_h, tend_hT) — one evaluation of all terms (RK4 path)."""
    mesh = grid.mesh
    u, h, tr = state.u, state.layerThickness, state.tracers
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    h_edge = 0.5 * (h[c1] + h[c2])
    # GM: transport velocity = resolved + bolus (ref: ocn_gm — tracer and
    # thickness advection use normalVelocity + normalGMBolusVelocity)
    u_trans = u
    if cfg.config_use_gm:
        from mpas_tpu.cores.ocean.gm import bolus_velocity
        rho = equation_of_state(cfg, tr[..., 0], tr[..., 1])
        u_trans = u + bolus_velocity(grid, cfg, rho, h)
    uh = u_trans * h_edge
    if grid.edgeMask is not None:       # no flux through the bathymetry
        uh = uh * grid.edgeMask
    if cfg.config_use_freq_filtered_thickness \
            and state.highFreqThickness is not None:
        # z-tilde: high-frequency divergence inflates layers locally
        from mpas_tpu.cores.ocean.ztilde import (ale_tends_ztilde,
                                                 freq_filtered_tends)
        mesh_ = grid.mesh
        div_hu = jnp.sum(mesh_.divW[..., None] * uh[mesh_.edgesOnCell],
                         axis=1) * mesh_.invAreaCell[:, None]
        tend_lfd, tend_hhf = freq_filtered_tends(
            grid, cfg, div_hu, h, state.lowFreqDivergence,
            state.highFreqThickness)
        tend_h, w_top = ale_tends_ztilde(grid, div_hu, tend_hhf)
        tend_u = vel_tendency(grid, cfg, u, h, tr, w_top, dt,
                              planetary=True)
        tend_hT = tracer_tendency(grid, cfg, uh, w_top, h, tr)
        return tend_u, tend_h, tend_hT, tend_lfd, tend_hhf
    _, tend_h, w_top = thickness_tendency(grid, uh)
    tend_u = vel_tendency(grid, cfg, u, h, tr, w_top, dt, planetary=True)
    tend_hT = tracer_tendency(grid, cfg, uh, w_top, h, tr)
    return tend_u, tend_h, tend_hT


def implicit_vertical_mix(grid: OcnGrid, cfg: OcnConfig, state: OcnState,
                          dt, forcing=None):
    """Backward-Euler vertical mixing of u and tracers
    (ref: ocn_vmix implicit solves, mpas_ocn_vmix.F), with the interface
    coefficients built by the configured scheme (vmix.build_coefs). The
    KPP scheme additionally produces the non-local counter-gradient
    transport: an explicit flux N(sigma)*F_surf divergence added to the
    tracers (ref: vertNonLocalFlux / ocn_tracer_nonlocalflux_tend)."""
    from mpas_tpu.cores.ocean.vmix import build_coefs
    mesh = grid.mesh
    nz = grid.nz
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    rho = equation_of_state(cfg, state.tracers[..., 0], state.tracers[..., 1])
    vert_visc, vert_diff, nonlocal_c = build_coefs(
        grid, cfg, state.u, state.layerThickness, rho,
        forcing=forcing, tracers=state.tracers)
    if nonlocal_c is not None and forcing is not None:
        # explicit nonlocal tracer flux: F(z) = N(z) * F_surf; tendency =
        # -dF/dz per layer (temperature from the net heat flux)
        cp_sw = 3996.0
        f_surf_T = (forcing.sensibleHeatFlux + forcing.shortwaveFlux) \
            / (cfg.config_density0 * cp_sw)
        nzc = state.layerThickness.shape[-1]
        zero = jnp.zeros_like(nonlocal_c[:, :1])
        n_full = jnp.concatenate([zero, nonlocal_c, zero], axis=-1)
        dflux = (n_full[:, :-1] - n_full[:, 1:])   # + at top convergence
        tr = state.tracers.at[..., 0].add(
            dt * dflux * f_surf_T[:, None] / state.layerThickness)
        state = state.replace(tracers=tr)
    if cfg.config_use_redi:
        # Redi (3,3) term: kappa_Redi * S^2 enhances the vertical tracer
        # diffusivity (ref: mpas_ocn_tracer_hmix_Redi.F small-slope tensor)
        from mpas_tpu.cores.ocean.gm import redi_vertical_enhancement
        vert_diff = vert_diff + redi_vertical_enhancement(
            grid, cfg, rho, state.layerThickness)

    def solve(field, h_field, kappa, bottom_drag=0.0, mask=None):
        # interface diffusivity flux: kappa/dz_int between layers; dead
        # interfaces (below maxLevel) carry zero mixing so the bottom
        # boundary is a no-flux wall wherever the bathymetry sits
        hi = jnp.maximum(0.5 * (h_field[..., 1:] + h_field[..., :-1]),
                         1e-12)
        if mask is not None:
            kappa = kappa * mask[..., 1:]
        g = dt * kappa / hi
        zero = jnp.zeros_like(h_field[..., :1])
        gu = jnp.concatenate([zero, g], axis=-1)       # above-interface coef
        gl = jnp.concatenate([g, zero], axis=-1)       # below-interface coef
        h_safe = jnp.maximum(h_field, 1e-12)
        a = -gu / h_safe
        c = -gl / h_safe
        b = 1.0 - a - c
        if bottom_drag > 0.0:
            # quadratic bottom drag, linearized (ref:
            # ocn_vel_forcing_bottomdrag) at the TRUE bottom layer: the
            # last live level of each column, not index nz-1
            if mask is None:
                spd = jnp.abs(field[..., -1])
                b = b.at[..., -1].add(dt * bottom_drag * spd
                                      / h_safe[..., -1])
            else:
                below = jnp.concatenate([mask[..., 1:], zero], axis=-1)
                bottom = mask * (1.0 - below)          # one-hot bottom level
                spd_b = jnp.sum(jnp.abs(field) * bottom, axis=-1,
                                keepdims=True)
                b = b + bottom * dt * bottom_drag * spd_b / h_safe
        return tridiagonal_solve(a, b, c, field)

    h_edge = 0.5 * (state.layerThickness[c1] + state.layerThickness[c2])
    u_new = solve(state.u, h_edge, vert_visc,
                  cfg.config_bottom_drag_coeff, mask=grid.edgeMask)
    tr_new = jnp.stack(
        [solve(state.tracers[..., i], state.layerThickness,
               vert_diff, mask=grid.cellMask)
         for i in range(state.tracers.shape[-1])],
        axis=-1)
    return state.replace(u=u_new * (1.0 - mesh.boundaryEdge)[:, None],
                         tracers=tr_new)


_RK_W = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
_RK_S = (0.5, 0.5, 1.0, 0.0)


def rk4_step(grid: OcnGrid, cfg: OcnConfig, state: OcnState, dt,
             forcing=None, xch=None) -> OcnState:
    """ref: mpas_ocn_time_integration_rk4.F:74 — same pool choreography as
    the SW core, with implicit vertical mixing applied after the RK update.
    xch: per-stage provisional-prognostic halo refresh (the sharded SW-core
    strategy: exchange prognostics, recompute diagnostics in the halo)."""
    ce = (lambda x, depth=None: x) if xch is None else xch.cell
    ee = (lambda x, depth=None: x) if xch is None else xch.edge
    use_zt = cfg.config_use_freq_filtered_thickness \
        and state.highFreqThickness is not None
    u0, h0 = state.u, state.layerThickness
    hT0 = state.tracers * h0[..., None]
    u_acc, h_acc, hT_acc = u0, h0, hT0
    lfd0 = hhf0 = lfd_acc = hhf_acc = None
    if use_zt:
        lfd0, hhf0 = state.lowFreqDivergence, state.highFreqThickness
        lfd_acc, hhf_acc = lfd0, hhf0
    provis = state
    for stage in range(4):
        tends = tendencies(grid, cfg, provis, dt)
        tu, th, thT = tends[:3]
        u_acc = u_acc + dt * _RK_W[stage] * tu
        h_acc = h_acc + dt * _RK_W[stage] * th
        hT_acc = hT_acc + dt * _RK_W[stage] * thT
        if use_zt:
            lfd_acc = lfd_acc + dt * _RK_W[stage] * tends[3]
            hhf_acc = hhf_acc + dt * _RK_W[stage] * tends[4]
        if stage < 3:
            w = dt * _RK_S[stage]
            hp = h0 + w * th
            hp_safe = jnp.where(hp == 0.0, 1.0, hp)
            provis = OcnState(
                u=ee(u0 + w * tu), layerThickness=ce(hp),
                tracers=ce((hT0 + w * thT) / hp_safe[..., None]),
                lowFreqDivergence=ce(lfd0 + w * tends[3]) if use_zt
                else None,
                highFreqThickness=ce(hhf0 + w * tends[4]) if use_zt
                else None)
    if cfg.config_use_min_max_thickness:
        # conservative per-column clamping of the ALE target thickness
        # (ref: mpas_ocn_thick_ale.F:186-214); tracer MASS rides along
        from mpas_tpu.cores.ocean.ztilde import min_max_thickness_filter
        h_acc = min_max_thickness_filter(grid, cfg, h_acc)
    out = OcnState(u=u_acc, layerThickness=h_acc,
                   tracers=hT_acc
                   / jnp.where(h_acc == 0.0, 1.0, h_acc)[..., None],
                   ubtr=state.ubtr,
                   lowFreqDivergence=lfd_acc, highFreqThickness=hhf_acc)
    return implicit_vertical_mix(grid, cfg, out, dt, forcing)


def _fperp(mesh: Mesh, v, f_at_edges):
    """Sum_j w_j * f(eoe) * v(eoe): the +f v_perp tangential reconstruction
    (ref: ocn_fuperp, mpas_ocn_diagnostics.F:1062; also the CoriolisTerm of
    the barotropic subcycle, mpas_ocn_time_integration_split.F:820-828)."""
    from mpas_tpu.ops.stencils import tangential_cell_assembled
    if v.ndim == 1:
        return tangential_cell_assembled(mesh, v * f_at_edges)
    return tangential_cell_assembled(mesh, v * f_at_edges[:, None])


def split_step(grid: OcnGrid, cfg: OcnConfig, state: OcnState,
               dt, forcing=None, xch=None) -> OcnState:
    """Split-explicit barotropic/baroclinic timestep (ref:
    ocn_time_integrator_split, mpas_ocn_time_integration_split.F:82-1926;
    Higdon 2005 scheme as implemented in MPAS-Ocean v7).

    Per outer iteration (config_n_ts_iter, midpoint predictor-corrector):
      stage 1  baroclinic prediction: n_bcl_iter fixed-point iterations on
               the linear Coriolis term; the thickness-weighted vertical
               mean is removed and becomes the barotropic forcing G (:525-618)
      stage 2  barotropic subcycling over loop_factor*dt with
               forward-backward SSH solve, velocity corrector iterations and
               flux averaging (:632-1120); velocity correction (:1282-1345)
      stage 3  thickness/tracer update with the time-averaged transport
               velocity; midpoint state on non-final passes (:1390-1740)
    followed by implicit vertical mixing.

    xch: optional exchange hooks (ocean/distributed._ShardExchange) fired at
    the reference's halo-exchange points: ubcl per bcl iteration, the
    'subcycleFields' ssh+ubtr pair depth-restricted inside the barotropic
    scan body (ref exchange-group reuse,
    mpas_ocn_time_integration_split.F:771), the 'finalBtrFields' group after
    subcycling (:1282-1290), and the stage-3 prognostics per outer pass.
    None = single-device no-op.
    """
    ce = (lambda x, depth=None: x) if xch is None else xch.cell
    ee = (lambda x, depth=None: x) if xch is None else xch.edge
    mesh = grid.mesh
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    not_bnd = 1.0 - mesh.boundaryEdge
    g = gravity
    f_edge = mesh.fEdge

    u_cur, h_cur, tr_cur = state.u, state.layerThickness, state.tracers
    ubtr_cur = state.ubtr * not_bnd
    ubcl_cur = (u_cur - ubtr_cur[:, None]) * not_bnd[:, None]
    ssh_cur = jnp.sum(h_cur, axis=-1) - grid.bottomDepth

    n_ts = cfg.config_n_ts_iter
    n_bcl = [cfg.config_n_bcl_iter_mid] * n_ts
    n_bcl[0] = cfg.config_n_bcl_iter_beg
    n_bcl[-1] = cfg.config_n_bcl_iter_end
    n_btr = max(1, int(round(float(cfg.config_dt) / cfg.config_btr_dt)))
    n_loop = n_btr * cfg.config_btr_subcycle_loop_factor
    gam1 = cfg.config_btr_gam1_velWt1
    gam2 = cfg.config_btr_gam2_SSHWt1
    gam3 = cfg.config_btr_gam3_velWt2

    _grad_e = lambda fld: (fld[c2] - fld[c1]) * mesh.invDcEdge * not_bnd
    if grid.surfacePressure is not None:
        # under land ice the barotropic gradient acts on the pressure-
        # adjusted SSH (ref: the landIcePressure contribution to the
        # barotropic forcing in ocn_diagnostics / the split integrator):
        # grad(ssh_eff) with ssh_eff = ssh + p_surf/(g rho0)
        p_corr = grid.surfacePressure \
            / (g * cfg.config_eos_linear_densityref)
        grad_e = lambda fld: _grad_e(fld + p_corr)
    else:
        grad_e = _grad_e
    # barotropic column thickness at edges (ref :906-907): sshEdge + min of
    # the neighboring resting depths
    min_depth = jnp.minimum(grid.bottomDepth[c1], grid.bottomDepth[c2])

    def btr_div(flux):
        return jnp.sum(mesh.divW * flux[mesh.edgesOnCell], axis=1) \
            * mesh.invAreaCell

    # working level-2 state
    h_new, tr_new, ubcl_new, ssh_new = h_cur, tr_cur, ubcl_cur, ssh_cur
    w_for_tend = jnp.zeros((mesh.nCells, grid.nz + 1), h_cur.dtype)
    ubtr_avg = ubtr_cur
    for outer in range(n_ts):
        # --- stage 1: baroclinic prediction --------------------------------
        if outer == 0:
            u_st, h_st, tr_st = u_cur, h_cur, tr_cur
        else:
            u_st, h_st, tr_st = u_new, h_new, tr_new
        h_edge = 0.5 * (h_st[c1] + h_st[c2])
        h_edge_sum = jnp.sum(h_edge, axis=-1)
        tend_u = vel_tendency(grid, cfg, u_st, h_st, tr_st, w_for_tend, dt,
                              planetary=False)
        h_edge_safe = jnp.where(h_edge_sum == 0.0, 1.0, h_edge_sum)
        for _ in range(n_bcl[outer]):
            fperp = _fperp(mesh, ubcl_new, f_edge)
            u_temp = ubcl_cur + dt * (tend_u + fperp
                                      + g * grad_e(ssh_new)[:, None])
            G = jnp.sum(h_edge * u_temp, axis=-1) / h_edge_safe / dt
            ubcl_new = 0.5 * (ubcl_cur + u_temp - dt * G[:, None]) \
                * not_bnd[:, None]
            # ref: normalBaroclinicVelocity exchanged per bcl iteration
            ubcl_new = ee(ubcl_new)
        G = ee(G)

        # --- stage 2: barotropic subcycling --------------------------------
        dtb = dt / n_btr

        def subcycle(carry, _):
            ssh_o, ubtr_o, ubtr_acc, flux_acc = carry
            # 'subcycleFields' exchange-group reuse, depth-restricted (ref
            # :771 — haloLayers 1:2 on ssh+ubtr; depth 2 restores the two
            # rings this body consumes)
            ssh_o = ce(ssh_o, depth=2)
            ubtr_o = ee(ubtr_o, depth=2)
            # velocity predictor (ref :820-838)
            cor = _fperp(mesh, ubtr_o, f_edge)
            ubtr_n = not_bnd * (ubtr_o + dtb * (cor - g * grad_e(ssh_o) + G))
            # SSH forward-backward solve + flux accumulation (ref :896-960)
            ssh_e = 0.5 * (ssh_o[c1] + ssh_o[c2])
            h_sum = ssh_e + min_depth
            flux = ((1.0 - gam1) * ubtr_o + gam1 * ubtr_n) * h_sum * not_bnd
            ssh_n = ssh_o - dtb * btr_div(flux)
            flux_acc = flux_acc + flux
            # velocity corrector iterations (ref :1020-1076)
            for _ in range(cfg.config_n_btr_cor_iter):
                cor = _fperp(mesh, ubtr_n, f_edge)
                ssh_w = (1.0 - gam2) * ssh_o + gam2 * ssh_n
                ubtr_n = not_bnd * (ubtr_o + dtb * (cor - g * grad_e(ssh_w)
                                                    + G))
            return (ssh_n, ubtr_n, ubtr_acc + ubtr_n, flux_acc), None

        (ssh_sub, _, ubtr_acc, flux_acc), _ = jax.lax.scan(
            subcycle, (ssh_cur, ubtr_cur, ubtr_cur,
                       jnp.zeros_like(ubtr_cur)), None, length=n_loop)
        flux_avg = flux_acc / n_loop
        ubtr_avg = ubtr_acc / (n_loop + 1)
        # 'finalBtrFields' full-depth exchange (ref :1282-1290)
        flux_avg = ee(flux_avg)
        ubtr_avg = ee(ubtr_avg)

        # velocity correction (ref :1282-1345)
        u_full = ubtr_avg[:, None] + ubcl_new
        if cfg.config_vel_correction:
            corr = (flux_avg - jnp.sum(h_edge * u_full, axis=-1)) \
                / h_edge_safe
        else:
            corr = jnp.zeros_like(ubtr_avg)
        u_transport = (u_full + corr[:, None]) * not_bnd[:, None]

        # --- stage 3: thickness / tracer update ----------------------------
        if cfg.config_use_gm:
            # GM bolus transport added to the advective velocity (ref:
            # ocn_gm; same treatment as the RK4 path)
            from mpas_tpu.cores.ocean.gm import bolus_velocity
            rho_gm = equation_of_state(cfg, tr_new[..., 0], tr_new[..., 1])
            u_transport = u_transport + bolus_velocity(grid, cfg, rho_gm,
                                                       h_st)
        uh = u_transport * h_edge
        if grid.edgeMask is not None:
            uh = uh * grid.edgeMask
        _, tend_h, w_top = thickness_tendency(grid, uh)
        tend_hT = tracer_tendency(grid, cfg, uh, w_top, h_st, tr_new)
        w_for_tend = w_top
        if outer < n_ts - 1:
            temp_h = h_cur + dt * tend_h
            h_new = 0.5 * (h_cur + temp_h)
            temp_tr = (tr_cur * h_cur[..., None] + dt * tend_hT) \
                / jnp.where(temp_h == 0.0, 1.0, temp_h)[..., None]
            tr_new = 0.5 * (tr_cur + temp_tr)
            u_new = ubtr_avg[:, None] + ubcl_new
            # midpoint prognostics feed the next outer pass: refresh halos
            # (ref: the 'combined' exchange between ts iterations, :1390+)
            h_new = ce(h_new)
            tr_new = ce(tr_new)
            ssh_new = jnp.sum(h_new, axis=-1) - grid.bottomDepth
        else:
            h_new = h_cur + dt * tend_h
            tr_new = (tr_cur * h_cur[..., None] + dt * tend_hT) \
                / jnp.where(h_new == 0.0, 1.0, h_new)[..., None]
            # ubcl_new is at n+1/2: extrapolate to n+1 (ref :1733-1737)
            u_new = ubtr_avg[:, None] + 2.0 * ubcl_new - ubcl_cur

    out = OcnState(u=u_new * not_bnd[:, None], layerThickness=h_new,
                   tracers=tr_new, ubtr=ubtr_avg)
    mixed = implicit_vertical_mix(grid, cfg, out, dt, forcing)
    return mixed.replace(ubtr=ubtr_avg)


def apply_surface_forcing(grid: OcnGrid, cfg: OcnConfig, state: OcnState,
                          forcing, dt) -> OcnState:
    """Forward-Euler application of the surface forcing terms before the
    dynamics step (ref: the forcing tendencies are part of ocn_tend_vel /
    ocn_tend_tracer; applied operator-split here)."""
    from mpas_tpu.cores.ocean.forcing import (surface_stress_tend,
                                              surface_tracer_tend)
    h = state.layerThickness
    du = surface_stress_tend(grid, cfg, forcing, h)
    dhT = surface_tracer_tend(grid, cfg, forcing, h, state.tracers)
    tr = state.tracers + dt * dhT / jnp.maximum(h, 1e-3)[..., None]
    return state.replace(u=state.u + dt * du, tracers=tr)


def ocn_timestep(grid: OcnGrid, cfg: OcnConfig, state: OcnState,
                 dt, forcing=None, xch=None) -> OcnState:
    """Integrator dispatch (ref: ocn_timestep,
    mpas_ocn_time_integration.F:80)."""
    if forcing is not None:
        state = apply_surface_forcing(grid, cfg, state, forcing, dt)
    if cfg.config_time_integrator == "split_explicit":
        out = split_step(grid, cfg, state, dt, forcing, xch=xch)
    elif cfg.config_time_integrator == "RK4":
        out = rk4_step(grid, cfg, state, dt, forcing, xch=xch)
    else:
        raise ValueError(
            f"unknown config_time_integrator "
            f"{cfg.config_time_integrator!r}; "
            "supported: 'split_explicit', 'RK4'")
    # auxiliary tracer groups, operator-split after the dynamics
    # (ref ordering: tracer group tendencies in ocn_tend_tracer + the
    # frazil adjustment at the end of the split stage 3)
    if (cfg.config_use_ideal_age or cfg.config_use_exponential_decay
            or cfg.config_use_frazil):
        from mpas_tpu.cores.ocean import tracer_extras as tx
        tr = out.tracers
        if cfg.config_use_ideal_age:
            tr = tx.ideal_age_step(tr, cfg.config_ideal_age_index, dt)
        if cfg.config_use_exponential_decay:
            tr = tx.exponential_decay_step(
                tr, cfg.config_exp_decay_index, dt,
                cfg.config_exp_decay_efolding)
        out = out.replace(tracers=tr)
        if cfg.config_use_frazil:
            out, _frazil = tx.frazil_adjustment(cfg, out, dt)
    return out


@functools.partial(jax.jit, static_argnums=(1, 3))
def run_steps(grid: OcnGrid, cfg: OcnConfig, state: OcnState,
              n_steps: int, forcing=None) -> OcnState:
    dt = jnp.asarray(cfg.config_dt, dtype=state.layerThickness.dtype)

    def body(s, _):
        return ocn_timestep(grid, cfg, s, dt, forcing), None

    final, _ = jax.lax.scan(body, state, None, length=n_steps)
    return final
