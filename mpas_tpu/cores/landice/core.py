"""Land-ice forward core: SIA velocity + FE thickness evolution + thermal
column solve + calving.

ref call structure (src/core_landice/mode_forward/mpas_li_core.F:279
li_core_run -> mpas_li_time_integration.F -> mpas_li_time_integration_fe.F):
  1. velocity solve       (mpas_li_velocity.F -> mpas_li_sia.F:234 li_sia_solve)
  2. thickness advection  (mpas_li_advection.F, FO-upwind branch)
  3. thermal solve        (mpas_li_thermal.F vertical column)
  4. calving              (mpas_li_calving.F)

TPU redesign: one jittable FE step; the SIA vertical profile is a cumulative
sum over static sigma levels (vectorized over edges); the thermal solve is a
batched Thomas tridiagonal over cells; calving is an elementwise mask. The
n-step driver is a lax.scan.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mpas_tpu.cores.landice.config import LiConfig
from mpas_tpu.mesh.mesh import Mesh
from mpas_tpu.ops import stencils as st
from mpas_tpu.ops.matrix import tridiagonal_solve


@struct.dataclass
class LiGrid:
    mesh: Mesh
    bedTopography: Any          # (nCells,) m (negative below sea level)
    # static sigma coordinate, 0 at surface -> 1 at bed, ref
    # layerInterfaceSigma (mpas_li_sia.F:428)
    layerInterfaceSigma: Any    # (nz+1,)
    layerSigmaFraction: Any     # (nz,) layer fractional thickness
    # first-order Stokes geometry (built when config_velocity_solver='FO';
    # ref: the extruded-grid setup of Interface_velocity_solver.cpp:928)
    fo_geom: Any = None


@struct.dataclass
class LiState:
    thickness: Any              # (nCells,) m
    temperature: Any            # (nCells, nz) K, layer midpoints
    # diagnostics carried across steps
    normalVelocity: Any         # (nEdges, nz+1) m/s at layer interfaces
    calvingFlux: Any            # (nCells,) m of ice removed (cumulative)
    # polythermal state (enthalpy solver; ref waterFrac tracer)
    waterFrac: Any = None       # (nCells, nz) liquid water fraction
    basalMeltRate: Any = None   # (nCells,) m of ice / s


def make_grid(mesh: Mesh, cfg: LiConfig, bed=None) -> LiGrid:
    nz = cfg.config_nvertlevels
    sigma = jnp.linspace(0.0, 1.0, nz + 1)     # surface -> bed
    frac = jnp.full((nz,), 1.0 / nz)
    if bed is None:
        bed = jnp.zeros((mesh.nCells,))
    fo_geom = None
    if cfg.config_velocity_solver == "FO":
        from mpas_tpu.cores.landice.fo_stokes import build_fo_geom
        fo_geom = build_fo_geom(mesh)
    return LiGrid(mesh=mesh, bedTopography=jnp.asarray(bed),
                  layerInterfaceSigma=sigma, layerSigmaFraction=frac,
                  fo_geom=fo_geom)


def fo_velocity(grid: LiGrid, cfg: LiConfig, thickness, temperature,
                xch=None, owned=None):
    """First-order Stokes edge-normal interface velocities.

    ref: mpas_li_velocity_external.F + Interface_velocity_solver.cpp
    velocity_solver_solve_fo (:341) — here the JAX-native Blatter-Pattyn
    solve of fo_stokes.py; cell (u, v) at layer midpoints are projected
    onto edge normals and interpolated to layer interfaces. xch/owned:
    distributed-solve hooks (see _solve_fo_stokes_impl)."""
    from mpas_tpu.cores.landice.fo_stokes import (_solve_fo_stokes_impl,
                                                  solve_fo_stokes)
    m = grid.mesh
    nz = cfg.config_nvertlevels
    surface = grid.bedTopography + thickness
    flwa = flow_param_a(cfg, temperature)
    beta2 = cfg.config_fo_basal_friction
    if xch is None:
        u, v, _ = solve_fo_stokes(
            grid.fo_geom, thickness, surface, flwa,
            beta2, cfg.rho_ice * cfg.gravity, nz=nz,
            picard_iters=cfg.config_fo_picard_iters,
            cg_iters=cfg.config_fo_cg_iters)
    else:
        u, v, _ = _solve_fo_stokes_impl(
            grid.fo_geom, thickness, surface, flwa,
            beta2, cfg.rho_ice * cfg.gravity, nz=nz,
            picard_iters=cfg.config_fo_picard_iters,
            cg_iters=cfg.config_fo_cg_iters, xch=xch, owned=owned)
    dyn = (thickness > 1.0).astype(thickness.dtype)
    u = u * dyn[:, None]
    v = v * dyn[:, None]
    coe = m.cellsOnEdge
    un_mid = 0.5 * ((u[coe[:, 0]] + u[coe[:, 1]])
                    * jnp.cos(m.angleEdge)[:, None]
                    + (v[coe[:, 0]] + v[coe[:, 1]])
                    * jnp.sin(m.angleEdge)[:, None])
    # midpoints (k=0 surface..nz-1 base) -> interfaces (nz+1): linear
    # interior, copy at the surface, zero at the bed contact
    interior = 0.5 * (un_mid[:, 1:] + un_mid[:, :-1])
    u_int = jnp.concatenate(
        [un_mid[:, :1], interior, un_mid[:, -1:]], axis=1)
    return u_int * (1.0 - m.boundaryEdge)[:, None]


def zero_state(mesh: Mesh, cfg: LiConfig, dtype=jnp.float64) -> LiState:
    nz = cfg.config_nvertlevels
    return LiState(
        thickness=jnp.zeros((mesh.nCells,), dtype=dtype),
        temperature=jnp.full((mesh.nCells, nz),
                             cfg.config_surface_air_temperature, dtype=dtype),
        normalVelocity=jnp.zeros((mesh.nEdges, nz + 1), dtype=dtype),
        calvingFlux=jnp.zeros((mesh.nCells,), dtype=dtype))


def flow_param_a(cfg: LiConfig, temperature):
    """Arrhenius rate factor A(T*). ref: li_calculate_flowParamA
    (mpas_li_sia.F:336 capability; PB1982 option)."""
    if cfg.config_flowParamA_calculation == "constant":
        return jnp.full_like(temperature, cfg.config_default_flowParamA)
    from mpas_tpu.cores.landice.config import SECONDS_PER_YEAR
    cold = temperature < 263.15
    a0 = jnp.where(cold, cfg.pb_a0_cold, cfg.pb_a0_warm)
    q = jnp.where(cold, cfg.pb_q_cold, cfg.pb_q_warm)
    a_yr = a0 * jnp.exp(-q / (cfg.gas_constant * temperature))
    return a_yr / SECONDS_PER_YEAR


def sia_velocity(grid: LiGrid, cfg: LiConfig, thickness, temperature):
    """Shallow-ice normal velocity at layer interfaces on edges.

    ref: li_sia_solve (mpas_li_sia.F:234-445):
      u(sig) = -0.5 (rho g)^n * |grad s|^(n-1) * ds/dn * H^(n+1)
               * sum_k flwa_k (sig_k^(n+1) - sig_{k+1}^(n+1))
    with centered thickness on edges and dynamic-cell-weighted flwa.
    """
    m = grid.mesh
    n = cfg.config_flowlaw_exponent
    surface = grid.bedTopography + thickness

    normal_slope = st.cell_gradient_n(m, surface)
    # tangent slope via TRiSK tangential reconstruct of the normal slope
    # (ref: 'from_normal_slope' option, mpas_li_sia.F:373)
    tangent_slope = st.tangential_velocity(m, normal_slope)
    slope = jnp.sqrt(normal_slope ** 2 + tangent_slope ** 2)

    coe = m.cellsOnEdge
    dyn = (thickness > 1.0).astype(thickness.dtype)       # dynamic-ice mask
    h_edge = 0.5 * (thickness[coe[:, 0]] + thickness[coe[:, 1]])
    d1, d2 = dyn[coe[:, 0]], dyn[coe[:, 1]]
    edge_dyn = ((d1 + d2) > 0).astype(thickness.dtype) \
        * (1.0 - m.boundaryEdge)

    flwa = flow_param_a(cfg, temperature)                  # (nCells, nz)
    flwa_edge = (flwa[coe[:, 0]] * d1[:, None]
                 + flwa[coe[:, 1]] * d2[:, None]) \
        / jnp.maximum(d1 + d2, 1.0)[:, None]

    factor = -0.5 * (cfg.rho_ice * cfg.gravity) ** n
    level_factor = slope ** (n - 1.0) * normal_slope * h_edge ** (n + 1.0)

    # vertical profile: u(sigma) = factor*level*flwa*(1 - sigma^(n+1)),
    # sigma measured from the surface (no sliding: u(1)=0); built as a
    # cumulative sum of per-layer increments so flwa may vary with depth
    # (ref: mpas_li_sia.F:424-429)
    sig = grid.layerInterfaceSigma
    dsig = sig[1:] ** (n + 1.0) - sig[:-1] ** (n + 1.0)    # (nz,) > 0
    # cumulative from the bed (interface nz) upward: u[k] = sum_{j>=k} inc_j
    inc = factor * level_factor[:, None] * flwa_edge * dsig[None, :]
    u_int = jnp.concatenate(
        [jnp.cumsum(inc[:, ::-1], axis=1)[:, ::-1],
         jnp.zeros((m.nEdges, 1), dtype=thickness.dtype)], axis=1)
    return u_int * edge_dyn[:, None]


def advect_thickness_fo(grid: LiGrid, cfg: LiConfig, thickness, u_int, dt,
                        scheme: str = "centered"):
    """Thickness transport with the depth-averaged SIA velocity.

    ref: mpas_li_advection.F. `fo` is the reference's first-order upwind
    branch; `centered` uses the 2nd-order centered edge thickness, which for
    the diffusion-dominated SIA balance is stable under the diffusive CFL
    and ~5x more accurate on Halfar (ref comment mpas_li_sia.F:405-410).
    """
    m = grid.mesh
    # depth-average of the interface velocities per layer, then over layers
    u_layer = 0.5 * (u_int[:, :-1] + u_int[:, 1:])
    ubar = jnp.sum(u_layer * grid.layerSigmaFraction[None, :], axis=1)

    coe = m.cellsOnEdge
    if scheme == "fo":
        h_edge = jnp.where(ubar > 0.0, thickness[coe[:, 0]],
                           thickness[coe[:, 1]])
    else:
        h_edge = 0.5 * (thickness[coe[:, 0]] + thickness[coe[:, 1]])
    flux = ubar * h_edge * m.dvEdge
    eoc = m.edgesOnCell
    div = jnp.sum(m.edgeSignOnCell * flux[eoc], axis=1) * m.invAreaCell
    return jnp.maximum(thickness - dt * div, 0.0)


def thermal_solve(grid: LiGrid, cfg: LiConfig, thickness, temperature, dt):
    """Implicit vertical temperature diffusion per column.

    ref: mpas_li_thermal.F (temperature branch): conduction through the
    column, Dirichlet surface-air temperature at the top, geothermal flux at
    the bed; batched Thomas solve (columns stay shard-local, SURVEY §5.7).
    """
    nz = cfg.config_nvertlevels
    rho_c = cfg.rho_ice * cfg.ice_specific_heat
    kappa = cfg.ice_conductivity
    h = jnp.maximum(thickness, 10.0)[:, None]              # avoid /0
    dz = h * grid.layerSigmaFraction[None, :]              # (nC, nz)

    # interface conductances between layer midpoints
    dz_mid = 0.5 * (dz[:, :-1] + dz[:, 1:])
    g_int = kappa / dz_mid                                 # (nC, nz-1)
    g_surf = kappa / (0.5 * dz[:, 0])

    alpha = dt / (rho_c * dz)
    a = jnp.concatenate([jnp.zeros_like(g_surf)[:, None],
                         -alpha[:, 1:] * g_int], axis=1)
    c = jnp.concatenate([-alpha[:, :-1] * g_int,
                         jnp.zeros_like(g_surf)[:, None]], axis=1)
    b = 1.0 - a - c
    b = b.at[:, 0].add(alpha[:, 0] * g_surf)
    d = temperature
    d = d.at[:, 0].add(alpha[:, 0] * g_surf
                       * cfg.config_surface_air_temperature)
    d = d.at[:, -1].add(alpha[:, -1] * cfg.config_geothermal_flux)
    t_new = tridiagonal_solve(a, b, c, d)
    # pressure-melting cap
    t_new = jnp.minimum(t_new, 273.15)
    return jnp.where(thickness[:, None] > 1.0, t_new, temperature)


def calve(grid: LiGrid, cfg: LiConfig, thickness, calving_flux,
          u_int=None, dt=None):
    """ref: mpas_li_calving.F li_calve_ice dispatch (:198-276); the
    eigencalving/topographic variants live in calving.py."""
    if cfg.config_calving == "none":
        return thickness, calving_flux
    if cfg.config_calving == "topographic_threshold":
        from mpas_tpu.cores.landice.calving import topographic_calving
        return topographic_calving(
            grid, cfg, thickness, calving_flux,
            bed_threshold=cfg.config_calving_topography)
    if cfg.config_calving == "eigencalving":
        from mpas_tpu.cores.landice.calving import eigencalving
        u_mean = jnp.mean(u_int, axis=1) if u_int is not None else \
            jnp.zeros((grid.mesh.nEdges,), thickness.dtype)
        return eigencalving(grid, cfg, thickness, u_mean, dt,
                            calving_flux,
                            k_eigen=cfg.config_calving_eigencalving_k)
    floating = (cfg.rho_ice * thickness
                < -cfg.rho_seawater * jnp.minimum(grid.bedTopography, 0.0))
    if cfg.config_calving == "floating":
        remove = floating
    else:  # thickness_threshold
        remove = floating & (thickness < cfg.config_calving_thickness)
    new_h = jnp.where(remove, 0.0, thickness)
    return new_h, calving_flux + (thickness - new_h)


def fe_step(grid: LiGrid, cfg: LiConfig, state: LiState, dt,
            xch=None, owned=None) -> LiState:
    """One forward-Euler step (ref: li_time_integrator_forwardeuler,
    mpas_li_time_integration_fe.F). xch/owned: distributed hooks for the
    FO Stokes velocity solve (ignored by the SIA branch)."""
    if cfg.config_velocity_solver == "FO":
        u_int = fo_velocity(grid, cfg, state.thickness, state.temperature,
                            xch=xch, owned=owned)
    else:
        u_int = sia_velocity(grid, cfg, state.thickness,
                             state.temperature)
    t = state.temperature
    if cfg.config_thickness_advection == "incremental_remapping":
        from mpas_tpu.cores.landice.advection_ir import advect_thickness_ir
        h, t = advect_thickness_ir(grid, cfg, state.thickness, t, u_int,
                                   dt)
    else:
        h = advect_thickness_fo(grid, cfg, state.thickness, u_int, dt,
                                scheme=cfg.config_thickness_advection)
    out = state
    if cfg.config_thermal_solver == "temperature":
        t = thermal_solve(grid, cfg, h, t, dt)
    elif cfg.config_thermal_solver == "enthalpy":
        from mpas_tpu.cores.landice.thermal_enthalpy import (
            thermal_solve_enthalpy)
        t, w, bmr = thermal_solve_enthalpy(grid, cfg, h, t,
                                           state.waterFrac, dt)
        out = out.replace(waterFrac=w, basalMeltRate=bmr)
    h, cf = calve(grid, cfg, h, state.calvingFlux, u_int=u_int, dt=dt)
    return out.replace(thickness=h, temperature=t,
                       normalVelocity=u_int, calvingFlux=cf)


@functools.partial(jax.jit, static_argnums=(1, 3))
def run_steps(grid: LiGrid, cfg: LiConfig, state: LiState,
              n_steps: int) -> LiState:
    dt = jnp.asarray(cfg.config_dt, dtype=state.thickness.dtype)
    if cfg.config_thermal_solver == "enthalpy" and state.waterFrac is None:
        # materialize the polythermal carry so the scan pytree is stable
        state = state.replace(
            waterFrac=jnp.zeros_like(state.temperature),
            basalMeltRate=jnp.zeros_like(state.thickness))

    def body(s, _):
        return fe_step(grid, cfg, s, dt), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def total_volume(grid: LiGrid, state: LiState):
    return jnp.sum(state.thickness * grid.mesh.areaCell)
