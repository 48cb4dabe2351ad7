"""Urban canopy physics: single-layer UCM + building energy model.

ref capability: physics_wrf/module_sf_urban.F (4,042 LoC — the
Kusaka/Chen single-layer urban canopy model SLUCM) and module_sf_bem.F /
module_sf_bep.F / module_sf_bep_bem.F (the multi-layer building-effect
parameterization with indoor energy budget). The reference reads facet
properties from URBPARM.TBL (not vendored); this "-class" implementation
carries the same structure with the table's default (low-intensity
residential) values inlined:

  - three facets (roof, wall, road) each with a layered substrate solved
    implicitly (the same 4-layer tridiagonal treatment as the Noah
    column), a linearized skin energy balance, facet-specific
    albedo/emissivity/conductance;
  - canyon radiation geometry: sky-view factors of road and walls from
    the height/width ratio, one-bounce shortwave reflection, canyon
    shadowing of the road by direct beam;
  - anthropogenic heat with a diurnal profile (AH of the SLUCM);
  - BEM-class indoor node: building interior air temperature with
    conditioned-target heating/cooling whose waste heat is released to
    the canyon (module_sf_bem.F genre);
  - grid-cell aggregation by roof fraction R and urban fraction FRC_URB.

All per-cell elementwise; columns vmapped naturally by array shapes.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import struct

from mpas_tpu.ops.matrix import tridiagonal_solve

_SB = 5.670374e-8
_CP_AIR = 1004.5
_RHO_AIR = 1.2


class UrbanParams(NamedTuple):
    """URBPARM.TBL-genre defaults (low-intensity residential row)."""
    h_over_w: float = 1.0        # canyon aspect ratio ZR/ROAD_WIDTH
    roof_frac: float = 0.5       # R: building coverage ratio
    frc_urb: float = 0.9         # urban fraction of the cell
    alb_roof: float = 0.20
    alb_wall: float = 0.20
    alb_road: float = 0.15
    eps_roof: float = 0.90
    eps_wall: float = 0.90
    eps_road: float = 0.95
    # substrate: heat capacity (J/m3/K) and conductivity (W/m/K)
    cap_roof: float = 1.0e6
    cap_wall: float = 1.0e6
    cap_road: float = 1.4e6
    aks_roof: float = 0.67
    aks_wall: float = 0.67
    aks_road: float = 0.40
    dz_layers: tuple = (0.05, 0.05, 0.1, 0.2)   # 4 substrate layers (m)
    ch_urban: float = 7.0e-3     # facet bulk transfer coefficient
    ah_peak: float = 20.0        # anthropogenic heat peak (W/m2)
    # BEM-class indoor node
    t_target: float = 295.0      # conditioned indoor target (K)
    cop: float = 3.0             # AC coefficient of performance
    cap_indoor: float = 4.0e5    # indoor air+furnishing capacity (J/m2/K)
    k_indoor: float = 2.0        # wall->indoor conductance (W/m2/K)
    t_deep: float = 290.0        # road/roof deep boundary temperature


@struct.dataclass
class UrbanState:
    t_roof: Any     # (nC, 4) roof substrate layers
    t_wall: Any     # (nC, 4)
    t_road: Any     # (nC, 4)
    ts_roof: Any    # (nC,) skin temps
    ts_wall: Any
    ts_road: Any
    t_indoor: Any   # (nC,) BEM indoor air node


def init_urban_state(n_cells, t0=290.0, dtype=jnp.float64) -> UrbanState:
    z = jnp.full((n_cells,), t0, dtype=dtype)
    l4 = jnp.full((n_cells, 4), t0, dtype=dtype)
    return UrbanState(t_roof=l4, t_wall=l4, t_road=l4,
                      ts_roof=z, ts_wall=z, ts_road=z, t_indoor=z)


def sky_view_factors(h_over_w):
    """Canyon view factors (ref: the SLUCM geometry block,
    module_sf_urban.F:194-216): road-to-sky and wall-to-sky from the
    aspect ratio; reciprocity closes wall-road exchange."""
    hw = h_over_w
    svf_road = jnp.sqrt(1.0 + hw ** 2) - hw
    svf_wall = 0.5 * (hw + 1.0 - jnp.sqrt(1.0 + hw ** 2)) / jnp.maximum(
        hw, 1e-6)
    return svf_road, svf_wall


def _shadow_fraction(h_over_w, mu):
    """Fraction of the road in direct-beam shadow: tan(zenith) * h/w
    capped at 1 (the SLUCM direct-beam canyon shadowing)."""
    mu = jnp.clip(mu, 1e-3, 1.0)
    tanz = jnp.sqrt(jnp.maximum(1.0 - mu ** 2, 0.0)) / mu
    return jnp.clip(h_over_w * tanz, 0.0, 1.0)


def _facet_substrate(t_layers, ts, g_flux, dt, cap, aks, dzs, t_bottom):
    """Implicit conduction through 4 substrate layers with the skin
    conductive flux at the top and a Dirichlet deep boundary (the Noah
    column treatment reused per facet)."""
    dz = jnp.asarray(dzs, dtype=t_layers.dtype)
    kh = aks / (0.5 * (dz[:-1] + dz[1:]))
    kh = jnp.broadcast_to(kh[None, :], (t_layers.shape[0], 3))
    eta = dt / (cap * dz)[None, :]
    zero = jnp.zeros_like(kh[:, :1])
    a = -eta * jnp.concatenate([zero, kh], axis=1)
    c = -eta * jnp.concatenate([kh, zero], axis=1)
    b = 1.0 - a - c
    d = t_layers.at[:, 0].add(eta[:, 0] * g_flux)
    kb = aks / (0.5 * dz[-1])
    b = b.at[:, -1].add(eta[:, -1] * kb)
    d = d.at[:, -1].add(eta[:, -1] * kb * t_bottom)
    return tridiagonal_solve(a, b, c, d)


def _facet_skin(ts, t1, sw_abs, lw_in, eps, t_air, ch_u, wind, aks, dz0,
                extra_flux=0.0):
    """Linearized facet skin energy balance (the SLUCM TS_SCHEME=1
    Newton step): SW + eps*(LW_in - sig Ts^4) - H - G + extra = 0."""
    kg = aks / (0.5 * dz0)
    ch = _RHO_AIR * _CP_AIR * ch_u * jnp.maximum(wind, 0.5)
    f = sw_abs + eps * (lw_in - _SB * ts ** 4) \
        - ch * (ts - t_air) - kg * (ts - t1) + extra_flux
    dfdt = -4.0 * eps * _SB * ts ** 3 - ch - kg
    ts_new = ts - f / dfdt
    h_flux = ch * (ts_new - t_air)
    g_flux = kg * (ts_new - t1)
    return ts_new, h_flux, g_flux


def slucm_step(state: UrbanState, t_air, wind, swdown, lwdown, mu, dt,
               hour_utc=12.0, params: UrbanParams = UrbanParams()):
    """One urban canopy step (ref: the `urban` driver subroutine of
    module_sf_urban.F). Returns (new UrbanState, diagnostics dict with
    the grid-cell aggregated hfx/ts_urban/q_ac and per-facet skins)."""
    pr = params
    svf_road, svf_wall = sky_view_factors(pr.h_over_w)
    shadow = _shadow_fraction(pr.h_over_w, mu)
    swd = jnp.maximum(swdown, 0.0)

    # --- shortwave on facets with one canyon bounce -----------------------
    sw_roof = (1.0 - pr.alb_roof) * swd
    sw_road_in = swd * (1.0 - shadow) + swd * shadow * 0.25  # diffuse leak
    refl_road = pr.alb_road * sw_road_in
    sw_wall_in = swd * shadow * 0.5 + refl_road * (1.0 - svf_road) * 0.5
    refl_wall = pr.alb_wall * sw_wall_in
    sw_road = (1.0 - pr.alb_road) * (sw_road_in
                                     + refl_wall * (1.0 - svf_wall))
    sw_wall = (1.0 - pr.alb_wall) * sw_wall_in

    # --- longwave with view factors ---------------------------------------
    lw_wall_emit = pr.eps_wall * _SB * state.ts_wall ** 4
    lw_road_sky = svf_road * lwdown \
        + (1.0 - svf_road) * lw_wall_emit
    lw_wall_sky = svf_wall * lwdown \
        + (1.0 - 2.0 * svf_wall) * lw_wall_emit \
        + svf_wall * pr.eps_road * _SB * state.ts_road ** 4

    # --- anthropogenic heat (diurnal profile; ref AH + AHDIUPRF) ----------
    ah = pr.ah_peak * jnp.maximum(
        jnp.cos((hour_utc - 14.0) / 24.0 * 2.0 * jnp.pi), 0.1)

    dzs = pr.dz_layers
    # BEM: wall conduction exchanges with the indoor node
    indoor_flux = pr.k_indoor * (state.t_indoor - state.ts_wall)

    ts_roof, h_roof, g_roof = _facet_skin(
        state.ts_roof, state.t_roof[:, 0], sw_roof, lwdown, pr.eps_roof,
        t_air, pr.ch_urban, wind, pr.aks_roof, dzs[0])
    ts_wall, h_wall, g_wall = _facet_skin(
        state.ts_wall, state.t_wall[:, 0], sw_wall, lw_wall_sky,
        pr.eps_wall, t_air, 0.5 * pr.ch_urban, wind, pr.aks_wall, dzs[0],
        extra_flux=indoor_flux)
    ts_road, h_road, g_road = _facet_skin(
        state.ts_road, state.t_road[:, 0], sw_road, lw_road_sky,
        pr.eps_road, t_air, pr.ch_urban, wind, pr.aks_road, dzs[0])

    t_roof = _facet_substrate(state.t_roof, ts_roof, g_roof, dt,
                              pr.cap_roof, pr.aks_roof, dzs, pr.t_deep)
    t_wall = _facet_substrate(state.t_wall, ts_wall, g_wall, dt,
                              pr.cap_wall, pr.aks_wall, dzs,
                              state.t_indoor)
    t_road = _facet_substrate(state.t_road, ts_road, g_road, dt,
                              pr.cap_road, pr.aks_road, dzs, pr.t_deep)

    # --- BEM indoor node: conduction gain, AC relaxation to target --------
    gain = pr.k_indoor * (t_wall[:, -1] - state.t_indoor)
    q_cond = pr.cap_indoor * (pr.t_target - state.t_indoor) / 3600.0
    t_indoor = state.t_indoor + dt / pr.cap_indoor * (gain + q_cond)
    # AC waste heat to the canyon: removed heat * (1 + 1/COP) when cooling
    q_ac = jnp.where(q_cond < 0.0, -q_cond * (1.0 + 1.0 / pr.cop), 0.0)

    # --- aggregation (ref: the R/(1-R) roof/canyon split + FRC_URB) -------
    hw2 = 2.0 * pr.h_over_w          # wall area per unit canyon floor
    h_canyon = (h_road + hw2 * h_wall) / (1.0 + hw2) + ah + q_ac
    hfx_urban = pr.roof_frac * h_roof + (1.0 - pr.roof_frac) * h_canyon
    ts_urban = pr.roof_frac * ts_roof + (1.0 - pr.roof_frac) \
        * (0.5 * (ts_road + ts_wall))

    new = UrbanState(t_roof=t_roof, t_wall=t_wall, t_road=t_road,
                     ts_roof=ts_roof, ts_wall=ts_wall, ts_road=ts_road,
                     t_indoor=t_indoor)
    diag = {"hfx_urban": hfx_urban * pr.frc_urb, "ts_urban": ts_urban,
            "q_ac": q_ac, "ah": ah,
            "h_roof": h_roof, "h_wall": h_wall, "h_road": h_road}
    return new, diag


def bep_column_drag(u, v, z_mid, dt, building_height=20.0,
                    frontal_density=0.3, cd_building=0.4,
                    frc_urb=0.9):
    """BEP-class multi-layer building drag (ref: module_sf_bep.F — the
    building-effect parameterization distributes drag and TKE production
    over the model levels inside the canopy instead of a single surface
    stress). Implicit per-level drag
        du/dt = -a(z) |V| u,  a(z) = 0.5 Cd lambda_f(z)
    with the frontal-area density profile lambda_f constant below the
    building height and zero above (the BEP default morphology).

    Returns (u_new, v_new, tke_source) with tke_source = a |V|^3 per
    level (the canopy wake-TKE production BEP feeds the PBL scheme)."""
    import jax.numpy as jnp
    inside = (z_mid < building_height).astype(u.dtype)
    a = 0.5 * cd_building * frontal_density * frc_urb * inside
    speed = jnp.sqrt(u * u + v * v)
    fac = 1.0 / (1.0 + dt * a * speed)      # implicit update
    u_new = u * fac
    v_new = v * fac
    tke_src = a * speed ** 3
    return u_new, v_new, tke_src
