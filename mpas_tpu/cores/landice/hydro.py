"""Subglacial hydrology (distributed sheet model).

ref: src/core_landice/mode_forward/mpas_li_subglacial_hydro.F (1,757 LoC):
li_SGH_init (:75) / li_SGH_solve (:206) — evolves the basal water sheet:
  d(W)/dt = melt_input/rho_w - C_d (till drainage) - div(q)
  q = -k W^alpha |grad(phi)|^(beta-2) grad(phi)     (sheet flux law)
  phi = rho_w g z_b + rho_i g H  (hydraulic potential, zero water pressure
        approximation for the v1 sheet; the full model evolves effective
        pressure N and channels)
plus a till reservoir with capacity tillMax. Channels
(config_SGH_chnl_active) are a later milestone.

TPU redesign: upwinded sheet flux on edges from the potential gradient,
masked sums per cell, forward-Euler (the reference subcycles with an
advective CFL; here a fixed substep count per outer step).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from mpas_tpu.cores.landice.config import LiConfig


@struct.dataclass
class HydroState:
    waterThickness: Any     # (nCells,) m — the distributed sheet
    tillWater: Any          # (nCells,) m — till reservoir


def zero_hydro(n_cells, dtype=jnp.float64) -> HydroState:
    z = jnp.zeros((n_cells,), dtype=dtype)
    return HydroState(waterThickness=z, tillWater=z)


# sheet-flux law constants (ref: config_SGH_conduc_coeff, alpha/beta
# exponents of the Darcy-Weisbach sheet law)
_K_SHEET = 1.0e-3
_ALPHA = 5.0 / 4.0
_BETA = 3.0 / 2.0
_TILL_MAX = 2.0          # m (ref: config_SGH_till_max)
_TILL_DRAIN = 3.17e-11   # m/s (ref: config_SGH_till_drainage ~1 mm/yr)
_RHO_W = 1000.0


def hydraulic_potential(grid, cfg: LiConfig, thickness):
    """phi = rho_w g z_b + rho_i g H (zero water-pressure sheet).
    ref: the potential build in li_SGH_solve."""
    return (_RHO_W * cfg.gravity * grid.bedTopography
            + cfg.rho_ice * cfg.gravity * thickness)


def sgh_step(grid, cfg: LiConfig, hydro: HydroState, thickness,
             basal_melt_rate, dt, n_sub: int = 4) -> HydroState:
    """Advance the water sheet by dt.

    basal_melt_rate: (nCells,) m/s of water added at the bed (from the
    thermal solver's basal energy balance or a file, ref :329-340)."""
    m = grid.mesh
    phi = hydraulic_potential(grid, cfg, thickness)
    coe = m.cellsOnEdge
    not_bnd = 1.0 - m.boundaryEdge
    gphi = (phi[coe[:, 1]] - phi[coe[:, 0]]) * m.invDcEdge * not_bnd

    has_ice = (thickness > 1.0).astype(phi.dtype)
    dts = dt / n_sub
    w, till = hydro.waterThickness, hydro.tillWater
    for _ in range(n_sub):
        # till reservoir first (ref: till drainage ordering)
        fill = jnp.minimum(basal_melt_rate * dts, _TILL_MAX - till)
        fill = jnp.maximum(fill, 0.0)
        till_new = jnp.clip(till + fill - _TILL_DRAIN * dts, 0.0, _TILL_MAX)
        to_sheet = basal_melt_rate * dts - fill

        # sheet flux, upwind water thickness in the down-potential direction
        # (|grad phi|^(beta-2) with beta<2 is singular at zero gradient —
        # guard like the reference's minimum-gradient floor)
        w_up = jnp.where(gphi < 0.0, w[coe[:, 0]], w[coe[:, 1]])
        gmag = jnp.maximum(jnp.abs(gphi), 1e-3)
        q = -_K_SHEET * jnp.maximum(w_up, 0.0) ** _ALPHA \
            * gmag ** (_BETA - 2.0) * gphi * not_bnd
        div = jnp.sum(m.edgeSignOnCell * (q * m.dvEdge)[m.edgesOnCell],
                      axis=1) * m.invAreaCell
        w = jnp.maximum(w + to_sheet - dts * div, 0.0) * has_ice
        till = till_new * has_ice
    return HydroState(waterThickness=w, tillWater=till)


def basal_melt_from_thermal(grid, cfg: LiConfig, thickness, temperature):
    """Basal melt rate (m/s water) from the excess of the geothermal +
    frictional flux over what conduction removes at a temperate bed.
    ref: 'thermal' branch of config_SGH_basal_melt (:333)."""
    latent = 3.34e5 * _RHO_W
    nz = temperature.shape[-1]
    dz_b = jnp.maximum(thickness, 10.0) / nz
    t_bed = temperature[:, -1]
    temperate = t_bed >= 273.15 - 1e-3
    cond_out = cfg.ice_conductivity * jnp.maximum(
        273.15 - temperature[:, -2], 0.0) / dz_b
    melt = jnp.maximum(cfg.config_geothermal_flux - cond_out, 0.0) / latent
    return jnp.where(temperate & (thickness > 1.0), melt, 0.0)
