"""Incremental analysis update (IAU).

ref: src/core_atmosphere/dynamics/mpas_atm_iau.F (220 LoC):
atm_add_tend_anal_incr — spreads an analysis increment over the IAU window
as a constant tendency: tend_X += rho * dX_incr / T_window (for theta/u/qv;
rho-coupled for the flux variables). Active while the model time is inside
[start, start + config_IAU_window_length_s].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class IAUConfig:
    # ref: config_IAU_option ('off'|'on') + config_IAU_window_length_s
    config_IAU_option: str = "off"
    config_IAU_window_length_s: float = 21600.0


@struct.dataclass
class IAUIncrements:
    """Analysis increments (analysis minus background) on model levels.
    ref: the lbc/iau input stream variables theta_amb/rho_amb/u_amb ..."""
    theta_incr: Any     # (nCells, nz)
    rho_incr: Any       # (nCells, nz)
    u_incr: Any         # (nEdges, nz)
    qv_incr: Any        # (nCells, nz) or None


def iau_tendencies(cfg: IAUConfig, inc: IAUIncrements, rho_zz,
                   elapsed_s):
    """Constant-in-window tendencies (ref: atm_add_tend_anal_incr).

    Returns (tend_theta_flux, tend_rho, tend_u, tend_qv) — theta tendency
    is rho-coupled like the reference's tend_rtheta contribution. All are
    zero outside the window."""
    w = cfg.config_IAU_window_length_s
    active = jnp.asarray(elapsed_s) < w
    scale = jnp.where(active, 1.0 / w, 0.0)
    tend_rt = rho_zz * inc.theta_incr * scale
    tend_rho = inc.rho_incr * scale
    tend_u = inc.u_incr * scale
    tend_qv = None if inc.qv_incr is None else inc.qv_incr * scale
    return tend_rt, tend_rho, tend_u, tend_qv
