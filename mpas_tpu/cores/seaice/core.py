"""Sea-ice core timestep: velocity solve -> transport -> column physics.

ref: src/core_seaice/shared/mpas_seaice_time_integration.F:42-174
(seaice_timestep: seaice_run_velocity_solver :148 -> seaice_run_advection
:154 -> column physics). The whole step is one jittable function; multi-step
runs are a `lax.scan`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mpas_tpu.cores.seaice.advection import advect_upwind
from mpas_tpu.cores.seaice.column import column_physics_step
from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.state import (SeaiceForcing, SeaiceGrid,
                                         SeaiceState)
from mpas_tpu.cores.seaice.velocity import solve_velocities


def seaice_timestep(grid: SeaiceGrid, cfg: SeaiceConfig, state: SeaiceState,
                    forcing: SeaiceForcing, dt, xch=None):
    diags = {}
    if cfg.config_use_velocity_solver:
        state, diags = solve_velocities(grid, cfg, state, forcing, dt,
                                        xch=xch)
    if cfg.config_advection_type == "upwind":
        state = advect_upwind(grid, cfg, state, dt)
    elif cfg.config_advection_type == "incremental_remap":
        from mpas_tpu.cores.seaice.remap import advect_incremental_remap
        state = advect_incremental_remap(grid, cfg, state, dt)
    if cfg.config_use_column_physics:
        state = column_physics_step(cfg, state, forcing, dt)
    return state, diags


@functools.partial(jax.jit, static_argnums=(1, 4))
def run_steps(grid: SeaiceGrid, cfg: SeaiceConfig, state: SeaiceState,
              forcing: SeaiceForcing, n_steps: int) -> SeaiceState:
    dt = jnp.asarray(cfg.config_dt, dtype=state.uVelocity.dtype)

    def body(s, _):
        s, _d = seaice_timestep(grid, cfg, s, forcing, dt)
        return s, None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def total_ice_volume(grid: SeaiceGrid, state: SeaiceState):
    """Domain-integrated ice volume (m^3) — the conservation invariant."""
    return jnp.sum(jnp.sum(state.iceVolumeCategory, axis=-1)
                   * grid.mesh.areaCell)
