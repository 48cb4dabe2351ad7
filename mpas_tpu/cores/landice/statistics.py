"""Land-ice analysis members: global statistics.

ref: src/core_landice/analysis_members/mpas_li_global_stats.F (619 LoC) —
domain-integrated volume/area/extent, volume above floatation, grounded vs
floating partition, min/max thickness and speed, total calving flux.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.landice.config import LiConfig


def global_stats(grid, cfg: LiConfig, state):
    m = grid.mesh
    h = state.thickness
    area = m.areaCell
    has_ice = h > 1.0
    floating = (cfg.rho_ice * h
                < -cfg.rho_seawater * jnp.minimum(grid.bedTopography, 0.0))
    grounded = has_ice & ~floating

    # volume above floatation (ref: volumeAboveFloatation)
    haf = h + jnp.minimum(grid.bedTopography, 0.0) \
        * (cfg.rho_seawater / cfg.rho_ice)
    vaf = jnp.sum(jnp.where(grounded, jnp.maximum(haf, 0.0), 0.0) * area)

    speed = jnp.max(jnp.abs(state.normalVelocity), axis=1)
    out = {
        "totalIceVolume": jnp.sum(h * area),
        "totalIceArea": jnp.sum(jnp.where(has_ice, area, 0.0)),
        "groundedIceArea": jnp.sum(jnp.where(grounded, area, 0.0)),
        "floatingIceArea": jnp.sum(jnp.where(has_ice & floating, area, 0.0)),
        "volumeAboveFloatation": vaf,
        "maxThickness": jnp.max(h),
        "maxSurfaceSpeed": jnp.max(speed),
        "totalCalvingFlux": jnp.sum(state.calvingFlux * area),
    }
    return {k: float(v) for k, v in out.items()}
