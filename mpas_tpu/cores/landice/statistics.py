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


def regional_stats(grid, cfg: LiConfig, state, region_cell_masks,
                   sfc_mass_bal=None, basal_mass_bal=None):
    """Per-region land-ice statistics.

    ref: src/core_landice/analysis_members/mpas_li_regional_stats.F
    (li_compute_regional_stats:123-573) — the same reductions as the
    global member but restricted to each region of a cell-mask set.
    TPU redesign: one masked einsum per quantity over a dense
    (nCells, nRegions) 0/1 mask array instead of the reference's
    per-region loop+MPI_Allreduce; all regions reduce in a single pass.

    region_cell_masks: (nCells, nRegions).  Returns a dict of
    (nRegions,) numpy arrays."""
    m = grid.mesh
    h = state.thickness
    area = m.areaCell
    rmask = jnp.asarray(region_cell_masks, h.dtype)       # (nC, nR)
    has_ice = (h > 1.0).astype(h.dtype)
    floating = (cfg.rho_ice * h
                < -cfg.rho_seawater
                * jnp.minimum(grid.bedTopography, 0.0)).astype(h.dtype)
    grounded = has_ice * (1.0 - floating)
    floating = has_ice * floating

    def rsum(w):  # sum over cells of w, per region
        return jnp.einsum("c,cr->r", w, rmask)

    haf = jnp.maximum(
        h + jnp.minimum(grid.bedTopography, 0.0)
        * (cfg.rho_seawater / cfg.rho_ice), 0.0)
    speed = jnp.max(jnp.abs(state.normalVelocity), axis=1)
    cell_speed = jnp.max(
        jnp.where(m.edgesOnCell >= 0, speed[m.edgesOnCell], 0.0), axis=1)

    big = 1.0e30
    out = {
        "regionalIceArea": rsum(has_ice * area),
        "regionalIceVolume": rsum(h * area),
        "regionalVolumeAboveFloatation": rsum(grounded * haf * area),
        "regionalGroundedIceArea": rsum(grounded * area),
        "regionalGroundedIceVolume": rsum(grounded * h * area),
        "regionalFloatingIceArea": rsum(floating * area),
        "regionalFloatingIceVolume": rsum(floating * h * area),
        "regionalMaxThickness": jnp.max(
            jnp.where(rmask > 0, h[:, None], -big), axis=0),
        "regionalMinThickness": jnp.min(
            jnp.where((rmask > 0) & (has_ice[:, None] > 0),
                      h[:, None], big), axis=0),
        "regionalMaxSurfaceSpeed": jnp.max(
            jnp.where(rmask > 0, cell_speed[:, None], 0.0), axis=0),
        "regionalSumCalvingFlux": rsum(state.calvingFlux * area),
    }
    if sfc_mass_bal is not None:
        out["regionalSumSfcMassBal"] = rsum(sfc_mass_bal * area)
        out["regionalSumGroundedSfcMassBal"] = rsum(
            grounded * sfc_mass_bal * area)
        out["regionalSumFloatingSfcMassBal"] = rsum(
            floating * sfc_mass_bal * area)
    if basal_mass_bal is not None:
        out["regionalSumBasalMassBal"] = rsum(basal_mass_bal * area)
    return {k: np.asarray(v) for k, v in out.items()}
