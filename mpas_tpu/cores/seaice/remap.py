"""Incremental-remapping transport of the ITD tracer hierarchy.

ref capability: src/core_seaice/shared/
mpas_seaice_advection_incremental_remap.F (9,387 LoC) +
..._incremental_remap_tracers.F (tracer hierarchy): geometric flux
remapping (Dukowicz & Baumgardner 2000 / Lipscomb & Hunke 2004) — the
transport across each edge over a step is the integral of a limited
linear reconstruction over the *departure region* swept through the edge.

TPU-first redesign (machinery shared with land ice in ops/remap.py):
  * departure points of the two edge vertices from the vertex velocities
    (one fused gather), departure quad split into two triangles per edge;
  * each triangle is assigned whole to the cell on the upwind side of the
    edge (sign of its swept area) — the reference additionally clips
    triangles against cell boundaries for large CFL; this implementation
    is exact for sub-cell departure regions (CFL < 1, the practical
    regime) and conservative always;
  * tracer reconstructions are limited linear fields phi_c + g.(x-xc)
    (least-squares gradient over cellsOnCell, van-Leer min/max limiter —
    ref: construct_fields/limited_gradient);
  * triangle integrals by the 3-point edge-midpoint quadrature rule
    (exact to quadratic order, i.e. exact for products of two linear
    reconstructions like a*h);
  * the tracer hierarchy a -> (h, hs, T) -> layer enthalpies transports
    children as products with the parent reconstruction.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.state import SeaiceGrid, SeaiceState
from mpas_tpu.ops.remap import (apply_fluxes, cell_gradient,
                                departure_triangles, edge_flux,
                                product_flux)

def _departure_triangles(grid: SeaiceGrid, u_v, v_v, dt):
    """Adapter kept for the geometric-core tests."""
    return departure_triangles(grid.mesh, u_v, v_v, dt)


def advect_incremental_remap(grid: SeaiceGrid, cfg: SeaiceConfig,
                             state: SeaiceState, dt) -> SeaiceState:
    """One IR transport step of the full tracer hierarchy.
    ref driver: mpas_seaice_advection_incremental_remap.F
    seaice_run_advection_incremental_remap."""
    m = grid.mesh
    xc, yc = m.xCell, m.yCell

    a = state.iceAreaCategory
    vi = state.iceVolumeCategory
    vs = state.snowVolumeCategory
    T = state.surfaceTemperature
    h = jnp.where(a > cfg.puny, vi / jnp.maximum(a, cfg.puny), 0.0)
    hs = jnp.where(a > cfg.puny, vs / jnp.maximum(a, cfg.puny), 0.0)

    # limited linear reconstructions (a; children h, hs, T on the parent)
    agx, agy = cell_gradient(m, a, xc, yc)
    hgx, hgy = cell_gradient(m, h, xc, yc)
    sgx, sgy = cell_gradient(m, hs, xc, yc)
    tgx, tgy = cell_gradient(m, T, xc, yc)

    flux_areas, qx, qy = departure_triangles(
        m, state.uVelocity, state.vVelocity, dt)

    (fa,) = edge_flux(m, flux_areas, qx, qy, [a], [agx], [agy], xc, yc)
    fvi = product_flux(m, flux_areas, qx, qy, a, agx, agy,
                       h, hgx, hgy, xc, yc)
    fvs = product_flux(m, flux_areas, qx, qy, a, agx, agy,
                       hs, sgx, sgy, xc, yc)
    faT = product_flux(m, flux_areas, qx, qy, a, agx, agy,
                       T, tgx, tgy, xc, yc)

    a1 = jnp.maximum(apply_fluxes(m, fa, a), 0.0)
    vi1 = jnp.maximum(apply_fluxes(m, fvi, vi), 0.0)
    vs1 = jnp.maximum(apply_fluxes(m, fvs, vs), 0.0)
    aT1 = apply_fluxes(m, faT, a * T)
    T1 = jnp.where(a1 > cfg.puny, aT1 / jnp.maximum(a1, cfg.puny), T)

    out = state.replace(iceAreaCategory=a1, iceVolumeCategory=vi1,
                        snowVolumeCategory=vs1, surfaceTemperature=T1)
    # enthalpy tracers ride on volume (grandchildren of area)
    if state.iceEnthalpy is not None:
        qi = state.iceEnthalpy
        qs = state.snowEnthalpy
        qiv = qi * vi[..., None]
        qsv = qs * vs[..., None]
        qgx, qgy = cell_gradient(m, qiv, xc, yc)
        (fq,) = edge_flux(m, flux_areas, qx, qy, [qiv], [qgx], [qgy],
                          xc, yc)
        qiv1 = apply_fluxes(m, fq, qiv)
        sgx2, sgy2 = cell_gradient(m, qsv, xc, yc)
        (fqs,) = edge_flux(m, flux_areas, qx, qy, [qsv], [sgx2],
                           [sgy2], xc, yc)
        qsv1 = apply_fluxes(m, fqs, qsv)
        qi1 = jnp.where(vi1[..., None] > cfg.puny,
                        qiv1 / jnp.maximum(vi1[..., None], cfg.puny), qi)
        qs1 = jnp.where(vs1[..., None] > cfg.puny,
                        qsv1 / jnp.maximum(vs1[..., None], cfg.puny), qs)
        out = out.replace(iceEnthalpy=qi1, snowEnthalpy=qs1)
    return out
