"""Land-ice incremental-remapping advection + vertex velocity recovery.

ref capability: src/core_landice/mode_forward/mpas_li_advection.F
(`config_thickness_advection = 'incremental_remapping'` branch, which
calls the shared seaice IR machinery) — here the shared machinery lives
in mpas_tpu/ops/remap.py. Thickness is the parent field; temperature (or
enthalpy) layers ride on it as products, exactly the reference's tracer
hierarchy for land ice.

Vertex velocities for the departure trajectories are recovered from the
depth-averaged edge normal velocities by a per-vertex least-squares fit
over edgesOnVertex (3 normals per Voronoi vertex -> overdetermined 2x2
normal equations; exact for linear velocity fields).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.ops.remap import (apply_fluxes, cell_gradient,
                                departure_triangles, product_flux,
                                edge_flux)


def vertex_velocity_from_edges(mesh, u_edge):
    """Least-squares (u, v) at vertices from edge normal components.

    Solves min sum_e (n_e . v - u_e)^2 over the (<= vertexDegree) edges
    of each vertex. ref capability: the IR driver's vertex velocity
    interpolation (mpas_seaice_velocity_solver interpolation genre).
    """
    eov = mesh.edgesOnVertex                      # (nV, deg)
    valid = (mesh.edgeSignOnVertex != 0).astype(u_edge.dtype)
    ne = jnp.cos(mesh.angleEdge)[eov] * valid
    nn = jnp.sin(mesh.angleEdge)[eov] * valid
    ue = u_edge[eov] * valid
    # normal equations: [[sum ne^2, sum ne nn],[.., sum nn^2]] [u v]^T
    a11 = jnp.sum(ne * ne, axis=1) + 1e-12
    a12 = jnp.sum(ne * nn, axis=1)
    a22 = jnp.sum(nn * nn, axis=1) + 1e-12
    b1 = jnp.sum(ne * ue, axis=1)
    b2 = jnp.sum(nn * ue, axis=1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-10, 1e-10, det)
    u_v = (a22 * b1 - a12 * b2) / det
    v_v = (a11 * b2 - a12 * b1) / det
    return u_v, v_v


def advect_thickness_ir(grid, cfg, thickness, temperature, u_int, dt):
    """IR transport of thickness + per-layer temperature hierarchy.

    u_int: (nEdges, nz+1) interface normal velocities from the velocity
    solver (SIA or external FO). Returns (thickness, temperature).
    """
    m = grid.mesh
    u_layer = 0.5 * (u_int[:, :-1] + u_int[:, 1:])
    ubar = jnp.sum(u_layer * grid.layerSigmaFraction[None, :], axis=1)
    ubar = jnp.where(m.boundaryEdge > 0, 0.0, ubar)

    u_v, v_v = vertex_velocity_from_edges(m, ubar)
    flux_areas, qx, qy = departure_triangles(m, u_v, v_v, dt)

    xc, yc = m.xCell, m.yCell
    hgx, hgy = cell_gradient(m, thickness, xc, yc)
    (fh,) = edge_flux(m, flux_areas, qx, qy, [thickness], [hgx], [hgy],
                      xc, yc)
    h1 = jnp.maximum(apply_fluxes(m, fh, thickness), 0.0)

    # temperature layers ride on thickness (parent*child product flux)
    tgx, tgy = cell_gradient(m, temperature, xc, yc)
    fTh = product_flux(m, flux_areas, qx, qy, thickness, hgx, hgy,
                       temperature, tgx, tgy, xc, yc)
    hT1 = apply_fluxes(m, fTh, thickness[:, None] * temperature)
    t1 = jnp.where(h1[:, None] > 1e-6,
                   hT1 / jnp.maximum(h1[:, None], 1e-6), temperature)
    return h1, t1
