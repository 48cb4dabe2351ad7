"""Land-ice calving schemes (the full config_calving option set).

ref: src/core_landice/mode_forward/mpas_li_calving.F (1,399 LoC):
li_calve_ice dispatch (:198-276) over 'thickness_threshold' (:582),
'floating' (:822), 'topographic_threshold' (:886), 'eigencalving'
(:966-1158) with calculate_calving_front_mask (:1330) and the
distribute/cleanup passes, plus li_restore_calving_front (:293-544).

TPU-first: every mask pass is a batched neighbor gather over the padded
cellsOnCell table (PAD rows carry a validity mask) instead of the
reference's per-cell loops; the strain-rate principal values come from a
closed-form per-cell least-squares fit of the edge-normal velocities
followed by mesh cell gradients.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.ops.remap import cell_gradient


def _neighbors(mesh):
    """(cellsOnCell, valid) with padded slots masked off."""
    coc = mesh.cellsOnCell
    valid = (jnp.arange(coc.shape[1])[None, :]
             < mesh.nEdgesOnCell[:, None])
    return coc, valid


def cell_masks(grid, cfg, thickness, min_ice=1.0, dynamic_thickness=10.0):
    """ice / floating / dynamic / margin masks (li_mask genre,
    mpas_li_mask.F definitions)."""
    m = grid.mesh
    ice = thickness > min_ice
    floating = (cfg.rho_ice * thickness
                < -cfg.rho_seawater * jnp.minimum(grid.bedTopography, 0.0))
    floating = floating & ice
    dynamic = thickness > dynamic_thickness
    coc, valid = _neighbors(m)
    nbr_no_ice = jnp.any((~ice)[coc] & valid, axis=1)
    margin = ice & nbr_no_ice
    nbr_dynamic = jnp.any(dynamic[coc] & valid, axis=1)
    dyn_margin = dynamic & jnp.any(((~dynamic)[coc]) & valid, axis=1)
    return {"ice": ice, "floating": floating, "dynamic": dynamic,
            "margin": margin, "dynamic_margin": dyn_margin,
            "has_dynamic_neighbor": nbr_dynamic}


def cell_velocity_from_edges(grid, u_edge):
    """Closed-form least-squares (ux, uy) per cell from the edge-normal
    velocities of its edges: argmin sum_e (u_e - n_e . u)^2."""
    m = grid.mesh
    eoc = m.edgesOnCell
    valid = (jnp.arange(eoc.shape[1])[None, :]
             < m.nEdgesOnCell[:, None]).astype(u_edge.dtype)
    ang = m.angleEdge[eoc]
    nx = jnp.cos(ang) * valid
    ny = jnp.sin(ang) * valid
    ue = u_edge[eoc] * valid
    a11 = jnp.sum(nx * nx, 1)
    a12 = jnp.sum(nx * ny, 1)
    a22 = jnp.sum(ny * ny, 1)
    b1 = jnp.sum(nx * ue, 1)
    b2 = jnp.sum(ny * ue, 1)
    det = jnp.maximum(a11 * a22 - a12 ** 2, 1e-12)
    ux = (a22 * b1 - a12 * b2) / det
    uy = (a11 * b2 - a12 * b1) / det
    return ux, uy


def principal_strain_rates(grid, ux, uy):
    """eMax/eMin: eigenvalues of the horizontal strain-rate tensor from
    mesh cell gradients of the cell velocity (the velocityPool eMax/eMin
    the reference's eigencalving consumes)."""
    m = grid.mesh
    duxdx, duxdy = cell_gradient(m, ux, m.xCell, m.yCell)
    duydx, duydy = cell_gradient(m, uy, m.xCell, m.yCell)
    exx = duxdx
    eyy = duydy
    exy = 0.5 * (duxdy + duydx)
    mean = 0.5 * (exx + eyy)
    rad = jnp.sqrt(jnp.maximum(0.25 * (exx - eyy) ** 2 + exy ** 2, 0.0))
    return mean + rad, mean - rad


def calving_front_mask(grid, cfg, thickness, masks, sea_level=0.0):
    """Floating dynamic-margin cells adjacent to open ocean, directly or
    through a thin-ice neighbor (calculate_calving_front_mask,
    mpas_li_calving.F:1330-1394)."""
    m = grid.mesh
    coc, valid = _neighbors(m)
    ocean = (~masks["ice"]) & (grid.bedTopography < sea_level)
    thin_float = masks["floating"] & (~masks["dynamic"])
    # thin-ice cells that themselves touch open ocean
    thin_touches_ocean = thin_float & jnp.any(ocean[coc] & valid, axis=1)
    reach = jnp.any((ocean[coc] | thin_touches_ocean[coc]) & valid,
                    axis=1)
    return masks["floating"] & masks["dynamic_margin"] & reach


def eigencalving(grid, cfg, thickness, u_edge, dt, calving_flux,
                 k_eigen=1.0e17, sea_level=0.0):
    """Eigencalving (mpas_li_calving.F:966-1158): calving velocity
    K * max(0,e1) * max(0,e2) on floating ice; front cells lose volume
    at rate u_c * frontLength * frontHeight; cleanup removes thin front
    cells and floating ice with no dynamic neighbor.

    u_edge: vertically-averaged edge-normal velocity (nEdges,).
    Returns (thickness, calving_flux)."""
    m = grid.mesh
    masks = cell_masks(grid, cfg, thickness)
    ux, uy = cell_velocity_from_edges(grid, u_edge)
    e1, e2 = principal_strain_rates(grid, ux, uy)
    u_calv = k_eigen * jnp.maximum(e1, 0.0) * jnp.maximum(e2, 0.0) \
        * masks["floating"].astype(thickness.dtype)

    front = calving_front_mask(grid, cfg, thickness, masks, sea_level)
    coc, valid = _neighbors(m)
    eoc = m.edgesOnCell
    ocean = (~masks["ice"]) & (grid.bedTopography < sea_level)
    thin_float = masks["floating"] & (~masks["dynamic"])
    open_nbr = (ocean[coc] | thin_float[coc]) & valid
    front_len = jnp.sum(jnp.where(open_nbr, m.dvEdge[eoc], 0.0), axis=1)
    front_hgt = jnp.max(jnp.where(valid, thickness[coc], 0.0), axis=1)
    front_hgt = jnp.maximum(front_hgt, thickness)
    vol_rate = u_calv * front_len * front_hgt              # m^3/s
    calv_thk = jnp.where(front, jnp.minimum(
        vol_rate * dt / m.areaCell, thickness), 0.0)
    h = thickness - calv_thk

    # cleanup 1: front cells thinner than the calving thickness go
    masks2 = cell_masks(grid, cfg, h)
    front2 = calving_front_mask(grid, cfg, h, masks2, sea_level)
    gone = front2 & (h < cfg.config_calving_thickness)
    calv_thk = calv_thk + jnp.where(gone, h, 0.0)
    h = jnp.where(gone, 0.0, h)

    # cleanup 2: floating ice with no dynamic neighbor calves entirely
    masks3 = cell_masks(grid, cfg, h)
    orphan = masks3["floating"] & (~masks3["has_dynamic_neighbor"])
    calv_thk = calv_thk + jnp.where(orphan, h, 0.0)
    h = jnp.where(orphan, 0.0, h)
    return h, calving_flux + calv_thk


def topographic_calving(grid, cfg, thickness, calving_flux,
                        bed_threshold=-500.0):
    """'topographic_threshold' (mpas_li_calving.F:886-949): margin cells
    over bed deeper than the threshold calve."""
    masks = cell_masks(grid, cfg, thickness)
    remove = masks["margin"] & (grid.bedTopography < bed_threshold)
    h = jnp.where(remove, 0.0, thickness)
    return h, calving_flux + (thickness - h)


def restore_calving_front(grid, cfg, thickness, calving_flux,
                          initial_extent_mask):
    """li_restore_calving_front (:293-544): ice advanced beyond the
    initial extent is removed (the front is held fixed)."""
    outside = (~initial_extent_mask) & (thickness > 0.0)
    h = jnp.where(outside, 0.0, thickness)
    return h, calving_flux + (thickness - h)
