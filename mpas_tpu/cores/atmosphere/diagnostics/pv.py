"""Potential-vorticity diagnostics.

ref: src/core_atmosphere/diagnostics/pv_diagnostics.F (1,615 LoC): Ertel PV
on model levels, interpolation of theta/u/v to the dynamic-tropopause
(2-PVU) surface.

Here: the hydrostatic Ertel PV approximation PV = -g (f + zeta) dtheta/dp
(the reference's full 3D form includes the horizontal vorticity tilting
terms; the vertical term dominates at synoptic scale), plus the 2-PVU
interpolation.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity, p0, rgas
from mpas_tpu.ops.stencils import vertex_to_cell_kite


def ertel_pv(grid, mesh, state, diag):
    """PV on model levels at cells, in PVU (1e-6 K m2 kg-1 s-1)."""
    qv = jnp.maximum(state.scalars[..., 0], 0.0) \
        if state.scalars.shape[-1] > 0 else jnp.zeros_like(state.theta_m)
    th = state.theta_m / (1.0 + 1.608 * qv)
    p = p0 * diag.exner ** (cp / rgas)

    # relative vorticity at cells from the edge winds
    vort_v = jnp.sum(mesh.curlW[..., None]
                     * state.u[mesh.edgesOnVertex], axis=1) \
        * mesh.invAreaTriangle[:, None]
    vort = vertex_to_cell_kite(mesh, vort_v)

    # dtheta/dp centered in the column
    dth = th[:, 2:] - th[:, :-2]
    dp = p[:, 2:] - p[:, :-2]
    dthdp_mid = dth / jnp.where(jnp.abs(dp) > 1.0, dp, -1.0)
    dthdp = jnp.concatenate(
        [dthdp_mid[:, :1], dthdp_mid, dthdp_mid[:, -1:]], axis=1)

    f = mesh.fCell[:, None]
    pv = -gravity * (f + vort) * dthdp
    return pv * 1.0e6                       # PVU


def theta_on_pv_surface(pv_pvu, th, target=2.0):
    """theta on the 2-PVU surface, searching upward per column
    (ref: pv_diagnostics.F theta_pv)."""
    above = jnp.abs(pv_pvu) >= target
    nz = pv_pvu.shape[1]
    k = jnp.argmax(above, axis=1)
    found = jnp.any(above, axis=1)
    k = jnp.where(found, jnp.clip(k, 1, nz - 1), nz - 1)
    rows = jnp.arange(pv_pvu.shape[0])
    p1 = jnp.abs(pv_pvu[rows, k - 1])
    p2 = jnp.abs(pv_pvu[rows, k])
    w = jnp.clip((target - p1) / jnp.where(jnp.abs(p2 - p1) > 1e-9,
                                           p2 - p1, 1e-9), 0.0, 1.0)
    th_pv = (1.0 - w) * th[rows, k - 1] + w * th[rows, k]
    return jnp.where(found, th_pv, jnp.nan)
