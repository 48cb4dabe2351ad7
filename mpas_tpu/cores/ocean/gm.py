"""Gent-McWilliams eddy transport + Redi isoneutral mixing.

ref: src/core_ocean/shared/mpas_ocn_gm.F (ocn_gm_compute_Bolus_velocity —
isoneutral slope from horizontal/vertical density gradients, bolus
streamfunction, slope-clipped 'constant' closure branch) and the Redi
terms of mpas_ocn_tracer_hmix_Redi.F (small-slope approximation).

Implementation notes (TPU redesign):
  * slope S at edge interfaces = -grad_n(rho) / drho/dz, clipped to
    config_max_relative_slope (ref: config_gravWaveDragCoeff... the
    reference clips via config_max_relative_slope);
  * 'constant' closure: streamfunction Psi = kappa_GM * S at interior
    interfaces, tapered to zero at top/bottom (the reference's
    boundary-value-problem closure is a later milestone);
  * bolus normal velocity per layer: u* = -(Psi_top - Psi_bot)/h_edge;
  * Redi: along-isopycnal diffusion splits into the existing horizontal
    del2 (kappa_Redi) plus the vertical enhancement kappa_Redi * S^2
    added to the implicit vertical tracer diffusivity.
"""

from __future__ import annotations

import jax.numpy as jnp


def isoneutral_slope(grid, cfg, rho, h):
    """Slope at edge interior interfaces (nEdges, nz-1), clipped."""
    m = grid.mesh
    c1, c2 = m.cellsOnEdge[:, 0], m.cellsOnEdge[:, 1]
    not_bnd = (1.0 - m.boundaryEdge)[:, None]

    # horizontal density gradient at edge layer midpoints
    drho_n = (rho[c2] - rho[c1]) * m.invDcEdge[:, None] * not_bnd
    drho_n_int = 0.5 * (drho_n[:, :-1] + drho_n[:, 1:])   # (nE, nz-1)

    # vertical density gradient at cell interfaces -> edge interfaces
    h_mid = 0.5 * (h[:, :-1] + h[:, 1:])
    drho_dz_c = (rho[:, :-1] - rho[:, 1:]) / jnp.maximum(h_mid, 1e-3)
    # stable stratification: drho_dz_c < 0 with rho increasing downward:
    # rho[k+1] > rho[k] => (rho[k]-rho[k+1]) < 0. Keep sign; guard tiny.
    drho_dz_e = 0.5 * (drho_dz_c[c1] + drho_dz_c[c2])
    dmin = 1e-8
    drho_dz_e = jnp.where(jnp.abs(drho_dz_e) < dmin,
                          -dmin, jnp.minimum(drho_dz_e, -dmin))

    s = -drho_n_int / drho_dz_e
    smax = cfg.config_max_relative_slope
    return jnp.clip(s, -smax, smax) * not_bnd


def bolus_velocity(grid, cfg, rho, h):
    """GM bolus normal velocity (nEdges, nz) from the constant closure.
    ref: ocn_gm_compute_Bolus_velocity (mpas_ocn_gm.F)."""
    m = grid.mesh
    s = isoneutral_slope(grid, cfg, rho, h)            # (nE, nz-1)
    psi = cfg.config_gm_constant_kappa * s             # interior interfaces
    zero = jnp.zeros_like(psi[:, :1])
    psi_full = jnp.concatenate([zero, psi, zero], axis=1)  # (nE, nz+1)
    c1, c2 = m.cellsOnEdge[:, 0], m.cellsOnEdge[:, 1]
    h_edge = jnp.maximum(0.5 * (h[c1] + h[c2]), 1e-3)
    u_bolus = -(psi_full[:, :-1] - psi_full[:, 1:]) / h_edge
    return u_bolus * (1.0 - m.boundaryEdge)[:, None]


def redi_vertical_enhancement(grid, cfg, rho, h):
    """kappa_Redi * S^2 at cell interior interfaces (nCells, nz-1), added
    to the implicit vertical tracer diffusivity (ref: the 3,3 component of
    the small-slope Redi tensor)."""
    m = grid.mesh
    s = isoneutral_slope(grid, cfg, rho, h)            # (nE, nz-1)
    s2_edge = s * s
    eoc = m.edgesOnCell
    w = (m.edgeSignOnCell != 0).astype(rho.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    s2_cell = jnp.einsum("ce,cek->ck", w, s2_edge[eoc]) / cnt[:, None]
    return cfg.config_redi_kappa * s2_cell
