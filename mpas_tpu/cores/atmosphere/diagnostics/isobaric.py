"""Isobaric diagnostics: interpolate model-level fields to pressure levels.

ref: src/core_atmosphere/diagnostics/isobaric_diagnostics.F (1,247 LoC):
temperature/height/wind/RH at the standard isobaric levels, plus mean
sea-level pressure (the reference's surface-pressure extrapolation).

TPU redesign: log-pressure linear interpolation as a fully vectorized
masked gather (searchsorted per column expressed as a sum of comparisons).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import cp, gravity, p0, rgas

# standard levels (Pa), ref: isobaric_diagnostics.F level list
ISOBARIC_LEVELS = (92500.0, 85000.0, 70000.0, 50000.0, 30000.0,
                   25000.0, 20000.0, 10000.0)


def interp_to_pressure(p_col, f_col, levels):
    """Interpolate f(p) to target levels in log-p.

    p_col: (nCells, nz) decreasing with k (k=0 near surface);
    f_col: (nCells, nz); levels: (nL,). Returns (nCells, nL), NaN where a
    level is below the surface / above the top (the reference marks these
    with special values)."""
    lp = jnp.log(p_col)                       # decreasing in k
    lt = jnp.log(jnp.asarray(levels))         # (nL,)
    nz = p_col.shape[1]
    # index of the first model level with p < target (above the target)
    above = (lp[:, None, :] < lt[None, :, None])       # (nC, nL, nz)
    k_up = jnp.argmax(above, axis=-1)                  # first True
    has_up = jnp.any(above, axis=-1)
    k_up = jnp.clip(k_up, 1, nz - 1)
    k_dn = k_up - 1
    rows = jnp.arange(p_col.shape[0])[:, None]
    lp_dn = lp[rows, k_dn]
    lp_up = lp[rows, k_up]
    w = (lt[None, :] - lp_dn) / jnp.where(
        jnp.abs(lp_up - lp_dn) > 1e-12, lp_up - lp_dn, 1e-12)
    w = jnp.clip(w, 0.0, 1.0)
    f = (1.0 - w) * f_col[rows, k_dn] + w * f_col[rows, k_up]
    below_sfc = lt[None, :] > lp[:, :1]
    valid = has_up & ~below_sfc
    return jnp.where(valid, f, jnp.nan)


def mslp(p_sfc, t_sfc, z_sfc):
    """Mean sea-level pressure by the standard-lapse reduction
    (ref: isobaric_diagnostics.F mslp computation)."""
    lapse = 0.0065
    t0 = t_sfc + lapse * z_sfc          # extrapolated sea-level temperature
    return p_sfc * (t0 / t_sfc) ** (gravity / (rgas * lapse))


def compute_isobaric(grid, state, diag, levels=ISOBARIC_LEVELS):
    """Returns dict of isobaric fields + mslp."""
    qv = jnp.maximum(state.scalars[..., 0], 0.0) \
        if state.scalars.shape[-1] > 0 else 0.0
    th = state.theta_m / (1.0 + 1.608 * qv) \
        if state.scalars.shape[-1] > 0 else state.theta_m
    t = th * diag.exner
    p = p0 * diag.exner ** (cp / rgas)
    z_mid = 0.5 * (grid.zgrid[:, 1:] + grid.zgrid[:, :-1])

    out = {
        "temperature_isobaric": interp_to_pressure(p, t, levels),
        "height_isobaric": interp_to_pressure(p, z_mid, levels),
        "theta_isobaric": interp_to_pressure(p, th, levels),
        "mslp": mslp(p[:, 0], t[:, 0], z_mid[:, 0]),
        "levels": jnp.asarray(levels),
    }
    return out
