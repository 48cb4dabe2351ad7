"""z-tilde ALE vertical coordinate: frequency-filtered thickness.

ref: mpas_ocn_thick_ale.F (ocn_ALE_thickness — SSH/z-star part, the
highFreqThickness contribution, and the min/max thickness filter) +
mpas_ocn_tendency.F ocn_tend_freq_filtered_thickness (the Leclair &
Madec 2011 z-tilde prognostics):

  d(lfd)/dt = -2*pi/tau_filter * (lfd - div_hu + div_hu_btr*h/H)
  d(hhf)/dt = -div_hu + div_hu_btr*h/H + lfd - 2*pi/tau_restore * hhf
              + del2 smoothing

lfd = lowFreqDivergence, hhf = highFreqThickness: the high-frequency part
of the layer divergence inflates/deflates layers locally (internal waves
stay adiabatic) while the low-frequency part is carried by the z-star
SSH distribution.  Everything is elementwise over (nCells, nz) plus one
edge-gather del2 — fully jittable, levels in lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_2PI = 6.283185307179586


def hhf_del2(mesh, hhf, coeff):
    """Laplacian smoothing of highFreqThickness (ref:
    ocn_high_freq_thickness_hmix_del2_tend)."""
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    grad = (hhf[c2] - hhf[c1]) / mesh.dcEdge[:, None] \
        * (1.0 - mesh.boundaryEdge)[:, None]
    flux = mesh.dvEdge[:, None] * grad
    return coeff * jnp.sum(
        -mesh.edgeSignOnCell[..., None] * flux[mesh.edgesOnCell], axis=1) \
        * mesh.invAreaCell[:, None]


def freq_filtered_tends(grid, cfg, div_hu, h, lfd, hhf):
    """(tend_lfd, tend_hhf) per ocn_tend_freq_filtered_thickness
    (mpas_ocn_tendency.F:908+).  div_hu: (nCells, nz) layer thickness-flux
    divergence (positive = divergent); h: layer thickness."""
    tau_f = cfg.config_thickness_filter_timescale * 86400.0
    tau_r = cfg.config_highFreqThick_restore_time * 86400.0
    mask = grid.cellMask if grid.cellMask is not None else jnp.ones_like(h)
    h_live = h * mask
    total_h = jnp.sum(h_live, axis=-1, keepdims=True)
    div_btr = jnp.sum(div_hu * mask, axis=-1, keepdims=True)
    # barotropic part of the divergence, distributed by thickness
    div_btr_k = div_btr * h_live / jnp.maximum(total_h, 1e-14)
    tend_lfd = -_2PI / tau_f * (lfd - div_hu + div_btr_k)
    tend_hhf = -div_hu + div_btr_k + lfd
    if cfg.config_use_highFreqThick_restore:
        tend_hhf = tend_hhf - _2PI / tau_r * hhf
    if cfg.config_highFreqThick_del2 > 0.0:
        tend_hhf = tend_hhf + hhf_del2(grid.mesh, hhf,
                                       cfg.config_highFreqThick_del2)
    return tend_lfd * mask, tend_hhf * mask


def ale_tends_ztilde(grid, div_hu, tend_hhf):
    """z-star + z-tilde thickness tendency and the consistent vertical
    transport (ref: ocn_ALE_thickness with newHighFreqThickness +
    ocn_vert_transport_velocity_top).

    dh/dt = -(resting-weighted) total divergence + d(hhf)/dt; continuity
    then gives w_top."""
    total_div = jnp.sum(div_hu, axis=-1, keepdims=True)
    resting = grid.restingThickness
    if grid.cellMask is not None:
        resting = resting * grid.cellMask
    wgt = resting / jnp.sum(resting, axis=-1, keepdims=True)
    tend_h = -wgt * total_div + tend_hhf
    resid = -div_hu - tend_h
    w_rev = jnp.cumsum(resid[..., ::-1], axis=-1)[..., ::-1]
    w_top = jnp.concatenate([w_rev, jnp.zeros_like(w_rev[..., :1])],
                            axis=-1)
    return tend_h, w_top


def min_max_thickness_filter(grid, cfg, h):
    """The reference's two-sweep min/max thickness enforcement
    (mpas_ocn_thick_ale.F:186-214): go DOWN the column clamping each
    layer into [min_thickness, max_factor*resting] and pushing the
    correction remainder to the next layer; then go back UP with the
    leftover; any final remainder lands in the top layer.  Column volume
    is exactly conserved.  lax.scan over the (small, static) level dim."""
    resting = grid.restingThickness
    hmax = cfg.config_max_thickness_factor * resting
    hmin = cfg.config_min_thickness
    mask = grid.cellMask if grid.cellMask is not None else jnp.ones_like(h)

    def sweep(h_seq, hmax_seq, m_seq, rem0):
        """One clamping sweep along axis 0 (levels), starting from the
        carried remainder rem0; returns adjusted thickness + leftover."""
        def body(rem, xs):
            hk, hxk, mk = xs
            new = jnp.clip(hk + rem, hmin, jnp.maximum(hxk, hmin))
            new = jnp.where(mk > 0, new, hk)     # dead levels untouched
            return rem - (new - hk), new
        rem, h_out = lax.scan(body, rem0, (h_seq, hmax_seq, m_seq))
        return h_out, rem

    # down sweep: level 0 -> bottom (axis swap so scan runs over levels)
    hT, hmaxT, mT = h.T, hmax.T, mask.T
    h_dn, rem = sweep(hT, hmaxT, mT, jnp.zeros_like(hT[0]))
    # up sweep: bottom -> top, CARRYING the down sweep's leftover
    h_up_rev, rem2 = sweep(h_dn[::-1], hmaxT[::-1], mT[::-1], rem)
    h_up = h_up_rev[::-1]
    # any final remainder goes to the top live layer (ref :214)
    h_up = h_up.at[0].add(jnp.where(mT[0] > 0, rem2, 0.0))
    return h_up.T
