"""Linear-remapping ice-thickness-distribution transport (Lipscomb 2001).

ref capability: src/core_seaice/column/ice_itd.F90 (linear_itd /
fit_line / shift_ice genre).  After vertical thermodynamics changes each
category's mean thickness, the thickness distribution g(h) is advected in
thickness space: category boundaries are displaced with the ice, a linear
g(h) is fit inside each category from its area and mean thickness, and the
area/volume lying beyond the ORIGINAL boundaries is transferred to the
adjacent category.  Transfers are adjacent-only, so the whole remap is a
pair of vectorized boundary sweeps — no per-column loops, fully jittable,
category dimension in lanes.

Tracers ride along: area-type tracers (surface temperature, pond area,
level-ice area, age) move in proportion to the transferred area; ice-volume
type tracers (enthalpy) in proportion to the transferred volume; snow
volume moves with the area fraction, as the reference does (ice_itd.F90
shift_ice moves vsnon/esnon by donor area fraction).
"""

from __future__ import annotations

import jax.numpy as jnp


def _displaced_boundaries(hb, h_old, h_new, a, puny):
    """New positions of the interior category boundaries.

    ref: ice_itd.F90 linear_itd — boundary n moves by dh interpolated
    between the thickness changes of categories n and n+1, weighted by
    each category's distance from the boundary; an empty neighbor
    contributes its partner's dh.
    hb: (nB,) interior bounds; h_old/h_new/a: (nC, nCat)."""
    dh = h_new - h_old                       # (nC, nCat)
    dh_lo, dh_hi = dh[:, :-1], dh[:, 1:]     # cats n, n+1 per boundary
    h_lo, h_hi = h_old[:, :-1], h_old[:, 1:]
    a_lo, a_hi = a[:, :-1], a[:, 1:]
    has_lo = a_lo > puny
    has_hi = a_hi > puny
    # inverse-distance interpolation of dh to the boundary position
    w_lo = jnp.where(has_lo, jnp.maximum(hb[None, :] - h_lo, 0.0), 0.0)
    w_hi = jnp.where(has_hi, jnp.maximum(h_hi - hb[None, :], 0.0), 0.0)
    denom = w_lo + w_hi
    both = has_lo & has_hi
    dhb = jnp.where(
        both, (w_hi * dh_lo + w_lo * dh_hi) / jnp.maximum(denom, puny),
        jnp.where(has_lo, dh_lo, jnp.where(has_hi, dh_hi, 0.0)))
    return hb[None, :] + dhb                 # (nC, nB)


def _fit_line(a, h, hl, hr, puny):
    """Linear g(eta) = g0 + g1*eta on [0, hr-hl] with integral a and mean
    thickness h, clipped so g >= 0 (ref: ice_itd.F90 fit_line).
    Returns (g0, g1, etamax)."""
    w = jnp.maximum(hr - hl, puny)
    eta_bar = jnp.clip((h - hl) / w, 0.0, 1.0)   # normalized mean
    # unclipped fit on [0,1]: g0 = a(4 - 6 etabar), g1 = a(12 etabar - 6)
    # clip: if etabar < 1/3 the support shrinks to [0, 3 etabar];
    #        if etabar > 2/3 it shrinks to [3 etabar - 2, 1]
    lo = jnp.where(eta_bar < 1.0 / 3.0, 0.0,
                   jnp.where(eta_bar > 2.0 / 3.0, 3.0 * eta_bar - 2.0, 0.0))
    hi = jnp.where(eta_bar < 1.0 / 3.0, 3.0 * eta_bar,
                   jnp.where(eta_bar > 2.0 / 3.0, 1.0, 1.0))
    span = jnp.maximum(hi - lo, puny)
    ebar_loc = (eta_bar - lo) / span             # in [1/3, 2/3]
    g0 = a / span * (4.0 - 6.0 * ebar_loc)
    g1 = a / span ** 2 * (12.0 * ebar_loc - 6.0)
    return g0, g1, lo * w, hi * w, w


def linear_remap(cfg, a, vi, vs, ts, q_ice=None, q_snow=None,
                 area_tracers=(), vol_tracers=()):
    """One linear-remapping sweep of the ITD (ref ice_itd.F90 linear_itd).

    a, vi, vs, ts: (nCells, nCat).  h_old is reconstructed by assuming the
    pre-thermo ice sat at the category midpoints when the current mean has
    left its bin (the column driver calls this right after thermodynamics,
    so h_new - h_old is the thermodynamic growth/melt).
    Returns updated (a, vi, vs, ts, q_ice, q_snow, area_tracers,
    vol_tracers)."""
    puny = cfg.puny
    bounds = jnp.asarray(cfg.config_itd_bounds)
    hb = bounds[1:-1]                         # (nB,) interior boundaries
    n_cat = a.shape[-1]

    has = a > puny
    h_new = jnp.where(has, vi / jnp.maximum(a, puny), 0.0)
    # pre-displacement thickness: current mean clipped into its own bin
    h_old = jnp.clip(h_new, bounds[:-1][None, :] + puny,
                     jnp.minimum(bounds[1:][None, :],
                                 bounds[:-1][None, :] + 1.0e4) - puny)
    h_old = jnp.where(has, h_old, 0.0)

    hb_new = _displaced_boundaries(hb, h_old, h_new, a, puny)  # (nC, nB)
    # keep displaced boundaries inside the union of the two bins
    hb_new = jnp.clip(hb_new, bounds[:-2][None, :] + puny,
                      jnp.minimum(bounds[2:][None, :], 1.0e4) - puny)

    # fit g(h) in each category on its displaced support
    left = jnp.concatenate(
        [jnp.zeros_like(hb_new[:, :1]), hb_new], axis=1)      # (nC, nCat)
    right = jnp.concatenate(
        [hb_new, jnp.full_like(hb_new[:, :1], 1.0e4)], axis=1)
    g0, g1, elo, ehi, w = _fit_line(a, h_new, left, right, puny)

    def seg_int(g0, g1, e0, e1, hl):
        """(area, volume) of the fitted g over eta in [e0, e1]."""
        e0 = jnp.clip(e0, 0.0, None)
        e1 = jnp.maximum(e1, e0)
        da = g0 * (e1 - e0) + 0.5 * g1 * (e1 ** 2 - e0 ** 2)
        dm1 = 0.5 * g0 * (e1 ** 2 - e0 ** 2) \
            + g1 * (e1 ** 3 - e0 ** 3) / 3.0
        dv = hl * da + dm1                     # h = hl + eta
        return jnp.maximum(da, 0.0), jnp.maximum(dv, 0.0)

    # transfer UP across boundary n (cat n -> n+1): part of cat n above H_n
    up_e0 = jnp.maximum(hb[None, :] - left[:, :-1], elo[:, :-1])
    da_up, dv_up = seg_int(g0[:, :-1], g1[:, :-1],
                           up_e0, ehi[:, :-1], left[:, :-1])
    moved_up = hb_new > hb[None, :]            # boundary moved upward
    da_up = jnp.where(moved_up, da_up, 0.0)
    dv_up = jnp.where(moved_up, dv_up, 0.0)
    # transfer DOWN across boundary n (cat n+1 -> n): part of n+1 below H_n
    dn_e1 = jnp.minimum(hb[None, :] - left[:, 1:], ehi[:, 1:])
    da_dn, dv_dn = seg_int(g0[:, 1:], g1[:, 1:],
                           elo[:, 1:], dn_e1, left[:, 1:])
    da_dn = jnp.where(~moved_up, da_dn, 0.0)
    dv_dn = jnp.where(~moved_up, dv_dn, 0.0)

    # cap transfers at the donor's content
    f_up = jnp.minimum(jnp.where(a[:, :-1] > puny,
                                 da_up / jnp.maximum(a[:, :-1], puny),
                                 0.0), 0.9)
    fv_up = jnp.minimum(jnp.where(vi[:, :-1] > puny,
                                  dv_up / jnp.maximum(vi[:, :-1], puny),
                                  0.0), 0.9)
    f_dn = jnp.minimum(jnp.where(a[:, 1:] > puny,
                                 da_dn / jnp.maximum(a[:, 1:], puny),
                                 0.0), 0.9)
    fv_dn = jnp.minimum(jnp.where(vi[:, 1:] > puny,
                                  dv_dn / jnp.maximum(vi[:, 1:], puny),
                                  0.0), 0.9)

    def pad_up(x):   # (nC, nB) -> contribution indexed by donor cat 0..n-2
        return jnp.concatenate([x, jnp.zeros_like(x[:, :1])], axis=1)

    def pad_dn(x):   # donor cats 1..n-1
        return jnp.concatenate([jnp.zeros_like(x[:, :1]), x], axis=1)

    def shift(x, f_area_up, f_area_dn):
        """Move fraction f of each donor category to its neighbor."""
        out_up = x * pad_up(f_area_up)         # leaves cat k upward
        out_dn = x * pad_dn(f_area_dn)         # leaves cat k downward
        gain_up = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), out_up[:, :-1]], axis=1)
        gain_dn = jnp.concatenate(
            [out_dn[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
        return x - out_up - out_dn + gain_up + gain_dn

    a2 = shift(a, f_up, f_dn)
    vi2 = shift(vi, fv_up, fv_dn)
    vs2 = shift(vs, f_up, f_dn)                # snow rides on area fraction

    def shift_conserved(t, parent, parent2, fu, fd):
        tp = shift(t * parent, fu, fd)
        return jnp.where(parent2 > puny, tp / jnp.maximum(parent2, puny), t)

    ts2 = shift_conserved(ts, a, a2, f_up, f_dn)
    q_ice2 = q_snow2 = None
    if q_ice is not None:
        q_ice2 = shift_conserved(q_ice, vi[..., None], vi2[..., None],
                                 fv_up[..., None], fv_dn[..., None])
    if q_snow is not None:
        q_snow2 = shift_conserved(q_snow, vs[..., None], vs2[..., None],
                                  f_up[..., None], f_dn[..., None])
    at2 = tuple(shift_conserved(t, a, a2, f_up, f_dn) for t in area_tracers)
    vt2 = tuple(shift_conserved(t, vi, vi2, fv_up, fv_dn)
                for t in vol_tracers)
    return a2, vi2, vs2, ts2, q_ice2, q_snow2, at2, vt2
