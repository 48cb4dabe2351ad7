"""Mechanical redistribution (ridging) of the ice thickness distribution.

ref: src/core_seaice/column/ice_mechred.F90 —
  ridge_ice  (:80)   iteration until the total area constraint is met
  ridge_prep (:637)  closing/opening rates
  ridge_itd  (:738)  participation function + ridge-thickness distribution
  ridge_shift(:1027) conservative transfer between categories

This implements the exponential participation function (krdg_partic=1,
apartic_n = [exp(-G_{n-1}/a*) - exp(-G_n/a*)] / [1 - exp(-1/a*)], ref
:851-870) and the exponential redistribution (krdg_redist=1: ridged ice
from thickness hi spreads as g(h) ~ exp(-(h-hrmin)/hrexp) with
hrmin = min(2 hi, hi + maxraft), hrexp = mu_rdg sqrt(hi), so the mean
ridge thickness multiplier is krdg = (hrmin + hrexp)/hi, ref :900-930).
The category placement integrals of ridge_shift become closed-form
exponential bin integrals, batched over cells with categories in lanes.

Ice volume and ice enthalpy are conserved exactly; area shrinks by
closing; a fraction (1 - fsnowrdg) of the ridged snow volume is lost to
the ocean (ref: fsnowrdg in ridge_shift).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ASTAR = 0.05        # e-folding of the participation function (ref astari)
MU_RDG = 3.0        # sqrt(m) e-folding scale of ridged ice (ref mu_rdg)
MAXRAFT = 1.0       # m, maximum thickness of rafted ice
FSNOWRDG = 0.5      # snow fraction that survives ridging
N_ITER = 3          # ridge_ice convergence iterations (ref niterate)


def _participation(a_cat, a_open, puny):
    """Exponential participation function (ref ridge_itd :851-870).
    Returns (apartic0, apartic (nC, ncat))."""
    asum = a_open[:, None] + jnp.cumsum(a_cat, axis=-1)   # G at cat tops
    total = asum[:, -1:]
    g0 = a_open[:, None] / jnp.maximum(total, puny)
    g = asum / jnp.maximum(total, puny)
    norm = 1.0 / (1.0 - jnp.exp(-1.0 / ASTAR))
    e = lambda x: jnp.exp(-x / ASTAR) * norm
    apartic0 = (e(jnp.zeros_like(g0)) - e(g0))[:, 0]
    gprev = jnp.concatenate([g0, g[:, :-1]], axis=-1)
    apartic = e(gprev) - e(g)
    return apartic0, apartic


def _ridge_thickness_params(a_cat, v_cat, puny):
    """(hrmin, hrexp, krdg) per category (ref ridge_itd :900-930)."""
    hi = jnp.where(a_cat > puny, v_cat / jnp.maximum(a_cat, puny), puny)
    hi = jnp.maximum(hi, puny)
    hrmin = jnp.minimum(2.0 * hi, hi + MAXRAFT)
    hrexp = MU_RDG * jnp.sqrt(hi)
    krdg = (hrmin + hrexp) / hi
    return hrmin, hrexp, jnp.maximum(krdg, 1.0 + puny)


def _placement_fractions(hrmin, hrexp, bounds):
    """Exponential-bin integrals of ridge_shift: fraction of ridged AREA
    and VOLUME from each source category landing in each destination
    category. bounds: (ncat+1,) category edges, last = +inf.

    g(h) = exp(-(h - hrmin)/hrexp)/hrexp on [hrmin, inf):
      area cdf tail  E(x) = exp(-(max(x,hrmin)-hrmin)/hrexp)
      volume tail    V(x) = (max(x,hrmin)+hrexp) E(x) / (hrmin+hrexp)
    """
    lo = bounds[:-1]
    hi = bounds[1:]
    x_lo = jnp.maximum(lo[None, None, :], hrmin[..., None])   # (nC,ncat,ncat)
    x_hi = jnp.maximum(hi[None, None, :], hrmin[..., None])
    lam = hrexp[..., None]
    hm = hrmin[..., None]
    E = lambda x: jnp.exp(-(x - hm) / lam)
    V = lambda x: (x + lam) * E(x) / (hm + lam)
    e_hi = jnp.where(jnp.isinf(hi)[None, None, :], 0.0, E(x_hi))
    v_hi = jnp.where(jnp.isinf(hi)[None, None, :], 0.0, V(x_hi))
    f_area = E(x_lo) - e_hi
    f_vol = V(x_lo) - v_hi
    # numerical safety: renormalize to exactly 1 over destinations
    f_area = f_area / jnp.maximum(jnp.sum(f_area, -1, keepdims=True), 1e-12)
    f_vol = f_vol / jnp.maximum(jnp.sum(f_vol, -1, keepdims=True), 1e-12)
    return f_area, f_vol


def ridge_step(cfg, a_cat, v_cat, vs_cat, ts_cat, dt,
               q_ice=None, q_snow=None, closing_rate=None):
    """One ridging adjustment (ref ridge_ice :80-594).

    closing_rate: optional dynamics-supplied net closing (1/s, >= 0,
    ref ridge_prep from divergence/shear). Independently, any total-area
    excess over 1 is closed within the call. Returns the updated
    (a_cat, v_cat, vs_cat, ts_cat, q_ice, q_snow, a_open).
    """
    puny = cfg.puny
    ncat = a_cat.shape[-1]
    bounds = jnp.asarray(cfg.config_itd_bounds)[:ncat + 1]
    bounds = jnp.concatenate([bounds[:-1], jnp.asarray([jnp.inf])])

    extra = jnp.zeros(a_cat.shape[0], a_cat.dtype) if closing_rate is None \
        else jnp.maximum(closing_rate, 0.0)

    def one_iter(carry, _):
        a, v, vs, ts, qi, qs, ex = carry
        asum = jnp.sum(a, axis=-1)
        a_open = jnp.clip(1.0 - asum, 0.0, 1.0)
        # net closing needed: area excess + dynamics closing (ref
        # ridge_prep :690-710 asum correction)
        closing_net = jnp.maximum(asum - 1.0, 0.0) / dt + ex
        apartic0, apartic = _participation(a, a_open, puny)
        hrmin, hrexp, krdg = _ridge_thickness_params(a, v, puny)
        aksum = apartic0 + jnp.sum(apartic * (1.0 - 1.0 / krdg), axis=-1)
        closing_gross = closing_net / jnp.maximum(aksum, puny)
        # cap so no category loses more than 90% of its area per pass
        # (ref ridge_ice reduces closing_gross on overshoot)
        ara_want = apartic * (closing_gross * dt)[:, None]
        cap = jnp.min(jnp.where(apartic > puny,
                                0.9 * a / jnp.maximum(ara_want, puny),
                                jnp.inf), axis=-1)
        scale = jnp.minimum(cap, 1.0)
        ara = ara_want * scale[:, None]
        ara = jnp.where(a > puny, jnp.minimum(ara, a), 0.0)

        frac = jnp.where(a > puny, ara / jnp.maximum(a, puny), 0.0)
        vrdg = v * frac                    # ice volume ridged (conserved)
        vsr = vs * frac                    # snow volume ridged
        ard = ara / krdg                   # post-ridging area

        f_area, f_vol = _placement_fractions(hrmin, hrexp, bounds)
        add_a = jnp.einsum("cn,cnm->cm", ard, f_area)
        add_v = jnp.einsum("cn,cnm->cm", vrdg, f_vol)
        add_vs = jnp.einsum("cn,cnm->cm", vsr * FSNOWRDG, f_area)

        a2 = a - ara + add_a
        v2 = v - vrdg + add_v
        vs2 = vs - vsr + add_vs
        # surface temperature rides on area
        aT = a * ts - ara * ts + jnp.einsum("cn,cnm->cm", ard * ts, f_area)
        ts2 = jnp.where(a2 > puny, aT / jnp.maximum(a2, puny), ts)
        out = [a2, v2, vs2, ts2]
        # layer enthalpies ride on their carrier volume's placement:
        # ice enthalpy with the ridged-ice volume fractions, snow enthalpy
        # with the (area-placed) surviving snow volume
        for q, vol, vol2, moved_out, kept, f_place in (
                (qi, v, v2, vrdg, 1.0, f_vol),
                (qs, vs, vs2, vsr, FSNOWRDG, f_area)):
            if q is None:
                out.append(None)
                continue
            qv = q * vol[..., None]
            qmoved = jnp.where(vol[..., None] > puny,
                               q * moved_out[..., None], 0.0)
            # `kept` of the moved enthalpy arrives; the rest leaves with
            # the snow volume lost to the ocean
            qadd = jnp.einsum("cnl,cnm->cml", qmoved * kept, f_place)
            qv2 = qv - qmoved + qadd
            out.append(jnp.where(vol2[..., None] > puny,
                                 qv2 / jnp.maximum(vol2[..., None], puny),
                                 q))
        # dynamics closing only acts on the first pass
        return tuple(out) + (jnp.zeros_like(ex),), None

    carry = (a_cat, v_cat, vs_cat, ts_cat, q_ice, q_snow, extra)
    for _ in range(N_ITER):        # static unroll (ref niterate loop)
        carry, _ = one_iter(carry, None)
    a, v, vs, ts, qi, qs, _ = carry
    a_open = jnp.clip(1.0 - jnp.sum(a, axis=-1), 0.0, 1.0)
    return a, v, vs, ts, qi, qs, a_open
