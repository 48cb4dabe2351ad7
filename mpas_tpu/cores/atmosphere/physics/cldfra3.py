"""Thompson-companion cloud fraction (cal_cldfra3) for the radiation path.

ref: src/core_atmosphere/physics/physics_wrf/module_mp_thompson_cldfra3.F
  cal_cldfra3      (:44)  RH-based fraction with mixed-phase blending and
                          grid-size-dependent RH_00 thresholds
  find_cloudLayers (:191) tropopause / stable-surface-layer trimming and
                          per-cloud-deck hydrometeor seeding
  adjust_cloudIce  (:384) / adjust_cloudH2O (:429) deck seeding
  adjust_cloudFinal(:476) column LWP/IWP cap at 1 kg m^-2

TPU redesign: the reference's per-column while-loops over cloud decks
become vectorized run detection — decks are contiguous runs of
cfr >= 0.01 labelled by a cumulative-sum of run starts, with per-deck
totals (thickness, existing water path, base/top indices) computed by
segment reductions over (column, run) ids. No per-column Python control
flow; fully jittable at static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpas_tpu.cores.atmosphere.physics.wsm6 import _qsat_ice, _qsat_liq

_ENTR = 0.5           # entrainment fraction (ref :147 entrmnt)
_CF_MIN = 0.01        # deck membership threshold (ref :283)


def _std_height(p):
    """Standard-atmosphere height used for deck geometry (ref :225)."""
    return 44307.692 * (1.0 - (p / 101325.0) ** 0.190)


def _deck_ids(cloudy):
    """Label contiguous cloudy runs per column: returns (seg_id, valid)
    where seg_id is a global segment index (col * nz + run_index)."""
    nc, nz = cloudy.shape
    prev = jnp.concatenate([jnp.zeros_like(cloudy[:, :1]), cloudy[:, :-1]],
                           axis=1)
    start = cloudy & (~prev)
    run_idx = jnp.cumsum(start.astype(jnp.int32), axis=1) - 1
    run_idx = jnp.clip(run_idx, 0, nz - 1)
    col = jnp.arange(nc)[:, None]
    seg = col * nz + run_idx
    return jnp.where(cloudy, seg, nc * nz), cloudy   # invalid -> overflow bin


def _seg(vals, seg, nseg, op="sum"):
    fns = {"sum": jax.ops.segment_sum,
           "min": jax.ops.segment_min,
           "max": jax.ops.segment_max}
    return fns[op](vals.reshape(-1), seg.reshape(-1), num_segments=nseg + 1)


def _seed_decks(cfr, q_main, q_extra, qvs, t, rho, dz, region,
                t_floor, t_ceil, ice: bool):
    """Per-deck hydrometeor seeding (ref adjust_cloudIce/adjust_cloudH2O).

    region: (nC, nz) bool mask of levels eligible for this pass.
    Returns updated q_main."""
    nc, nz = cfr.shape
    nseg = nc * nz
    cloudy = region & (cfr >= _CF_MIN)
    seg, valid = _deck_ids(cloudy)
    karr = jnp.broadcast_to(jnp.arange(nz)[None, :], (nc, nz))

    tdz = _seg(jnp.where(valid, dz, 0.0), seg, nseg)[seg]
    k1 = _seg(jnp.where(valid, karr, nz), seg, nseg, "min")[seg]
    k2 = _seg(jnp.where(valid, karr, -1), seg, nseg, "max")[seg]
    wpath = q_main + q_extra
    wp_exists = _seg(jnp.where(valid, wpath * rho * dz, 0.0), seg,
                     nseg)[seg]

    rows = jnp.arange(nc)[:, None]
    k1c = jnp.clip(k1, 0, nz - 1)
    k2c = jnp.clip(k2, 0, nz - 1)
    # max water content from the qvs drop across the deck (ref :399)
    qvs_k1 = qvs[rows, k1c]
    qvs_k2m = qvs[rows, jnp.maximum(k2c - 1, 0)]
    max_wc = jnp.abs(qvs_k2m - qvs_k1)

    # cumulative deck thickness to level k with the half-bottom-layer
    # rule (ref :404-410): 0.5 dz(k1) + sum_{k1<j<=k} dz(j)
    cum = jnp.cumsum(jnp.where(valid, dz, 0.0), axis=1)
    cum_k1 = cum[rows, k1c]
    this_dz = cum - cum_k1 + 0.5 * dz[rows, k1c]
    wc = jnp.maximum(1e-6, max_wc * this_dz / jnp.maximum(tdz, 1e-3)
                     * (1.0 - _ENTR))

    multi = (k2 - k1 + 1) >= 2
    ok_t = (t >= t_floor) & (t < t_ceil)
    partly = valid & multi & (cfr > _CF_MIN) & (cfr < 0.99) & ok_t \
        & (wp_exists <= 1.0)
    full = valid & multi & (cfr >= 0.99) & (q_main < 1e-5) & ok_t \
        & (wp_exists <= 1.0)
    if ice:
        add = jnp.where(partly, 0.1 * cfr * wc,
                        jnp.where(full, 0.01 * wc, 0.0))
    else:
        add = jnp.where(partly, cfr * cfr * wc,
                        jnp.where(full, 0.1 * wc, 0.0))
    # single-level decks get the minimal seeding (ref :300-302, :333-335)
    single = valid & (~multi) & (cfr > 0.0) & (q_main < 1e-6)
    add = add + jnp.where(single, 1e-5 * cfr, 0.0)
    return q_main + add


def cal_cldfra3(qv, qc, qi, qs, p, t, rho, dz, xland, gridkm):
    """Cloud fraction + radiation-visible hydrometeor seeding.

    All 3D fields (nC, nz), k=0 lowest; xland (nC,) 1=land 2=water;
    gridkm (nC,) grid length in km. Returns (cldfra, qc_out, qi_out)
    (ref cal_cldfra3 in/out contract; qs is read-only here)."""
    # --- RH-based fraction (ref :151-186) --------------------------------
    rh_00l = 0.781 + jnp.sqrt(1.0 / (35.0 + gridkm ** 3 * 0.5))
    rh_00o = 0.831 + jnp.sqrt(1.0 / (70.0 + gridkm ** 3 * 0.5))
    tc = t - 273.16
    qvsw = _qsat_liq(t, p)
    qvsi = _qsat_ice(t, p)
    blend = jnp.clip((-12.0 - tc) / 8.0, 0.0, 1.0)
    qvsat = jnp.where(tc >= -12.0, qvsw,
                      jnp.where(tc < -20.0, qvsi,
                                qvsw - (qvsw - qvsi) * blend))
    rhum = jnp.clip(qv / jnp.maximum(qvsat, 1e-12), 0.01, 0.9999)
    rh_00 = jnp.where(xland > 1.5, rh_00o, rh_00l)[:, None]

    warm = jnp.maximum(
        0.0, 1.0 - jnp.sqrt(jnp.maximum(
            (1.0 - jnp.minimum(rhum, 0.999)) / (1.0 - rh_00), 0.0)))
    rhum_i = jnp.clip(qv / jnp.maximum(qvsat, 1e-12), 0.01,
                      qvsw / jnp.maximum(qvsi, 1e-12) - 1e-6)
    rhi_max = jnp.maximum(rhum_i + 1e-6, qvsw / jnp.maximum(qvsi, 1e-12))
    cold = jnp.maximum(
        0.0, 1.0 - jnp.sqrt(jnp.maximum(
            (rhi_max - rhum_i) / (rhi_max - rh_00o[:, None]), 0.0)))
    cold = jnp.where((tc < -12.0) & (tc > -70.0)
                     & (rhum_i > rh_00o[:, None]), cold, 0.0)
    cfr = jnp.minimum(0.90, jnp.where(tc >= -12.0, warm, cold))
    already = (qc > 1e-6) | (qi >= 1e-7) | (qs > 1e-5)
    cfr = jnp.where(already, 1.0, cfr)
    qvsat = jnp.where(already, qv, qvsat)

    # --- tropopause via weak theta lapse (ref :232-245) ------------------
    nc, nz = t.shape
    theta = t * (1.0e5 / p) ** (287.05 / 1004.0)
    ht = _std_height(p)
    lapse = jnp.zeros_like(t)
    lapse = lapse.at[:, :-2].set(
        (theta[:, 2:] - theta[:, :-2])
        / jnp.maximum(ht[:, 2:] - ht[:, :-2], 1.0))
    weak = (lapse < 10.0 / 1500.0) & (ht < 19000.0) & (ht > 4000.0)
    weak = weak.at[:, nz - 2:].set(False)
    karr = jnp.arange(nz)[None, :]
    kfound = jnp.max(jnp.where(weak, karr, 0), axis=1)   # highest weak k
    k_tropo = jnp.maximum(2, kfound + 2)

    # freezing-region indices (ref :219-222): highest k with T > -40/-12 C
    k_m40 = jnp.maximum(jnp.max(jnp.where(tc > -40.0, karr, 0), 1), 0)
    k_m12 = jnp.maximum(jnp.max(jnp.where(tc > -12.0, karr, 0), 1), 0)

    # clear partly-cloudy fractions above the tropopause (ref :249-253)
    partly = (cfr > 0.0) & (cfr < 0.999)
    cfr = jnp.where((karr > k_tropo[:, None]) & partly, 0.0, cfr)

    # stable surface layer kbot (ref :257-264): first k (from 2) where
    # theta jump exceeds 0.05e-3 * dz
    dtheta = jnp.zeros_like(t)
    dtheta = dtheta.at[:, 1:].set(theta[:, 1:] - theta[:, :-1])
    stable = (dtheta > 0.05e-3 * dz) & (karr >= 2) \
        & (karr <= k_m12[:, None])
    ks = jnp.where(jnp.any(stable, 1),
                   jnp.argmax(stable, 1), k_m12 + 1)
    kbot = jnp.maximum(1, ks - 2)
    cfr = jnp.where((karr <= kbot[:, None]) & partly, 0.0, cfr)

    # --- deck seeding (ref :268-341) --------------------------------------
    ice_region = (karr > k_m12[:, None]) & (karr <= k_tropo[:, None])
    wat_region = (karr > kbot[:, None]) & (karr <= k_m12[:, None])
    qi_out = _seed_decks(cfr, qi, qs, qvsat, t, rho, dz, ice_region,
                         203.16, jnp.inf, ice=True)
    qc_out = _seed_decks(cfr, qc, jnp.zeros_like(qc), qvsat, t, rho, dz,
                         wat_region, 253.16, 298.16, ice=False)

    # --- final column LWP/IWP cap (ref adjust_cloudFinal :476) -----------
    incl = (cfr > 0.01) & (cfr < 0.99) & (karr <= k_tropo[:, None])
    lwp = jnp.sum(jnp.where(incl, qc_out * rho * dz, 0.0), 1)
    iwp = jnp.sum(jnp.where(incl, qi_out * rho * dz, 0.0), 1)
    xfac_l = jnp.where(lwp > 1.0, 1.0 / jnp.maximum(lwp, 1e-12), 1.0)
    xfac_i = jnp.where(iwp > 1.0, 1.0 / jnp.maximum(iwp, 1e-12), 1.0)
    qc_out = jnp.where(incl, qc_out * xfac_l[:, None], qc_out)
    qi_out = jnp.where(incl, qi_out * xfac_i[:, None], qi_out)
    return cfr, qc_out, qi_out
