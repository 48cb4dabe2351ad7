"""Pallas TPU kernel: fused acoustic-substep cell column update.

ref: atm_advance_acoustic_step_work
(src/core_atmosphere/dynamics/mpas_atm_time_integration.F:2447-2723) —
the cell-local part of one forward-backward acoustic substep: the rs/ts
provisional updates, the implicit-w right-hand side, the Thomas solve of
the vertically-implicit system, implicit Rayleigh w-damping, and the
rho_pp/rtheta_pp back-substitution.

Why a kernel: under XLA this chain runs as ~10 separate HBM passes over
(nCells, nz+1) arrays per substep; fused in Pallas every input streams
through VMEM exactly once per block of cells, and the two tridiagonal
sweeps run over lanes inside VMEM (sequential over nz levels, parallel
over the cell block). The edge-coupled parts (pressure gradient, ru_p
update, the flux divergences feeding rs_flux/ts_flux) stay in XLA where
its gather fusion is already near bandwidth.

Falls back to the jnp path off-TPU (interpret mode in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512          # cells per program


def _affine_scan(A, B, n_lanes: int, reverse: bool = False):
    """Inclusive scan of x_i = A_i x_{i-1} + B_i along lanes (x_-1 = 0),
    or the i+1 recurrence with reverse=True. Sklansky-style: log2 steps of
    masked pltpu.roll compositions — no dynamic lane indexing."""
    lane = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)
    s = 1
    while s < n_lanes:
        if not reverse:
            A_p = pltpu.roll(A, s, 1)
            B_p = pltpu.roll(B, s, 1)
            valid = lane >= s
        else:
            # negative shift via circular complement (roll is circular
            # over the padded 128-lane register; mask hides the wrap)
            A_p = pltpu.roll(A, A.shape[1] - s, 1)
            B_p = pltpu.roll(B, B.shape[1] - s, 1)
            valid = lane < n_lanes - s
        A_p = jnp.where(valid, A_p, 0.0)
        B_p = jnp.where(valid, B_p, 0.0)
        A, B = A * A_p, A * B_p + B
        s *= 2
    return B


def _acoustic_cell_kernel(nz: int, epssm: float,
                          # refs ---------------------------------------
                          rs_pre_ref, ts_pre_ref, rw_p0_ref, wwavg0_ref,
                          tend_rw_ref, rho_pp0_ref, rtheta_pp0_ref,
                          cofwz_ref, cofwr_ref, cofwt_ref, coftz_ref,
                          cofrz_ref, rdzw_ref, a_ref, alpha_ref,
                          gamma_ref,
                          zz_ref, dss_int_ref, dw_term_ref, wdamp_ref,
                          dts_ref,
                          # outputs ------------------------------------
                          rw_p_out, rho_pp_out, rtheta_pp_out,
                          wwavg_out):
    """One block of cells; levels in lanes (nz or nz+1)."""
    resm = (1.0 - epssm) / (1.0 + epssm)
    dts = dts_ref[0, 0]
    rs = rs_pre_ref[:]                    # (B, nz): includes dts*tend+flux
    ts = ts_pre_ref[:]
    rw_p0 = rw_p0_ref[:]                  # (B, nz+1)
    rho_pp0 = rho_pp0_ref[:]
    rtheta_pp0 = rtheta_pp0_ref[:]
    cofrz = cofrz_ref[:]                  # (1, nz)
    rdzw = rdzw_ref[:]                    # (1, nz)
    coftz = coftz_ref[:]                  # (B, nz+1)

    # rs/ts correction with the old rw_p (ref :2551-2560)
    rs = rs - cofrz * resm * (rw_p0[:, 1:] - rw_p0[:, :-1])
    ts = ts - resm * rdzw * (coftz[:, 1:] * rw_p0[:, 1:]
                             - coftz[:, :-1] * rw_p0[:, :-1])

    wwavg = wwavg0_ref[:]
    wwavg = jnp.concatenate(
        [wwavg[:, :1],
         wwavg[:, 1:nz] + 0.5 * (1.0 - epssm) * rw_p0[:, 1:nz],
         wwavg[:, nz:]], axis=1)

    # rhs at interfaces 1..nz-1 (ref :2577-2592)
    zz = zz_ref[:]                        # (B, nz)
    zz_ts = zz * ts
    zz_rt = zz * rtheta_pp0
    cofwz = cofwz_ref[:]
    cofwr = cofwr_ref[:]
    cofwt = cofwt_ref[:]
    tend_rw = tend_rw_ref[:]
    rhs_mid = rw_p0[:, 1:nz] + dts * tend_rw[:, 1:nz] \
        - cofwz[:, 1:nz] * ((zz_ts[:, 1:] - zz_ts[:, :-1])
                            + resm * (zz_rt[:, 1:] - zz_rt[:, :-1])) \
        - cofwr[:, 1:nz] * ((rs[:, 1:] + rs[:, :-1])
                            + resm * (rho_pp0[:, 1:] + rho_pp0[:, :-1])) \
        + cofwt[:, 1:] * (ts[:, 1:] + resm * rtheta_pp0[:, 1:]) \
        + cofwt[:, :-1] * (ts[:, :-1] + resm * rtheta_pp0[:, :-1])

    # Thomas sweeps as lane-parallel affine scans (ref :2596-2604).
    # Mosaic forbids unaligned dynamic lane indexing, so the sequential
    # i-loop becomes a log2(nz) masked-roll inclusive scan of the affine
    # maps x_i = A_i x_{i-1} + B_i (identical math to ops/vscan.py).
    zero = jnp.zeros_like(rw_p0[:, :1])
    a = a_ref[:]
    alpha = alpha_ref[:]
    gamma = gamma_ref[:]
    nl = nz + 1
    rhs_full = jnp.concatenate([zero, rhs_mid, zero], axis=1)
    y = _affine_scan(-a * alpha, rhs_full * alpha, nl)
    x = _affine_scan(-gamma, y, nl, reverse=True)

    # implicit Rayleigh damping on w (ref :2608-2616); wdamp holds
    # zz_int * rho_int * w precomputed outside
    dss_int = dss_int_ref[:]              # (B, nz+1)
    dw_term = dw_term_ref[:]
    wdamp = wdamp_ref[:]
    denom = 1.0 + dts * dss_int
    mid = ((x[:, 1:nz] + dw_term[:, 1:nz]
            - dts * dss_int[:, 1:nz] * wdamp[:, 1:nz])
           / denom[:, 1:nz]) - dw_term[:, 1:nz]
    rw_p = jnp.concatenate([zero, mid, zero], axis=1)

    wwavg = jnp.concatenate(
        [wwavg[:, :1],
         wwavg[:, 1:nz] + 0.5 * (1.0 + epssm) * rw_p[:, 1:nz],
         wwavg[:, nz:]], axis=1)

    rho_pp = rs - cofrz * (rw_p[:, 1:] - rw_p[:, :-1])
    rtheta_pp = ts - rdzw * (coftz[:, 1:] * rw_p[:, 1:]
                             - coftz[:, :-1] * rw_p[:, :-1])
    rw_p_out[:] = rw_p
    rho_pp_out[:] = rho_pp
    rtheta_pp_out[:] = rtheta_pp
    wwavg_out[:] = wwavg


def acoustic_cell_update(nz: int, epssm: float, dts,
                         rs_pre, ts_pre, rw_p0, wwavg0, tend_rw,
                         rho_pp0, rtheta_pp0, cofwz, cofwr, cofwt, coftz,
                         cofrz, rdzw, a_tri, alpha_tri, gamma_tri, zz,
                         dss_int, dw_term, wdamp, interpret: bool = False):
    """Fused acoustic cell update via pallas_call.

    All cell arrays are (nC, nz) or (nC, nz+1); cofrz/rdzw are (nz,).
    rs_pre/ts_pre must already include the explicit tendency + horizontal
    flux parts (rho_pp0 + dts*tend + flux). The rtheta update divides by
    rdzw-scaled coftz exactly as the jnp path (coftz passed pre-scaled).
    Returns (rw_p, rho_pp, rtheta_pp, wwavg)."""
    if not interpret:
        interpret = jax.default_backend() == "cpu"   # tests force-enable
    nc = rs_pre.shape[0]
    pad = (-nc) % BLOCK
    def p(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    args = [p(rs_pre), p(ts_pre), p(rw_p0), p(wwavg0), p(tend_rw),
            p(rho_pp0), p(rtheta_pp0), p(cofwz), p(cofwr), p(cofwt),
            p(coftz), cofrz[None, :], rdzw[None, :], p(a_tri),
            p(alpha_tri),
            p(gamma_tri), p(zz), p(dss_int), p(dw_term), p(wdamp),
            jnp.asarray(dts, rs_pre.dtype).reshape(1, 1)]
    nblk = (nc + pad) // BLOCK

    def spec(x):
        if x.shape[0] == 1:        # broadcast rows (cofrz, dts)
            return pl.BlockSpec((1, x.shape[1]), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((BLOCK, x.shape[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct(((nc + pad), nz + 1), rs_pre.dtype),
                  jax.ShapeDtypeStruct(((nc + pad), nz), rs_pre.dtype),
                  jax.ShapeDtypeStruct(((nc + pad), nz), rs_pre.dtype),
                  jax.ShapeDtypeStruct(((nc + pad), nz + 1), rs_pre.dtype)]
    out_specs = [pl.BlockSpec((BLOCK, s.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for s in out_shapes]
    outs = pl.pallas_call(
        functools.partial(_acoustic_cell_kernel, nz, epssm),
        grid=(nblk,),
        in_specs=[spec(x) for x in args],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    return tuple(o[:nc] for o in outs)
