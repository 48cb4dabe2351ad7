"""Split-explicit RK3 timestep driver for the nonhydrostatic core.

ref: atm_srk3, src/core_atmosphere/dynamics/mpas_atm_time_integration.F:142.
All loops (dynamics substeps, 3 RK stages, acoustic substeps) are static
Python loops unrolled into one XLA program per full timestep; the reference's
~15 halo exchanges per substep disappear on a single shard and become
the distributed layer's exchange points in the sharded runner.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.nhyd import (AcousticVars, AtmSolveDiag,
                                            EulerTends, acoustic_step,
                                            compute_dyn_tend,
                                            divergence_damping_3d,
                                            recover_large_step_variables,
                                            reconstruct_cell_winds,
                                            set_smlstep_pert_variables,
                                            solve_diagnostics, vert_imp_coefs)
from mpas_tpu.cores.atmosphere.setup import AtmGrid
from mpas_tpu.cores.atmosphere.state import AtmDiag, AtmState


@struct.dataclass
class AtmCarry:
    """Everything advanced from step to step."""
    state: AtmState
    diag: AtmDiag
    v: Any          # tangential velocity (recomputed on rk_step 3)
    sdiag_ke: Any
    sdiag_div: Any
    sdiag_vort: Any
    sdiag_pv_edge: Any
    sdiag_rho_edge: Any
    ur_cell: Any
    vr_cell: Any
    # physics coupling (ref: tend pool rt_diabatic_tend; diag_physics rainnc)
    rt_diabatic_tend: Any
    rainnc: Any


def init_carry(grid: AtmGrid, cfg: AtmConfig, state: AtmState,
               diag: AtmDiag, dt) -> AtmCarry:
    """Initial diagnostics (ref: atm_mpas_init_block calls
    atm_compute_solve_diagnostics + mpas_reconstruct)."""
    sd = solve_diagnostics(grid, cfg, state.u, state.rho_zz, dt,
                           reconstruct_v=True)
    ur, vr = reconstruct_cell_winds(grid, state.u)
    return AtmCarry(state=state, diag=diag, v=sd.v, sdiag_ke=sd.ke,
                    sdiag_div=sd.divergence, sdiag_vort=sd.vorticity,
                    sdiag_pv_edge=sd.pv_edge, sdiag_rho_edge=sd.rho_edge,
                    ur_cell=ur, vr_cell=vr,
                    rt_diabatic_tend=jnp.zeros_like(state.theta_m),
                    rainnc=jnp.zeros_like(state.theta_m[:, 0]))


class _NoExchange:
    """Identity exchange hooks (single shard). The distributed runner
    substitutes halo refreshes at exactly the reference's exchange points
    (ref: the mpas_dmpar_exch_halo_field calls inside atm_srk3). `depth`
    mirrors the reference's haloLayers argument (layer-restricted
    exchanges, e.g. layer 1 only inside the acoustic loop, ref :792,845)."""

    def cell(self, x, depth=None):
        return x

    def edge(self, x, depth=None):
        return x


NO_XCH = _NoExchange()


def srk3_step(grid: AtmGrid, cfg: AtmConfig, carry: AtmCarry, dt,
              xch=NO_XCH) -> AtmCarry:
    """One full (dry) timestep (ref: atm_srk3 :142-1796)."""
    state1 = carry.state
    diag = carry.diag
    nz = grid.vert.nz

    if cfg.config_microp_scheme not in ("off", "mp_kessler", "mp_wsm6",
                                        "mp_thompson"):
        raise ValueError(
            f"unknown config_microp_scheme {cfg.config_microp_scheme!r}; "
            "supported: 'off', 'mp_kessler', 'mp_wsm6', 'mp_thompson'")
    if cfg.config_microp_scheme == "mp_kessler" \
            and state1.scalars.shape[-1] < 3:
        raise ValueError("mp_kessler requires scalars (qv, qc, qr); "
                         f"got {state1.scalars.shape[-1]} scalar(s)")
    if cfg.config_microp_scheme == "mp_wsm6" \
            and state1.scalars.shape[-1] < 6:
        raise ValueError("mp_wsm6 requires scalars (qv,qc,qr,qi,qs,qg); "
                         f"got {state1.scalars.shape[-1]} scalar(s)")
    if cfg.config_microp_scheme == "mp_thompson" \
            and state1.scalars.shape[-1] < 8:
        raise ValueError(
            "mp_thompson requires scalars (qv,qc,qr,qi,qs,qg,nr,ni); "
            f"got {state1.scalars.shape[-1]} scalar(s)")

    order = cfg.config_time_integration_order
    ns = cfg.config_number_of_sub_steps
    split = cfg.config_dynamics_split_steps \
        if cfg.config_split_dynamics_transport else 1
    dt_dyn = dt / split
    if order == 3:
        rk_timestep = (dt_dyn / 3.0, dt_dyn / 2.0, dt_dyn)
        rk_sub = (dt_dyn / 3.0, dt_dyn / ns, dt_dyn / ns)
        nsub = (1, max(1, ns // 2), ns)
    else:
        rk_timestep = (dt_dyn / 2.0, dt_dyn / 2.0, dt_dyn)
        rk_sub = (dt_dyn / ns,) * 3
        nsub = (max(1, ns // 2), max(1, ns // 2), ns)

    # step-start halo refresh (ref: atm_srk3 :666-676 theta_m/scalars/
    # pressure_p/rtheta_p exchanges)
    state1 = state1.replace(theta_m=xch.cell(state1.theta_m),
                            w=xch.cell(state1.w),
                            rho_zz=xch.cell(state1.rho_zz),
                            u=xch.edge(state1.u),
                            scalars=xch.cell(state1.scalars))
    diag = diag.replace(pressure_p=xch.cell(diag.pressure_p),
                        rtheta_p=xch.cell(diag.rtheta_p),
                        exner=xch.cell(diag.exner),
                        rho_p=xch.cell(diag.rho_p),
                        ru=xch.edge(diag.ru), rw=xch.cell(diag.rw))

    # working (time level 2) state and sub-step saves
    u2, w2 = state1.u, state1.w
    th2, rho2 = state1.theta_m, state1.rho_zz
    u1, w1, th1, rho1 = u2, w2, th2, rho2
    ru, rw = diag.ru, diag.rw
    rho_p, rtheta_p = diag.rho_p, diag.rtheta_p
    exner, pressure_p = diag.exner, diag.pressure_p
    sd = AtmSolveDiag(rho_edge=carry.sdiag_rho_edge, ke=carry.sdiag_ke,
                      divergence=carry.sdiag_div, vorticity=carry.sdiag_vort,
                      pv_edge=carry.sdiag_pv_edge, v=carry.v)
    ur_cell, vr_cell = carry.ur_cell, carry.vr_cell
    rho_zz_old_split = rho1

    # moist coupling (ref: atm_compute_moist_coefficients :410, computed once
    # per srk3 from time-level-1 scalars). Shape-static gate: a run carrying
    # at least (qv,qc,qr) is moist; the dry JW/mountain-wave configs carry a
    # single passive scalar and take the exact dry path.
    moist = state1.scalars.shape[-1] >= 3
    if moist:
        from mpas_tpu.cores.atmosphere.nhyd import compute_moist_coefficients
        qtot, cqw, cqu = compute_moist_coefficients(grid, state1.scalars)
        rt_diab = carry.rt_diabatic_tend
    else:
        qtot, cqw, cqu, rt_diab = None, None, None, None

    ruAvg_split = jnp.zeros_like(ru)
    wwAvg_split = jnp.zeros_like(rw)
    ruAvg = jnp.zeros_like(ru)
    wwAvg = jnp.zeros_like(rw)

    for sub in range(split):
        # start-of-substep saves (ref: atm_rk_integration_setup :1799)
        ru_save, rw_save = ru, rw
        rtheta_p_save, rho_p_save = rtheta_p, rho_p
        th_save = th1
        # u2 etc. already equal time level 1 values at substep start

        mkw = {} if not moist else {"qtot": qtot, "cqw": cqw}
        coefs = vert_imp_coefs(grid, cfg, rk_sub[0], th2, exner, rtheta_p,
                               **mkw)
        # substep-invariant acoustic edge quantities (zz/exner/theta pairs)
        # hoisted out of the scanned acoustic body — XLA cannot move a
        # gather out of a lax.scan on its own
        from mpas_tpu.cores.atmosphere.nhyd import acoustic_hoist
        hoist = acoustic_hoist(grid, th_save, exner,
                               cqu if moist else 1.0)
        euler = None
        for rk in (1, 2, 3):
            if order == 3 and rk == 2:
                coefs = vert_imp_coefs(grid, cfg, rk_sub[1], th2, exner,
                                       rtheta_p, **mkw)
            (tend_u, tend_rho, tend_theta, tend_w_raw, h_div,
             euler) = compute_dyn_tend(
                grid, cfg, rk, dt, u2, w2, th2, rho2, sd, ru, rw,
                ru_save, rw_save, th_save, rho_p_save, pressure_p,
                ur_cell, vr_cell, euler, cqu=cqu, cqw=cqw,
                qtot=qtot, rt_diabatic_tend=rt_diab)
            # ref: tend_u layer-1-only halo exchange before the omega
            # conversion (:642)
            tend_u = xch.edge(tend_u, depth=1)
            tend_rw = set_smlstep_pert_variables(grid, tend_u, tend_w_raw)

            av = AcousticVars(
                ru_p=jnp.zeros_like(ru), rho_pp=jnp.zeros_like(rho2),
                rtheta_pp=jnp.zeros_like(rho2),
                rtheta_pp_old=jnp.zeros_like(rho2),
                rw_p=jnp.zeros_like(rw), ruAvg=jnp.zeros_like(ru),
                wwAvg=jnp.zeros_like(rw))

            # acoustic loop as lax.scan: the body is substep-invariant (the
            # reference's small_step==1 reset is the zero-initialized `av`),
            # so the graph holds ONE acoustic step regardless of ns
            def acoustic_body(av_c, _, _rk=rk):
                # Exchange choreography = the reference's layer-1 rho_pp /
                # rtheta_pp exchanges (:792,:845), restructured producer-side
                # for compute/comm overlap (the begin/local/end split of
                # mpas_dmpar.F:6993-7142 expressed as async-collective
                # scheduling): each field's ppermute is issued the moment the
                # field is produced, with independent work after it —
                # rtheta_pp's permute rides behind the rho_pp recovery
                # (inside acoustic_step), rho_pp's behind the packed entry
                # gathers of the next iteration. Values at every consumption
                # point are identical to the consumer-side placement:
                # iteration k+1's pgrad reads the same refreshed halos
                # either way (iteration 1 enters with zero-initialized,
                # trivially-valid fields). damp=True folds the previous
                # iteration's divergence damping into this iteration's
                # packed gather (a no-op on the zero-initialized entry);
                # the final iteration's damping is applied after the scan.
                av_c = acoustic_step(
                    grid, cfg, coefs, av_c, rk_sub[_rk - 1],
                    th_save, exner, w2, rho2, rw, rw_save, ru, ru_save,
                    tend_u, tend_rho, tend_theta, tend_rw,
                    cqu=cqu if moist else 1.0,
                    xch_rtheta=lambda x: xch.cell(x, depth=1),
                    hoist=hoist, damp=True)
                av_c = av_c._replace(rho_pp=xch.cell(av_c.rho_pp, depth=1))
                return av_c, None

            # unroll: the acoustic scan is 1-4 iterations; unrolling
            # removes the while-loop overhead (~20 ms/step in the device
            # trace) and lets XLA fuse across iterations
            av, _ = jax.lax.scan(acoustic_body, av, None,
                                 length=nsub[rk - 1], unroll=True)
            av = divergence_damping_3d(grid, cfg, av, rk_sub[rk - 1],
                                       th_save, th_sum=hoist.th_sum)
            # ref: rw_p/ru_p(2)/rho_pp/rtheta_pp(2) exchanged before recover
            # (:873-887) — two layers; ruAvg/wwAvg full for the transport
            av = av._replace(rw_p=xch.cell(av.rw_p, depth=2),
                             ru_p=xch.edge(av.ru_p, depth=2),
                             rho_pp=xch.cell(av.rho_pp, depth=2),
                             rtheta_pp=xch.cell(av.rtheta_pp, depth=2),
                             ruAvg=xch.edge(av.ruAvg),
                             wwAvg=xch.cell(av.wwAvg))

            (u2, w2, th2, rho2, ru, rw, rho_p, rtheta_p, exner_new,
             pressure_p_new, ruAvg, wwAvg) = recover_large_step_variables(
                grid, cfg, av, rk, rk_timestep[rk - 1], nsub[rk - 1],
                rho_p_save, rtheta_p_save, ru_save, rw_save, th2,
                rt_diabatic_tend=rt_diab if moist else 0.0)
            if rk == 3:
                exner, pressure_p = exner_new, pressure_p_new

            # ref: u full-halo exchange after recover (:988); w after the
            # diagnostics (:1234-1248)
            u2 = xch.edge(u2)
            w2 = xch.cell(w2)
            sd = solve_diagnostics(grid, cfg, u2, rho2, dt,
                                   reconstruct_v=(rk == 3), v_prev=sd.v)

        # substep finish (ref: atm_rk_dynamics_substep_finish :5993)
        if sub == 0:
            ruAvg_split = ruAvg
            wwAvg_split = wwAvg
        else:
            ruAvg_split = ruAvg_split + ruAvg
            wwAvg_split = wwAvg_split + wwAvg
        if sub < split - 1:
            u1, w1, th1, rho1 = u2, w2, th2, rho2
            ruAvg = jnp.zeros_like(ru)
            wwAvg = jnp.zeros_like(rw)

    ruAvg = ruAvg_split / split
    wwAvg = wwAvg_split / split

    # split RK3 scalar transport with the time-averaged mass fluxes
    # (ref: RK3_SPLIT_TRANSPORT :1230-1580; Skamarock & Gassmann 2011)
    scalars = state1.scalars
    if cfg.config_scalar_advection and scalars.shape[-1] > 0:
        from mpas_tpu.cores.atmosphere.transport import (advance_scalars,
                                                         advance_scalars_mono)
        if order == 3:
            tr_ts = (dt / 3.0, dt / 2.0, dt)
        else:
            tr_ts = (dt / 2.0, dt / 2.0, dt)
        sc_old = scalars
        sc_new = scalars
        limited = cfg.config_monotonic or cfg.config_positive_definite
        for rk in (1, 2, 3):
            if rk < 3 or not limited:
                sc_new = advance_scalars(
                    grid, cfg, sc_old, sc_new, rho_zz_old_split, rho2,
                    ruAvg, wwAvg, tr_ts[rk - 1], rk, True)
            else:
                sc_new = advance_scalars_mono(
                    grid, cfg, sc_old, sc_new, rho_zz_old_split, rho2,
                    ruAvg, wwAvg, tr_ts[rk - 1], True,
                    positive_definite_only=not cfg.config_monotonic)
            sc_new = xch.cell(sc_new)
        scalars = sc_new

    # microphysics runs inside the timestep after transport, on the new time
    # level; the saturation-adjustment theta tendency feeds the next step's
    # dynamics (ref: atm_srk3 :1654 driver_microphysics)
    rt_diab_out = carry.rt_diabatic_tend
    rainnc = carry.rainnc
    if cfg.config_microp_scheme in ("mp_kessler", "mp_wsm6",
                                    "mp_thompson") and moist:
        from mpas_tpu.cores.atmosphere.physics.driver import (
            microphysics_step, microphysics_step_thompson,
            microphysics_step_wsm6)
        mp = {"mp_kessler": microphysics_step,
              "mp_wsm6": microphysics_step_wsm6,
              "mp_thompson": microphysics_step_thompson}[
            cfg.config_microp_scheme]
        (th2, scalars, rtheta_p, exner, pressure_p, rt_diab_out,
         rain) = mp(grid, th2, rho2, scalars, exner, dt)
        th2 = xch.cell(th2)
        scalars = xch.cell(scalars)
        rtheta_p = xch.cell(rtheta_p)
        exner = xch.cell(exner)
        pressure_p = xch.cell(pressure_p)
        rt_diab_out = xch.cell(rt_diab_out)
        rainnc = rainnc + rain

    ur_cell, vr_cell = reconstruct_cell_winds(grid, u2)

    state2 = AtmState(u=u2, w=w2, theta_m=th2, rho_zz=rho2,
                      scalars=scalars)
    diag2 = AtmDiag(ru=ru, rw=rw, rho_p=rho_p, rtheta_p=rtheta_p,
                    exner=exner, pressure_p=pressure_p,
                    ruAvg=ruAvg, wwAvg=wwAvg)
    return AtmCarry(state=state2, diag=diag2, v=sd.v, sdiag_ke=sd.ke,
                    sdiag_div=sd.divergence, sdiag_vort=sd.vorticity,
                    sdiag_pv_edge=sd.pv_edge, sdiag_rho_edge=sd.rho_edge,
                    ur_cell=ur_cell, vr_cell=vr_cell,
                    rt_diabatic_tend=rt_diab_out, rainnc=rainnc)


@functools.partial(jax.jit, static_argnums=(1, 4))
def run_steps(grid: AtmGrid, cfg: AtmConfig, carry: AtmCarry, dt,
              n_steps: int) -> AtmCarry:
    def body(c, _):
        return srk3_step(grid, cfg, c, dt), None
    final, _ = jax.lax.scan(body, carry, None, length=n_steps)
    return final


def run_steps_xch(grid, cfg, carry, dt, n_steps, xch):
    """Like run_steps but with exchange hooks (used inside shard_map)."""
    def body(c, _):
        return srk3_step(grid, cfg, c, dt, xch=xch), None
    final, _ = jax.lax.scan(body, carry, None, length=n_steps)
    return final
