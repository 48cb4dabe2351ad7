"""Phase-level profiling of the jw_120km step on the real TPU.

Each phase is wrapped in a lax.scan whose carry feeds outputs back into
inputs (keeps HBM pressure realistic, defeats CSE/DCE), timed by the
slope method with device->host sync (block_until_ready does not block on
the axon platform).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_jw import init_jw
from mpas_tpu.cores.atmosphere.time_integration import init_carry
from mpas_tpu.mesh.cache import cached
from mpas_tpu.mesh.sphere import icosahedral_mesh


def slope_time(fn, n1=3, n2=13, reps=3):
    """fn(n) -> a device array; returns seconds per unit n."""
    np.asarray(fn(n1)); np.asarray(fn(n2))
    ts = []
    for n in (n1, n2):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(n))
        ts.append((time.perf_counter() - t0) / reps)
    return (ts[1] - ts[0]) / (n2 - n1)


def main():
    mesh0 = cached("icos64_l4", lambda: icosahedral_mesh(64, lloyd_iters=4))
    nz = 26
    dt = 720.0
    cfg = AtmConfig(config_nvertlevels=nz, config_dt=dt,
                    config_len_disp=120000.0)
    grid, state, diag = init_jw(mesh0, cfg, case=2)
    grid = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32))
        if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
        grid)
    cast = lambda t: jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32))
        if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a), t)
    carry = init_carry(grid, cfg, cast(state), cast(diag), dt)

    from mpas_tpu.cores.atmosphere import nhyd
    from mpas_tpu.cores.atmosphere.nhyd import (
        AcousticVars, acoustic_hoist, acoustic_step, compute_dyn_tend,
        recover_large_step_variables, set_smlstep_pert_variables,
        solve_diagnostics, vert_imp_coefs)

    st, dg = carry.state, carry.diag
    sd0 = solve_diagnostics(grid, cfg, st.u, st.rho_zz, dt)
    ur, vr = carry.ur_cell, carry.vr_cell
    coefs = vert_imp_coefs(grid, cfg, dt / 6, st.theta_m, dg.exner,
                           dg.rtheta_p)
    hoist = acoustic_hoist(grid, st.theta_m, dg.exner)

    eps = 1e-12

    # --- full step reference -------------------------------------------------
    from mpas_tpu.cores.atmosphere.time_integration import run_steps

    def full(n):
        return run_steps(grid, cfg, carry, dt, n).state.u
    t_full = slope_time(full, 2, 6)
    print(f"full step: {t_full*1e3:9.2f} ms/step")

    # --- solve_diagnostics ---------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(2,))
    def loop_sd(u, rho, n):
        def body(c, _):
            u_, rho_ = c
            sd = solve_diagnostics(grid, cfg, u_, rho_, dt)
            return (u_ + eps * sd.pv_edge, rho_ + eps * sd.ke), None
        (u_, rho_), _ = jax.lax.scan(body, (u, rho), None, length=n)
        return u_

    t = slope_time(lambda n: loop_sd(st.u, st.rho_zz, n))
    print(f"solve_diagnostics: {t*1e3:9.2f} ms  x9/step = {9*t*1e3:8.1f} ms")

    # --- compute_dyn_tend rk=1 and rk=2 -------------------------------------
    for rk in (1, 2):
        @functools.partial(jax.jit, static_argnums=(4,))
        def loop_dt(u, w, th, rho, n, _rk=rk):
            euler = None
            if _rk != 1:
                kdiff = jnp.zeros_like(th)
                euler = nhyd.EulerTends(
                    tend_u_euler=jnp.zeros_like(u),
                    tend_w_euler=jnp.zeros_like(w),
                    tend_theta_euler=jnp.zeros_like(th), kdiff=kdiff,
                    dpdz=jnp.zeros_like(th), tend_rho=jnp.zeros_like(th))

            def body(c, _):
                u_, w_, th_, rho_ = c
                (tu, trho, tth, tw, hd, eu) = compute_dyn_tend(
                    grid, cfg, _rk, dt, u_, w_, th_, rho_, sd0, dg.ru,
                    dg.rw, dg.ru, dg.rw, th_, dg.rho_p, dg.pressure_p,
                    ur, vr, euler)
                return (u_ + eps * tu, w_ + eps * tw, th_ + eps * tth,
                        rho_ + eps * trho), None
            c, _ = jax.lax.scan(body, (u, w, th, rho), None, length=n)
            return c[0]

        t = slope_time(lambda n: loop_dt(st.u, st.w, st.theta_m,
                                         st.rho_zz, n))
        mult = 3 if rk == 1 else 6
        print(f"dyn_tend rk{rk}: {t*1e3:9.2f} ms  x{mult}/step = "
              f"{mult*t*1e3:8.1f} ms")

    # --- acoustic step (scan body) ------------------------------------------
    av0 = AcousticVars(ru_p=jnp.zeros_like(st.u),
                       rho_pp=jnp.zeros_like(st.rho_zz),
                       rtheta_pp=jnp.zeros_like(st.rho_zz),
                       rtheta_pp_old=jnp.zeros_like(st.rho_zz),
                       rw_p=jnp.zeros_like(st.w),
                       ruAvg=jnp.zeros_like(st.u),
                       wwAvg=jnp.zeros_like(st.w))
    tz = jnp.zeros_like(st.u)
    tzc = jnp.zeros_like(st.rho_zz)
    tzw = jnp.zeros_like(st.w)

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_ac(av, n):
        def body(av_c, _):
            av_c = acoustic_step(grid, cfg, coefs, av_c, dt / 6,
                                 st.theta_m, dg.exner, st.w, st.rho_zz,
                                 dg.rw, dg.rw, dg.ru, dg.ru,
                                 tz, tzc, tzc, tzw, hoist=hoist, damp=True)
            return av_c, None
        av, _ = jax.lax.scan(body, av, None, length=n)
        return av.ru_p

    t = slope_time(lambda n: loop_ac(av0, n))
    # nsub=(1,2,4)? count: split=3 substeps x sum(nsub); ns=2 -> (1,1,2)=4
    ns = cfg.config_number_of_sub_steps
    nacc = 3 * (1 + max(1, ns // 2) + ns)
    print(f"acoustic body: {t*1e3:9.2f} ms  x{nacc}/step = "
          f"{nacc*t*1e3:8.1f} ms")

    # --- set_smlstep + recover ----------------------------------------------
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_rec(av, n):
        def body(c, _):
            av_c, th = c
            out = recover_large_step_variables(
                grid, cfg, av_c, 3, dt, 2, dg.rho_p, dg.rtheta_p, dg.ru,
                dg.rw, th)
            u2, w2, th2 = out[0], out[1], out[2]
            return (av_c._replace(ru_p=av_c.ru_p + eps * u2,
                                  rw_p=av_c.rw_p + eps * w2),
                    th + eps * th2), None
        c, _ = jax.lax.scan(body, (av, st.theta_m), None, length=n)
        return c[1]

    t = slope_time(lambda n: loop_rec(av0, n))
    print(f"recover rk3: {t*1e3:9.2f} ms  x9/step = {9*t*1e3:8.1f} ms")

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop_sml(tu, tw, n):
        def body(c, _):
            tu_, tw_ = c
            o = set_smlstep_pert_variables(grid, tu_, tw_)
            return (tu_ + eps * jnp.sum(o) , tw_ + eps * o), None
        c, _ = jax.lax.scan(body, (tu, tw), None, length=n)
        return c[1]

    t = slope_time(lambda n: loop_sml(st.u, st.w, n))
    print(f"set_smlstep: {t*1e3:9.2f} ms  x9/step = {9*t*1e3:8.1f} ms")

    # --- transport (3 RK stages incl. mono) ---------------------------------
    from mpas_tpu.cores.atmosphere.transport import (advance_scalars,
                                                     advance_scalars_mono)
    sc = st.scalars

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_tr(sc_, n):
        def body(c, _):
            c2 = advance_scalars(grid, cfg, c, c, st.rho_zz, st.rho_zz,
                                 dg.ru, dg.rw, dt, 1, True)
            return c + eps * c2, None
        c, _ = jax.lax.scan(body, sc_, None, length=n)
        return c

    t = slope_time(lambda n: loop_tr(sc, n))
    print(f"advance_scalars(1 scalar): {t*1e3:9.2f} ms x3/step = "
          f"{3*t*1e3:8.1f} ms")

    # --- vert_imp_coefs ------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop_vic(th, n):
        def body(th_, _):
            c = vert_imp_coefs(grid, cfg, dt / 6, th_, dg.exner, dg.rtheta_p)
            return th_ + eps * c.cofwt, None
        th_, _ = jax.lax.scan(body, th, None, length=n)
        return th_

    t = slope_time(lambda n: loop_vic(st.theta_m, n))
    print(f"vert_imp_coefs: {t*1e3:9.2f} ms  x6/step = {6*t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
