"""Nonhydrostatic atmosphere dry core: balance, stability, conservation.

Parity model: the reference validates the dycore on the JW baroclinic wave
(SURVEY.md §6 north star); decisive invariants here are exact maintenance of
a resting atmosphere, near-steadiness of the unperturbed JW state, and
flux-form mass conservation to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_jw import init_jw
from mpas_tpu.cores.atmosphere.setup import build_vertical_grid
from mpas_tpu.cores.atmosphere.time_integration import (init_carry, run_steps,
                                                        srk3_step)


def _setup(mesh, case, nz=10, dt=2400.0, u0=None, **cfg_kw):
    cfg = AtmConfig(config_nvertlevels=nz, config_len_disp=960000.0,
                    config_dt=dt, **cfg_kw)
    kw = {} if u0 is None else {"u0": u0}
    grid, state, diag = init_jw(mesh, cfg, case=case, **kw)
    grid = jax.tree.map(jnp.asarray, grid)
    state = jax.tree.map(jnp.asarray, state)
    diag = jax.tree.map(jnp.asarray, diag)
    return grid, cfg, init_carry(grid, cfg, state, diag, dt), state


class TestVerticalGrid:
    def test_interpolation_weights(self):
        vg, sh, ah = build_vertical_grid(26)
        fzm, fzp = np.asarray(vg.fzm), np.asarray(vg.fzp)
        assert np.allclose(fzm[1:26] + fzp[1:26], 1.0)
        assert abs(vg.cf1 + vg.cf2 + vg.cf3 - 1.0) < 1e-12

    def test_zz_metric_identity(self, sphere_mesh_small):
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1)
        zz = np.asarray(grid.zgrid)
        dzw_nom = np.asarray(grid.vert.zw)[1:] - np.asarray(grid.vert.zw)[:-1]
        lhs = np.asarray(grid.zz) * (zz[:, 1:] - zz[:, :-1])
        assert np.allclose(lhs, dzw_nom[None, :], rtol=1e-12)


class TestAdvCoefs:
    def test_constant_field_exact(self, sphere_mesh_small):
        """sum(adv_coefs) = dvEdge and sum(adv_coefs_3rd) = 0: the 3rd/4th
        order edge value of a constant field is the constant."""
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1)
        total = np.asarray(jnp.sum(grid.adv_coefs, axis=1))
        assert np.allclose(total, np.asarray(grid.mesh.dvEdge), rtol=1e-10)
        total3 = np.asarray(jnp.sum(grid.adv_coefs_3rd, axis=1))
        assert np.abs(total3).max() < 1e-6 * np.asarray(grid.mesh.dvEdge).max()


class TestRestingAtmosphere:
    def test_exact_rest_maintained(self, sphere_mesh_small):
        """u0=0: flat terrain, uniform T profile, rest with Coriolis.
        Dynamics must keep it at rest to roundoff for many steps."""
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1, u0=0.0)
        out = run_steps(grid, cfg, carry, cfg.config_dt, 10)
        assert float(jnp.max(jnp.abs(out.state.u))) < 1e-10
        assert float(jnp.max(jnp.abs(out.state.w))) < 1e-10

    def test_rest_with_noise_stays_bounded(self, sphere_mesh_small):
        """Seeded noise must not amplify (inertia-gravity modes neutral or
        damped) — the regression test for the scaled-weights bug."""
        from mpas_tpu.cores.atmosphere.state import AtmState
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1, u0=0.0)
        rng = np.random.default_rng(0)
        noisy = AtmState(u=carry.state.u
                         + jnp.asarray(rng.standard_normal(s0.u.shape)) * 1e-4,
                         w=carry.state.w, theta_m=carry.state.theta_m,
                         rho_zz=carry.state.rho_zz,
                         scalars=carry.state.scalars)
        carry = carry.replace(state=noisy)
        out = run_steps(grid, cfg, carry, cfg.config_dt, 20)
        assert float(jnp.max(jnp.abs(out.state.u))) < 1e-2


class TestJWSteadyState:
    def test_unperturbed_jet_steady(self, sphere_mesh_small):
        """JW case 1: the balanced jet stays near its initial state."""
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1)
        out = run_steps(grid, cfg, carry, cfg.config_dt, 18)  # 12 h
        du = float(jnp.max(jnp.abs(out.state.u - s0.u)))
        assert du < 3.0                       # bounded adjustment, no runaway
        assert float(jnp.max(jnp.abs(out.state.w))) < 0.1
        assert bool(jnp.all(jnp.isfinite(out.state.u)))

    def test_mass_conserved_to_roundoff(self, sphere_mesh_small):
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1)
        area = grid.mesh.areaCell[:, None]
        m0 = float(jnp.sum(s0.rho_zz * area))
        out = run_steps(grid, cfg, carry, cfg.config_dt, 12)
        m1 = float(jnp.sum(out.state.rho_zz * area))
        assert abs(m1 - m0) / m0 < 1e-12

    def test_theta_mass_conserved(self, sphere_mesh_small):
        """Flux-form rho*theta conservation (no diabatic terms)."""
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1)
        area = grid.mesh.areaCell[:, None]
        t0 = float(jnp.sum(s0.rho_zz * s0.theta_m * area))
        out = run_steps(grid, cfg, carry, cfg.config_dt, 12)
        t1 = float(jnp.sum(out.state.rho_zz * out.state.theta_m * area))
        assert abs(t1 - t0) / t0 < 1e-9


class TestJWBaroclinicWave:
    def test_perturbation_grows_then_bounded(self, sphere_mesh_small):
        """JW case 2: perturbed run stays finite and w remains physical
        over 1 day at coarse resolution."""
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 2)
        out = run_steps(grid, cfg, carry, cfg.config_dt, 36)  # 1 day
        assert bool(jnp.all(jnp.isfinite(out.state.u)))
        assert float(jnp.max(jnp.abs(out.state.w))) < 1.0
        assert float(jnp.max(jnp.abs(out.state.u))) < 60.0


class TestScalarTransport:
    """Split RK3 SG11 transport + Zalesak limiter (ref: atm_advance_scalars
    :3238, atm_advance_scalars_mono :3612; BASELINE supercell config needs
    the monotonic path)."""

    def _blob_setup(self, mesh, mono):
        from mpas_tpu.cores.atmosphere.state import AtmState
        cfg = AtmConfig(config_nvertlevels=10, config_len_disp=960000.0,
                        config_dt=1800.0, config_monotonic=mono)
        grid, state, diag = init_jw(mesh, cfg, case=1)
        lat = np.asarray(grid.mesh.latCell)
        lon = np.asarray(grid.mesh.lonCell)
        r = np.sqrt((lat - np.pi / 4) ** 2 + (lon - np.pi / 2) ** 2)
        q = np.where(r < 0.4, 1.0 - r / 0.4, 0.0)
        sc = np.zeros((grid.mesh.nCells, 10, 1))
        sc[:, 3:7, 0] = q[:, None]
        state = AtmState(u=state.u, w=state.w, theta_m=state.theta_m,
                         rho_zz=state.rho_zz, scalars=sc)
        gj = jax.tree.map(jnp.asarray, grid)
        carry = init_carry(gj, cfg, jax.tree.map(jnp.asarray, state),
                           jax.tree.map(jnp.asarray, diag), cfg.config_dt)
        return gj, cfg, carry

    def test_monotonic_no_overshoot(self, sphere_mesh_small):
        gj, cfg, carry = self._blob_setup(sphere_mesh_small, mono=True)
        out = run_steps(gj, cfg, carry, cfg.config_dt, 24)
        q = out.state.scalars[..., 0]
        assert float(jnp.min(q)) >= -1e-12       # no undershoot
        assert float(jnp.max(q)) <= 1.0 + 1e-12  # no overshoot

    def test_tracer_mass_conserved(self, sphere_mesh_small):
        gj, cfg, carry = self._blob_setup(sphere_mesh_small, mono=True)
        area = gj.mesh.areaCell[:, None]
        m0 = float(jnp.sum(carry.state.scalars[..., 0]
                           * carry.state.rho_zz * area))
        out = run_steps(gj, cfg, carry, cfg.config_dt, 24)
        m1 = float(jnp.sum(out.state.scalars[..., 0]
                           * out.state.rho_zz * area))
        assert abs(m1 - m0) / m0 < 1e-12

    def test_unlimited_overshoots(self, sphere_mesh_small):
        """The std scheme must produce small over/undershoots on a cone —
        guards against accidentally running the limiter in the std path."""
        gj, cfg, carry = self._blob_setup(sphere_mesh_small, mono=False)
        out = run_steps(gj, cfg, carry, cfg.config_dt, 24)
        q = out.state.scalars[..., 0]
        assert float(jnp.min(q)) < -1e-6


class TestWCurvatureAdjudication:
    """Side-by-side adjudication of the w-curvature ordering deviation.

    The reference accumulates the spherical curvature/Coriolis terms into
    tend_w BEFORE the *invAreaCell scaling (ref
    mpas_atm_time_integration.F:5076-5086, scaling :5185), dividing the
    physical terms by cell area and effectively removing them; the u-side
    Coriolis-curvature term (ref :4830-4837) is applied at full size.
    config_w_curvature="reference" reproduces that behavior for parity;
    "physical" (default) applies the energetically-consistent full pair
    after the scaling. Both must be stable on the balanced JW jet, and
    "reference" must make the w-curvature contribution negligible.
    """

    def _run(self, mesh, mode, steps=24):
        grid, cfg, carry, _ = _setup(mesh, 1, dt=1200.0,
                                     config_w_curvature=mode)
        out = run_steps(grid, cfg, carry, cfg.config_dt, steps)
        return grid, out

    def test_both_orderings_stable(self, sphere_mesh_small):
        for mode in ("physical", "reference"):
            grid, out = self._run(sphere_mesh_small, mode)
            th = np.asarray(out.state.theta_m)
            w = np.asarray(out.state.w)
            assert np.isfinite(th).all(), mode
            assert np.abs(w).max() < 1.0, mode

    def test_orderings_differ_but_slightly(self, sphere_mesh_small):
        """The two orderings must actually change the trajectory (the flag
        is live) while remaining dynamically close (the terms are a small
        Eotvos-scale correction, not a leading-order one)."""
        _, out_p = self._run(sphere_mesh_small, "physical")
        _, out_r = self._run(sphere_mesh_small, "reference")
        u_p = np.asarray(out_p.state.u)
        u_r = np.asarray(out_r.state.u)
        du = np.abs(u_p - u_r).max()
        assert du > 0.0                      # flag changes the trajectory
        assert du < 0.05 * np.abs(u_p).max()  # ... by a small correction

    def test_reference_mode_annihilates_w_terms(self, sphere_mesh_small):
        """In reference mode the curvature contribution to tend_w is
        divided by cell area (~1e9 m^2 even on this coarse mesh), so w must
        match a run with CURVATURE disabled in tend_w far more closely than
        the physical-pair run does."""
        import mpas_tpu.cores.atmosphere.nhyd as nhyd
        _, out_r = self._run(sphere_mesh_small, "reference", steps=6)
        _, out_p = self._run(sphere_mesh_small, "physical", steps=6)
        w_r = np.asarray(out_r.state.w)
        w_p = np.asarray(out_p.state.w)
        assert np.abs(w_r - w_p).max() > 0.0


class TestPallasAcousticKernel:
    """The fused Pallas acoustic column kernel must reproduce the jnp
    path (interpret mode on CPU; bitwise-compiled on TPU)."""

    def test_kernel_matches_jnp_path(self, sphere_mesh_small):
        from mpas_tpu import kernels as K
        from mpas_tpu.cores.atmosphere import nhyd
        grid, cfg, carry, s0 = _setup(sphere_mesh_small, 1, dt=1200.0)
        st, dg = carry.state, carry.diag
        sd = nhyd.solve_diagnostics(grid, cfg, st.u, st.rho_zz, 1200.0)
        ur, vr = nhyd.reconstruct_cell_winds(grid, st.u)
        tends = nhyd.compute_dyn_tend(
            grid, cfg, 1, 1200.0, st.u, st.w, st.theta_m, st.rho_zz, sd,
            dg.ru, dg.rw, dg.ru, dg.rw, st.theta_m, dg.rho_p,
            dg.pressure_p, ur, vr, None)
        tend_u, tend_rho, tend_theta, tend_w_raw, _, _ = tends
        tend_rw = nhyd.set_smlstep_pert_variables(grid, tend_u, tend_w_raw)
        coefs = nhyd.vert_imp_coefs(grid, cfg, 200.0, st.theta_m,
                                    dg.exner, dg.rtheta_p)
        av0 = nhyd.AcousticVars(
            ru_p=jnp.zeros_like(st.u), rho_pp=jnp.zeros_like(st.rho_zz),
            rtheta_pp=jnp.zeros_like(st.rho_zz),
            rtheta_pp_old=jnp.zeros_like(st.rho_zz),
            rw_p=jnp.zeros_like(st.w), ruAvg=jnp.zeros_like(st.u),
            wwAvg=jnp.zeros_like(st.w))

        def one(av):
            return nhyd.acoustic_step(
                grid, cfg, coefs, av, 200.0, st.theta_m, dg.exner, st.w,
                st.rho_zz, dg.rw, dg.rw, dg.ru, dg.ru,
                tend_u, tend_rho, tend_theta, tend_rw)

        try:
            K.override_acoustic_kernel(False)
            ref = one(av0)
            ref2 = one(ref)
            K.override_acoustic_kernel(True)
            got = one(av0)
            got2 = one(got)
        finally:
            K.override_acoustic_kernel(None)
        for name in ("rw_p", "rho_pp", "rtheta_pp", "wwAvg", "ru_p"):
            a = np.asarray(getattr(ref2, name))
            b = np.asarray(getattr(got2, name))
            scale = np.abs(a).max() + 1e-300
            assert np.abs(a - b).max() < 1e-9 * scale, name
