"""Sea-ice core: exact weak-scheme operators + EVP box experiment.

Parity model: the reference's velocity-solver unit tests
(mpas_seaice_velocity_solver_unit_tests.F exercise strain/stress-divergence
on analytic fields) + the testing_and_setup/seaice regression genres
(stability, conservation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.state import make_grid, zero_state, SeaiceForcing
from mpas_tpu.cores.seaice import velocity as vel
from mpas_tpu.cores.seaice.advection import advect_upwind
from mpas_tpu.cores.seaice.column import itd_remap, ridge
from mpas_tpu.cores.seaice.core import run_steps, total_ice_volume
from mpas_tpu.cores.seaice.init_square import init_square


@pytest.fixture(scope="module")
def box():
    mesh = box_hex_mesh(12, 12, 10000.0)
    cfg = SeaiceConfig(config_dt=600.0,
                       config_elastic_subcycle_number=60)
    grid, state, forcing = init_square(mesh, cfg)
    return mesh, cfg, grid, state, forcing


class TestWeakOperators:
    def test_strain_linear_velocity_exact(self, box):
        """u = a + b x + c y  =>  constant strain (exact by Green's thm)."""
        mesh, cfg, grid, state, forcing = box
        xv = jnp.asarray(mesh.xVertex)
        yv = jnp.asarray(mesh.yVertex)
        u = 1.0 + 2.0e-6 * xv + 3.0e-6 * yv
        v = -0.5 + 4.0e-6 * xv - 1.0e-6 * yv
        ones = jnp.ones(mesh.nCells)
        e11, e22, e12 = vel.strain_tensor_weak(grid, u, v, ones)
        # skip boundary cells (their polygons touch the wall)
        interior = np.asarray(
            jnp.sum(grid.mesh.edgeSignOnCell != 0, axis=1) ==
            jnp.asarray(grid.mesh.nEdgesOnCell))
        bnd_cell = np.zeros(mesh.nCells, dtype=bool)
        be = np.asarray(mesh.boundaryEdge) > 0
        coe = np.asarray(mesh.cellsOnEdge)
        bnd_cell[coe[be].ravel()] = True
        sel = interior & ~bnd_cell
        assert np.allclose(np.asarray(e11)[sel], 2.0e-6, atol=1e-12)
        assert np.allclose(np.asarray(e22)[sel], -1.0e-6, atol=1e-12)
        assert np.allclose(np.asarray(e12)[sel], 3.5e-6, atol=1e-12)

    def test_stress_divergence_linear_stress_exact(self, box):
        """sigma linear in (x,y) => divergence constant (exact)."""
        mesh, cfg, grid, state, forcing = box
        xc = jnp.asarray(mesh.xCell)
        yc = jnp.asarray(mesh.yCell)
        s11 = 2.0e-3 * xc + 1.0e-3 * yc
        s22 = -1.0e-3 * xc + 3.0e-3 * yc
        s12 = 0.5e-3 * xc - 0.5e-3 * yc
        ones = jnp.ones(mesh.nVertices)
        du, dv = vel.stress_divergence_weak(grid, s11, s22, s12, ones)
        # expected: du = d(s11)/dx + d(s12)/dy ; dv = d(s12)/dx + d(s22)/dy
        exp_u = 2.0e-3 - 0.5e-3
        exp_v = 0.5e-3 + 3.0e-3
        interior = np.asarray(grid.interiorVertex) > 0
        # also exclude vertices whose stencil cells touch the boundary
        be = np.asarray(mesh.boundaryEdge) > 0
        coe = np.asarray(mesh.cellsOnEdge)
        bnd_cell = np.zeros(mesh.nCells, dtype=bool)
        bnd_cell[coe[be].ravel()] = True
        cov = np.asarray(mesh.cellsOnVertex)
        good = interior & ~np.any(bnd_cell[cov], axis=1)
        assert np.allclose(np.asarray(du)[good], exp_u, rtol=1e-10)
        assert np.allclose(np.asarray(dv)[good], exp_v, rtol=1e-10)

    def test_evp_constitutive_zero_strain_decay(self, box):
        """With zero strain (Delta=0) the update is pure relaxation:
        s -> s / (1 + dt/(2T)) each substep (exactly, per the reference
        update form, constitutive_relation.F:203-215)."""
        mesh, cfg, grid, state, forcing = box
        s11 = jnp.asarray([1.0e4])
        z = jnp.zeros(1)
        p = jnp.asarray([2.0e4])
        s11o, s22o, s12o = s11, z, z
        n = 50
        for _ in range(n):
            s11o, s22o, s12o, _ = vel.evp_constitutive(
                cfg, s11o, s22o, s12o, z, z, z, p, 1.0, 100.0)
        expect = 1.0e4 / (1.0 + 0.5 / 100.0) ** n
        assert float(s11o[0] + s22o[0]) == pytest.approx(expect, rel=1e-10)
        assert float(s12o[0]) == pytest.approx(0.0, abs=1e-12)

    def test_evp_constitutive_uniaxial_compression_sign(self, box):
        """Convergent strain must build compressive (negative) stress."""
        mesh, cfg, grid, state, forcing = box
        z = jnp.zeros(1)
        e = jnp.asarray([-1.0e-6])     # convergence
        p = jnp.asarray([2.0e4])
        s11o, s22o, s12o = z, z, z
        for _ in range(200):
            s11o, s22o, s12o, _ = vel.evp_constitutive(
                cfg, s11o, s22o, s12o, e, e, z, p, 1.0, 100.0)
        assert float(s11o[0]) < 0.0
        assert float(s22o[0]) < 0.0


class TestBoxExperiment:
    def test_evp_spins_up_bounded_drift(self, box):
        mesh, cfg, grid, state, forcing = box
        out = run_steps(grid, cfg, state, forcing, 6)   # 1 h
        sp = jnp.sqrt(out.uVelocity ** 2 + out.vVelocity ** 2)
        assert bool(jnp.all(jnp.isfinite(sp)))
        # ice drifts (wind ~5-8 m/s => drift ~ a few % of wind)
        assert 0.001 < float(jnp.max(sp)) < 2.0

    def test_advection_conserves_volume_no_thermo(self, box):
        mesh, cfg, grid, state, forcing = box
        cfg2 = SeaiceConfig(config_dt=600.0,
                            config_elastic_subcycle_number=60,
                            config_use_column_physics=False)
        v0 = float(total_ice_volume(grid, state))
        out = run_steps(grid, cfg2, state, forcing, 6)
        v1 = float(total_ice_volume(grid, out))
        assert v1 == pytest.approx(v0, rel=1e-12)
        assert bool(jnp.all(out.iceAreaCategory >= 0.0))

    def test_itd_remap_conserves(self, box):
        mesh, cfg, grid, state, forcing = box
        # force thicknesses out of their bins
        st2 = state.replace(iceVolumeCategory=state.iceVolumeCategory * 3.0)
        out = itd_remap(cfg, st2)
        assert float(jnp.sum(out.iceVolumeCategory)) == pytest.approx(
            float(jnp.sum(st2.iceVolumeCategory)), rel=1e-13)
        assert float(jnp.sum(out.iceAreaCategory)) == pytest.approx(
            float(jnp.sum(st2.iceAreaCategory)), rel=1e-13)
        # every nonzero category now sits inside its bounds
        a = np.asarray(out.iceAreaCategory)
        h = np.asarray(out.iceVolumeCategory) / np.where(a > 1e-11, a, 1.0)
        bounds = np.asarray(cfg.config_itd_bounds)
        for k in range(cfg.config_n_categories):
            sel = a[:, k] > 1e-11
            assert np.all(h[sel, k] >= bounds[k] - 1e-9)
            assert np.all(h[sel, k] <= bounds[k + 1] + 1e-9)

    def test_ridging_caps_area(self, box):
        mesh, cfg, grid, state, forcing = box
        st2 = state.replace(iceAreaCategory=state.iceAreaCategory * 1.5)
        out = ridge(cfg, st2)
        assert float(jnp.max(jnp.sum(out.iceAreaCategory, axis=-1))) \
            <= 1.0 + 1e-12
        # mechanical redistribution moves volume between categories but
        # conserves it per cell (ref ice_mechred.F90 ridge_shift :1027)
        assert np.allclose(
            np.asarray(jnp.sum(out.iceVolumeCategory, axis=-1)),
            np.asarray(jnp.sum(st2.iceVolumeCategory, axis=-1)))
        # ridging never thins: redistributed ice lands in categories at
        # least as thick as its source
        a_out = np.asarray(out.iceAreaCategory)
        assert np.all(np.sum(a_out, axis=-1)
                      <= np.sum(np.asarray(st2.iceAreaCategory), axis=-1)
                      + 1e-12)

    def test_thermo_growth_in_cold_freezing_ocean(self, box):
        """Cold air + ocean losing heat => ice grows."""
        mesh, cfg, grid, state, forcing = box
        frc = forcing.replace(
            airTemperature=forcing.airTemperature * 0 - 30.0,
            shortwaveDown=forcing.shortwaveDown * 0,
            oceanHeatFlux=forcing.oceanHeatFlux * 0 - 50.0)
        cfg2 = SeaiceConfig(config_dt=600.0,
                            config_use_velocity_solver=False,
                            config_advection_type="none")
        v0 = float(total_ice_volume(grid, state))
        out = run_steps(grid, cfg2, state, frc, 12)
        v1 = float(total_ice_volume(grid, out))
        assert v1 > v0

    def test_thermo_melt_in_warm_summer(self, box):
        mesh, cfg, grid, state, forcing = box
        frc = forcing.replace(
            airTemperature=forcing.airTemperature * 0 + 5.0,
            shortwaveDown=forcing.shortwaveDown * 0 + 600.0,
            longwaveDown=forcing.longwaveDown * 0 + 320.0,
            oceanHeatFlux=forcing.oceanHeatFlux * 0 + 30.0)
        cfg2 = SeaiceConfig(config_dt=600.0,
                            config_use_velocity_solver=False,
                            config_advection_type="none")
        v0 = float(total_ice_volume(grid, state))
        out = run_steps(grid, cfg2, state, frc, 12)
        v1 = float(total_ice_volume(grid, out))
        assert v1 < v0


class TestVariational:
    @pytest.fixture(scope="class")
    def vgrid(self):
        mesh = box_hex_mesh(10, 10, 10000.0)
        from mpas_tpu.cores.seaice.state import make_grid
        return mesh, make_grid(mesh, variational=True)

    def test_strain_exact_for_linear_velocity(self, vgrid):
        """Wachspress basis reproduces linear fields exactly, so corner
        strains of a linear velocity are exact (ref: the variational
        unit tests, mpas_seaice_velocity_solver_unit_tests.F)."""
        from mpas_tpu.cores.seaice.variational import (
            strain_tensor_variational)
        mesh, grid = vgrid
        xv = jnp.asarray(mesh.xVertex)
        yv = jnp.asarray(mesh.yVertex)
        u = 2.0e-6 * xv + 3.0e-6 * yv
        v = 4.0e-6 * xv - 1.0e-6 * yv
        e11, e22, e12 = strain_tensor_variational(mesh, grid.variational,
                                                  u, v)
        ne = np.asarray(mesh.nEdgesOnCell)
        for c in range(mesh.nCells):
            n = int(ne[c])
            assert np.allclose(np.asarray(e11[c, :n]), 2.0e-6, rtol=1e-4)
            assert np.allclose(np.asarray(e22[c, :n]), -1.0e-6, rtol=1e-4)
            assert np.allclose(np.asarray(e12[c, :n]), 3.5e-6, rtol=1e-4)

    def test_divergence_zero_for_constant_stress(self, vgrid):
        """Constant stress => zero variational divergence at interior
        vertices (edge contributions cancel between neighbor cells)."""
        from mpas_tpu.cores.seaice.variational import (
            stress_divergence_variational)
        from mpas_tpu.cores.seaice.state import make_grid
        mesh, grid = vgrid
        s = jnp.ones((mesh.nCells, mesh.maxEdges)) * 1.0e3
        fu, fv = stress_divergence_variational(mesh, grid.variational,
                                               s, s, 0.0 * s)
        interior = np.asarray(grid.interiorVertex) > 0
        # exclude vertices adjacent to boundary cells (their polygons are
        # clipped)
        be = np.asarray(mesh.boundaryEdge) > 0
        coe = np.asarray(mesh.cellsOnEdge)
        bnd_cell = np.zeros(mesh.nCells, dtype=bool)
        bnd_cell[coe[be].ravel()] = True
        cov = np.asarray(mesh.cellsOnVertex)
        good = interior & ~np.any(bnd_cell[cov], axis=1)
        assert good.sum() > 5
        assert np.max(np.abs(np.asarray(fu)[good])) < 1e-6
        assert np.max(np.abs(np.asarray(fv)[good])) < 1e-6

    def test_box_runs_with_variational_scheme(self, vgrid):
        mesh, grid = vgrid
        cfg = SeaiceConfig(config_dt=600.0,
                           config_elastic_subcycle_number=60,
                           config_stress_divergence_scheme="variational")
        _, state, forcing = init_square(mesh, cfg)
        out = run_steps(grid, cfg, state, forcing, 4)
        sp = jnp.sqrt(out.uVelocity ** 2 + out.vVelocity ** 2)
        assert bool(jnp.all(jnp.isfinite(sp)))
        assert 0.001 < float(jnp.max(sp)) < 2.0


class TestPrincipalStresses:
    def test_on_yield_curve_after_spinup(self, box):
        """After EVP spin-up the normalized principal stresses must lie on
        or inside the elliptical yield curve
        ((2 s1 + P)/P)^2/1 + ... ellipse with e=2 (ref: principal_stresses
        diagnostic + the EVP constitutive law)."""
        mesh, cfg, grid, state, forcing = box
        out = run_steps(grid, cfg, state, forcing, 4)
        from mpas_tpu.cores.seaice.velocity import (aggregate_state,
                                                    ice_strength,
                                                    principal_stresses)
        a, vi, _, _ = aggregate_state(cfg, out)
        p = ice_strength(cfg, a, vi)
        s1, s2 = principal_stresses(cfg, out.stress11, out.stress22,
                                    out.stress12, p)
        s1n = np.asarray(s1)
        s2n = np.asarray(s2)
        valid = np.isfinite(s1n)
        assert valid.sum() > 10
        # elliptical yield curve in normalized coords: the stress state
        # (s1+s2+1)^2 + ((s1-s2)*e)^2 <= ~1 (allow EVP overshoot slack)
        e = 2.0
        lhs = (s1n[valid] + s2n[valid] + 1.0) ** 2 \
            + (e * (s1n[valid] - s2n[valid])) ** 2
        assert np.percentile(lhs, 95) < 1.5
        # stresses are compressive on average
        assert np.mean(s1n[valid] + s2n[valid]) < 0.1


class TestMechanicalRidging:
    """ice_mechred.F90 parity properties: participation of thin ice,
    volume/energy conservation, area reduction under compression."""

    def _mkstate(self, nC=6, ncat=5, with_enthalpy=False):
        from mpas_tpu.cores.seaice.config import SeaiceConfig
        cfg = SeaiceConfig()
        rng = np.random.default_rng(11)
        a = rng.uniform(0.1, 0.35, (nC, ncat))
        a = a / a.sum(-1, keepdims=True) * 1.15     # compressed: asum > 1
        h_mid = np.array([0.3, 1.0, 1.9, 3.5, 6.0])[:ncat]
        v = a * h_mid[None, :]
        vs = 0.1 * a
        ts = np.full((nC, ncat), -5.0)
        qi = qs = None
        if with_enthalpy:
            qi = np.full((nC, ncat, 4), -2.0e8)
            qs = np.full((nC, ncat, 1), -1.1e8)
        j = jnp.asarray
        return cfg, j(a), j(v), j(vs), j(ts), \
            (j(qi) if qi is not None else None), \
            (j(qs) if qs is not None else None)

    def test_compression_restores_area_conserves_volume(self):
        from mpas_tpu.cores.seaice.ridging import ridge_step
        cfg, a, v, vs, ts, qi, qs = self._mkstate()
        a2, v2, vs2, ts2, _, _, a_open = ridge_step(cfg, a, v, vs, ts,
                                                    3600.0)
        asum2 = np.asarray(jnp.sum(a2, -1))
        assert (asum2 <= 1.0 + 1e-6).all()
        assert (asum2 > 0.9).all()                  # not over-closed
        # ice volume conserved exactly
        np.testing.assert_allclose(np.asarray(jnp.sum(v2, -1)),
                                   np.asarray(jnp.sum(v, -1)), rtol=1e-12)
        # snow volume decreases (the (1-fsnowrdg) share goes to the ocean)
        assert (np.asarray(jnp.sum(vs2, -1))
                <= np.asarray(jnp.sum(vs, -1)) + 1e-12).all()

    def test_ridged_ice_moves_to_thicker_categories(self):
        from mpas_tpu.cores.seaice.ridging import ridge_step
        cfg, a, v, vs, ts, qi, qs = self._mkstate()
        a2, v2, *_ = ridge_step(cfg, a, v, vs, ts, 3600.0)
        h1 = np.asarray(jnp.sum(v, -1) / jnp.sum(a, -1))
        h2 = np.asarray(jnp.sum(v2, -1) / jnp.sum(a2, -1))
        assert (h2 > h1).all()                      # mean thickness grows
        # thin category loses area preferentially (participation function)
        da = np.asarray(a2 - a)
        assert (da[:, 0] < 0).all()

    def test_enthalpy_conserved(self):
        from mpas_tpu.cores.seaice.ridging import ridge_step
        cfg, a, v, vs, ts, qi, qs = self._mkstate(with_enthalpy=True)
        a2, v2, vs2, ts2, qi2, qs2, _ = ridge_step(cfg, a, v, vs, ts,
                                                   3600.0, q_ice=qi,
                                                   q_snow=qs)
        e1 = np.asarray(jnp.sum(qi * v[..., None], (-1, -2)))
        e2 = np.asarray(jnp.sum(qi2 * v2[..., None], (-1, -2)))
        np.testing.assert_allclose(e2, e1, rtol=1e-10)  # ice energy exact
        # uniform enthalpy stays uniform (no spurious mixing artifacts)
        assert np.allclose(np.asarray(qi2), -2.0e8, rtol=1e-10)

    def test_dynamics_closing_rate_ridges_subunity_ice(self):
        """Even with asum < 1, a convergent-flow closing rate must ridge."""
        from mpas_tpu.cores.seaice.ridging import ridge_step
        cfg, a, v, vs, ts, qi, qs = self._mkstate()
        a = a * 0.7                                 # asum ~ 0.8
        v = v * 0.7
        closing = jnp.full((a.shape[0],), 1e-5)     # 1/s
        a2, v2, *_ = ridge_step(cfg, a, v, vs, ts, 3600.0,
                                closing_rate=closing)
        assert (np.asarray(jnp.sum(a2, -1))
                < np.asarray(jnp.sum(a, -1)) - 1e-4).all()
        np.testing.assert_allclose(np.asarray(jnp.sum(v2, -1)),
                                   np.asarray(jnp.sum(v, -1)), rtol=1e-12)


class TestPwlBasis:
    """PWL variational basis (ref: mpas_seaice_velocity_solver_pwl.F) —
    same contract as Wachspress: partition of unity, linear completeness,
    and exact strains for linear velocity fields."""

    def test_partition_of_unity_and_linear_completeness(self):
        from mpas_tpu.cores.seaice.variational import _pwl
        rng = np.random.default_rng(3)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 6))
        verts = np.stack([np.cos(ang), np.sin(ang)], -1)
        wg = _pwl(verts)
        for p in (np.array([0.05, -0.1]), np.array([0.3, 0.2]),
                  verts.mean(axis=0)):
            phi, g = wg(p)
            assert abs(phi.sum() - 1.0) < 1e-12
            assert np.abs(g.sum(axis=0)).max() < 1e-10
            # linear completeness: sum_j phi_j v_j = p
            np.testing.assert_allclose(phi @ verts, p, atol=1e-12)
            # gradient reproduces the identity map
            np.testing.assert_allclose(g.T @ verts, np.eye(2), atol=1e-9)

    def test_strain_linear_velocity_exact_pwl(self):
        from mpas_tpu.cores.seaice.variational import (
            build_variational_coeffs, strain_tensor_variational)
        from mpas_tpu.mesh.planar import box_hex_mesh
        m = box_hex_mesh(6, 6, 1000.0)
        coeffs = build_variational_coeffs(m, basis="pwl")
        xv = np.asarray(m.xVertex)
        yv = np.asarray(m.yVertex)
        # u = a x + b y, v = c x + d y -> e11 = a, e22 = d, e12 = (b+c)/2
        a, b, c, d = 2e-6, -1e-6, 3e-6, 1.5e-6
        u = jnp.asarray(a * xv + b * yv)
        v = jnp.asarray(c * xv + d * yv)
        e11, e22, e12 = strain_tensor_variational(m, coeffs, u, v)
        nEoC = np.asarray(m.nEdgesOnCell)
        interior = ~np.any(np.asarray(m.boundaryEdge)[
            np.asarray(m.edgesOnCell)] > 0, axis=1) \
            & (np.asarray(m.edgesOnCellMask).sum(-1) == nEoC)
        for field, expect in ((e11, a), (e22, d), (e12, 0.5 * (b + c))):
            vals = np.asarray(field)[interior]
            mask = np.asarray(m.edgesOnCellMask)[interior] > 0
            err = np.abs(vals[mask] - expect)
            assert err.max() < 5e-2 * abs(expect) + 1e-9

    def test_velocity_solver_runs_with_pwl(self):
        from mpas_tpu.cores.seaice.variational import (
            build_variational_coeffs, stress_divergence_variational)
        from mpas_tpu.mesh.planar import box_hex_mesh
        m = box_hex_mesh(6, 6, 1000.0)
        coeffs = build_variational_coeffs(m, basis="pwl")
        rng = np.random.default_rng(5)
        s = jnp.asarray(rng.standard_normal((m.nCells, m.maxEdges)))
        fu, fv = stress_divergence_variational(m, coeffs, s, s, 0.5 * s)
        assert np.isfinite(np.asarray(fu)).all()
        assert np.isfinite(np.asarray(fv)).all()
