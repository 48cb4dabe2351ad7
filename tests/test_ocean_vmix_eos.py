"""Ocean EOS (JM95) and vertical-mixing coefficient schemes.

Parity model: published JM95 check values + the reference's coefficient
formulas (mpas_ocn_vmix_coefs_rich.F:258-282,362-385)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.mesh.planar import channel_hex_mesh
from mpas_tpu.cores.ocean.core import OcnConfig, run_steps
from mpas_tpu.cores.ocean.eos import density_jm, pressure_from_depth
from mpas_tpu.cores.ocean import vmix
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel

import jax


class TestJMEos:
    def test_check_value(self):
        """Jackett & McDougall (1995) check value:
        rho(T=20C, S=20 psu, p=1000 dbar=100 bar) = 1017.72886 kg/m3."""
        rho = float(density_jm(jnp.asarray(20.0), jnp.asarray(20.0), 100.0))
        assert rho == pytest.approx(1017.72886, abs=2e-3)

    def test_surface_fresh_water(self):
        """UNESCO fresh water at 4C, p=0: ~ 999.97 kg/m3 (max density)."""
        rho = float(density_jm(jnp.asarray(4.0), jnp.asarray(0.0), 0.0))
        assert rho == pytest.approx(999.97, abs=0.05)

    def test_monotone_in_salinity_and_pressure(self):
        t = jnp.asarray(10.0)
        assert float(density_jm(t, jnp.asarray(36.0), 0.0)) \
            > float(density_jm(t, jnp.asarray(34.0), 0.0))
        assert float(density_jm(t, jnp.asarray(35.0), 200.0)) \
            > float(density_jm(t, jnp.asarray(35.0), 0.0))

    def test_pressure_from_depth_near_hydrostatic(self):
        # ~1 bar per 10 m
        p = float(pressure_from_depth(jnp.asarray(1000.0)))
        assert 95.0 < p < 110.0


@pytest.fixture(scope="module")
def channel():
    m = channel_hex_mesh(8, 16, 10000.0)
    grid, state = init_baroclinic_channel(m, nz=10)
    return (jax.tree.map(jnp.asarray, grid), jax.tree.map(jnp.asarray, state))


class TestVmixSchemes:
    def test_rich_formula_limits(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_vert_mix_scheme="rich")
        rho = jnp.broadcast_to(
            jnp.linspace(1025.0, 1028.0, grid.nz)[None, :],
            state.layerThickness.shape)   # stable stratification
        visc, diff = vmix.coefs_rich(grid, cfg, state.u * 0,
                                     state.layerThickness, rho)
        # zero shear & stable => Ri -> large => coefficients ~ background
        assert float(jnp.max(visc)) <= cfg.config_convective_visc
        assert float(jnp.min(visc)) >= cfg.config_bkrd_vert_visc * 0.99
        assert float(jnp.max(diff)) < 10 * cfg.config_bkrd_vert_diff

    def test_rich_convective_when_unstable(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_vert_mix_scheme="rich")
        rho = jnp.broadcast_to(
            jnp.linspace(1028.0, 1025.0, grid.nz)[None, :],
            state.layerThickness.shape)   # inverted = unstable
        visc, diff = vmix.coefs_rich(grid, cfg, state.u * 0,
                                     state.layerThickness, rho)
        assert float(jnp.min(diff)) == pytest.approx(
            cfg.config_convective_diff)
        assert float(jnp.min(visc)) == pytest.approx(
            cfg.config_convective_visc)

    def test_tanh_profile_monotone_with_depth(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_vert_mix_scheme="tanh",
                        config_tanh_zmid=-300.0, config_tanh_zwidth=150.0)
        rho = jnp.ones_like(state.layerThickness) * 1026.0
        visc, diff = vmix.coefs_tanh(grid, cfg, state.u,
                                     state.layerThickness, rho)
        d = np.asarray(diff)
        assert np.all(np.diff(d, axis=1) <= 1e-12)       # decreasing upward?
        assert d.max() <= cfg.config_max_diff_tanh + 1e-12
        assert d.min() >= cfg.config_min_diff_tanh - 1e-12

    def test_cvmix_convection_targets_unstable_interfaces(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_vert_mix_scheme="cvmix")
        rho = jnp.broadcast_to(
            jnp.linspace(1025.0, 1028.0, grid.nz)[None, :],
            state.layerThickness.shape)
        rho = rho.at[:, :2].set(1029.0)   # unstable at top interface(s)
        visc, diff = vmix.coefs_cvmix_convection(
            grid, cfg, state.u, state.layerThickness, rho)
        d = np.asarray(diff)
        assert np.all(d[:, 1] == cfg.config_convective_diff)
        assert np.all(d[:, -1] == cfg.config_vert_diff)

    def test_channel_runs_with_rich_and_jm(self, channel):
        grid, state = channel
        cfg = OcnConfig(config_dt=30.0, config_eos_type="jm",
                        config_vert_mix_scheme="rich")
        out = run_steps(grid, cfg, state, 60)
        assert bool(jnp.all(jnp.isfinite(out.u)))
        assert bool(jnp.all(jnp.isfinite(out.tracers)))
        umax = float(jnp.max(jnp.abs(out.u)))
        assert umax < 3.0
