"""Land-ice sharded-step correctness: decomposition invariance of the
SIA FE step (the compass/landice parallelism-test genre; exchange model
per the per-timestep thickness/temperature halo group of
mpas_li_time_integration_fe.F)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.landice.config import LiConfig, SECONDS_PER_YEAR
from mpas_tpu.cores.landice.core import run_steps, total_volume
from mpas_tpu.cores.landice.distributed import (make_run_steps_li,
                                                shard_li_grid,
                                                shard_li_state)
from mpas_tpu.cores.landice.init_dome import init_halfar
from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.parallel.partition import sfc_partition
from mpas_tpu.parallel.runner import device_mesh, gather_field

_H0, _R0 = 500.0, 30000.0


@pytest.fixture(scope="module")
def dome():
    mesh = box_hex_mesh(20, 20, 4000.0)
    cfg = LiConfig(config_dt=0.25 * SECONDS_PER_YEAR,
                   config_thermal_solver="temperature",
                   config_calving="thickness_threshold",
                   config_calving_thickness=50.0)
    grid, state, _t0 = init_halfar(mesh, cfg, h0=_H0, r0=_R0)
    return mesh, cfg, grid, state


def _distributed_run(mesh, cfg, grid, state, n_parts, n_steps):
    part = sfc_partition(mesh, n_parts)
    sli = shard_li_grid(grid, cfg, part)
    st = shard_li_state(sli, state)
    out = make_run_steps_li(sli, cfg, device_mesh(n_parts))(
        jax.tree.map(jnp.asarray, sli.grid),
        jax.tree.map(jnp.asarray, sli.smesh), st, n_steps)
    return {
        "h": gather_field(sli.smesh, out.thickness, "cell", mesh.nCells),
        "t": gather_field(sli.smesh, out.temperature, "cell", mesh.nCells),
        "cf": gather_field(sli.smesh, out.calvingFlux, "cell",
                           mesh.nCells),
    }


@pytest.mark.slow
@pytest.mark.parametrize("n_parts", [4, 8])
def test_decomp_invariance(dome, n_parts):
    mesh, cfg, grid, state = dome
    n_steps = 16
    ref = run_steps(grid, cfg, state, n_steps)
    got = _distributed_run(mesh, cfg, grid, state, n_parts, n_steps)
    np.testing.assert_allclose(got["h"], np.asarray(ref.thickness),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(got["t"], np.asarray(ref.temperature),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(got["cf"], np.asarray(ref.calvingFlux),
                               rtol=0, atol=1e-8)


def test_single_part_bitwise(dome):
    """P=1 sharded path must agree with the single-device scan exactly
    (pins the scatter/gather plumbing itself)."""
    mesh, cfg, grid, state = dome
    n_steps = 4
    ref = run_steps(grid, cfg, state, n_steps)
    got = _distributed_run(mesh, cfg, grid, state, 1, n_steps)
    np.testing.assert_array_equal(got["h"], np.asarray(ref.thickness))


def test_volume_conservation_sharded(dome):
    """Interior transport conserves volume up to calving removal on the
    sharded path too."""
    mesh, cfg, grid, state = dome
    got = _distributed_run(mesh, cfg, grid, state, 4, 8)
    area = np.asarray(mesh.areaCell)
    v0 = float(np.sum(np.asarray(state.thickness) * area))
    v1 = float(np.sum(got["h"] * area))
    vc = float(np.sum(got["cf"] * area))
    assert abs((v1 + vc) - v0) / v0 < 1e-10


@pytest.mark.slow
def test_ir_advection_decomp_invariance(dome):
    """Incremental-remapping advection branch sharded: the departure
    triangles, upwind gradients, and vertex velocity recovery all close
    within the depth-3 halo, so the same per-step refresh suffices
    (ref: the shared seaice IR machinery called from
    mpas_li_advection.F's incremental_remapping branch)."""
    import dataclasses as _dc
    mesh, _cfg, grid, state = dome
    cfg = _dc.replace(_cfg,
                      config_thickness_advection="incremental_remapping")
    n_steps = 8
    ref = run_steps(grid, cfg, state, n_steps)
    got = _distributed_run(mesh, cfg, grid, state, 4, n_steps)
    np.testing.assert_allclose(got["h"], np.asarray(ref.thickness),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(got["t"], np.asarray(ref.temperature),
                               rtol=0, atol=1e-8)


@pytest.mark.slow
def test_fo_stokes_decomp_invariance(dome):
    """Distributed FO Stokes: per-shard LSQ geometry + halo import before
    every operator apply + psum'd CG dots must reproduce the global
    Krylov iteration (ref: the Albany partition of
    Interface_velocity_solver.cpp, here in-framework). Tolerance covers
    psum-vs-serial dot reassociation over the CG sweeps."""
    import dataclasses as _dc
    mesh, _cfg, _grid, state = dome
    cfg = _dc.replace(_cfg, config_velocity_solver="FO",
                      config_fo_picard_iters=3, config_fo_cg_iters=30,
                      config_nvertlevels=4, config_dt=0.25
                      * SECONDS_PER_YEAR)
    from mpas_tpu.cores.landice.core import make_grid
    from mpas_tpu.cores.landice.init_dome import init_halfar
    grid, st0, _t0 = init_halfar(mesh, cfg, h0=_H0, r0=_R0)
    n_steps = 3
    ref = run_steps(grid, cfg, st0, n_steps)
    got = _distributed_run(mesh, cfg, grid, st0, 4, n_steps)
    scale = float(np.abs(np.asarray(ref.thickness)).max())
    np.testing.assert_allclose(got["h"], np.asarray(ref.thickness),
                               rtol=0, atol=1e-6 * scale)
