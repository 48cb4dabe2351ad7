"""Sea-ice sharded-step correctness: decomposition invariance of the EVP
dynamics + transport + column step (the compass/seaice parallelism-test
genre, ref: testing_and_setup/seaice tests/parallelism.py; exchange
choreography per the per-subcycle velocity exchanges of
mpas_seaice_velocity_solver.F:2326-2485)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpas_tpu.cores.seaice.config import SeaiceConfig
from mpas_tpu.cores.seaice.core import run_steps
from mpas_tpu.cores.seaice.distributed import (make_run_steps_seaice,
                                               shard_seaice_forcing,
                                               shard_seaice_grid,
                                               shard_seaice_state)
from mpas_tpu.cores.seaice.init_square import init_square
from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.parallel.partition import sfc_partition
from mpas_tpu.parallel.runner import device_mesh, gather_field


@pytest.fixture(scope="module")
def square():
    """Smooth dynamics configuration: full ice cover (no open-water strip)
    and column physics off. The standard box config's puny/area thresholds
    make the EVP step chaotic to roundoff (a 1e-12 velocity perturbation
    grows to ~7e-4 in ONE step through the solve_vel mask flips — measured;
    the reference's MPI decomposition sidesteps this only because ranks
    compute bitwise-identical sums, which XLA's shape-dependent reduction
    tiling does not guarantee). Uniform masks remove the flips and expose
    the exchange machinery itself to a tight tolerance."""
    import jax.numpy as _jnp
    m = box_hex_mesh(12, 12, 20000.0)
    cfg = SeaiceConfig(config_dt=600.0,
                       config_stress_divergence_scheme="weak",
                       config_use_column_physics=False)
    grid, state, forcing = init_square(m, cfg)
    a = np.asarray(state.iceAreaCategory)
    tot = a.sum(-1)
    a1 = np.where(tot[:, None] > 0, a / np.maximum(tot[:, None], 1e-12),
                  0.0)
    a1[tot <= 0] = a1[tot > 0].mean(0)        # fill the open strip
    h = np.asarray(state.iceVolumeCategory).sum(-1)
    h = np.where(h > 0, h, 1.5)
    state = state.replace(
        iceAreaCategory=_jnp.asarray(a1),
        iceVolumeCategory=_jnp.asarray(a1 * h[:, None]),
        snowVolumeCategory=_jnp.asarray(0.1 * a1))
    return m, cfg, grid, state, forcing


def _distributed_run(m, cfg, grid, state, forcing, n_parts, n_steps):
    part = sfc_partition(m, n_parts)
    ssi = shard_seaice_grid(grid, part)
    st = shard_seaice_state(ssi, state)
    fo = shard_seaice_forcing(ssi, forcing)
    out = make_run_steps_seaice(ssi, cfg, device_mesh(n_parts))(
        jax.tree.map(jnp.asarray, ssi.grid),
        jax.tree.map(jnp.asarray, ssi.smesh), st, fo, n_steps)
    return {
        "u": gather_field(ssi.smesh, out.uVelocity, "vertex", m.nVertices),
        "a": gather_field(ssi.smesh, out.iceAreaCategory, "cell", m.nCells),
        "v": gather_field(ssi.smesh, out.iceVolumeCategory, "cell",
                          m.nCells),
    }


# Tolerance structure (diagnosed round 4):
#  (1) N-vs-M-shard decomposition invariance is BITWISE: 2/4/8-shard runs
#      produce identical results at every step count because the sharded
#      arithmetic (owned+halo gathers, slot-ordered sums) is independent
#      of the partition (ulp-level: transport rounds tiny category
#      areas at ~1e-21 absolute) — strictly stronger than the reference's 4-vs-8
#      proc decomp_test genre, which is only bitwise because ranks reuse
#      the serial orderings.
#  (2) distributed-vs-single-device agreement is limited by the EVP's own
#      perturbation amplification (~5e6 per step through 120 elastic
#      subcycles, measured by direct perturbation on the single-device
#      path — NOT an exchange artifact: one step agrees to ~1e-11 and
#      full-depth per-subcycle exchanges change nothing), seeded by the
#      SFC reindexing's summation-order change (~roundoff). So the
#      vs-single-device check runs ONE step at near-roundoff, and the
#      multi-step check asserts cross-shard bitwise equality plus
#      conservation.
def test_decomp_invariance_bitwise_across_shards(square):
    m, cfg, grid, state, forcing = square
    g2 = _distributed_run(m, cfg, grid, state, forcing, 2, 4)
    g4 = _distributed_run(m, cfg, grid, state, forcing, 4, 4)
    g8 = _distributed_run(m, cfg, grid, state, forcing, 8, 4)
    for k in ("u", "a", "v"):
        np.testing.assert_allclose(g2[k], g4[k], rtol=5e-14,
                                   atol=1e-18, err_msg=k)
        np.testing.assert_allclose(g4[k], g8[k], rtol=5e-14,
                                   atol=1e-18, err_msg=k)


def test_one_step_vs_single_device_roundoff(square):
    m, cfg, grid, state, forcing = square
    ref = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                    jax.tree.map(jnp.asarray, state),
                    jax.tree.map(jnp.asarray, forcing), 1)
    got = _distributed_run(m, cfg, grid, state, forcing, 4, 1)
    np.testing.assert_allclose(got["u"], np.asarray(ref.uVelocity),
                               atol=1e-9)
    np.testing.assert_allclose(got["a"], np.asarray(ref.iceAreaCategory),
                               atol=1e-11)
    np.testing.assert_allclose(got["v"], np.asarray(ref.iceVolumeCategory),
                               atol=1e-11)


@pytest.mark.parametrize("n_parts", [4, 8])
def test_decomp_conservation(square, n_parts):
    m, cfg, grid, state, forcing = square
    ref = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                    jax.tree.map(jnp.asarray, state),
                    jax.tree.map(jnp.asarray, forcing), 4)
    got = _distributed_run(m, cfg, grid, state, forcing, n_parts, 4)
    area = np.asarray(m.areaCell)
    for f_ in ("a", "v"):
        ref_tot = float((np.asarray(getattr(ref, {"a": "iceAreaCategory",
                        "v": "iceVolumeCategory"}[f_])).sum(-1)
                         * area).sum())
        got_tot = float((got[f_].sum(-1) * area).sum())
        assert abs(got_tot - ref_tot) / abs(ref_tot) < 1e-9, f_


def test_revised_evp_decomp(square):
    """Revised EVP (Bouillon et al. 2013; ref: config_revised_evp,
    solve_velocity_revised mpas_seaice_velocity_solver.F:2721,
    constitutive_relation_revised :230): cross-shard bitwise + stable,
    finite velocities."""
    import dataclasses as _dc
    m, _cfg, grid, state, forcing = square
    cfg = _dc.replace(_cfg, config_revised_evp=True)
    ref = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                    jax.tree.map(jnp.asarray, state),
                    jax.tree.map(jnp.asarray, forcing), 4)
    assert np.all(np.isfinite(np.asarray(ref.uVelocity)))
    g4 = _distributed_run(m, cfg, grid, state, forcing, 4, 4)
    g8 = _distributed_run(m, cfg, grid, state, forcing, 8, 4)
    for k in ("u", "a", "v"):
        np.testing.assert_allclose(g4[k], g8[k], rtol=5e-14,
                                   atol=1e-18, err_msg=k)


def test_single_shard_bitwise(square):
    m, cfg, grid, state, forcing = square
    ref = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                    jax.tree.map(jnp.asarray, state),
                    jax.tree.map(jnp.asarray, forcing), 2)
    got = _distributed_run(m, cfg, grid, state, forcing, 1, 2)
    assert np.array_equal(got["u"], np.asarray(ref.uVelocity))
    assert np.array_equal(got["v"], np.asarray(ref.iceVolumeCategory))


def test_vertex_schedules_exist(square):
    m, cfg, grid, state, forcing = square
    part = sfc_partition(m, 4)
    ssi = shard_seaice_grid(grid, part)
    sm = ssi.smesh
    assert sm.vertex_nx is not None and 2 in sm.vertex_nx
    # the subcycle's depth-2 vertex schedule moves less than full depth
    assert sm.vertex_nx[2].volume <= sm.vertex_nx[sm.halo_depth].volume


@pytest.mark.slow
def test_variational_decomp_invariance(square):
    """Variational (Wachspress) stress-divergence scheme sharded via
    per-shard rebuild of the basis tensors (block-local variational init,
    ref: seaice_init_velocity_solver_variational run per block).
    Cross-shard bitwise + 1-step near-roundoff vs single device (see the
    tolerance-structure note above)."""
    import dataclasses as _dc
    from mpas_tpu.cores.seaice.state import make_grid
    m, _cfg, _grid, state, forcing = square
    cfg = _dc.replace(_cfg, config_stress_divergence_scheme="variational")
    grid = make_grid(m, variational=True)

    def drun(n_parts, n_steps):
        part = sfc_partition(m, n_parts)
        ssi = shard_seaice_grid(grid, part)
        st = shard_seaice_state(ssi, state)
        fo = shard_seaice_forcing(ssi, forcing)
        out = make_run_steps_seaice(ssi, cfg, device_mesh(n_parts))(
            jax.tree.map(jnp.asarray, ssi.grid),
            jax.tree.map(jnp.asarray, ssi.smesh), st, fo, n_steps)
        return {
            "u": gather_field(ssi.smesh, out.uVelocity, "vertex",
                              m.nVertices),
            "a": gather_field(ssi.smesh, out.iceAreaCategory, "cell",
                              m.nCells),
        }

    ref1 = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                     jax.tree.map(jnp.asarray, state),
                     jax.tree.map(jnp.asarray, forcing), 1)
    got1 = drun(4, 1)
    np.testing.assert_allclose(got1["u"], np.asarray(ref1.uVelocity),
                               atol=1e-9)

    g4 = drun(4, 4)
    g8 = drun(8, 4)
    for k in ("u", "a"):
        np.testing.assert_allclose(g4[k], g8[k], rtol=5e-14,
                                   atol=1e-18, err_msg=k)

    ref = run_steps(jax.tree.map(jnp.asarray, grid), cfg,
                    jax.tree.map(jnp.asarray, state),
                    jax.tree.map(jnp.asarray, forcing), 4)
    area = np.asarray(m.areaCell)
    ref_tot = float((np.asarray(ref.iceAreaCategory).sum(-1) * area).sum())
    got_tot = float((g4["a"].sum(-1) * area).sum())
    assert abs(got_tot - ref_tot) / abs(ref_tot) < 1e-9
