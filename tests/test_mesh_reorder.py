"""SFC renumbering: structural validity + dycore equivalence.

Renumbering along the Morton curve (mpas_tpu/mesh/reorder.py) only
relabels entities — every per-row slot ordering is preserved — so the
nonhydrostatic step must reproduce the original per-cell trajectory to
reduction-reassociation tolerance (the TPU-side analogue of the reference's
contract that block numbering never changes answers; ref:
mpas_block_decomp.F:101-120).
"""

import numpy as np
import pytest

from mpas_tpu.mesh.reorder import apply_permutations, sfc_reorder_mesh
from mpas_tpu.mesh.sphere import icosahedral_mesh


@pytest.fixture(scope="module")
def mesh_pair():
    mesh0 = icosahedral_mesh(8, lloyd_iters=2)
    meshR, perms = sfc_reorder_mesh(mesh0)
    return mesh0, meshR, perms


def test_reorder_structurally_valid(mesh_pair):
    mesh0, meshR, perms = mesh_pair
    meshR.validate()
    pc, pe, pv = perms["cell"], perms["edge"], perms["vertex"]
    # permutations are bijections
    for p, n in [(pc, mesh0.nCells), (pe, mesh0.nEdges),
                 (pv, mesh0.nVertices)]:
        assert sorted(p.tolist()) == list(range(n))
    # geometry rows moved with their entity
    i_old = 17
    i_new = pc[i_old]
    assert np.asarray(meshR.xCell)[i_new] == np.asarray(mesh0.xCell)[i_old]
    # topology relabeled consistently: cellsOnEdge of a moved edge
    e_old = 31
    e_new = pe[e_old]
    np.testing.assert_array_equal(
        np.asarray(meshR.cellsOnEdge)[e_new],
        pc[np.asarray(mesh0.cellsOnEdge)[e_old]])


def test_reorder_normalizes_random_numbering(mesh_pair):
    """An adversarially shuffled mesh (the ingested-grid.nc worst case)
    regains bounded neighbor index span after SFC renumbering."""
    mesh0, _, _ = mesh_pair
    rng = np.random.default_rng(0)
    shuffled = apply_permutations(
        mesh0,
        rng.permutation(mesh0.nCells),
        rng.permutation(mesh0.nEdges),
        rng.permutation(mesh0.nVertices))
    shuffled.validate()

    def span(m):
        coc = np.asarray(m.cellsOnCell)
        mask = np.asarray(m.edgesOnCellMask) > 0
        idx = np.arange(m.nCells)[:, None]
        return np.abs(coc - idx)[mask].mean()

    normalized, _ = sfc_reorder_mesh(shuffled)
    # a random relabeling has mean span ~nCells/3; Morton restores locality
    assert span(shuffled) > 0.25 * mesh0.nCells
    assert span(normalized) < 0.2 * span(shuffled)


def test_reorder_dycore_equivalent(mesh_pair):
    import jax
    import jax.numpy as jnp

    from mpas_tpu.cores.atmosphere.config import AtmConfig
    from mpas_tpu.cores.atmosphere.init_jw import init_jw
    from mpas_tpu.cores.atmosphere.time_integration import (init_carry,
                                                            run_steps)

    mesh0, meshR, perms = mesh_pair
    cfg = AtmConfig(config_nvertlevels=6, config_dt=4000.0,
                    config_len_disp=960000.0)

    def traj(m):
        grid, state, diag = init_jw(m, cfg, case=2)
        carry = init_carry(grid, cfg, state, diag, cfg.config_dt)
        dt = jnp.asarray(cfg.config_dt, dtype=np.asarray(state.u).dtype)
        out = run_steps(grid, cfg, carry, dt, 2)
        return np.asarray(out.state.theta_m)

    a = traj(mesh0)
    b = traj(meshR)
    # the IC builders include global reductions (order-sensitive at the
    # ulp level); the dynamics itself is row-local and permutation-exact
    np.testing.assert_allclose(a, b[perms["cell"]], rtol=5e-13, atol=0)
