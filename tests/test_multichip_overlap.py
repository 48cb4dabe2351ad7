"""Compiler-verified compute/comm overlap on the multichip TPU program.

ref: the reference's begin/local/end split halo exchange
(mpas_dmpar.F:6993-7142) exists so interior compute proceeds while MPI
messages are in flight. The TPU analogue is XLA's async collectives:
`collective-permute-start` issued early, `collective-permute-done`
consumed late, with independent fusions SCHEDULED between them. This
test AOT-compiles the real distributed dycore for an 8-device v5e
topology (jax.experimental.topologies — no hardware needed) and asserts
that interleaving actually happens in the scheduled module, turning the
overlap claim of time_integration.py:210 into a compiler-checked fact.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _has_tpu_compiler():
    try:
        from jax.experimental import topologies
        topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
        return True
    except Exception:
        return False


@pytest.mark.slow
@pytest.mark.skipif(not _has_tpu_compiler(),
                    reason="TPU AOT compiler unavailable")
def test_collective_permute_overlaps_compute():
    from jax.experimental import topologies

    from mpas_tpu.cores.atmosphere.config import AtmConfig
    from mpas_tpu.cores.atmosphere.distributed import (make_run_steps_atm,
                                                       shard_atm_grid,
                                                       shard_atm_state)
    from mpas_tpu.cores.atmosphere.init_jw import init_jw
    from mpas_tpu.cores.atmosphere.time_integration import init_carry
    from mpas_tpu.cores.atmosphere.time_integration import AtmCarry
    from mpas_tpu.mesh.sphere import icosahedral_mesh
    from mpas_tpu.parallel.partition import sfc_partition
    from mpas_tpu.parallel.runner import AXIS, scatter_field

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    devs = np.array(topo.devices).reshape(8)
    dmesh = jax.sharding.Mesh(devs, (AXIS,))

    dtype = np.float32
    mesh0 = icosahedral_mesh(8, lloyd_iters=1)
    cfg = AtmConfig(config_nvertlevels=8, config_dt=3600.0,
                    config_len_disp=1.9e6)
    grid, state, diag = init_jw(mesh0, cfg, case=2)

    def cast(t):
        return jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a, dtype))
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else jnp.asarray(np.asarray(a)), t)

    gridj = cast(grid)
    carry0 = init_carry(gridj, cfg, cast(state), cast(diag),
                        cfg.config_dt)
    part = sfc_partition(grid.mesh, 8)
    satm = shard_atm_grid(grid, part)
    sm = satm.smesh

    def c(x):
        return np.asarray(scatter_field(sm, np.asarray(x), "cell"), dtype)

    def e(x):
        return np.asarray(scatter_field(sm, np.asarray(x), "edge"), dtype)

    def v(x):
        return np.asarray(scatter_field(sm, np.asarray(x), "vertex"),
                          dtype)

    from mpas_tpu.cores.atmosphere.distributed import shard_atm_state
    st, dg = shard_atm_state(satm, state, diag)
    carry_st = AtmCarry(
        state=jax.tree.map(lambda a: np.asarray(a, dtype)
                           if np.issubdtype(np.asarray(a).dtype,
                                            np.floating)
                           else np.asarray(a), st),
        diag=jax.tree.map(lambda a: np.asarray(a, dtype), dg),
        v=e(carry0.v), sdiag_ke=c(carry0.sdiag_ke),
        sdiag_div=c(carry0.sdiag_div), sdiag_vort=v(carry0.sdiag_vort),
        sdiag_pv_edge=e(carry0.sdiag_pv_edge),
        sdiag_rho_edge=e(carry0.sdiag_rho_edge),
        ur_cell=c(carry0.ur_cell), vr_cell=c(carry0.vr_cell),
        rt_diabatic_tend=c(carry0.rt_diabatic_tend),
        rainnc=c(carry0.rainnc))

    def castf(tree):
        return jax.tree.map(
            lambda a: np.asarray(a, dtype)
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else np.asarray(a), tree)

    runner = make_run_steps_atm(satm, cfg, dmesh)
    lowered = runner.lower(castf(satm.grid), castf(sm), carry_st, 1)
    compiled = lowered.compile()
    txt = compiled.as_text()

    # async collective pairs must exist in the optimized module
    starts = len(re.findall(r"collective-permute-start", txt))
    dones = len(re.findall(r"collective-permute-done", txt))
    assert starts > 0 and dones > 0, "no async collective-permutes found"

    # scheduled interleaving: between at least one start and its done
    # there are real compute instructions (fusions) — the begin/local/end
    # overlap structure
    lines = txt.splitlines()
    start_ids = {}
    overlap_found = 0
    # NOTE: a done line CONTAINS the start's name as its operand, so the
    # done pattern must be checked first
    pat_done = re.compile(r"collective-permute-done\((%[\w.\-]+)\)")
    pat_start = re.compile(
        r"(%?[\w.\-]+)\s*=\s*.*\bcollective-permute-start\(")
    compute_pat = re.compile(r"= \S*fusion\.|_fusion")
    for i, ln in enumerate(lines):
        md = pat_done.search(ln)
        if md:
            src = md.group(1).strip("% ")
            j = start_ids.get(src)
            if j is not None:
                between = "\n".join(lines[j + 1:i])
                if compute_pat.search(between):
                    overlap_found += 1
            continue
        ms = pat_start.search(ln)
        if ms:
            start_ids[ms.group(1).strip("% ")] = i
    assert overlap_found > 0, (
        "no compute scheduled between any collective-permute start/done "
        "pair — exchanges are not overlapped")
