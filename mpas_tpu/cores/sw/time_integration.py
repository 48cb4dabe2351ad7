"""Shallow-water RK4 time integration.

ref: sw_rk4, src/core_sw/mpas_sw_time_integration.F:65-357. The reference's
pool-clone + per-block halo-exchange choreography collapses to a pure
function: one jitted step advancing (u, h, tracers); multi-step runs use
lax.scan so the whole trajectory is a single XLA computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mpas_tpu.mesh.mesh import Mesh
from mpas_tpu.cores.sw.config import SWConfig
from mpas_tpu.cores.sw.dynamics import (compute_scalar_tend, compute_tend,
                                        solve_diagnostics)
from mpas_tpu.cores.sw.state import SWState

# RK4 classic weights (ref: :115-123)
_RK_WEIGHTS = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
_RK_SUBSTEP = (0.5, 0.5, 1.0, 0.0)


def _stage(mesh, cfg, provis, dt, h_s):
    """One RK-stage tendency: fused gather-batched path when available,
    generic operator path otherwise (del4 not yet in the fused path)."""
    if cfg.config_h_mom_eddy_visc4 <= 0.0 and not cfg.config_monotonic:
        from mpas_tpu.cores.sw.fused import stage_tendencies
        return stage_tendencies(mesh, cfg, provis, dt, h_s)
    diag = solve_diagnostics(mesh, cfg, provis, dt, h_s)
    ct_provis = provis.tracers * provis.h[:, None]
    tend_u, tend_h = compute_tend(mesh, cfg, provis, diag, h_s)
    tend_ct = compute_scalar_tend(mesh, cfg, provis, diag, ct_provis)
    return tend_u, tend_h, tend_ct


def rk4_step(mesh: Mesh, cfg: SWConfig, state: SWState, h_s, dt) -> SWState:
    """One RK4 step. Tracers advance in coupled (h*psi) form (ref: :72-78)."""
    u0, h0 = state.u, state.h
    ct0 = state.tracers * h0[:, None]       # couple tracers

    u_acc, h_acc, ct_acc = u0, h0, ct0
    provis = state
    for stage in range(4):
        tend_u, tend_h, tend_ct = _stage(mesh, cfg, provis, dt, h_s)

        u_acc = u_acc + dt * _RK_WEIGHTS[stage] * tend_u
        h_acc = h_acc + dt * _RK_WEIGHTS[stage] * tend_h
        ct_acc = ct_acc + dt * _RK_WEIGHTS[stage] * tend_ct

        if stage < 3:
            w = dt * _RK_SUBSTEP[stage]
            hp = h0 + w * tend_h
            provis = SWState(
                u=u0 + w * tend_u,
                h=hp,
                tracers=(ct0 + w * tend_ct) / hp[:, None])

    return SWState(u=u_acc, h=h_acc, tracers=ct_acc / h_acc[:, None])


@functools.partial(jax.jit, static_argnums=(1, 4))
def run_steps(mesh: Mesh, cfg: SWConfig, state: SWState, h_s,
              n_steps: int) -> SWState:
    """Advance n_steps with lax.scan (single compiled program)."""
    dt = jnp.asarray(cfg.config_dt, dtype=state.h.dtype)

    def body(s, _):
        return rk4_step(mesh, cfg, s, h_s, dt), None

    final, _ = jax.lax.scan(body, state, None, length=n_steps)
    return final
