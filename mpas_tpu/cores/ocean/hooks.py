"""Ocean core hooks for the run driver (ref: ocn_forward_mode setup,
mpas_ocn_forward_mode.F:142)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.framework.driver import CoreHooks
from mpas_tpu.cores.ocean.core import OcnConfig, OcnState, run_steps
from mpas_tpu.cores.ocean.init_channel import init_baroclinic_channel
from mpas_tpu.cores.sw.hooks import parse_mesh_spec


@dataclasses.dataclass
class _OcnRun:
    grid: object
    cfg: OcnConfig
    state: OcnState


def _setup(cfg: OcnConfig, mesh_spec: str):
    mesh = parse_mesh_spec(mesh_spec)
    grid, state = init_baroclinic_channel(mesh)
    return _OcnRun(grid=jax.tree.map(jnp.asarray, grid), cfg=cfg,
                   state=jax.tree.map(jnp.asarray, state))


def _step_chunk(run: _OcnRun, n: int):
    run.state = run_steps(run.grid, run.cfg, run.state, n)
    return run


def _fields(run: _OcnRun, restart: bool):
    s = run.state
    m = run.grid.mesh
    out = {
        "normalVelocity": (("nEdges", "nVertLevels"), np.asarray(s.u)),
        "layerThickness": (("nCells", "nVertLevels"),
                           np.asarray(s.layerThickness)),
        "tracers": (("nCells", "nVertLevels", "nTracers"),
                    np.asarray(s.tracers)),
    }
    if restart and s.ubtr is not None:
        out["normalBarotropicVelocity"] = (("nEdges",), np.asarray(s.ubtr))
    if not restart:
        out["ssh"] = (("nCells",), np.asarray(
            jnp.sum(s.layerThickness, -1) - run.grid.bottomDepth))
    dims = {"nCells": m.nCells, "nEdges": m.nEdges,
            "nVertLevels": run.grid.nz, "nTracers": s.tracers.shape[-1]}
    return out, dims


def _resume(run: _OcnRun, data: dict):
    u = jnp.asarray(data["normalVelocity"])
    ubtr = jnp.asarray(data["normalBarotropicVelocity"]) \
        if "normalBarotropicVelocity" in data else jnp.zeros(u.shape[0],
                                                             u.dtype)
    run.state = OcnState(u=u, ubtr=ubtr,
                         layerThickness=jnp.asarray(data["layerThickness"]),
                         tracers=jnp.asarray(data["tracers"]))
    return run


HOOKS = CoreHooks(name="ocean", config_cls=OcnConfig, setup=_setup,
                  step_chunk=_step_chunk,
                  output_fields=lambda r: _fields(r, False),
                  restart_fields=lambda r: _fields(r, True),
                  resume=_resume)


def default_mesh(cfg: OcnConfig) -> str:
    return "channel:16,52,10000"
