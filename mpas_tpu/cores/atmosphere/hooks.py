"""Atmosphere core hooks for the run driver (ref: atm_setup_core,
mpas_atm_core_interface.F)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpas_tpu.framework.driver import CoreHooks
from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_jw import init_jw
from mpas_tpu.cores.atmosphere.state import AtmDiag, AtmState
from mpas_tpu.cores.atmosphere.time_integration import (AtmCarry, init_carry,
                                                        run_steps)
from mpas_tpu.cores.sw.hooks import parse_mesh_spec
from mpas_tpu.ops.reconstruct import build_reconstruct_coeffs, reconstruct


@dataclasses.dataclass
class _AtmRun:
    grid: object
    cfg: AtmConfig
    carry: AtmCarry
    recon: object
    phys: object = None        # PhysicsState when the suite is active


def _setup(cfg: AtmConfig, mesh_spec: str):
    mesh0 = parse_mesh_spec(mesh_spec)
    if cfg.config_init_case in (4, 5):
        from mpas_tpu.cores.atmosphere.init_supercell import init_supercell
        grid, state, diag = init_supercell(mesh0, cfg,
                                           case=cfg.config_init_case)
    elif cfg.config_init_case == 6:
        from mpas_tpu.cores.atmosphere.init_mtn_wave import init_mtn_wave
        grid, state, diag = init_mtn_wave(mesh0, cfg)
    else:
        grid, state, diag = init_jw(mesh0, cfg, case=cfg.config_init_case)
    recon = jnp.asarray(build_reconstruct_coeffs(grid.mesh))
    gj = jax.tree.map(jnp.asarray, grid)
    carry = init_carry(gj, cfg, jax.tree.map(jnp.asarray, state),
                       jax.tree.map(jnp.asarray, diag), cfg.config_dt)
    phys = None
    if cfg.config_physics_suite != "none":
        from mpas_tpu.cores.atmosphere.physics.manager import (
            init_physics_state)
        phys = init_physics_state(gj.mesh.nCells, cfg.config_nvertlevels,
                                  dtype=carry.state.theta_m.dtype)
    return _AtmRun(grid=gj, cfg=cfg, carry=carry, recon=recon, phys=phys)


def _step_chunk(run: _AtmRun, n: int):
    dt = jnp.asarray(run.cfg.config_dt,
                     dtype=run.carry.state.theta_m.dtype)
    if run.phys is None:
        run.carry = run_steps(run.grid, run.cfg, run.carry, dt, n)
        return run
    # physics suite runs before dynamics every step
    # (ref: atm_do_timestep, mpas_atm_core.F:830-873)
    run.carry, run.phys = run_steps_with_physics(
        run.grid, run.cfg, run.carry, run.phys, run.recon, dt, n)
    return run


import functools


@functools.partial(jax.jit, static_argnums=(1, 6))
def run_steps_with_physics(grid, cfg, carry, phys, recon, dt, n):
    from mpas_tpu.cores.atmosphere.physics.manager import (PhysicsConfig,
                                                           physics_step)
    from mpas_tpu.cores.atmosphere.time_integration import srk3_step
    pcfg = PhysicsConfig()

    def body(c, _):
        carry, phys = c
        th, sc, u, phys = physics_step(grid, pcfg, grid.mesh, recon,
                                       carry.state, carry.diag, phys, dt)
        carry = carry.replace(state=carry.state.replace(
            theta_m=th, scalars=sc, u=u))
        carry = srk3_step(grid, cfg, carry, dt)
        return (carry, phys), None

    (carry, phys), _ = jax.lax.scan(body, (carry, phys), None, length=n)
    return carry, phys


def _fields(run: _AtmRun, restart: bool):
    g = run.grid
    s = run.carry.state
    d = run.carry.diag
    out = {
        "u": (("nEdges", "nVertLevels"), np.asarray(s.u)),
        "w": (("nCells", "nVertLevelsP1"), np.asarray(s.w)),
        "theta_m": (("nCells", "nVertLevels"), np.asarray(s.theta_m)),
        "rho_zz": (("nCells", "nVertLevels"), np.asarray(s.rho_zz)),
        "scalars": (("nCells", "nVertLevels", "nScalars"),
                    np.asarray(s.scalars)),
    }
    if restart:
        out.update({
            "ru": (("nEdges", "nVertLevels"), np.asarray(d.ru)),
            "rw": (("nCells", "nVertLevelsP1"), np.asarray(d.rw)),
            "rho_p": (("nCells", "nVertLevels"), np.asarray(d.rho_p)),
            "rtheta_p": (("nCells", "nVertLevels"), np.asarray(d.rtheta_p)),
            "exner": (("nCells", "nVertLevels"), np.asarray(d.exner)),
            "pressure_p": (("nCells", "nVertLevels"),
                           np.asarray(d.pressure_p)),
        })
    else:
        _, _, _, zon, mer = reconstruct(g.mesh, run.recon, s.u)
        out["uReconstructZonal"] = (("nCells", "nVertLevels"),
                                    np.asarray(zon))
        out["uReconstructMeridional"] = (("nCells", "nVertLevels"),
                                         np.asarray(mer))
        out["surface_pressure"] = (("nCells",), np.asarray(
            d.pressure_p[:, 0] + g.pressure_base[:, 0]))
        out["rainnc"] = (("nCells",), np.asarray(run.carry.rainnc))
    nz = run.cfg.config_nvertlevels
    dims = {"nCells": g.mesh.nCells, "nEdges": g.mesh.nEdges,
            "nVertLevels": nz, "nVertLevelsP1": nz + 1,
            "nScalars": s.scalars.shape[-1]}
    return out, dims


def _resume(run: _AtmRun, data: dict):
    st = AtmState(u=jnp.asarray(data["u"]), w=jnp.asarray(data["w"]),
                  theta_m=jnp.asarray(data["theta_m"]),
                  rho_zz=jnp.asarray(data["rho_zz"]),
                  scalars=jnp.asarray(data["scalars"]))
    dg = AtmDiag(ru=jnp.asarray(data["ru"]), rw=jnp.asarray(data["rw"]),
                 rho_p=jnp.asarray(data["rho_p"]),
                 rtheta_p=jnp.asarray(data["rtheta_p"]),
                 exner=jnp.asarray(data["exner"]),
                 pressure_p=jnp.asarray(data["pressure_p"]),
                 ruAvg=jnp.zeros_like(jnp.asarray(data["ru"])),
                 wwAvg=jnp.zeros_like(jnp.asarray(data["rw"])))
    run.carry = init_carry(run.grid, run.cfg, st, dg, run.cfg.config_dt)
    return run


def _summarize(run: _AtmRun) -> str:
    """ref: summarize_timestep (mpas_atm_time_integration.F:6675) — global
    w extremes + accumulated precip extremes, logged per step."""
    s = run.carry.state
    wmin = float(jnp.min(s.w))
    wmax = float(jnp.max(s.w))
    out = f"w[min,max]=[{wmin:+.3f},{wmax:+.3f}] m/s"
    rain = getattr(run.carry, "rainnc", None)
    if rain is not None:
        out += f" rainnc_max={float(jnp.max(rain)) * 1000.0:.2f} mm"
    return out


HOOKS = CoreHooks(name="atmosphere", config_cls=AtmConfig, setup=_setup,
                  step_chunk=_step_chunk,
                  output_fields=lambda r: _fields(r, False),
                  restart_fields=lambda r: _fields(r, True),
                  resume=_resume, summarize=_summarize)


def default_mesh(cfg: AtmConfig) -> str:
    if cfg.config_init_case in (4, 5):
        return "hex:40,40,2000"
    return "icos:16"
