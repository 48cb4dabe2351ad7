"""Physics suite manager: alarms, driver ordering, dynamics coupling.

ref: src/core_atmosphere/physics/mpas_atmphys_manager.F (alarms/intervals),
mpas_atmphys_driver.F:106 (ordering: cloudiness -> radiation LW/SW ->
surface layer -> LSM -> PBL -> GWDO -> convection, all BEFORE dynamics on
time level 1; microphysics runs separately inside the RK3 loop) and
mpas_atmphys_todynamics.F (tendency mapping physics winds(cell) ->
normal-velocity tendencies(edge)).

TPU redesign: the suite step is one jittable function over (nCells, nz)
columns. Radiation tendencies are computed on the radiation alarm and held
constant between calls (exactly the reference behavior). Cell winds come
from the RBF reconstruct; wind tendencies return to edges by projecting
the two adjacent cells' (du, dv) onto the edge normal.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

from mpas_tpu.constants import cp, rgas, rvord, p0
from mpas_tpu.cores.atmosphere.physics import lsm as lsm_mod
from mpas_tpu.cores.atmosphere.physics.convection import kf_convection
from mpas_tpu.cores.atmosphere.physics.radiation import (cos_zenith,
                                                         radiation_lw,
                                                         radiation_sw)
from mpas_tpu.cores.atmosphere.physics.sfclay import sfclay
from mpas_tpu.cores.atmosphere.physics.ysu import ysu


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    """ref: the config_*_scheme namelist options + suite defaults
    (Registry.xml:378-392, 'suites')."""
    config_physics_suite: str = "mesoscale_reference"
    config_radt_interval_s: float = 1800.0   # radiation alarm
    config_conv_interval_s: float = 0.0      # 0 = every step
    config_microp_scheme: str = "wsm6"       # used by the dycore coupling
    config_pbl_scheme: str = "ysu"           # "ysu" | "mynn"
    config_conv_scheme: str = "kf"           # "kf" | "tiedtke" | "grell_freitas"
    config_lsm_scheme: str = "slab"          # "slab" | "noah"
    # "broadband" (gray) | "kdist" (RRTMG-class correlated-k) | "cam"
    # (CAM-class absorptivity/emissivity LW + delta-Eddington adding SW,
    # ref module_ra_cam.F)
    config_radiation_scheme: str = "broadband"
    config_gwdo_scheme: str = "off"
    config_cldfra_scheme: str = "off"        # "off" | "cldfra3"
    config_sfclay_scheme: str = "mm5"        # "mm5" | "mynn"
    roughness_m: float = 0.1
    albedo: float = 0.2
    gwdo_var2d: float = 100.0


# suite -> per-scheme defaults for fields left at the 'suite' sentinel
# (ref: mpas_atmphys_control.F:120-160 — mesoscale_reference resolves to
# wsm6/ntiedtke/ysu/ysu_gwdo/rrtmg/cld_fraction/monin_obukhov/noah;
# convection_permitting to thompson/grell_freitas/mynn/.../sf_mynn/noah)
_SUITES = {
    "mesoscale_reference": dict(
        config_microp_scheme="wsm6", config_conv_scheme="tiedtke",
        config_pbl_scheme="ysu", config_gwdo_scheme="on",
        config_radiation_scheme="kdist", config_cldfra_scheme="cldfra3",
        config_sfclay_scheme="mm5", config_lsm_scheme="noah"),
    "convection_permitting": dict(
        config_microp_scheme="thompson",
        config_conv_scheme="grell_freitas",
        config_pbl_scheme="mynn", config_gwdo_scheme="on",
        config_radiation_scheme="kdist", config_cldfra_scheme="cldfra3",
        config_sfclay_scheme="mynn", config_lsm_scheme="noah"),
    "none": dict(
        config_microp_scheme="off", config_conv_scheme="off",
        config_pbl_scheme="off", config_gwdo_scheme="off",
        config_radiation_scheme="off", config_cldfra_scheme="off",
        config_sfclay_scheme="off", config_lsm_scheme="off"),
}


def resolve_suite(cfg: PhysicsConfig) -> PhysicsConfig:
    """Resolve 'suite'-sentinel scheme choices from config_physics_suite
    (ref: mpas_atmphys_control.F physics_namelist_check — explicit
    per-scheme settings win over the suite default; an unknown suite is
    fatal)."""
    suite = cfg.config_physics_suite
    if suite not in _SUITES:
        raise ValueError(
            f"Unrecognized choice of physics suite: "
            f"config_physics_suite = '{suite}'")
    updates = {k: v for k, v in _SUITES[suite].items()
               if getattr(cfg, k) == "suite"}
    return dataclasses.replace(cfg, **updates) if updates else cfg


@struct.dataclass
class PhysicsState:
    """Per-cell surface/physics state carried between steps
    (ref: diag_physics + sfc_input pools)."""
    tsk: Any          # (nCells,) skin temperature K
    t_deep: Any       # (nCells,) deep reservoir temperature
    rainc: Any        # (nCells,) accumulated convective precip (m)
    hpbl: Any         # (nCells,)
    glw: Any          # (nCells,) last LW down at surface
    gsw: Any          # (nCells,) last SW absorbed at surface
    rad_tend: Any     # (nCells, nz) cached radiative dT/dt (K/s)
    time_since_rad: Any   # scalar seconds since last radiation call
    # Noah LSM soil column (None in slab mode; ref sfc_input TSLB/SMOIS)
    tslb: Any = None      # (nCells, 4) soil temperature
    smois: Any = None     # (nCells, 4) volumetric soil moisture
    swe: Any = None       # (nCells,) snow water equivalent (m)
    # MYNN prognostic TKE (None in YSU mode; ref qke diag_physics field)
    qke: Any = None       # (nCells, nz)
    # surface-type masks (ref sfc_input XICE/landuse ISICE/glacier):
    # fractional sea ice and permanent-ice (glacial) flags; None = open
    # land everywhere
    xice: Any = None      # (nCells,) sea-ice fraction [0, 1]
    isice: Any = None     # (nCells,) 1.0 on glacial landuse


def init_physics_state(n_cells, nz, tsk0=288.0, dtype=jnp.float64,
                       lsm_scheme="slab", pbl_scheme="ysu"):
    z = jnp.zeros((n_cells,), dtype=dtype)
    st = PhysicsState(
        tsk=z + tsk0, t_deep=z + tsk0, rainc=z, hpbl=z + 100.0,
        glw=z, gsw=z, rad_tend=jnp.zeros((n_cells, nz), dtype=dtype),
        time_since_rad=jnp.asarray(1.0e30, dtype=dtype))
    if lsm_scheme == "noah":
        st = st.replace(
            tslb=jnp.full((n_cells, 4), tsk0, dtype=dtype),
            smois=jnp.full((n_cells, 4), 0.25, dtype=dtype),
            swe=z)
    if pbl_scheme == "mynn":
        st = st.replace(qke=jnp.full((n_cells, nz), 1.0e-4, dtype=dtype))
    return st


def _edge_wind_tendency(mesh, du_cell, dv_cell):
    """Map cell (du, dv) to edge normal-velocity increments.
    ref: mpas_atmphys_todynamics.F (tend_u from u/v tendencies)."""
    coe = mesh.cellsOnEdge
    du_e = 0.5 * (du_cell[coe[:, 0]] + du_cell[coe[:, 1]])
    dv_e = 0.5 * (dv_cell[coe[:, 0]] + dv_cell[coe[:, 1]])
    ne = jnp.cos(mesh.angleEdge)[:, None]
    nn = jnp.sin(mesh.angleEdge)[:, None]
    return du_e * ne + dv_e * nn


def physics_step(grid, cfg: PhysicsConfig, mesh, recon_coeffs,
                 state, diag, phys: PhysicsState, dt,
                 gmt_hours=12.0, julian_day=172.0, gwd_statics=None):
    """Run the suite once before dynamics; returns (new dycore state fields
    theta_m/scalars/u, new PhysicsState).

    Ordering ref: physics_driver (mpas_atmphys_driver.F:208-330)."""
    from mpas_tpu.ops.reconstruct import reconstruct

    cfg = resolve_suite(cfg)
    m = mesh
    qv = jnp.maximum(state.scalars[..., 0], 0.0)
    qc = jnp.maximum(state.scalars[..., 1], 0.0) \
        if state.scalars.shape[-1] > 1 else jnp.zeros_like(qv)
    th = state.theta_m / (1.0 + rvord * qv)
    exner = diag.exner
    t = th * exner
    rho = grid.zz * state.rho_zz
    p = p0 * exner ** (cp / rgas)
    dz = grid.zgrid[:, 1:] - grid.zgrid[:, :-1]
    z_mid = 0.5 * (grid.zgrid[:, 1:] + grid.zgrid[:, :-1]) \
        - grid.zgrid[:, :1]

    # cell-centered winds (ref: uReconstruct{Zonal,Meridional})
    _vx, _vy, _vz, u_c, v_c = reconstruct(m, recon_coeffs, state.u)

    # --- cloudiness before radiation (ref: driver_cloudiness ->
    # module_mp_thompson_cldfra3.F cal_cldfra3): the RH-based fraction
    # seeds radiation-visible condensate in partly-cloudy decks
    if cfg.config_cldfra_scheme == "cldfra3":
        from mpas_tpu.cores.atmosphere.physics.cldfra3 import cal_cldfra3
        qi_s = jnp.maximum(state.scalars[..., 3], 0.0) \
            if state.scalars.shape[-1] > 3 else jnp.zeros_like(qv)
        qs_s = jnp.maximum(state.scalars[..., 4], 0.0) \
            if state.scalars.shape[-1] > 4 else jnp.zeros_like(qv)
        xland = jnp.ones_like(phys.tsk)
        gridkm = 2.0 * jnp.sqrt(m.areaCell / jnp.pi) * 1e-3
        _cldfra, qc_rad, _qi_rad = cal_cldfra3(
            qv, qc, qi_s, qs_s, p, t, rho, dz, xland, gridkm)
        qc = qc_rad + _qi_rad     # radiation sees seeded condensate

    # --- radiation on its alarm (held constant in between) ---
    lat = m.latCell if m.on_sphere else jnp.zeros_like(m.xCell)
    lon = m.lonCell if m.on_sphere else jnp.zeros_like(m.xCell)
    mu = cos_zenith(lat, lon, gmt_hours, julian_day)
    due = phys.time_since_rad >= cfg.config_radt_interval_s

    if cfg.config_radiation_scheme == "kdist":
        from mpas_tpu.cores.atmosphere.physics.rrtmg import (rrtmg_lw,
                                                             rrtmg_sw)
        lw_tend, glw, _olr = rrtmg_lw(t, qv, qc, rho, dz, phys.tsk)
        sw_tend, gsw = rrtmg_sw(qv, qc, rho, dz, mu, cfg.albedo)
    elif cfg.config_radiation_scheme == "cam":
        from mpas_tpu.cores.atmosphere.physics.cam_radiation import (cam_lw,
                                                                     cam_sw)
        lw_tend, glw, _olr = cam_lw(t, qv, qc, rho, dz, phys.tsk)
        sw_tend, gsw = cam_sw(qv, qc, rho, dz, mu, cfg.albedo, t=t)
    else:
        lw_tend, glw, _olr = radiation_lw(t, qv, qc, rho, dz, phys.tsk)
        sw_tend, gsw = radiation_sw(qv, qc, rho, dz, mu, cfg.albedo)
    rad_tend = jnp.where(due, lw_tend + sw_tend, phys.rad_tend)
    glw = jnp.where(due, glw, phys.glw)
    gsw = jnp.where(due, gsw, phys.gsw)
    t_rad = t + dt * rad_tend

    # --- surface layer (ref: driver_sfclayer) ---
    if cfg.config_lsm_scheme == "noah":
        from mpas_tpu.cores.atmosphere.physics import noah
        root = (phys.smois[:, 0] * 0.1 + phys.smois[:, 1] * 0.3
                + phys.smois[:, 2] * 0.6)
        beta0 = jnp.clip((root - noah.SMCWLT) / (noah.SMCREF - noah.SMCWLT),
                         0.0, 1.0)
        qsfc = noah.noah_surface_moisture(phys.tsk, p[:, 0], beta0)
    else:
        qsfc = lsm_mod.surface_moisture(phys.tsk, p[:, 0])
    if cfg.config_sfclay_scheme == "mynn":
        from mpas_tpu.cores.atmosphere.physics.mynn_sfc import mynn_sfclay
        sfc = mynn_sfclay(u_c[:, 0], v_c[:, 0], t_rad[:, 0] / exner[:, 0],
                          qv[:, 0], p[:, 0], rho[:, 0], z_mid[:, 0],
                          phys.tsk, qsfc, z0_land=cfg.roughness_m)
    else:
        sfc = sfclay(u_c[:, 0], v_c[:, 0], t_rad[:, 0] / exner[:, 0],
                     qv[:, 0], p[:, 0], rho[:, 0], z_mid[:, 0], phys.tsk,
                     qsfc, cfg.roughness_m)

    # --- LSM: advance skin temperature (ref: driver_lsm; the
    # seaice/glacial variants dispatch per point exactly as
    # module_sf_noah_seaice_drv.F / the glacial branch of
    # module_sf_noahdrv.F select on XICE and the ISICE landuse) ---
    if cfg.config_lsm_scheme == "noah":
        out = noah.noah_lsm(phys.tsk, phys.tslb, phys.smois, phys.swe,
                            gsw, glw, sfc["hfx"], sfc["lh"],
                            jnp.zeros_like(phys.tsk), dt)
        tsk_new, tslb_new, swe_new = out["tsk"], out["tslb"], out["swe"]
        if phys.isice is not None:
            gl = noah.noah_glacial(phys.tsk, phys.tslb, phys.swe,
                                   gsw, glw, sfc["hfx"], sfc["lh"], dt)
            w = phys.isice[:, None]
            tsk_new = jnp.where(phys.isice > 0.5, gl["tsk"], tsk_new)
            tslb_new = jnp.where(w > 0.5, gl["tslb"], tslb_new)
            swe_new = jnp.where(phys.isice > 0.5, gl["swe"], swe_new)
        if phys.xice is not None:
            si = noah.noah_seaice(phys.tsk, phys.tslb, phys.swe,
                                  gsw, glw, sfc["hfx"], sfc["lh"], dt)
            # fractional blend on the ice fraction (ref: the XICE
            # fractional treatment of module_sf_noah_seaice_drv.F)
            xi = jnp.clip(phys.xice, 0.0, 1.0)
            tsk_new = xi * si["tsk"] + (1.0 - xi) * tsk_new
            tslb_new = xi[:, None] * si["tslb"] \
                + (1.0 - xi[:, None]) * tslb_new
            swe_new = xi * si["swe"] + (1.0 - xi) * swe_new
        phys = phys.replace(tslb=tslb_new, smois=out["smois"],
                            swe=swe_new)
    else:
        tsk_new, _g = lsm_mod.slab_lsm(phys.tsk, phys.t_deep, gsw, glw,
                                       sfc["hfx"], sfc["lh"], dt)

    # --- PBL (ref: driver_pbl) ---
    th_in = t_rad / exner
    if cfg.config_pbl_scheme == "mynn":
        from mpas_tpu.cores.atmosphere.physics.mynn import mynn
        u_pbl, v_pbl, th_pbl, qv_pbl, hpbl, qke_new = mynn(
            u_c, v_c, th_in, qv, rho, z_mid, dz, sfc, phys.qke, dt)
        phys = phys.replace(qke=qke_new)
    else:
        u_pbl, v_pbl, th_pbl, qv_pbl, hpbl = ysu(
            u_c, v_c, th_in, qv, rho, z_mid, dz, sfc, dt)

    # --- GWDO (ref: driver_gwdo -> module_bl_gwdo.F gwdo2d) ---
    if cfg.config_gwdo_scheme == "on":
        from mpas_tpu.cores.atmosphere.physics.gwdo import gwdo
        if gwd_statics is not None:
            var2d = gwd_statics["var2d"]
            oc1 = gwd_statics["con"]
            oa4 = jnp.stack([gwd_statics[f"oa{i}"] for i in (1, 2, 3, 4)],
                            axis=1)
            ol4 = jnp.stack([gwd_statics[f"ol{i}"] for i in (1, 2, 3, 4)],
                            axis=1)
        else:
            # uniform-statistics fallback (isotropic hills of height
            # sigma = cfg.gwdo_var2d, convexity 1)
            ones = jnp.ones_like(phys.tsk)
            var2d = cfg.gwdo_var2d * ones
            oc1 = ones
            oa4 = jnp.zeros((ones.shape[0], 4), ones.dtype)
            ol4 = 0.5 * jnp.ones((ones.shape[0], 4), ones.dtype)
        dx_cell = 2.0 * jnp.sqrt(m.areaCell / jnp.pi)
        dudt, dvdt, _dusfc, _dvsfc = gwdo(
            u_pbl, v_pbl, t_rad, qv_pbl, p, z_mid, dz,
            var2d, oc1, oa4, ol4, dx_cell, dt)
        u_pbl = u_pbl + dt * dudt
        v_pbl = v_pbl + dt * dvdt

    # --- convection (ref: driver_convection) ---
    qc_detr = None
    if cfg.config_conv_scheme == "tiedtke":
        from mpas_tpu.cores.atmosphere.physics.tiedtke import tiedtke
        th_cu, qv_cu, rain_c, _cape = tiedtke(
            th_pbl, qv_pbl, p, rho, z_mid, dz, exner, dt)
    elif cfg.config_conv_scheme == "grell_freitas":
        from mpas_tpu.cores.atmosphere.physics.gf import gf_convection
        dx_gf = 2.0 * jnp.sqrt(m.areaCell / jnp.pi)
        th_cu, qv_cu, qc_detr, rain_c, _cape = gf_convection(
            th_pbl, qv_pbl, p, rho, z_mid, dz, exner, dt, dx=dx_gf)
    else:
        from mpas_tpu.cores.atmosphere.physics.convection import \
            kf_convection_full
        # grid-scale w at layer midpoints feeds the KF trigger
        # (ref: W0AVG, module_cu_kfeta.F:740-760); KF dx sets the
        # 25-km-equivalent w scaling and the advective timescale
        w_mid = 0.5 * (state.w[:, 1:] + state.w[:, :-1])
        dx_kf = 2.0 * jnp.sqrt(m.areaCell / jnp.pi)
        kf = kf_convection_full(
            th_pbl, qv_pbl, p, rho, z_mid, dz, exner, dt,
            w0avg=w_mid, u=u_c, v=v_c, dx=dx_kf)
        th_cu, qv_cu, rain_c, _cape = (kf["th"], kf["qv"],
                                       kf["raincv_m"], kf["cape"])
        qc_detr = kf["qc_detr"]

    # --- couple back to dycore variables ---
    theta_m_new = th_cu * (1.0 + rvord * qv_cu)
    scalars_new = state.scalars.at[..., 0].set(qv_cu)
    if qc_detr is not None and scalars_new.shape[-1] > 1:
        # GF detrains non-precipitated condensate to cloud water
        scalars_new = scalars_new.at[..., 1].add(qc_detr)
    du_e = _edge_wind_tendency(m, u_pbl - u_c, v_pbl - v_c)
    u_new = (state.u + du_e) * (1.0 - m.boundaryEdge)[:, None]

    phys_new = phys.replace(
        tsk=tsk_new, rainc=phys.rainc + rain_c, hpbl=hpbl,
        glw=glw, gsw=gsw, rad_tend=rad_tend,
        time_since_rad=jnp.where(due, dt, phys.time_since_rad + dt))
    return theta_m_new, scalars_new, u_new, phys_new
