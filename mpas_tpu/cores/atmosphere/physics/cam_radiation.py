"""CAM-class radiation (longwave absorptivity/emissivity + shortwave
delta-Eddington adding).

ref capability: physics_wrf/module_ra_cam.F (7,876 LoC) +
module_ra_cam_support.F (3,905) — the CAM3 radiation package the reference
selects with config_radt_{lw,sw}_scheme = 'cam_{lw,sw}'
(mpas_atmphys_driver_radiation_{lw,sw}.F). Methodologically distinct from
RRTMG: CAM LW uses the broadband absorptivity/emissivity formulation
(radclwmx: trapezoidal exchange integral over broadband H2O/CO2/O3
emissivities, not a correlated-k quadrature), and CAM SW uses
delta-Eddington two-stream layer reflectivities combined by the adding
method over spectral intervals (radcswmx). The reference's CAM absorptance
tables live in the external CAM_ABS_DATA file (not vendored, see
mpas_atmphys_camrad_init.F); this "-class" implementation replaces the
table lookups with the standard broadband fits the tables encode
(Ramanathan & Downey 1986 genre for H2O, logarithmic CO2 band
absorptance), keeping the method's structure exactly.

All functions are per-column, vectorized over cells; k=0 is the lowest
layer (matching the dycore layout).
"""

from __future__ import annotations

import jax.numpy as jnp

_SB = 5.670374e-8
CO2_PPV = 3.79e-4
G = 9.80616
CP = 1004.5


def _layer_paths(qv, qc, rho, dz):
    """Water-vapor path u (kg/m2), cloud water path (kg/m2) per layer."""
    wpath = qv * rho * dz
    cwp = qc * rho * dz
    return wpath, cwp


def _broadband_emissivity(u_h2o, u_co2, cwp, t):
    """Broadband flux emissivity of a (possibly multi-layer) path.

    H2O: sqrt-path growth with weak temperature scaling (the
    Ramanathan-Downey broadband fit genre the CAM tables encode);
    CO2: logarithmic band absorptance; clouds: gray LW with mass
    absorption 140 m2/kg (CAM's LW cloud emissivity).
    """
    eps_v = 1.0 - jnp.exp(-0.75 * jnp.sqrt(jnp.maximum(u_h2o, 0.0))
                          * (t / 256.0))
    eps_c = 0.065 * jnp.log1p(680.0 * jnp.maximum(u_co2, 0.0))
    eps_cld = 1.0 - jnp.exp(-140.0 * jnp.maximum(cwp, 0.0))
    eps = eps_v + (1.0 - eps_v) * eps_c
    return eps + (1.0 - eps) * eps_cld


def cam_lw(t, qv, qc, rho, dz, tsk, emiss_sfc=0.985, co2_ppv=CO2_PPV):
    """CAM-class longwave (ref: radclwmx, module_ra_cam.F).

    The absorptivity/emissivity exchange integral: the net flux at
    interface i is the surface term attenuated by the path emissivity plus
    the sum over layers of sigma*T^4 differences weighted by the
    differential emissivity of the path between layer j and interface i —
    evaluated here as cumulative-path emissivity differences (the same
    trapezoid radclwmx builds from the abs/ems tables).

    Returns (tend (nC, nz) K/s, glw surface downward (nC,), olr (nC,)).
    """
    nC, nz = t.shape
    wpath, cwp = _layer_paths(qv, qc, rho, dz)
    u_co2 = co2_ppv * (44.0 / 28.97) * rho * dz   # kg CO2 / m2
    planck = _SB * t ** 4

    # cumulative paths from each interface: emissivity of the slab between
    # interface i (0..nz) and layer j, built from cumsum differences
    cw = jnp.concatenate([jnp.zeros((nC, 1), t.dtype),
                          jnp.cumsum(wpath, -1)], -1)     # (nC, nz+1)
    cc = jnp.concatenate([jnp.zeros((nC, 1), t.dtype),
                          jnp.cumsum(u_co2, -1)], -1)
    ccl = jnp.concatenate([jnp.zeros((nC, 1), t.dtype),
                           jnp.cumsum(cwp, -1)], -1)
    t_mean = jnp.mean(t, -1, keepdims=True)

    # slab emissivity between interface i and interface k:
    # eps[i,k] = E(|path(i) - path(k)|)
    def slab_eps(i_paths, k_paths):
        du = jnp.abs(i_paths[0][:, :, None] - k_paths[0][:, None, :])
        dc = jnp.abs(i_paths[1][:, :, None] - k_paths[1][:, None, :])
        dl = jnp.abs(i_paths[2][:, :, None] - k_paths[2][:, None, :])
        return _broadband_emissivity(du, dc, dl, t_mean[:, :, None])

    eps = slab_eps((cw, cc, ccl), (cw, cc, ccl))          # (nC, nz+1, nz+1)

    # downward flux at interface i: sum over layers above (j >= i):
    #   B_j * [eps(i, j+1) - eps(i, j)]   (differential slab emissivity)
    d_eps_down = eps[:, :, 1:] - eps[:, :, :-1]           # (nC, nz+1, nz)
    jj = jnp.arange(nz)[None, None, :]
    ii = jnp.arange(nz + 1)[None, :, None]
    above = (jj >= ii).astype(t.dtype)
    f_down = jnp.sum(jnp.where(above > 0, d_eps_down, 0.0)
                     * planck[:, None, :], axis=-1)       # (nC, nz+1)

    # upward flux: surface Planck attenuated through the slab below i plus
    # the layers-below exchange term
    sfc_b = emiss_sfc * _SB * tsk ** 4
    trans_sfc = 1.0 - eps[:, :, 0]                        # interface i<->sfc
    below = (jj < ii).astype(t.dtype)
    f_up = sfc_b[:, None] * trans_sfc \
        - jnp.sum(jnp.where(below > 0, d_eps_down, 0.0)
                  * planck[:, None, :], axis=-1)

    net = f_up - f_down                                   # (nC, nz+1)
    tend = -(net[:, 1:] - net[:, :-1]) / (CP * rho * dz)
    glw = f_down[:, 0]
    olr = f_up[:, -1]
    return tend, glw, olr


def _delta_eddington(tau, w0, g_asym, mu0):
    """Delta-Eddington layer reflectivity/transmissivity (Joseph, Wiscombe
    & Weinman 1976 — the radcswmx per-layer solution). Returns direct-beam
    (Rdir, Tdir) and diffuse (Rdif, Tdif) properties per layer."""
    f = g_asym ** 2
    tau_p = (1.0 - w0 * f) * tau
    w0_p = (1.0 - f) * w0 / (1.0 - w0 * f)
    g_p = (g_asym - f) / (1.0 - f)

    w0_p = jnp.clip(w0_p, 1e-6, 1.0 - 1e-6)
    lam = jnp.sqrt(3.0 * (1.0 - w0_p) * (1.0 - w0_p * g_p))
    u = 1.5 * (1.0 - w0_p * g_p) / lam
    e = jnp.exp(-jnp.minimum(lam * tau_p, 25.0))
    denom_dif = (u + 1.0) ** 2 / e - (u - 1.0) ** 2 * e
    r_dif = (u ** 2 - 1.0) * (1.0 / e - e) / denom_dif
    t_dif = 4.0 * u / denom_dif

    # direct beam source terms (two-stream with exponential source)
    mu0 = jnp.maximum(mu0, 1e-3)
    e0 = jnp.exp(-jnp.minimum(tau_p / mu0, 25.0))
    alpha = 0.75 * w0_p * mu0 * (1.0 + g_p * (1.0 - w0_p)) \
        / (1.0 - lam ** 2 * mu0 ** 2 + 1e-9)
    beta = 0.5 * w0_p * (1.0 + 3.0 * g_p * (1.0 - w0_p) * mu0 ** 2) \
        / (1.0 - lam ** 2 * mu0 ** 2 + 1e-9)
    r_dir = (alpha - beta) * t_dif * e0 + (alpha + beta) * r_dif \
        - (alpha - beta)
    t_dir = e0 * (1.0 - (alpha + beta) * r_dif
                  - (alpha - beta) * t_dif) + (alpha + beta) * t_dif \
        + (alpha - beta) * e0 * r_dif
    # clamp to the physical range (the fit can slightly overshoot)
    r_dir = jnp.clip(r_dir, 0.0, 1.0)
    t_dir = jnp.clip(t_dir, 0.0, 1.0)
    return r_dir, t_dir, r_dif, t_dif, e0


# CAM-style spectral intervals (reduced set): (weight, k_h2o m2/kg)
# visible (no H2O absorption) + three NIR H2O bands (weak/medium/strong) —
# the structure of radcswmx's 19 intervals at "-class" fidelity.
_SW_INTERVALS = ((0.465, 0.0),
                 (0.32, 0.002),
                 (0.16, 0.075),
                 (0.055, 2.5))
_K_CLD = 75.0      # cloud water mass extinction (m2/kg), w0 ~ 0.9995
_W0_CLD = 0.9995
_G_CLD = 0.85
_TAU_RAY = 0.10    # column Rayleigh optical depth in the visible


def cam_sw(qv, qc, rho, dz, mu0, albedo=0.2):
    """CAM-class shortwave (ref: radcswmx, module_ra_cam.F): per-interval
    delta-Eddington layer properties combined by the adding method, summed
    over intervals. Returns (tend (nC, nz) K/s, gsw absorbed at sfc)."""
    nC, nz = qv.shape
    s0 = 1361.0
    wpath, cwp = _layer_paths(qv, qc, rho, dz)
    mass_frac = (rho * dz) / jnp.sum(rho * dz, -1, keepdims=True)
    mu = jnp.maximum(mu0, 0.0)
    day = (mu > 1e-3).astype(qv.dtype)
    mu_s = jnp.maximum(mu, 1e-3)[:, None]

    tend = jnp.zeros_like(qv)
    gsw = jnp.zeros(nC, qv.dtype)
    for wgt, k_h2o in _SW_INTERVALS:
        tau_gas = k_h2o * wpath + _TAU_RAY * mass_frac \
            * (1.0 if k_h2o == 0.0 else 0.0)
        tau_cld = _K_CLD * cwp
        tau = tau_gas + tau_cld
        w0 = jnp.where(tau > 0.0,
                       (_W0_CLD * tau_cld
                        + (_TAU_RAY * mass_frac if k_h2o == 0.0 else 0.0))
                       / jnp.maximum(tau, 1e-12), 0.0)
        w0 = jnp.clip(w0, 1e-6, 1.0 - 1e-6)
        g_a = jnp.where(tau_cld > 0.0, _G_CLD * _W0_CLD * tau_cld
                        / jnp.maximum(w0 * tau, 1e-12), 0.0)
        g_a = jnp.clip(g_a, 0.0, 0.95)

        rdir, tdir, rdif, tdif, e0 = _delta_eddington(tau, w0, g_a, mu_s)

        # adding method, from the surface upward (ref radcswmx adding):
        # R_k = reflectivity of the atmosphere+surface below interface k
        # for diffuse light; direct beam handled with its own pass
        r_below_dif = jnp.full((nC,), albedo, qv.dtype)
        r_below_dir = jnp.full((nC,), albedo, qv.dtype)
        rs_dif = [r_below_dif]
        rs_dir = [r_below_dir]
        for k in range(nz):
            rd, td = rdif[:, k], tdif[:, k]
            rr, tt, ee = rdir[:, k], tdir[:, k], e0[:, k]
            denom = 1.0 - rd * r_below_dif
            # direct beam: attenuated beam continues (ee), scattered part
            # (tt - ee) goes diffuse
            r_below_dir = rr + (td * (ee * r_below_dir
                                      + (tt - ee) * r_below_dif)) / denom
            r_below_dif = rd + td * td * r_below_dif / denom
            rs_dir.append(r_below_dir)
            rs_dif.append(r_below_dif)

        # downward pass: direct beam + diffuse fluxes at interfaces
        fdir = [jnp.ones((nC,), qv.dtype)]   # normalized direct at top
        fdn = [jnp.zeros((nC,), qv.dtype)]   # diffuse down at top
        for k in range(nz - 1, -1, -1):
            rd, td = rdif[:, k], tdif[:, k]
            rr, tt, ee = rdir[:, k], tdir[:, k], e0[:, k]
            r_bel_dif = rs_dif[k]
            denom = 1.0 - rd * r_bel_dif
            beam = fdir[-1]
            dif_in = fdn[-1]
            beam_out = beam * ee
            dif_out = (beam * (tt - ee) + dif_in * td
                       + (beam_out * rs_dir[k]
                          + 0.0) * rd) / denom
            fdir.append(beam_out)
            fdn.append(dif_out)
        fdir = jnp.stack(fdir[::-1], -1)     # (nC, nz+1), index 0 = sfc
        fdn = jnp.stack(fdn[::-1], -1)

        fup = jnp.concatenate(
            [((fdir[:, :1] * rs_dir[0][:, None])
              + fdn[:, :1] * rs_dif[0][:, None]),
             jnp.stack([fdir[:, k + 1] * rs_dir[k + 1]
                        + fdn[:, k + 1] * rs_dif[k + 1]
                        for k in range(nz)], -1)], -1)
        net = (fdir + fdn) - fup             # net downward, normalized
        flux0 = s0 * mu * wgt * day
        absorbed = (net[:, 1:] - net[:, :-1]) * flux0[:, None]
        tend = tend + absorbed / (CP * rho * dz)
        gsw = gsw + net[:, 0] * flux0
    return tend, gsw
