"""Land-ice enthalpy thermodynamics (polythermal column solver).

ref capability: src/core_landice/mode_forward/mpas_li_thermal.F
(3,316 LoC; `config_thermal_solver = 'enthalpy'` branch, Aschwanden et
al. 2012 genre): prognostic specific enthalpy E = c_i (T - T0) + w L per
layer handles cold and temperate ice in one conserved variable —
temperate ice carries liquid water fraction w where E exceeds the
pressure-melting enthalpy E_pmp(z); diffusion uses the cold-ice
conductivity below E_pmp and a small moisture diffusivity above it;
sources are strain (dissipation) heating, geothermal flux, and basal
friction; excess water above the drainage threshold becomes basal melt.

TPU-first: a batched implicit tridiagonal over the sigma layers with two
Picard passes for the E-dependent diffusivity switch; pure column math.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.ops.matrix import tridiagonal_solve

_T0 = 273.15
C_ICE = 2009.0          # J/kg/K (ref li constants)
L_FUS = 3.35e5          # J/kg
K_COLD = 2.1            # W/m/K
NU_TEMPERATE = 1.1e-8   # kg/m/s moisture diffusivity (small)
BETA_CC = 9.8e-8        # Clausius-Clapeyron K/Pa
W_MAX = 0.01            # drainage threshold liquid fraction


def pmp_temperature(cfg, thickness, sigma_mid):
    """Pressure-melting temperature at layer midpoints.
    ref: li_thermal pressure melting point (T_pmp = T0 - beta rho g d)."""
    depth = thickness[:, None] * sigma_mid[None, :]
    return _T0 - BETA_CC * cfg.rho_ice * cfg.gravity * depth


def enthalpy_from_tw(T, w):
    return C_ICE * (T - _T0) + w * L_FUS


def tw_from_enthalpy(cfg, E, thickness, sigma_mid):
    """Invert E -> (T, w) against the pressure-melting enthalpy."""
    t_pmp = pmp_temperature(cfg, thickness, sigma_mid)
    e_pmp = C_ICE * (t_pmp - _T0)
    T = jnp.where(E < e_pmp, _T0 + E / C_ICE, t_pmp)
    w = jnp.maximum(E - e_pmp, 0.0) / L_FUS
    return T, w


def strain_heating(grid, cfg, thickness, temperature):
    """SIA dissipation Phi = 2 A tau^(n+1) per layer (W/m3).
    tau(z) = rho g (s - z) |grad s|; slope magnitude from the limited
    cell gradient of the surface. ref: li_thermal dissipation source."""
    from mpas_tpu.ops.remap import cell_gradient
    from mpas_tpu.cores.landice.core import flow_param_a
    m = grid.mesh
    surface = grid.bedTopography + thickness
    gx, gy = cell_gradient(m, surface, m.xCell, m.yCell)
    slope = jnp.sqrt(gx ** 2 + gy ** 2)
    sig_mid = 0.5 * (grid.layerInterfaceSigma[:-1]
                     + grid.layerInterfaceSigma[1:])
    tau = (cfg.rho_ice * cfg.gravity * thickness[:, None]
           * sig_mid[None, :] * slope[:, None])
    a_flow = flow_param_a(cfg, temperature)
    n = cfg.config_flowlaw_exponent
    return 2.0 * a_flow * tau ** (n + 1.0)


def thermal_solve_enthalpy(grid, cfg, thickness, temperature, waterFrac,
                           dt, basal_friction_flux=None):
    """One implicit enthalpy step for all columns.

    Returns (temperature, waterFrac, basal_melt_rate [m/s of ice]).
    ref: li_thermal_solver enthalpy branch call sequence: build E,
    diffuse with mode-dependent conductivity, apply sources, drain."""
    m = grid.mesh
    nz = temperature.shape[-1]
    sig_mid = 0.5 * (grid.layerInterfaceSigma[:-1]
                     + grid.layerInterfaceSigma[1:])
    h = jnp.maximum(thickness, 10.0)[:, None]
    dz = h * grid.layerSigmaFraction[None, :]
    rho = cfg.rho_ice

    if waterFrac is None:
        waterFrac = jnp.zeros_like(temperature)
    E = enthalpy_from_tw(temperature, waterFrac)
    phi = strain_heating(grid, cfg, thickness, temperature)  # W/m3

    geo = cfg.config_geothermal_flux
    fric = (basal_friction_flux if basal_friction_flux is not None
            else jnp.zeros_like(thickness))

    t_pmp = pmp_temperature(cfg, thickness, sig_mid)
    e_pmp = C_ICE * (t_pmp - _T0)

    for _ in range(2):    # Picard passes over the cold/temperate switch
        temperate = E >= e_pmp
        # diffusivity in enthalpy space: cold k/(rho c); temperate nu/rho
        kappa = jnp.where(temperate, NU_TEMPERATE / rho,
                          K_COLD / (rho * C_ICE))           # m2/s
        k_int = 2.0 * kappa[:, :-1] * kappa[:, 1:] / jnp.maximum(
            kappa[:, :-1] + kappa[:, 1:], 1e-20)
        g_int = k_int / (0.5 * (dz[:, :-1] + dz[:, 1:]))
        g_surf = kappa[:, 0] / (0.5 * dz[:, 0])

        alpha = dt / dz
        a = jnp.concatenate([jnp.zeros_like(g_surf)[:, None],
                             -alpha[:, 1:] * g_int], axis=1)
        c = jnp.concatenate([-alpha[:, :-1] * g_int,
                             jnp.zeros_like(g_surf)[:, None]], axis=1)
        b = 1.0 - a - c
        b = b.at[:, 0].add(alpha[:, 0] * g_surf)
        e_surf = C_ICE * (cfg.config_surface_air_temperature - _T0)
        d = E + dt * phi / rho
        d = d.at[:, 0].add(alpha[:, 0] * g_surf * e_surf)
        # basal flux (geothermal + friction) enters the bottom layer
        d = d.at[:, -1].add(dt * (geo + fric) / (rho * dz[:, -1]))
        E_new = tridiagonal_solve(a, b, c, d)
        E = E_new

    # drainage: water above W_MAX leaves the column as basal melt
    excess = jnp.maximum(E - (e_pmp + W_MAX * L_FUS), 0.0)
    E = jnp.minimum(E, e_pmp + W_MAX * L_FUS)
    basal_melt = jnp.sum(excess / L_FUS * dz, axis=1) / dt    # m ice / s

    T, w = tw_from_enthalpy(cfg, E, thickness, sig_mid)
    active = thickness[:, None] > 1.0
    T = jnp.where(active, T, temperature)
    w = jnp.where(active, w, 0.0)
    return T, w, jnp.where(thickness > 1.0, basal_melt, 0.0)
