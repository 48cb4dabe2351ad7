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
# temperate-ice enthalpy diffusivity = cold diffusivity / 100
# (ref enthalpy_matrix_elements, mpas_li_thermal.F:2416-2417)
KAPPA_TEMPERATE_RATIO = 0.01
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
        # diffusivity in enthalpy space: cold k/(rho c); temperate is
        # cold/100 (ref mpas_li_thermal.F:2416-2417)
        kappa_cold = K_COLD / (rho * C_ICE)
        kappa = jnp.where(temperate, KAPPA_TEMPERATE_RATIO * kappa_cold,
                          kappa_cold)                       # m2/s
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


def basal_energy_balance(cfg, thickness, temperature, waterFrac,
                         basal_friction_flux, basal_water_thickness,
                         dt):
    """Grounded basal energy balance -> basal mass balance (m ice/s,
    negative = melt), basal temperature, and the conductive flux
    (ref: basal_melt_grounded_ice, mpas_li_thermal.F:2632-2881).

    net = friction + geothermal + conductive(into bed);
    mass balance = -net / (L rho - q_bottom); a melting bed with no
    stored water is nudged just below the pressure-melting point, and a
    cold bed cannot melt."""
    nz = temperature.shape[-1]
    h = jnp.maximum(thickness, 10.0)
    dz_bot = h * (1.0 / nz)
    t_pmp_bed = _T0 - BETA_CC * cfg.rho_ice * cfg.gravity * h
    t_bot = temperature[:, -1]
    # conductive flux from the bed into the ice interior (positive up);
    # into-bed flux is its negative
    flux_up = K_COLD * (t_pmp_bed - t_bot) / (0.5 * dz_bot)
    conductive_down = -flux_up
    net = basal_friction_flux + cfg.config_geothermal_flux \
        + conductive_down
    # bmb = -net / (L rho_i - q_bottom)  [ref :2765, q in J/m3]
    q_bot = cfg.rho_ice * enthalpy_from_tw(t_bot, waterFrac[:, -1])
    denom = jnp.maximum(L_FUS * cfg.rho_ice - q_bot, 1.0e6)
    bmb = -net / denom                                # m ice / s
    bmb = jnp.where(thickness > 1.0, bmb, 0.0)
    # a cold bed cannot melt; freeze-on requires basal water
    cold = t_bot < t_pmp_bed - 1.0e-3
    bmb = jnp.where(cold & (bmb < 0.0), 0.0, bmb)
    bmb = jnp.where((bmb > 0.0) & (basal_water_thickness <= 0.0), 0.0,
                    bmb)
    basal_temperature = jnp.minimum(t_bot, t_pmp_bed)
    return bmb, basal_temperature, conductive_down


def basal_melt_floating(cfg, thickness, bed_topography, ocean_temperature,
                        gamma_t: float = 1.0e-4):
    """Ocean-driven melt under floating ice, thermal-forcing form
    (ref: li_basal_melt_floating_ice, mpas_li_thermal.F:1403-1584,
    'temperature_forcing' genre): melt = gamma_T c_w rho_w / (rho_i L)
    * (T_ocn - T_freeze(draft)), with the pressure/salinity freezing
    point at the ice draft. Returns m ice/s (positive = melt)."""
    rho_w, c_w = 1028.0, 3974.0
    draft = jnp.minimum(bed_topography + 0.0, 0.0)
    # floating: draft = -rho_i/rho_w * H
    draft = -cfg.rho_ice / rho_w * thickness
    t_freeze = _T0 - 1.85 - 7.61e-4 * (-draft)     # C->K offsets inline
    forcing = jnp.maximum(ocean_temperature - t_freeze, 0.0)
    melt = gamma_t * c_w * rho_w / (cfg.rho_ice * L_FUS) * forcing
    floating = bed_topography < -cfg.rho_ice / rho_w * thickness
    return jnp.where(floating & (thickness > 1.0), melt, 0.0)
