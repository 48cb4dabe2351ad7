"""Ocean biogeochemistry tracer tendencies (ecosys-class NPZD + DMS).

ref capability: src/core_ocean/shared/mpas_ocn_tracer_ecosys.F +
mpas_ocn_tracer_DMS.F + mpas_ocn_tracer_MacroMolecules.F — the reference
couples the MARBL/ecosys library through per-tracer interior tendencies
plus surface gas-exchange fluxes, evaluated operator-split in the tracer
update. The full MARBL chemistry lives in an external library not
vendored with the reference; this module provides the same coupling
surface with a self-contained NPZD-class model:

  N  nutrient        P  phytoplankton     Z  zooplankton
  D  detritus        (+ optional DMS with production/ventilation)

Column processes (all elementwise, vmapped over cells with depth in
lanes): light-limited Michaelis-Menten uptake with self-shading
attenuation, grazing (Holling II), linear+quadratic mortalities,
detritus sinking and remineralization, and air-sea DMS ventilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BgcParams(NamedTuple):
    mu_max: float = 2.0 / 86400.0      # max phyto growth (1/s)
    k_n: float = 0.5                   # nutrient half-saturation (mmol/m3)
    alpha_light: float = 0.04          # light-limitation slope (1/(W/m2))
    kw: float = 0.04                   # water light attenuation (1/m)
    kc: float = 0.03                   # self-shading (1/m per mmol/m3)
    graze_max: float = 1.0 / 86400.0   # max grazing (1/s)
    k_p: float = 1.0                   # grazing half-saturation
    assim: float = 0.7                 # zooplankton assimilation
    m_p: float = 0.05 / 86400.0        # phyto linear mortality
    m_z: float = 0.2 / 86400.0         # zoo quadratic mortality (1/s per X)
    remin: float = 0.1 / 86400.0       # detritus remineralization
    w_sink: float = 5.0 / 86400.0      # detritus sinking (m/s)
    dms_yield: float = 0.02            # DMS produced per grazing loss
    dms_decay: float = 1.0 / (3.0 * 86400.0)
    piston_dms: float = 3.0e-5         # surface ventilation (m/s)


def bgc_tendencies(h, sw_surface, n, p_phy, z, d, params: BgcParams,
                   dms=None):
    """Interior NPZD(+DMS) tendencies (per second).

    h: (nC, nz) layer thickness; sw_surface: (nC,) surface shortwave W/m2;
    tracers (nC, nz) in mmol/m3. Returns (dN, dP, dZ, dD[, dDMS])."""
    pr = params
    # light profile with self-shading (cumulative attenuation to layer mid)
    tau = (pr.kw + pr.kc * jnp.maximum(p_phy, 0.0)) * h
    cum = jnp.cumsum(tau, axis=-1) - 0.5 * tau
    light = sw_surface[:, None] * jnp.exp(-cum)
    f_light = 1.0 - jnp.exp(-pr.alpha_light * jnp.maximum(light, 0.0))
    f_nut = jnp.maximum(n, 0.0) / (pr.k_n + jnp.maximum(n, 0.0))
    growth = pr.mu_max * f_light * f_nut * jnp.maximum(p_phy, 0.0)
    graze = pr.graze_max * jnp.maximum(p_phy, 0.0) \
        / (pr.k_p + jnp.maximum(p_phy, 0.0)) * jnp.maximum(z, 0.0)
    mort_p = pr.m_p * jnp.maximum(p_phy, 0.0)
    mort_z = pr.m_z * jnp.maximum(z, 0.0) ** 2
    remin = pr.remin * jnp.maximum(d, 0.0)

    dn = -growth + remin
    dp = growth - graze - mort_p
    dz = pr.assim * graze - mort_z
    dd = (1.0 - pr.assim) * graze + mort_p + mort_z - remin

    out = (dn, dp, dz, dd)
    if dms is not None:
        ddms = pr.dms_yield * graze - pr.dms_decay * jnp.maximum(dms, 0.0)
        # surface ventilation to the atmosphere
        vent = pr.piston_dms * jnp.maximum(dms[:, 0], 0.0) / h[:, 0]
        ddms = ddms.at[:, 0].add(-vent)
        out = out + (ddms,)
    return out


def sink_detritus(d, h, w_sink, dt):
    """Upstream sinking of detritus (ref: the sinking term of ecosys
    particulate pools). k=0 is the surface; material leaving the bottom
    live layer is removed (export to sediment)."""
    cfl = jnp.minimum(w_sink * dt / h, 0.9)
    out = d * cfl
    inflow = jnp.concatenate([jnp.zeros_like(d[:, :1]),
                              (out * h)[:, :-1]], axis=-1) / h
    return d - out + inflow


def bgc_step(state, grid, dt, sw_surface, params: BgcParams = BgcParams(),
             index0: int = 2, with_dms: bool = False):
    """Operator-split BGC update on tracers [index0 .. index0+3(+1)] =
    (N, P, Z, D[, DMS]) (the reference evaluates ecosys tendencies inside
    the tracer update; split here like the other column physics)."""
    tr = state.tracers
    h = state.layerThickness
    n = tr[..., index0]
    p_phy = tr[..., index0 + 1]
    z = tr[..., index0 + 2]
    d = tr[..., index0 + 3]
    dms = tr[..., index0 + 4] if with_dms else None
    tends = bgc_tendencies(h, sw_surface, n, p_phy, z, d, params, dms=dms)
    n = jnp.maximum(n + dt * tends[0], 0.0)
    p_phy = jnp.maximum(p_phy + dt * tends[1], 0.0)
    z = jnp.maximum(z + dt * tends[2], 0.0)
    d = jnp.maximum(d + dt * tends[3], 0.0)
    d = sink_detritus(d, h, params.w_sink, dt)
    tr = tr.at[..., index0].set(n)
    tr = tr.at[..., index0 + 1].set(p_phy)
    tr = tr.at[..., index0 + 2].set(z)
    tr = tr.at[..., index0 + 3].set(d)
    if with_dms:
        dms = jnp.maximum(dms + dt * tends[4], 0.0)
        tr = tr.at[..., index0 + 4].set(dms)
    return state.replace(tracers=tr)


# ---------------------------------------------------------------------------
# multi-group ecosys-class model
# (ref capability: mpas_ocn_tracer_ecosys.F — the MARBL-genre multi-element
#  ecosystem: N/Si/Fe co-limitation, multiple phytoplankton functional
#  types, zooplankton, sinking particulate pools. The reference couples an
#  external library; this is the same coupling surface with a
#  self-contained 8-pool model in nitrogen units.)
# ---------------------------------------------------------------------------

class EcosysParams(NamedTuple):
    """Pools (all mmol N/m3 except SiO3 mmol Si/m3, Fe mmol Fe/m3):
    NO3, SiO3, Fe, spN (small phyto), diatN (diatoms), zooN,
    detN (sinking PON), detSi (sinking biogenic opal)."""
    mu_sp: float = 2.0 / 86400.0       # small-phyto max growth (1/s)
    mu_diat: float = 2.5 / 86400.0     # diatom max growth
    k_no3_sp: float = 0.25             # half saturations
    k_no3_diat: float = 0.8
    k_sio3: float = 1.0
    k_fe_sp: float = 6e-5
    k_fe_diat: float = 1.5e-4
    alpha_light: float = 0.04
    kw: float = 0.04
    kc: float = 0.03
    graze_sp: float = 1.2 / 86400.0    # grazing on small phyto
    graze_diat: float = 0.7 / 86400.0  # diatoms grazed more slowly
    k_graze: float = 1.0
    assim: float = 0.7
    m_p: float = 0.05 / 86400.0
    m_z: float = 0.2 / 86400.0
    remin_n: float = 0.1 / 86400.0
    remin_si: float = 0.03 / 86400.0   # opal dissolves more slowly
    r_si_n: float = 1.0                # diatom Si:N uptake ratio
    r_fe_n: float = 3e-5               # Fe:N ratio of all biomass
    fe_scav: float = 1.0 / (180.0 * 86400.0)  # scavenging of free Fe
    w_sink_n: float = 8.0 / 86400.0
    w_sink_si: float = 30.0 / 86400.0


def ecosys_tendencies(h, sw_surface, tr8, params: EcosysParams):
    """Interior multi-group tendencies; tr8 = (nC, nz, 8) pools in the
    EcosysParams order. Returns d(tr8)/dt (same shape).

    Conservation by construction: total N (NO3+sp+diat+zoo+detN) and total
    Si (SiO3 + r_si_n*diat + detSi) have zero interior tendency; Fe is
    conserved up to the documented scavenging sink (particle adsorption
    export, ref ecosys Fe scavenging)."""
    pr = params
    no3, sio3, fe = tr8[..., 0], tr8[..., 1], tr8[..., 2]
    sp, diat, zoo = tr8[..., 3], tr8[..., 4], tr8[..., 5]
    detn, detsi = tr8[..., 6], tr8[..., 7]
    pos = lambda x: jnp.maximum(x, 0.0)

    # shared light profile with self-shading from total phyto biomass
    biomass = pos(sp) + pos(diat)
    tau = (pr.kw + pr.kc * biomass) * h
    cum = jnp.cumsum(tau, axis=-1) - 0.5 * tau
    light = sw_surface[:, None] * jnp.exp(-cum)
    f_light = 1.0 - jnp.exp(-pr.alpha_light * pos(light))

    # Liebig co-limitation (ref ecosys multi-nutrient limitation genre)
    lim_sp = jnp.minimum(pos(no3) / (pr.k_no3_sp + pos(no3)),
                         pos(fe) / (pr.k_fe_sp + pos(fe)))
    lim_diat = jnp.minimum(
        jnp.minimum(pos(no3) / (pr.k_no3_diat + pos(no3)),
                    pos(sio3) / (pr.k_sio3 + pos(sio3))),
        pos(fe) / (pr.k_fe_diat + pos(fe)))
    grow_sp = pr.mu_sp * f_light * lim_sp * pos(sp)
    grow_diat = pr.mu_diat * f_light * lim_diat * pos(diat)

    gr_sp = pr.graze_sp * pos(sp) / (pr.k_graze + pos(sp)) * pos(zoo)
    gr_diat = pr.graze_diat * pos(diat) / (pr.k_graze + pos(diat)) \
        * pos(zoo)
    mort_sp = pr.m_p * pos(sp)
    mort_diat = pr.m_p * pos(diat)
    mort_z = pr.m_z * pos(zoo) ** 2
    remin_n = pr.remin_n * pos(detn)
    remin_si = pr.remin_si * pos(detsi)

    d_no3 = -(grow_sp + grow_diat) + remin_n
    d_sp = grow_sp - gr_sp - mort_sp
    d_diat = grow_diat - gr_diat - mort_diat
    d_zoo = pr.assim * (gr_sp + gr_diat) - mort_z
    d_detn = (1.0 - pr.assim) * (gr_sp + gr_diat) \
        + mort_sp + mort_diat + mort_z - remin_n
    # silicon: diatom uptake -> biogenic opal on diatom losses -> dissolve
    d_sio3 = -pr.r_si_n * grow_diat + remin_si
    d_detsi = pr.r_si_n * (gr_diat + mort_diat) - remin_si
    # but grazed diatom Si goes straight to detSi while grazed N splits:
    # total Si tendency = -r*grow + r*(gr+mort) + (remin-remin) ... must be
    # -d(r*diat): r*(gr+mort-grow) -> sum_Si = d_sio3 + r*d_diat + d_detsi
    #  = remin - r*grow + r*(grow-gr-mort) + r*(gr+mort) - remin = 0  ✓
    # iron: fixed stoichiometry rides the N pools (biomass Fe is implicit,
    # r_fe_n * N), so the dissolved pool sees uptake, remineralization
    # release, and particle scavenging (the documented non-conserved sink)
    d_fe = pr.r_fe_n * (remin_n - grow_sp - grow_diat) \
        - pr.fe_scav * pos(fe)

    return jnp.stack([d_no3, d_sio3, d_fe, d_sp, d_diat, d_zoo,
                      d_detn, d_detsi], axis=-1)


def ecosys_step(state, grid, dt, sw_surface,
                params: EcosysParams = EcosysParams(), index0: int = 2):
    """Operator-split multi-group ecosys update on tracers
    [index0 .. index0+7] (ref: ecosys tendencies inside the tracer update,
    mpas_ocn_tracer_ecosys.F; sinking applied to the particulate pools)."""
    tr = state.tracers
    h = state.layerThickness
    tr8 = tr[..., index0:index0 + 8]
    tends = ecosys_tendencies(h, sw_surface, tr8, params)
    tr8 = jnp.maximum(tr8 + dt * tends, 0.0)
    detn = sink_detritus(tr8[..., 6], h, params.w_sink_n, dt)
    detsi = sink_detritus(tr8[..., 7], h, params.w_sink_si, dt)
    tr8 = tr8.at[..., 6].set(detn).at[..., 7].set(detsi)
    tr = tr.at[..., index0:index0 + 8].set(tr8)
    return state.replace(tracers=tr)


def carbon_step(state, grid, dt, t_c, s, wind10, index_dic: int,
                index_alk: int, pco2_atm_uatm: float = 420.0,
                ice_frac=0.0):
    """DIC/ALK carbon-pool update: air-sea CO2 exchange into the top
    layer (ref: the ecosys carbonate/gas-exchange block of
    mpas_ocn_tracer_ecosys.F; chemistry in ocean/carbonate.py).

    t_c/s: surface temperature (C) and salinity (psu), (nC,);
    wind10 (nC,) m/s; tracers carry DIC/ALK in mol/kg at index_dic/alk.
    Returns (state, diagnostics dict with pCO2/pH/flux)."""
    import jax.numpy as jnp

    from mpas_tpu.cores.ocean.carbonate import air_sea_co2_flux
    tr = state.tracers
    h_top = state.layerThickness[:, 0]
    dic = tr[:, 0, index_dic]
    alk = tr[:, 0, index_alk]
    flux, pco2, ph = air_sea_co2_flux(dic, alk, t_c, s, wind10,
                                      pco2_atm_uatm=pco2_atm_uatm,
                                      ice_frac=ice_frac)
    # mol/m2/s into mol/kg of the top layer (rho0 ~ 1030 kg/m3)
    d_dic = flux * dt / (1030.0 * jnp.maximum(h_top, 0.1))
    tr = tr.at[:, 0, index_dic].add(d_dic)
    return state.replace(tracers=tr), {
        "pco2Surface": pco2, "phSurface": ph, "co2Flux": flux}
