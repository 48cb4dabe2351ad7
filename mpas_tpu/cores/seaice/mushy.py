"""Full mushy-layer sea-ice physics: Assur liquidus, enthalpy inversion,
two-mode gravity drainage, flushing, and the coupled T-S column update.

TPU-native re-implementation of the mushy machinery of
ref: src/core_seaice/column/ice_mushy_physics.F90 (two-region Assur 1958
liquidus :28-135, enthalpy_mush :287-327, temperature_mush quadratic
inversion :361-409, enthalpy_brine :345-357, density_brine :163-180) and
src/core_seaice/column/ice_therm_mushy.F90 (Turner, Hunke & Jeffery 2013
JGR two-mode gravity drainage: explicit_flow_velocities :2840-3011,
Golden et al. 2007 permeability :2820-2836, flushing_velocity
:3017-3133, flush_pond :3137-3173, solve_salinity :2690-2766, and the
Picard-coupled temperature-salinity iteration :1118-1379).

Layout: per-layer arrays are (..., nilyr) with layers in the minor
(lane) dimension; layer loops with cumulative state (the bottom-up
permeability/density sweeps) unroll over the static nilyr. The
reference's per-column early exits become masks.

Default drainage constants = the reference Registry defaults
(src/core_seaice/Registry.xml:1506-1530): a_rapid_mode = 0.5 mm,
Rac = 10, aspect = 1, dSdt_slow = -1.5e-7 m/s/K (Registry default
-5e-8 in some configs; the colpkg default used here), phi_c_slow = 0.05.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# base constants (ref: ice_constants_colpkg.F90, cice set)
RHOI = 917.0
RHOW = 1026.0
RHOS = 330.0
CP_ICE = 2106.0
CP_OCN = 4218.0
LFRESH = 3.34e5
GRAV = 9.80616
VISC_DYN = 1.79e-3          # dynamic viscosity of brine (kg/m/s)
KAPPA_L = 8.824e-8          # heat diffusivity of liquid (m2/s)

# drainage-mode constants (ref Registry.xml:1506-1530 defaults)
A_RAPID = 0.5e-3            # channel radius (m)
RAC_RAPID = 10.0            # critical Rayleigh number
ASPECT_RAPID = 1.0
DSDT_SLOW = -1.5e-7         # slow-mode strength (m/s/K)
PHI_C_SLOW = 0.05
S_MIN = 0.01                # psu floor in solve_salinity
ZSIN_MIN = 0.1

# ---------------------------------------------------------------------------
# Assur (1958) two-region liquidus (ref ice_mushy_physics.F90:28-135)
# ---------------------------------------------------------------------------
AZ1, BZ1 = -18.48, 0.0
AZ2, BZ2 = -10.3085, 62.4
TB_LIQ = -7.6362968855167352
SB_LIQ = 123.66702800276086
AZ1P, BZ1P = AZ1 / 1000.0, BZ1 / 1000.0
AZ2P, BZ2P = AZ2 / 1000.0, BZ2 / 1000.0

AS1 = AZ1P * (RHOW * CP_OCN - RHOI * CP_ICE)
AC1 = RHOI * CP_ICE * AZ1
BS1 = (1.0 + BZ1P) * (RHOW * CP_OCN - RHOI * CP_ICE) + RHOI * LFRESH * AZ1P
BQ1 = -AZ1
BC1 = RHOI * CP_ICE * BZ1 - RHOI * LFRESH * AZ1
CS1 = RHOI * LFRESH * (1.0 + BZ1P)
CQ1 = -BZ1
CC1 = -RHOI * LFRESH * BZ1

AS2 = AZ2P * (RHOW * CP_OCN - RHOI * CP_ICE)
AC2 = RHOI * CP_ICE * AZ2
BS2 = (1.0 + BZ2P) * (RHOW * CP_OCN - RHOI * CP_ICE) + RHOI * LFRESH * AZ2P
BQ2 = -AZ2
BC2 = RHOI * CP_ICE * BZ2 - RHOI * LFRESH * AZ2
CS2 = RHOI * LFRESH * (1.0 + BZ2P)
CQ2 = -BZ2
CC2 = -RHOI * LFRESH * BZ2

D_LIQ = ((1.0 + AZ1P * TB_LIQ + BZ1P) / (AZ1 * TB_LIQ + BZ1)) \
    * ((CP_OCN * RHOW - CP_ICE * RHOI) * TB_LIQ + LFRESH * RHOI)
E_LIQ = CP_ICE * RHOI * TB_LIQ - LFRESH * RHOI

F1 = (-1000.0 * CP_OCN * RHOW) / AZ1
G1 = -1000.0
H1 = (-BZ1 * CP_OCN * RHOW) / AZ1
F2 = (-1000.0 * CP_OCN * RHOW) / AZ2
G2 = -1000.0
H2 = (-BZ2 * CP_OCN * RHOW) / AZ2
I_LIQ = 1.0 / (CP_OCN * RHOW)

J1, K1, L1 = BZ1 / AZ1, 1.0 / 1000.0, (1.0 + BZ1P) / AZ1
J2, K2, L2 = BZ2 / AZ2, 1.0 / 1000.0, (1.0 + BZ2P) / AZ2
M1, N1, O1 = AZ1, -AZ1P, -BZ1 / AZ1
M2, N2, O2 = AZ2, -AZ2P, -BZ2 / AZ2


def liquidus_brine_salinity(T):
    """Equilibrium brine salinity Sbr(T) (ppt); ref :237-260."""
    hi = T > TB_LIQ
    sbr = jnp.where(hi, (T + J1) / (K1 * T + L1),
                    (T + J2) / (K2 * T + L2))
    return jnp.where(T <= 0.0, sbr, 0.0)


def liquidus_temperature(Sbr):
    """Equilibrium temperature T(Sbr) (C); ref :264-283."""
    hi = Sbr <= SB_LIQ
    return jnp.where(hi, Sbr / (M1 + N1 * Sbr) + O1,
                     Sbr / (M2 + N2 * Sbr) + O2)


def liquid_fraction(T, S):
    """phi = S / Sbr(T), clipped to [0, 1]; ref :218-233."""
    sbr = jnp.maximum(liquidus_brine_salinity(T), 1.0e-10)
    return jnp.clip(S / sbr, 0.0, 1.0)


def enthalpy_mush(T, S):
    """q(T, S) (J/m3); ref :287-306."""
    phi = liquid_fraction(T, S)
    return phi * (CP_OCN * RHOW - CP_ICE * RHOI) * T \
        + RHOI * CP_ICE * T - (1.0 - phi) * RHOI * LFRESH


def temperature_mush(q, S):
    """T(q, S) via the two-region quadratic inversion; ref :361-409."""
    s_low = S < SB_LIQ
    q0 = jnp.where(s_low, (F1 * S) / (G1 + S) + H1,
                   (F2 * S) / (G2 + S) + H2)
    melted = q > q0
    qb = D_LIQ * S + E_LIQ
    hi = q > qb
    A = jnp.where(hi, AS1 * S + AC1, AS2 * S + AC2)
    B = jnp.where(hi, BS1 * S + BQ1 * q + BC1, BS2 * S + BQ2 * q + BC2)
    C = jnp.where(hi, CS1 * S + CQ1 * q + CC1, CS2 * S + CQ2 * q + CC2)
    T = (-B + jnp.sqrt(jnp.maximum(B * B - 4.0 * A * C, 1.0e-30))) \
        / (2.0 * A)
    return jnp.where(melted, q * I_LIQ, T)


def enthalpy_brine(T):
    """ref :345-357."""
    return CP_OCN * RHOW * T


def density_brine(Sbr):
    """ref :163-180 (empirical)."""
    return 1000.3 + 0.78237 * Sbr + 2.8008e-4 * Sbr ** 2


def permeability(phi):
    """Golden et al. 2007 (ref ice_therm_mushy.F90:2820-2836)."""
    return 3.0e-8 * jnp.maximum(phi - 0.05, 0.0) ** 3


# ---------------------------------------------------------------------------
# Turner et al. 2013 two-mode gravity drainage (ref :2840-3011)
# ---------------------------------------------------------------------------

def explicit_flow_velocities(zSin, zTin, Tsf, Tbot, dt, sss, qocn,
                             hilyr, hin):
    """Rapid-mode Darcy interface flows q (..., nilyr) [upward, indexed
    so q[k] is the flow at the TOP of layer k] and slow-mode dSdt, plus
    the brine salinity/enthalpy profiles. Batched over leading dims;
    the bottom-up cumulative sweep unrolls over the static nilyr."""
    nilyr = zSin.shape[-1]
    Sbr = liquidus_brine_salinity(zTin)
    phi = liquid_fraction(zTin, zSin)
    qbr = enthalpy_brine(zTin)
    rho = density_brine(Sbr)
    rho_ocn = density_brine(sss)
    # rho at interface above layer k: 0.5*(rho[k]+rho[k-1]), rho[-1]=rho[0]
    rho_up = jnp.concatenate([rho[..., :1], rho[..., :-1]], axis=-1)
    rho_pipe = 0.5 * (rho + rho_up)

    qlimit = (0.2 * hilyr) / dt
    ra_const = GRAV / (VISC_DYN * KAPPA_L)

    q_list = [None] * nilyr
    dsdt_list = [None] * nilyr
    perm_min = jnp.full(zSin.shape[:-1], 1.0e30, zSin.dtype)
    perm_harm = jnp.zeros(zSin.shape[:-1], zSin.dtype)
    rho_sum = jnp.zeros(zSin.shape[:-1], zSin.dtype)
    for j, k in enumerate(range(nilyr - 1, -1, -1)):
        z = ((k + 0.5) / nilyr) * hin
        perm = permeability(phi[..., k])
        perm_min = jnp.minimum(perm_min, perm)
        perm_harm = perm_harm + 1.0 / jnp.maximum(perm, 1.0e-30)
        rho_sum = rho_sum + rho[..., k]
        drho = jnp.maximum(rho[..., k] - rho_ocn, 0.0)
        Ra = drho * (hin - z) * perm_min * ra_const
        rn = float(j + 1)
        L = rn * hilyr
        dx = L * 2.0 * ASPECT_RAPID
        dx2 = dx * dx
        Am = (dx2 * rn) / (VISC_DYN * perm_harm)
        Bm = (-GRAV * rho_sum) / rn
        Ap = (np.pi * A_RAPID ** 4) / (8.0 * VISC_DYN)
        Bp = -rho_pipe[..., k] * GRAV
        qk = jnp.maximum((Am / dx2) * ((-Ap * Bp - Am * Bm) / (Am + Ap)
                                       + Bm), 1.0e-30)
        qk = jnp.minimum(qk * (jnp.maximum(Ra - RAC_RAPID, 0.0)
                               / (Ra + 1.0e-11)), qlimit)
        # slow-mode drainage (ref :2994-2999)
        dsdt = DSDT_SLOW * (jnp.maximum(zSin[..., k]
                                        - PHI_C_SLOW * Sbr[..., k], 0.0)
                            * jnp.maximum(Tbot - Tsf, 0.0)) \
            / (hin + 0.001)
        dsdt = jnp.maximum(dsdt, (-zSin[..., k] * 0.5) / dt)
        # salt-loss safety limiter (ref :3001-3009)
        if k == nilyr - 1:
            sbr_dn = jnp.asarray(sss) * jnp.ones_like(Sbr[..., k])
        else:
            sbr_dn = Sbr[..., k + 1]
        ds_guess = ((qk * (sbr_dn - Sbr[..., k])) / hilyr + dsdt) \
            * dt * 10.0
        alpha = jnp.where(jnp.abs(ds_guess) < 1.0e-11, 1.0,
                          (ZSIN_MIN - zSin[..., k]) / jnp.where(
                              jnp.abs(ds_guess) < 1.0e-11, 1.0, ds_guess))
        alpha = jnp.where((alpha < 0.0) | (alpha > 1.0), 1.0, alpha)
        q_list[k] = qk * alpha
        dsdt_list[k] = dsdt * alpha
    q = jnp.stack(q_list, axis=-1)
    dSdt = jnp.stack(dsdt_list, axis=-1)
    return q, dSdt, Sbr, qbr, phi


def flushing_velocity(zTin, phi, hin, hsn, hilyr, hpond, apond, dt):
    """Downward Darcy flushing velocity from the pond hydraulic head
    (ref :3017-3133)."""
    nilyr = phi.shape[-1]
    perm = permeability(phi)
    phi_min = jnp.min(phi, axis=-1)
    rho_br = density_brine(liquidus_brine_salinity(zTin))
    ice_mass = jnp.sum(phi * rho_br + (1.0 - phi) * RHOI,
                       axis=-1) * hilyr
    perm_harm = nilyr / jnp.sum(1.0 / (perm + 1.0e-30), axis=-1)
    hocn = (ice_mass + hpond * apond * RHOW + hsn * RHOS) / RHOW
    hbrine = hin + hpond
    dhhead = jnp.maximum(hbrine - hocn, 0.0)
    w = (perm_harm * RHOW * GRAV * (dhhead / jnp.maximum(hin, 1e-6))) \
        / VISC_DYN
    w = jnp.minimum(w, (hpond * apond) / dt)
    wlimit = (0.005 * phi_min * hilyr) / dt
    w = jnp.where(jnp.abs(w) > 1.0e-11,
                  w * jnp.clip(jnp.abs(wlimit / jnp.where(
                      jnp.abs(w) > 1.0e-11, w, 1.0)), 0.0, 1.0), 0.0)
    return jnp.maximum(w, 0.0)


def solve_salinity(zSin, Sbr, Spond, sss, q, dSdt, w, hilyr, dt):
    """Bulk-salinity update from drainage + flushing advection
    (ref :2690-2766). q[k] = upward Darcy flow at top of layer k; the
    flux into layer k from below uses Sbr[k+1] (ocean for the bottom).
    Returns (zSin_new, fzsal): fzsal = net salt flux to the ocean
    (kg/m2/s, positive into ocean)."""
    nilyr = zSin.shape[-1]
    sbr_dn = jnp.concatenate(
        [Sbr[..., 1:], jnp.broadcast_to(
            jnp.asarray(sss)[..., None], Sbr[..., :1].shape)], axis=-1)
    sbr_up = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(Spond)[..., None],
                          Sbr[..., :1].shape), Sbr[..., :-1]], axis=-1)
    dS = ((q * (sbr_dn - Sbr)) / hilyr[..., None]
          + dSdt
          + (w[..., None] * (sbr_up - Sbr)) / hilyr[..., None]) * dt
    dS = jnp.maximum(S_MIN - zSin, dS)
    zSin_new = zSin + dS
    # salt budget: whatever leaves the ice goes to the ocean
    # (rho_i h dS sums; flux in kg salt / m2 / s, 1 ppt = 1 g/kg)
    fzsal = -jnp.sum(dS, axis=-1) * hilyr * RHOI * 1.0e-3 / dt
    return zSin_new, fzsal


def drainage_heat_flux(q, w, qbr, qocn, qpond=0.0):
    """Brine advective heat flux divergence per layer (J/m3/s * hilyr;
    ref picard_drainage_fluxes :1545-1581 and picard_flushing_fluxes
    :1585-1606): upward drainage brings brine enthalpy from below,
    downward flushing from above."""
    qbr_dn = jnp.concatenate(
        [qbr[..., 1:], jnp.broadcast_to(
            jnp.asarray(qocn)[..., None], qbr[..., :1].shape)], axis=-1)
    qbr_up = jnp.concatenate(
        [jnp.full_like(qbr[..., :1], qpond), qbr[..., :-1]], axis=-1)
    return q * (qbr_dn - qbr) + w[..., None] * (qbr_up - qbr)


def mushy_coupled_step(zTin, zSin, Tsf, Tbot, h_i, h_s, hpond, apond,
                       sss, qocn, dt, n_picard: int = 3):
    """Coupled temperature-salinity Picard update for the brine dynamics
    (ref picard_solver :1118-1379, drainage+flushing part): iterates
    {flow velocities from (T, S)} -> {salinity update} -> {temperature
    correction from brine advective heat} holding the conductive state
    fixed (the conduction solve lives in thermo_vertical._solve_heat).

    All inputs batched (...); per-layer (..., nilyr).
    Returns (zTin', zSin', fzsal, fadvheat_total)."""
    nilyr = zSin.shape[-1]
    hilyr = jnp.maximum(h_i, 1.0e-6) / nilyr
    T = zTin
    S = zSin
    fzsal_acc = 0.0
    for _ in range(n_picard):
        q, dSdt, Sbr, qbr, phi = explicit_flow_velocities(
            S, T, Tsf, Tbot, dt, sss, qocn, hilyr, h_i)
        w = flushing_velocity(T, phi, h_i, h_s, hilyr, hpond, apond, dt)
        S_new, fzsal = solve_salinity(S, Sbr, 0.0, sss, q, dSdt, w,
                                      hilyr, dt)
        # heat carried by the brine flows, applied at fixed enthalpy
        # then re-inverted for T at the NEW salinity (enthalpy-
        # conservative coupling: q is invariant under the S update,
        # advective heating adds to it)
        qq = enthalpy_mush(T, S)
        dq = drainage_heat_flux(q, w, qbr, qocn) \
            / jnp.maximum(hilyr[..., None], 1e-6) * dt
        qq = qq + dq
        T = temperature_mush(qq, S_new)
        T = jnp.minimum(T, 0.0)
        S = S_new
        fzsal_acc = fzsal
        # heat budget closure: the ice column gained sum(dq*hilyr);
        # the matching flux is drawn from the ocean (ref fadvheat)
        fadvheat = -jnp.sum(dq, axis=-1) * hilyr / dt
    return T, S, fzsal_acc, fadvheat
