"""Nonhydrostatic split-explicit RK3 dynamics (dry core compute path).

TPU-native re-design of the reference dycore internals
(ref: src/core_atmosphere/dynamics/mpas_atm_time_integration.F):
  solve_diagnostics      <- atm_compute_solve_diagnostics_work (:5513)
  smagorinsky_kdiff      <- 2d_smagorinsky block of dyn_tend (:4668-4700)
  compute_dyn_tend       <- atm_compute_dyn_tend_work (:4481)
  vert_imp_coefs         <- atm_compute_vert_imp_coefs_work (:2012)
  set_smlstep_pert       <- atm_set_smlstep_pert_variables_work (:2224)
  acoustic_step          <- atm_advance_acoustic_step_work (:2447)
  divergence_damping_3d  <- atm_divergence_damping_3d (:2726)
  recover_large_step     <- atm_recover_large_step_variables_work (:2909)

Layout: levels minor (lanes); interfaces are arrays of nz+1. All horizontal
stencils are destination-side gathers batched over the vertical, so each
gather row carries nz (or nz+1) lanes — the gather cost amortizes over the
whole column (the design reason the reference keeps columns on-rank;
SURVEY.md §5.7). Scatter-free throughout. Dry path: cqu=cqw=1, qtot=0,
rt_diabatic_tend=0; moist coefficients plug in via the `cqu`/`cqw` args.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mpas_tpu.constants import cp, cv, gravity, omega, p0, rgas
from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.setup import AtmGrid
from mpas_tpu.ops.vscan import thomas_prefactor, thomas_solve

RCV = rgas / (cp - rgas)
C2 = cp * RCV
SECONDS_PER_DAY = 86400.0
CURVATURE = True  # debug kill-switch for the spherical curvature terms
# instability-bisection switches (all True in production)
DBG = {"q": True, "ke": True, "hdivu": True, "uvert": True, "thadv": True,
       "thvert": True, "wadv": True, "wvert": True, "apgrad": True,
       "ueuler": True, "weuler": True, "thpickup": True, "tsflux": True}


# ---------------------------------------------------------------------------
# vertical helpers (levels k=0..nz-1; interfaces i=0..nz)
# ---------------------------------------------------------------------------

def to_interface(x, fzm, fzp):
    """Level field -> interface field (0 at bottom/top).
    interface i (1..nz-1): fzm[i]*x[i] + fzp[i]*x[i-1]."""
    nz = x.shape[-1]
    mid = fzm[1:nz] * x[..., 1:] + fzp[1:nz] * x[..., :-1]
    zero = jnp.zeros_like(x[..., :1])
    return jnp.concatenate([zero, mid, zero], axis=-1)


def flux3_vertical(x, mass_int, fzm, fzp, coef3):
    """3rd/4th-order vertical flux of level field x with interface mass flux.

    Returns interface array (nz+1): 0 at ends, 2nd-order at i=1 and i=nz-1,
    flux3 at i=2..nz-2 (ref: the wduz/wdtz local statement functions,
    mpas_atm_time_integration.F:4658-4663 and usages)."""
    nz = x.shape[-1]
    second = mass_int[..., 1:nz] * (fzm[1:nz] * x[..., 1:]
                                    + fzp[1:nz] * x[..., :-1])
    # flux3 interior i=2..nz-2: stencil x[i-2], x[i-1], x[i], x[i+1]
    qm2 = x[..., 0:nz - 3]
    qm1 = x[..., 1:nz - 2]
    qi = x[..., 2:nz - 1]
    qp1 = x[..., 3:nz]
    m = mass_int[..., 2:nz - 1]
    f4 = m * (7.0 * (qi + qm1) - (qp1 + qm2)) / 12.0
    f3 = f4 + coef3 * jnp.abs(m) * ((qp1 - qm2) - 3.0 * (qi - qm1)) / 12.0
    zero = jnp.zeros_like(x[..., :1])
    return jnp.concatenate([zero, second[..., :1], f3,
                            second[..., nz - 2:nz - 1], zero], axis=-1)


def d_interface(flux_int, rdzw):
    """-d(flux)/dzeta at levels: returns (flux[i+1]-flux[i])*rdzw[k]."""
    return (flux_int[..., 1:] - flux_int[..., :-1]) * rdzw


def _add_interior(x, delta):
    """x + delta on interface rows 1..nz-1, identity at 0 and nz.

    Value-identical to ``x.at[:, 1:nz].add(delta)`` but lowers to a pad+add
    fusion instead of a scatter: the static-slice ``.at[].add`` form lowers
    to an HLO scatter on the sharded path, which XLA constant-folds for
    seconds per compile at 40k cells (MULTICHIP_r04 finding)."""
    return x + jnp.pad(delta, ((0, 0), (1, 1)))


# ---------------------------------------------------------------------------
# diagnostics
# ---------------------------------------------------------------------------

class AtmSolveDiag(NamedTuple):
    rho_edge: Any       # (nE, nz)
    ke: Any             # (nC, nz)
    divergence: Any     # (nC, nz)
    vorticity: Any      # (nV, nz)
    pv_edge: Any        # (nE, nz)
    v: Any              # (nE, nz) tangential velocity


def solve_diagnostics(grid: AtmGrid, cfg: AtmConfig, u, rho_zz, dt,
                      reconstruct_v: bool = True, v_prev=None):
    """ref: atm_compute_solve_diagnostics_work (:5513). h == rho_zz here."""
    mesh = grid.mesh
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    v1, v2 = mesh.verticesOnEdge[:, 0], mesh.verticesOnEdge[:, 1]

    rho_edge = 0.5 * (rho_zz[c1] + rho_zz[c2])
    ke_edge = (mesh.dcEdge * mesh.dvEdge)[:, None] * u * u

    # u and ke_edge ride one packed row-gather round per stencil family,
    # slot-major (no (nC, mE, nz) intermediates)
    u_eov, ke_eov = _rows_gather(mesh.edgesOnVertex, [u, ke_edge])
    vorticity = jnp.sum(mesh.curlW[..., None] * u_eov, axis=1) \
        * mesh.invAreaTriangle[:, None]
    div_s, ke_s = _slot_weighted_sums(
        mesh.edgesOnCell, [u, ke_edge],
        [mesh.divW, mesh.edgesOnCellMask.astype(u.dtype)])
    divergence = div_s * mesh.invAreaCell[:, None]
    ke = 0.25 * ke_s * mesh.invAreaCell[:, None]

    # Hollingsworth correction (ref :5607-5652): blend cell KE with
    # vertex-remapped KE, ke_fact = 1 - 0.375. Mask padded edgesOnVertex
    # slots (|edgeSignOnVertex| = 0 there): on meshes with merged
    # (degree-4) vertices the vertexDegree pad would otherwise add
    # ke_edge[slot 0] spuriously — and shard-dependently.
    eov_mask = jnp.abs(mesh.edgeSignOnVertex)
    ke_vertex = 0.25 * jnp.sum(eov_mask[..., None] * ke_eov, axis=1) \
        * mesh.invAreaTriangle[:, None]
    ke_fact = 1.0 - 0.375
    pv_vertex = mesh.fVertex[:, None] + vorticity       # no 1/rho (ref :5707)
    if cfg.config_apvm_upwinding > 0.0:
        ke_voc, pv_voc = _rows_gather(mesh.verticesOnCell,
                                      [ke_vertex, pv_vertex])
    else:
        (ke_voc,) = _rows_gather(mesh.verticesOnCell, [ke_vertex])
    ke = ke_fact * ke + (1.0 - ke_fact) \
        * jnp.sum(grid.mesh.kiteAreasOnCell[..., None] * ke_voc, axis=1) \
        * mesh.invAreaCell[:, None]

    if reconstruct_v or v_prev is None:
        from mpas_tpu.ops.stencils import tangential_cell_assembled
        v = tangential_cell_assembled(mesh, u)
    else:
        v = v_prev

    (pv1, pv2), = _pair_gather(v1, v2, [pv_vertex])
    pv_edge = 0.5 * (pv1 + pv2)
    if cfg.config_apvm_upwinding > 0.0:
        pv_cell = jnp.sum(mesh.kiteAreasOnCell[..., None] * pv_voc, axis=1) \
            * mesh.invAreaCell[:, None]
        gradPVt = (pv2 - pv1) * mesh.invDvEdge[:, None]
        gradPVn = (pv_cell[c2] - pv_cell[c1]) * mesh.invDcEdge[:, None]
        r = cfg.config_apvm_upwinding * dt
        pv_edge = pv_edge - r * (v * gradPVt + u * gradPVn)

    return AtmSolveDiag(rho_edge=rho_edge, ke=ke, divergence=divergence,
                        vorticity=vorticity, pv_edge=pv_edge, v=v)


def smagorinsky_kdiff(grid: AtmGrid, cfg: AtmConfig, u, v, dt):
    """2d_smagorinsky eddy viscosity (ref :4668-4690)."""
    mesh = grid.mesh
    nz = u.shape[-1]
    cat = jnp.concatenate([u, v], axis=-1)
    rT = mesh.edgesOnCell.T
    d_diag = 0.0
    d_off = 0.0
    for s in range(rT.shape[0]):
        g = cat[rT[s]]
        gu, gv = g[:, :nz], g[:, nz:]
        a = grid.defc_a[:, s][:, None]
        b = grid.defc_b[:, s][:, None]
        d_diag = d_diag + a * gu - b * gv
        d_off = d_off + b * gu + a * gv
    ls = cfg.config_smagorinsky_coef * cfg.config_len_disp
    return jnp.minimum(ls * ls * jnp.sqrt(d_diag ** 2 + d_off ** 2),
                       0.01 * cfg.config_len_disp ** 2 / dt)


def reconstruct_cell_winds(grid: AtmGrid, u):
    """Cell-centered (zonal, meridional) winds via per-cell LSQ weights
    (TPU-native replacement for the reference RBF reconstruction that fills
    ur_cell/vr_cell; ref: mpas_vector_reconstruction.F:195,
    mpas_atm_time_integration.F:4343).

    Returns (ur_cell, vr_cell) with shape (nCells, nz)."""
    rT = grid.mesh.edgesOnCell.T
    ur = 0.0
    vr = 0.0
    for s in range(rT.shape[0]):
        g = u[rT[s]]
        ur = ur + grid.recon_zonal[:, s][:, None] * g
        vr = vr + grid.recon_merid[:, s][:, None] * g
    return ur, vr


def advective_flux_edge(grid: AtmGrid, field_cell, ru_for_sign):
    """3rd/4th-order horizontal edge value * dvEdge of a cell field
    (ref: the adv_coefs flux loops :5020-5035, :5199-5214).
    flux[e,k] = sum_j (adv_coefs[e,j] + sign(ru[e,k])*adv_coefs_3rd[e,j])
                * field[advCells[e,j], k]
    Dispatches to the cell-assembled factorization (advection.py) when the
    grid carries the factored tensors."""
    if grid.d2_bmat is not None:
        from mpas_tpu.cores.atmosphere.advection import edge_value_parts
        base, third = edge_value_parts(grid, field_cell)
        return base + jnp.sign(ru_for_sign) * third
    g = field_cell[grid.advCellsForEdge]                # (nE, N_ADV, K)
    base = jnp.sum(grid.adv_coefs[..., None] * g, axis=1)
    third = jnp.sum(grid.adv_coefs_3rd[..., None] * g, axis=1)
    return base + jnp.sign(ru_for_sign) * third


# ---------------------------------------------------------------------------
# large-step tendencies (ref: atm_compute_dyn_tend_work :4481)
# ---------------------------------------------------------------------------

class EulerTends(NamedTuple):
    """Forward-Euler mixing+pgf tendencies computed on rk_step 1 and reused
    (ref: 'mixing terms are integrated using forward-Euler' :4618)."""
    tend_u_euler: Any
    tend_w_euler: Any
    tend_theta_euler: Any
    kdiff: Any
    dpdz: Any
    tend_rho: Any


def compute_moist_coefficients(grid: AtmGrid, scalars, n_moist: int = 3):
    """Moisture coupling coefficients (ref: atm_compute_moist_coefficients,
    mpas_atm_time_integration.F:1862-1933): qtot = sum of moist species at
    cells, cqw = 1/(1+qtot) at cell interfaces, cqu = 1/(1+qtot) at edges.
    Returns (qtot (nC,nz), cqw (nC,nz+1), cqu (nE,nz))."""
    mesh = grid.mesh
    nm = min(n_moist, scalars.shape[-1])
    qtot = jnp.sum(scalars[..., :nm], axis=-1)
    q_int = 0.5 * (qtot[:, 1:] + qtot[:, :-1])
    zpad = jnp.zeros_like(qtot[:, :1])
    cqw = 1.0 / (1.0 + jnp.concatenate([zpad, q_int, zpad], axis=-1))
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    cqu = 1.0 / (1.0 + 0.5 * (qtot[c1] + qtot[c2]))
    return qtot, cqw, cqu


def compute_dyn_tend(grid: AtmGrid, cfg: AtmConfig, rk_step: int, dt,
                     u, w, theta_m, rho_zz, diag: AtmSolveDiag,
                     ru, rw, ru_save, rw_save, theta_m_save, rho_p_save,
                     pressure_p, ur_cell, vr_cell,
                     euler: EulerTends | None, cqu=None, cqw=None,
                     qtot=None, rt_diabatic_tend=None):
    """Returns (tend_u, tend_rho, tend_theta, tend_w_raw, h_divergence,
    euler). tend_w_raw is the physical-w tendency before the omega
    conversion of set_smlstep_pert_variables."""
    mesh = grid.mesh
    vg = grid.vert
    nz = vg.nz
    fzm, fzp, rdzw, rdzu = vg.fzm, vg.fzp, vg.rdzw, vg.rdzu
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    v1, v2 = mesh.verticesOnEdge[:, 0], mesh.verticesOnEdge[:, 1]
    inv_r_earth = 1.0 / mesh.sphere_radius if mesh.on_sphere else 0.0

    # --- h_divergence (ref :4706-4729) -------------------------------------
    (h_div_s,) = _slot_weighted_sums(mesh.edgesOnCell, [ru], [mesh.divW])
    h_divergence = h_div_s * mesh.invAreaCell[:, None]

    # --- rk_step 1: tend_rho, dpdz, kdiff (ref :4737-4766) -----------------
    if rk_step == 1:
        tend_rho = -h_divergence - rdzw * (rw[:, 1:] - rw[:, :-1])
        if qtot is None:
            dpdz = -gravity * rho_p_save      # dry: qtot=0 (ref :4763)
        else:
            dpdz = -gravity * (grid.rho_base * qtot
                               + rho_p_save * (1.0 + qtot))   # (ref :4763)
        if cfg.config_horiz_mixing == "2d_smagorinsky":
            kdiff = smagorinsky_kdiff(grid, cfg, u, diag.v, dt)
            h_mom_visc4 = cfg.config_visc4_2dsmag * cfg.config_len_disp ** 3
            h_theta_visc4 = h_mom_visc4
        else:
            kdiff = jnp.full_like(h_divergence, cfg.config_h_theta_eddy_visc2)
            h_mom_visc4 = cfg.config_h_mom_eddy_visc4
            h_theta_visc4 = cfg.config_h_theta_eddy_visc4
    else:
        tend_rho = euler.tend_rho
        dpdz = euler.dpdz
        kdiff = euler.kdiff
        h_mom_visc4 = cfg.config_visc4_2dsmag * cfg.config_len_disp ** 3 \
            if cfg.config_horiz_mixing == "2d_smagorinsky" \
            else cfg.config_h_mom_eddy_visc4
        h_theta_visc4 = h_mom_visc4 \
            if cfg.config_horiz_mixing == "2d_smagorinsky" \
            else cfg.config_h_theta_eddy_visc4

    # --- packed cell-pair gathers (round 1) ---------------------------------
    # every cell field this rk step reads at cellsOnEdge rides ONE packed
    # gather per edge side (see _pair_gather): the per-row gather cost that
    # dominated the substep amortizes across all of them
    on_curv = mesh.on_sphere and CURVATURE
    w_mid = 0.5 * (w[:, :-1] + w[:, 1:]) if on_curv else None
    pf = [rw, diag.ke, h_divergence]
    if on_curv:
        pf.append(w_mid)
    if rk_step == 1:
        zpad_kd = jnp.zeros_like(kdiff[:, :1])
        kd4 = jnp.concatenate(
            [zpad_kd, kdiff[:, 1:] + kdiff[:, :-1], zpad_kd],
            axis=-1)                                    # (nC, nz+1) sum pair
        pf += [grid.zz, pressure_p, dpdz, diag.divergence, kdiff, w, kd4,
               theta_m]
    elif DBG["thpickup"]:
        pf.append(theta_m_save)
    pairs = iter(_pair_gather(c1, c2, pf))
    rw1, rw2 = next(pairs)
    ke1, ke2 = next(pairs)
    hd1, hd2 = next(pairs)
    if on_curv:
        wm1, wm2 = next(pairs)
    if rk_step == 1:
        zz1, zz2 = next(pairs)
        pp1, pp2 = next(pairs)
        dp1, dp2 = next(pairs)
        dvg1, dvg2 = next(pairs)
        kdf1, kdf2 = next(pairs)
        wg1, wg2 = next(pairs)
        kd41, kd42 = next(pairs)
        thg1, thg2 = next(pairs)
    elif DBG["thpickup"]:
        ths1, ths2 = next(pairs)

    # --- u tendency (ref :4770-4830) ----------------------------------------
    # vertical transport of u: wduz with rw averaged to edges
    rw_edge = 0.5 * (rw1 + rw2)                         # (nE, nz+1)
    wduz = flux3_vertical(u, rw_edge, fzm, fzp, 1.0)
    tend_u = -rdzw * (wduz[:, 1:] - wduz[:, :-1])

    # nonlinear Coriolis q (no h_edge factor, ref :4803-4813) via the
    # cell-assembled TRiSK operator — the 12-wide edgesOnEdge gathers here
    # were the single largest HBM cost of the whole step (two 153 MB
    # gathers per dyn_tend at 120 km)
    from mpas_tpu.ops.stencils import trisk_q_cell_assembled
    q = trisk_q_cell_assembled(mesh, u, diag.pv_edge)

    if not DBG["uvert"]:
        tend_u = tend_u * 0.0
    if not DBG["q"]:
        q = q * 0.0
    dke = (ke2 - ke1) * mesh.invDcEdge[:, None]
    if not DBG["ke"]:
        dke = dke * 0.0
    hdivu = u * 0.5 * (hd1 + hd2)
    if not DBG["hdivu"]:
        hdivu = hdivu * 0.0
    tend_u = tend_u + diag.rho_edge * (q - dke) - hdivu

    if on_curv:  # CURVATURE terms (ref :4815-4823)
        # level-average FIRST, then row-gather: a gather fused with a lane
        # slice (w[c1, :-1]) lowers to a pathological TPU gather (~100x
        # slower than a row gather — measured 1.16 s vs 8 ms at 40k cells)
        w4 = 0.5 * (wm1 + wm2)
        tend_u = tend_u - 2.0 * omega \
            * jnp.cos(mesh.angleEdge)[:, None] \
            * jnp.cos(mesh.latEdge)[:, None] * diag.rho_edge * w4 \
            - u * w4 * diag.rho_edge * inv_r_earth

    # --- u mixing (rk 1 only; ref :4836-4975) -------------------------------
    if rk_step == 1:
        if cqu is None:
            cqu_ = 1.0
        else:
            cqu_ = cqu
        zz_edge = 0.5 * (zz1 + zz2)
        tend_u_euler = -cqu_ * (
            (pp2 - pp1) * mesh.invDcEdge[:, None]
            / zz_edge - 0.5 * grid.zxu * (dp1 + dp2))

        r_dc = mesh.invDcEdge[:, None]
        r_dv = jnp.minimum(mesh.invDvEdge, 4.0 * mesh.invDcEdge)[:, None]
        delsq_u = (dvg2 - dvg1) * r_dc \
            - (diag.vorticity[v2] - diag.vorticity[v1]) * r_dv
        kdiffu = 0.5 * (kdf1 + kdf2)
        tend_u_euler = tend_u_euler + diag.rho_edge * kdiffu * delsq_u \
            * mesh.meshScalingDel2[:, None]

        # --- consolidated mixing stencils: the u/w/theta del2+del4 terms
        # (ref :4884-4947, :5094-5160, :5272-5310) share three packed
        # row-gather rounds — edge fields at edgesOnCell (round A), delsq
        # fields at cellsOnEdge (round B), del4 differences back at
        # edgesOnCell (round C) — instead of one gather per field per term
        rho_edge_int = jnp.concatenate(
            [jnp.zeros_like(diag.rho_edge[:, :1]),
             diag.rho_edge[:, 1:] + diag.rho_edge[:, :-1],
             jnp.zeros_like(diag.rho_edge[:, :1])], axis=-1)  # (nE, nz+1)
        dw = wg2 - wg1
        wflux = 0.5 * (mesh.dvEdge * mesh.invDcEdge)[:, None] \
            * rho_edge_int * dw                         # edge_sign in sum
        kdiff_int_e = 0.25 * (kd41 + kd42)
        wflux_mix = wflux * mesh.meshScalingDel2[:, None] * kdiff_int_e
        dth = (thg2 - thg1) \
            * (mesh.dvEdge * mesh.invDcEdge)[:, None] * diag.rho_edge
        pr_scale = mesh.meshScalingDel2[:, None] / 1.0  # prandtl = 1
        mixth = dth * kdiffu * pr_scale
        inva = mesh.invAreaCell[:, None]
        sgn_w = mesh.edgeSignOnCell
        dsum, wsum, mxsum, thsum, mthsum = _slot_weighted_sums(
            mesh.edgesOnCell, [delsq_u, wflux, wflux_mix, dth, mixth],
            [mesh.divW, sgn_w, sgn_w, sgn_w, sgn_w])
        delsq_w = wsum * inva
        tend_w_euler_mix = mxsum * inva
        delsq_theta = thsum * inva
        tend_theta_euler_mix = mthsum * inva
        pb = []
        if h_mom_visc4 > 0.0:
            delsq_div = dsum * inva
            delsq_vort = jnp.sum(mesh.curlW[..., None]
                                 * delsq_u[mesh.edgesOnVertex], axis=1) \
                * mesh.invAreaTriangle[:, None]
            pb += [delsq_w, delsq_div]
        if h_theta_visc4 > 0.0:
            pb += [delsq_theta]
        if pb:
            it_b = iter(_pair_gather(c1, c2, pb))
            if h_mom_visc4 > 0.0:
                dsw1, dsw2 = next(it_b)
                dd1, dd2 = next(it_b)
            if h_theta_visc4 > 0.0:
                dst1, dst2 = next(it_b)
        pc = []
        if h_mom_visc4 > 0.0:
            dsw = (dsw2 - dsw1) * (mesh.dvEdge * mesh.invDcEdge)[:, None]
            pc.append(dsw)
        if h_theta_visc4 > 0.0:
            dst = (dst2 - dst1) * (mesh.dvEdge * mesh.invDcEdge)[:, None]
            pc.append(dst)
        if pc:
            ms4_eoc = mesh.meshScalingDel4[mesh.edgesOnCell]
            w_d4 = mesh.edgeSignOnCell * ms4_eoc
            sums_c = _slot_weighted_sums(mesh.edgesOnCell, pc,
                                         [w_d4] * len(pc))
            it_c = iter(sums_c)
            d4w_sum = next(it_c) if h_mom_visc4 > 0.0 else None
            d4t_sum = next(it_c) if h_theta_visc4 > 0.0 else None

        if h_mom_visc4 > 0.0:  # u del4 (ref :4884-4947)
            ms4 = mesh.meshScalingDel4[:, None] * h_mom_visc4
            u_diff4 = diag.rho_edge * (
                (dd2 - dd1) * r_dc
                * cfg.config_del4u_div_factor
                - (delsq_vort[v2] - delsq_vort[v1]) * r_dv) * ms4
            tend_u_euler = tend_u_euler - u_diff4

        if cfg.config_v_mom_eddy_visc2 > 0.0:  # vertical u mixing (ref :4950)
            zgrid_e = 0.5 * (grid.zgrid[c1] + grid.zgrid[c2])  # (nE, nz+1)
            zmid = 0.5 * (zgrid_e[:, :-1] + zgrid_e[:, 1:])    # (nE, nz)
            dzp = zmid[:, 2:] - zmid[:, 1:-1]
            dzm = zmid[:, 1:-1] - zmid[:, :-2]
            lap = ((u[:, 2:] - u[:, 1:-1]) / dzp
                   - (u[:, 1:-1] - u[:, :-2]) / dzm) / (0.5 * (dzp + dzm))
            lap = jnp.pad(lap, ((0, 0), (1, 1)))
            tend_u_euler = tend_u_euler + diag.rho_edge \
                * cfg.config_v_mom_eddy_visc2 * lap
    else:
        tend_u_euler = euler.tend_u_euler

    if cfg.config_rayleigh_damp_u:
        nlev = cfg.config_number_rayleigh_damp_u_levels
        coef_inv = 1.0 / (nlev * cfg.config_rayleigh_damp_u_timescale_days
                          * SECONDS_PER_DAY)
        kk = jnp.arange(nz)
        coef = jnp.where(kk >= nz - nlev, (kk - (nz - nlev - 1)) * coef_inv,
                         0.0)
        tend_u = tend_u - diag.rho_edge * u * coef

    if not DBG["ueuler"]:
        tend_u_euler = tend_u_euler * 0.0
    tend_u = tend_u + tend_u_euler

    # --- w tendency (ref :5017-5233) ----------------------------------------
    # horizontal advection of w at interfaces; theta advection batched into
    # the same cell-assembled pass (both gathers share rows — see
    # advection.advective_tendencies_cell)
    ru_int = to_interface(ru, fzm, fzp)                  # (nE, nz+1)
    if grid.d2w_own is not None:
        from mpas_tpu.cores.atmosphere.advection import (
            advective_tendencies_cell)
        tend_w, tend_theta_adv = advective_tendencies_cell(
            grid, [(w, ru_int), (theta_m, ru)])
    else:
        flux_w = advective_flux_edge(grid, w, ru_int)    # (nE, nz+1)
        gw = (ru_int * flux_w)[mesh.edgesOnCell]         # (nC, mE, nz+1)
        tend_w = -jnp.sum(mesh.edgeSignOnCell[..., None] * gw, axis=1)
        flux_t = advective_flux_edge(grid, theta_m, ru)  # (nE, nz)
        gt = (ru * flux_t)[mesh.edgesOnCell]
        tend_theta_adv = -jnp.sum(mesh.edgeSignOnCell[..., None] * gt,
                                  axis=1)
    if not DBG["wadv"]:
        tend_w = tend_w * 0.0

    if mesh.on_sphere and CURVATURE:  # CURVATURE for w (ref :5074-5086)
        rho_int = to_interface(rho_zz, fzm, fzp)
        ur_int = to_interface(ur_cell, fzm, fzp)
        vr_int = to_interface(vr_cell, fzm, fzp)
        curv_w = rho_int * (ur_int ** 2 + vr_int ** 2) * inv_r_earth \
            + 2.0 * omega * jnp.cos(mesh.latCell)[:, None] * ur_int * rho_int
        # ADJUDICATED DEVIATION (config_w_curvature switches it): the
        # reference accumulates these terms into tend_w BEFORE the
        # *invAreaCell scaling (ref :5076-5086; scaling at :5185 with the
        # comment "we are also dividing through by the cell area"), which
        # divides the physical curvature/Coriolis terms by cell area
        # (~1e9 m^2 at 120 km) and reduces them to ~1e-12 of their size —
        # the w-side of the Coriolis-curvature pair is effectively absent
        # from the reference solution, while the u-side (ref :4830-4837)
        # is applied at full size.  "physical" (default) applies the full
        # pair after the scaling — energetically consistent (the
        # antisymmetric 2*Omega*cos(phi) pair conserves kinetic energy) and
        # the correct Eotvos/curvature physics; "reference" reproduces the
        # reference ordering for trajectory parity. Side-by-side evidence:
        # tests/test_atm_core.py::TestWCurvatureAdjudication.
    else:
        curv_w = None

    # w mixing (rk 1; ref :5094-5160) — stencils precomputed in the
    # consolidated packed-gather block above
    if rk_step == 1:
        tend_w_euler = tend_w_euler_mix
        if h_mom_visc4 > 0.0:
            tend_w_euler = tend_w_euler - h_mom_visc4 \
                * d4w_sum * mesh.invAreaCell[:, None]
        tend_w_euler = tend_w_euler.at[:, 0].set(0.0).at[:, nz].set(0.0)
    else:
        tend_w_euler = euler.tend_w_euler

    # vertical advection of w (ref :5163-5177)
    rw_lev = 0.5 * (rw[:, 1:] + rw[:, :-1])             # (nC, nz) level flux
    # wdwz lives at levels; stencil on interface field w
    second_b = 0.25 * (rw[:, 1:2] + rw[:, 0:1]) * (w[:, 1:2] + w[:, 0:1])
    second_t = 0.25 * (rw[:, nz - 1:nz] + rw[:, nz - 2:nz - 1]) \
        * (w[:, nz - 1:nz] + w[:, nz - 2:nz - 1])
    qm2 = w[:, 0:nz - 3]
    qm1 = w[:, 1:nz - 2]
    qi = w[:, 2:nz - 1]
    qp1 = w[:, 3:nz]
    # wdwz[j] (j=2..nz-2) needs mass 0.5*(rw[j]+rw[j-1]) = rw_lev[j-1]
    m = rw_lev[:, 1:nz - 2]
    f4 = m * (7.0 * (qi + qm1) - (qp1 + qm2)) / 12.0
    f3 = f4 + 1.0 * jnp.abs(m) * ((qp1 - qm2) - 3.0 * (qi - qm1)) / 12.0
    zerol = jnp.zeros_like(w[:, :1])
    # wdwz entries j=0..nz: [0, 2nd@j=1, flux3 j=2..nz-2, 2nd@j=nz-1, 0]
    wdwz = jnp.concatenate([zerol, second_b, f3, second_t, zerol], axis=-1)
    # tend_w at interface i=1..nz-1 -= rdzu[i]*(wdwz[i+1]-wdwz[i])
    if curv_w is not None and cfg.config_w_curvature == "reference":
        tend_w = tend_w + curv_w        # annihilated by the scaling below
    tend_w = tend_w * mesh.invAreaCell[:, None]
    if curv_w is not None and cfg.config_w_curvature != "reference":
        tend_w = tend_w + curv_w
    vert = rdzu[1:nz] * (wdwz[:, 2:nz + 1] - wdwz[:, 1:nz])
    if not DBG["wvert"]:
        vert = vert * 0.0
    tend_w = _add_interior(tend_w, -vert)
    tend_w = tend_w.at[:, 0].set(0.0).at[:, nz].set(0.0)

    if rk_step == 1:
        if cqw is None:
            cqw_ = 1.0
        else:
            cqw_ = cqw
        dpdz_int = to_interface(dpdz, fzm, fzp)
        pgrad = jnp.concatenate(
            [jnp.zeros_like(pressure_p[:, :1]),
             (pressure_p[:, 1:] - pressure_p[:, :-1]) * rdzu[1:nz],
             jnp.zeros_like(pressure_p[:, :1])], axis=-1)
        tend_w_euler = tend_w_euler - cqw_ * (pgrad - dpdz_int)
        tend_w_euler = tend_w_euler.at[:, 0].set(0.0).at[:, nz].set(0.0)
        if cfg.config_v_mom_eddy_visc2 > 0.0:  # (ref :5212-5222)
            lap = ((w[:, 2:] - w[:, 1:-1]) * rdzw[1:]
                   - (w[:, 1:-1] - w[:, :-2]) * rdzw[:-1])
            lap = jnp.pad(lap, ((0, 0), (1, 1))) * rdzu
            rho_int2 = to_interface(rho_zz, fzm, fzp)
            rho_pair = jnp.concatenate(
                [jnp.zeros_like(rho_zz[:, :1]),
                 0.5 * (rho_zz[:, 1:] + rho_zz[:, :-1]),
                 jnp.zeros_like(rho_zz[:, :1])], axis=-1)
            tend_w_euler = tend_w_euler + cfg.config_v_mom_eddy_visc2 \
                * rho_pair * lap

    if not DBG["weuler"]:
        tend_w_euler = tend_w_euler * 0.0
    tend_w = tend_w + tend_w_euler

    # --- theta tendency (ref :5239-5410; advective part computed above) ----
    tend_theta = tend_theta_adv
    if not DBG["thadv"]:
        tend_theta = tend_theta * 0.0

    if rk_step > 1 and DBG["thpickup"]:  # perturbation-flux pickup (ref :5252-5266)
        th_save_edge = 0.5 * (ths1 + ths2)
        pf_e = (mesh.dvEdge[:, None] * (ru_save - ru) * th_save_edge)
        (pf_sum,) = _slot_weighted_sums(mesh.edgesOnCell, [pf_e],
                                        [mesh.edgeSignOnCell])
        tend_theta = tend_theta - pf_sum

    if rk_step == 1:  # theta mixing (ref :5272-5310) — stencils from the
        # consolidated packed-gather block above
        tend_theta_euler = tend_theta_euler_mix
        if h_theta_visc4 > 0.0:
            tend_theta_euler = tend_theta_euler - h_theta_visc4 \
                * d4t_sum * mesh.invAreaCell[:, None]
        if cfg.config_v_theta_eddy_visc2 > 0.0:  # (ref :5342-5381)
            zmid = 0.5 * (grid.zgrid[:, :-1] + grid.zgrid[:, 1:])
            dzp = zmid[:, 2:] - zmid[:, 1:-1]
            dzm = zmid[:, 1:-1] - zmid[:, :-2]
            lap = ((theta_m[:, 2:] - theta_m[:, 1:-1]) / dzp
                   - (theta_m[:, 1:-1] - theta_m[:, :-2]) / dzm) \
                / (0.5 * (dzp + dzm))
            lap = jnp.pad(lap, ((0, 0), (1, 1)))
            tend_theta_euler = tend_theta_euler \
                + cfg.config_v_theta_eddy_visc2 * rho_zz * lap
    else:
        tend_theta_euler = euler.tend_theta_euler

    # vertical advection of theta with rtheta_pp redefinition (ref :5316-5336)
    th_save_int = to_interface(theta_m_save, fzm, fzp)
    wdtz = flux3_vertical(theta_m, rw, fzm, fzp, cfg.config_coef_3rd_order)
    corr = (rw_save - rw) * th_save_int
    # boundary overrides: i=1 uses 2nd-order rw (already), i=nz-1 uses
    # rw_save only (ref: k=nVertLevels wdtz = rw_save*(...))
    th_int = to_interface(theta_m, fzm, fzp)
    wdtz = wdtz + corr
    wdtz = wdtz.at[:, nz - 1].set(rw_save[:, nz - 1] * th_int[:, nz - 1])

    if not DBG["thvert"]:
        wdtz = wdtz * 0.0
    tend_theta = tend_theta * mesh.invAreaCell[:, None] \
        - rdzw * (wdtz[:, 1:] - wdtz[:, :-1])
    tend_theta = tend_theta + tend_theta_euler
    if rt_diabatic_tend is not None:
        # physics heating applied during the RK stages, removed again at
        # recover_large_step_variables rk_step 3 (ref :5352, :3025)
        tend_theta = tend_theta + rho_zz * rt_diabatic_tend

    new_euler = EulerTends(tend_u_euler=tend_u_euler,
                           tend_w_euler=tend_w_euler,
                           tend_theta_euler=tend_theta_euler,
                           kdiff=kdiff, dpdz=dpdz, tend_rho=tend_rho)
    return tend_u, tend_rho, tend_theta, tend_w, h_divergence, new_euler


# ---------------------------------------------------------------------------
# packed gathers
# ---------------------------------------------------------------------------

def _pair_gather(c1, c2, fields):
    """Gather several (nRows, K_i) fields at both cells of every edge with
    ONE packed gather per side instead of one per field.

    TPU gathers pay per ROW, not per byte (measured 445 us for 123k rows
    whether the row is 26 or 104 lanes, PERF.md), and a (N, 26) f32 row
    occupies a full 128-lane tile anyway — so concatenating fields into the
    lane dimension before the gather divides the dominant per-row cost by
    the number of fields packed (measured 2.3x for 4 fields). The
    concatenate/slice pair is value-exact: each field's gathered rows are
    bitwise what a standalone gather would produce."""
    if len(fields) == 1:
        f = fields[0]
        return [(f[c1], f[c2])]
    dts = {f.dtype for f in fields}
    assert len(dts) == 1, (
        f"_pair_gather requires a uniform dtype (got {dts}); a mixed pack "
        "would silently promote every gathered slice")
    ks = [f.shape[-1] for f in fields]
    cat = jnp.concatenate(fields, axis=-1)
    g1, g2 = cat[c1], cat[c2]
    outs, o = [], 0
    for k in ks:
        outs.append((g1[:, o:o + k], g2[:, o:o + k]))
        o += k
    return outs


def _slot_weighted_sums(rows, fields, weights):
    """sum_s weights_i[:, s, None] * fields_i[rows[:, s]] for each i,
    slot-major: per edge-slot rank-2 gathers of the PACKED fields via the
    transposed row table, so no (nRows, width, K) intermediate is ever
    materialized. Measured on v5e (PERF.md round 5): each materialized
    (nC, mE, 26) gather costs ~0.5 ms of 6->8 x 26->128 tile padding;
    the per-slot rank-2 gathers fuse into the consuming accumulation
    (same-chip A/B on the transport path: +8.8%% whole-step).

    rows (nR, mS) index table; fields list of (nSrc, K_i); weights list
    of (nR, mS), one per field (may repeat the same array).
    Returns the list of (nR, K_i) weighted sums.
    """
    ks = [f.shape[-1] for f in fields]
    cat = jnp.concatenate(fields, axis=-1) if len(fields) > 1 else fields[0]
    rT = rows.T
    accs = [0.0] * len(fields)
    for s in range(rT.shape[0]):
        g = cat[rT[s]]
        o = 0
        for i, k in enumerate(ks):
            accs[i] = accs[i] + weights[i][:, s][:, None] * g[:, o:o + k]
            o += k
    return accs


def _rows_gather(rows, fields):
    """Same packing for multi-width row gathers (edgesOnCell /
    edgesOnVertex / verticesOnCell): one (nRows, width, sum K_i) gather,
    sliced back per field."""
    if len(fields) == 1:
        return [fields[0][rows]]
    dts = {f.dtype for f in fields}
    assert len(dts) == 1, (
        f"_rows_gather requires a uniform dtype (got {dts})")
    ks = [f.shape[-1] for f in fields]
    cat = jnp.concatenate(fields, axis=-1)
    g = cat[rows]
    outs, o = [], 0
    for k in ks:
        outs.append(g[..., o:o + k])
        o += k
    return outs


# ---------------------------------------------------------------------------
# acoustic-step machinery
# ---------------------------------------------------------------------------

class VertImpCoefs(NamedTuple):
    cofrz: Any        # (nz,)
    cofwr: Any        # (nC, nz+1) interfaces (0 ends)
    cofwz: Any        # (nC, nz+1)
    coftz: Any        # (nC, nz+1)
    cofwt: Any        # (nC, nz)
    a_tri: Any        # (nC, nz+1)
    alpha_tri: Any    # (nC, nz+1)
    gamma_tri: Any    # (nC, nz+1)


def vert_imp_coefs(grid: AtmGrid, cfg: AtmConfig, dts, theta_m, exner,
                   rtheta_p, qtot=0.0, cqw=1.0) -> VertImpCoefs:
    """ref: atm_compute_vert_imp_coefs_work (:2012)."""
    vg = grid.vert
    nz = vg.nz
    fzm, fzp, rdzw, rdzu = vg.fzm, vg.fzp, vg.rdzw, vg.rdzu
    zz = grid.zz
    dtseps = 0.5 * dts * (1.0 + cfg.config_epssm)

    cofrz = dtseps * rdzw
    zz_int = fzm[1:nz] * zz[:, 1:] + fzp[1:nz] * zz[:, :-1]
    p_int = fzm[1:nz] * exner[:, 1:] + fzp[1:nz] * exner[:, :-1]
    t_int = fzm[1:nz] * theta_m[:, 1:] + fzp[1:nz] * theta_m[:, :-1]
    # cqw is defined at interfaces (moist); dry path passes the scalar 1.0
    cqw_int = cqw[:, 1:nz] if getattr(cqw, "ndim", 0) > 1 else cqw

    zpad = jnp.zeros_like(zz[:, :1])
    cofwr = jnp.concatenate([zpad, 0.5 * dtseps * gravity * zz_int, zpad], -1)
    cofwz = jnp.concatenate(
        [zpad, dtseps * C2 * zz_int * rdzu[1:nz] * cqw_int * p_int, zpad], -1)
    coftz = jnp.concatenate([zpad, dtseps * t_int, zpad], -1)
    cofwt = 0.5 * dtseps * RCV * zz * gravity * grid.rho_base \
        / (1.0 + qtot) * exner \
        / ((grid.rtheta_base + rtheta_p) * grid.exner_base)

    # tridiagonal coefficients at interfaces i=1..nz-1, fully vectorized
    # over the level axis (ref :2092-2121; i-1/i/i+1 stencils become slices)
    a_mid = -cofwz[:, 1:nz] * coftz[:, 0:nz - 1] * rdzw[:nz - 1] \
        * zz[:, 0:nz - 1] \
        + cofwr[:, 1:nz] * cofrz[:nz - 1] \
        - cofwt[:, 0:nz - 1] * coftz[:, 0:nz - 1] * rdzw[:nz - 1]
    b_mid = 1.0 + cofwz[:, 1:nz] * (coftz[:, 1:nz] * rdzw[1:nz] * zz[:, 1:nz]
                                    + coftz[:, 1:nz] * rdzw[:nz - 1]
                                    * zz[:, 0:nz - 1]) \
        - coftz[:, 1:nz] * (cofwt[:, 1:nz] * rdzw[1:nz]
                            - cofwt[:, 0:nz - 1] * rdzw[:nz - 1]) \
        + cofwr[:, 1:nz] * (cofrz[1:nz] - cofrz[:nz - 1])
    c_mid = -cofwz[:, 1:nz] * coftz[:, 2:nz + 1] * rdzw[1:nz] * zz[:, 1:nz] \
        - cofwr[:, 1:nz] * cofrz[1:nz] \
        + cofwt[:, 1:nz] * coftz[:, 2:nz + 1] * rdzw[1:nz]
    a_tri = jnp.concatenate([jnp.zeros_like(zpad), a_mid,
                             jnp.zeros_like(zpad)], -1)

    # LU prefactor via O(log nz) associative scan (mpas_tpu/ops/vscan.py)
    # instead of the reference's sequential i-loop (ref :2108-2121)
    alpha_mid, gamma_mid = thomas_prefactor(a_mid, b_mid, c_mid)
    alpha_tri = jnp.concatenate([jnp.zeros_like(zpad), alpha_mid,
                                 jnp.zeros_like(zpad)], -1)
    gamma_tri = jnp.concatenate([jnp.zeros_like(zpad), gamma_mid,
                                 jnp.zeros_like(zpad)], -1)

    return VertImpCoefs(cofrz=cofrz, cofwr=cofwr, cofwz=cofwz, coftz=coftz,
                        cofwt=cofwt, a_tri=a_tri, alpha_tri=alpha_tri,
                        gamma_tri=gamma_tri)


def set_smlstep_pert_variables(grid: AtmGrid, tend_u, tend_w):
    """Convert the w tendency to an omega tendency (ref :2224-2309)."""
    mesh = grid.mesh
    vg = grid.vert
    nz = vg.nz
    fzm, fzp = vg.fzm, vg.fzp
    ut_int = to_interface(tend_u, fzm, fzp)              # (nE, nz+1)
    # sign() in the reference uses the LEVEL-k value of tend_u at interface k
    # (ref :2294 sign(1.0, u_tend(k,iEdge)) with k the interface loop index):
    # 0-based interface i <- level i; top interface pads with 0.
    sign_lev = jnp.sign(tend_u)                          # (nE, nz)
    sign_int = jnp.concatenate([sign_lev, jnp.zeros_like(tend_u[:, :1])],
                               axis=-1)
    # slot-major omega-metric contraction: one packed (nC, 2K) gather per
    # edge slot + rank-2 FMAs against the slot-major zb/zb3 tensors
    # (round-5 layout finding: rank-3 (nC, mE, K) intermediates pay
    # (8/6)x(128/K)x padding; see advection.py)
    K = nz + 1
    cat = jnp.concatenate([ut_int, sign_int], axis=-1)   # (nE, 2K)
    eocT = mesh.edgesOnCell.T
    contrib = 0.0
    for s in range(mesh.edgesOnCell.shape[1]):
        g = cat[eocT[s]]                                 # (nC, 2K)
        zbz3 = grid.zb_cell[s] + g[:, K:] * grid.zb3_cell[s]
        contrib = contrib + mesh.edgeSignOnCell[:, s][:, None] \
            * zbz3 * g[:, :K]
    w_tend = tend_w - contrib
    zz_int = to_interface(grid.zz, fzm, fzp)
    w_tend = w_tend * zz_int
    return w_tend.at[:, 0].set(0.0).at[:, nz].set(0.0)


class AcousticVars(NamedTuple):
    ru_p: Any         # (nE, nz)
    rho_pp: Any       # (nC, nz)
    rtheta_pp: Any    # (nC, nz)
    rtheta_pp_old: Any
    rw_p: Any         # (nC, nz+1)
    ruAvg: Any
    wwAvg: Any


class AcousticHoist(NamedTuple):
    """Acoustic-loop-invariant edge quantities, hoisted out of the scanned
    substep body: zz is run-static and exner/theta_m are fixed across a
    substep's acoustic iterations (exner is only refreshed by the rk_step-3
    recover), but XLA cannot hoist a gather out of a `lax.scan` body — so
    without this the reference's :2480-2504 pressure-gradient loop pays 6
    cell-pair gathers per acoustic iteration for values that never change."""
    zz_pair: Any      # (nE, nz)  0.5*(zz[c1]+zz[c2])
    pg_coef: Any      # (nE, nz)  cqu*0.5*C2*(exner[c1]+exner[c2])
    th_edge: Any      # (nE, nz)  0.5*(theta_m[c1]+theta_m[c2])
    th_sum: Any       # (nE, nz)  theta_m[c1]+theta_m[c2]


def acoustic_hoist(grid: AtmGrid, theta_m, exner, cqu=1.0) -> AcousticHoist:
    """One packed pair gather for every substep-invariant edge quantity the
    acoustic loop consumes (ref :2480-2504, :2536-2549, :2726-2805)."""
    mesh = grid.mesh
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    ((zz1, zz2), (ex1, ex2), (t1, t2)) = _pair_gather(
        c1, c2, [grid.zz, exner, theta_m])
    th_sum = t1 + t2
    return AcousticHoist(zz_pair=0.5 * (zz1 + zz2),
                         pg_coef=cqu * 0.5 * C2 * (ex1 + ex2),
                         th_edge=0.5 * th_sum, th_sum=th_sum)


def acoustic_step(grid: AtmGrid, cfg: AtmConfig, coefs: VertImpCoefs,
                  av: AcousticVars, dts,
                  theta_m, exner, w, rho_zz, rw, rw_save, ru, ru_save,
                  tend_ru, tend_rho, tend_rt, tend_rw, cqu=1.0,
                  xch_rtheta=None, hoist: AcousticHoist | None = None,
                  damp: bool = False):
    """One forward-backward acoustic substep (ref :2447-2723).

    The reference special-cases small_step==1 (perturbation fields zeroed,
    averages reset, no pressure gradient; ref :2506-2522).  With `av`
    initialized to zeros at each RK stage the general branch reproduces
    that first step exactly (the pgrad terms vanish on zero perturbations),
    so one uniform body runs under `lax.scan` over the substeps.

    hoist: substep-invariant edge quantities (see AcousticHoist); computed
    here when not supplied (standalone callers), precomputed once per
    substep by the srk3 driver.

    damp: fold the *previous* iteration's 3D divergence damping
    (ref :2726-2805) into this step's entry. Damping only modifies ru_p,
    and on a zero-initialized `av` the dpdt term vanishes, so running it
    first on iteration k+1 is value-identical to running it last on
    iteration k — and it lets the damping's rtheta_pp-difference gathers
    ride in the SAME packed gather as the pressure-gradient's; the final
    iteration's damping is applied by the driver after the scan. When
    damp=True the rho_pp/rtheta_pp/dpdt pair reads collapse from 6 row
    gathers per iteration to 2.

    xch_rtheta: optional halo-refresh callable fired on rtheta_pp the
    moment it is produced — the TPU analogue of the reference's
    begin/local/end overlapped exchange (ref: mpas_dmpar.F:6993-7142):
    the rho_pp recovery and wwAvg accumulation that follow are independent
    of rtheta_pp, so XLA's async-collective scheduler can keep the
    ppermute in flight behind them."""
    mesh = grid.mesh
    vg = grid.vert
    nz = vg.nz
    fzm, fzp, rdzw = vg.fzm, vg.fzp, vg.rdzw
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    epssm = cfg.config_epssm
    resm = (1.0 - epssm) / (1.0 + epssm)

    if hoist is None:
        hoist = acoustic_hoist(grid, theta_m, exner, cqu)

    # one packed pair gather for every per-iteration cell field the
    # momentum update (and folded damping) reads (ref :2480-2504)
    fields = [av.rho_pp, av.rtheta_pp]
    if damp:
        fields.append(av.rtheta_pp - av.rtheta_pp_old)   # dpdt (ref :2791)
    pairs = _pair_gather(c1, c2, fields)
    (rp1, rp2), (rt1, rt2) = pairs[0], pairs[1]

    ru_p_in = av.ru_p
    if damp:
        dp1, dp2 = pairs[2]
        coefd = 2.0 * cfg.config_smdiv * cfg.config_len_disp / dts
        # div1 = -dpdt[c1], div2 = -dpdt[c2]; ru_p += coef*(div2-div1)/th
        ru_p_in = ru_p_in + coefd * (dp1 - dp2) / hoist.th_sum

    # horizontal momentum update with pressure gradient (ref :2480-2504)
    pgrad = ((rt2 - rt1) * mesh.invDcEdge[:, None]) / hoist.zz_pair
    pgrad = hoist.pg_coef * pgrad
    pgrad = pgrad + 0.5 * grid.zxu * gravity * (rp1 + rp2)
    if not DBG["apgrad"]:
        pgrad = pgrad * 0.0
    ru_p = ru_p_in + dts * (tend_ru - pgrad)
    ruAvg = av.ruAvg + ru_p
    rtheta_pp_old = av.rtheta_pp
    rho_pp0 = av.rho_pp
    rtheta_pp0 = av.rtheta_pp
    rw_p0 = av.rw_p
    wwAvg0 = av.wwAvg

    # cell divergence contributions (ref :2536-2549)
    th_edge = hoist.th_edge
    flux_r = (mesh.dvEdge[:, None] * ru_p)
    flux_t = flux_r * th_edge
    if not DBG["tsflux"]:
        flux_t = flux_t * 0.0
    # NOTE(perf, measured): two SEPARATE clean (nE, nz) gathers. The
    # lane-concat pack (nE, 2nz) costs cross-lane shuffles (acoustic 4x
    # slower) and the (nE, nz, 2) stack-gather drags a 2-wide minor dim
    # through the gather and the reduction (2 ms per multiply_reduce in
    # the trace); per-row gather cost is flat up to 128 lanes, so two
    # single-tile-row gathers are the cheapest shape
    coefc = (dts * mesh.invAreaCell)[:, None]
    rsum, tsum = _slot_weighted_sums(mesh.edgesOnCell, [flux_r, flux_t],
                                     [mesh.edgeSignOnCell] * 2)
    rs_flux = -rsum * coefc
    ts_flux = -tsum * coefc

    from mpas_tpu.kernels import acoustic_kernel_enabled
    if acoustic_kernel_enabled(nz):
        # fused Pallas column kernel (mpas_tpu/kernels/acoustic.py): one
        # VMEM pass per cell block for the rs/ts updates, implicit-w rhs,
        # Thomas solve, Rayleigh damping and back-substitution
        from mpas_tpu.kernels.acoustic import acoustic_cell_update
        zz_int = to_interface(grid.zz, fzm, fzp)
        rho_int = to_interface(rho_zz, fzm, fzp)
        dss_int = jnp.pad(grid.dss, ((0, 0), (0, 1)))
        rw_p, rho_pp, rtheta_pp, wwAvg = acoustic_cell_update(
            nz, epssm, dts,
            rho_pp0 + dts * tend_rho + rs_flux,
            rtheta_pp0 + dts * tend_rt + ts_flux,
            rw_p0, wwAvg0, tend_rw, rho_pp0, rtheta_pp0,
            coefs.cofwz, coefs.cofwr, coefs.cofwt, coefs.coftz,
            coefs.cofrz, rdzw, coefs.a_tri, coefs.alpha_tri,
            coefs.gamma_tri, grid.zz, dss_int, rw_save - rw,
            zz_int * rho_int * w)
        if xch_rtheta is not None:
            rtheta_pp = xch_rtheta(rtheta_pp)
        return AcousticVars(ru_p=ru_p, rho_pp=rho_pp,
                            rtheta_pp=rtheta_pp,
                            rtheta_pp_old=rtheta_pp_old, rw_p=rw_p,
                            ruAvg=ruAvg, wwAvg=wwAvg)

    rs = rho_pp0 + dts * tend_rho + rs_flux \
        - coefs.cofrz * resm * (rw_p0[:, 1:] - rw_p0[:, :-1])
    ts = rtheta_pp0 + dts * tend_rt + ts_flux \
        - resm * rdzw * (coefs.coftz[:, 1:] * rw_p0[:, 1:]
                         - coefs.coftz[:, :-1] * rw_p0[:, :-1])

    wwAvg = _add_interior(wwAvg0, 0.5 * (1.0 - epssm) * rw_p0[:, 1:nz])

    # rw_p rhs at interfaces i=1..nz-1 (ref :2577-2592)
    zz_ts = grid.zz * ts
    zz_rt = grid.zz * rtheta_pp0
    rhs_mid = rw_p0[:, 1:nz] + dts * tend_rw[:, 1:nz] \
        - coefs.cofwz[:, 1:nz] * ((zz_ts[:, 1:] - zz_ts[:, :-1])
                                  + resm * (zz_rt[:, 1:] - zz_rt[:, :-1])) \
        - coefs.cofwr[:, 1:nz] * ((rs[:, 1:] + rs[:, :-1])
                                  + resm * (rho_pp0[:, 1:] + rho_pp0[:, :-1])) \
        + coefs.cofwt[:, 1:] * (ts[:, 1:] + resm * rtheta_pp0[:, 1:]) \
        + coefs.cofwt[:, :-1] * (ts[:, :-1] + resm * rtheta_pp0[:, :-1])
    zpadc = jnp.zeros_like(rs[:, :1])
    rw_p = jnp.concatenate([zpadc, rhs_mid, zpadc], axis=-1)

    # tridiagonal sweeps as parallel associative scans (ref :2596-2604;
    # boundary rows i=0 and i=nz are identity with zero RHS, so the solve
    # runs on the interior rows only)
    sol_mid = thomas_solve(rhs_mid, coefs.a_tri[:, 1:nz],
                           coefs.alpha_tri[:, 1:nz],
                           coefs.gamma_tri[:, 1:nz])
    rw_p = jnp.concatenate([zpadc, sol_mid, zpadc], axis=-1)

    # implicit Rayleigh damping on w (ref :2608-2616)
    zz_int = to_interface(grid.zz, fzm, fzp)
    rho_int = to_interface(rho_zz, fzm, fzp)
    # reference indexes the level array dss with the interface loop index
    # (ref :2611 dss(k,iCell) with k=2..nVertLevels): interface i <- level i
    dss_int = jnp.pad(grid.dss, ((0, 0), (0, 1)))
    dw_term = rw_save - rw
    denom = 1.0 + dts * dss_int
    rw_p_mid = ((rw_p[:, 1:nz] + dw_term[:, 1:nz]
                 - dts * dss_int[:, 1:nz] * zz_int[:, 1:nz]
                 * rho_int[:, 1:nz] * w[:, 1:nz]) / denom[:, 1:nz]) \
        - dw_term[:, 1:nz]
    rw_p = jnp.concatenate([zpadc, rw_p_mid, zpadc], axis=-1)

    rtheta_pp = ts - rdzw * (coefs.coftz[:, 1:] * rw_p[:, 1:]
                             - coefs.coftz[:, :-1] * rw_p[:, :-1])
    if xch_rtheta is not None:
        # overlap: permute in flight while rho_pp/wwAvg compute below
        rtheta_pp = xch_rtheta(rtheta_pp)

    wwAvg = _add_interior(wwAvg, 0.5 * (1.0 + epssm) * rw_p[:, 1:nz])
    rho_pp = rs - coefs.cofrz * (rw_p[:, 1:] - rw_p[:, :-1])

    return AcousticVars(ru_p=ru_p, rho_pp=rho_pp, rtheta_pp=rtheta_pp,
                        rtheta_pp_old=rtheta_pp_old, rw_p=rw_p,
                        ruAvg=ruAvg, wwAvg=wwAvg)


def divergence_damping_3d(grid: AtmGrid, cfg: AtmConfig, av: AcousticVars,
                          dts, theta_m, th_sum=None):
    """ref: atm_divergence_damping_3d (:2726). th_sum: optional hoisted
    theta_m[c1]+theta_m[c2] (AcousticHoist) to skip the pair gathers."""
    mesh = grid.mesh
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    coef = 2.0 * cfg.config_smdiv * cfg.config_len_disp / dts
    dpdt = av.rtheta_pp - av.rtheta_pp_old
    if th_sum is None:
        th_sum = theta_m[c1] + theta_m[c2]
    div1 = -dpdt[c1]
    div2 = -dpdt[c2]
    ru_p = av.ru_p + coef * (div2 - div1) / th_sum
    return av._replace(ru_p=ru_p)


def recover_large_step_variables(grid: AtmGrid, cfg: AtmConfig,
                                 av: AcousticVars, rk_step: int, dt, ns,
                                 rho_p_save, rtheta_p_save, ru_save, rw_save,
                                 theta_m, rt_diabatic_tend=0.0):
    """ref: atm_recover_large_step_variables_work (:2909).
    Returns (u, w, theta_m, rho_zz, new ru/rw/rho_p/rtheta_p/exner/
    pressure_p, ruAvg, wwAvg)."""
    mesh = grid.mesh
    vg = grid.vert
    nz = vg.nz
    fzm, fzp = vg.fzm, vg.fzp
    cf1, cf2, cf3 = vg.cf1, vg.cf2, vg.cf3
    c1, c2 = mesh.cellsOnEdge[:, 0], mesh.cellsOnEdge[:, 1]
    inv_ns = 1.0 / float(ns)

    rho_p = rho_p_save + av.rho_pp
    rho_zz = rho_p + grid.rho_base

    wwAvg = rw_save + av.wwAvg * inv_ns
    rw = rw_save + av.rw_p
    zz_int = to_interface(grid.zz, fzm, fzp)
    rho_int = to_interface(rho_zz, fzm, fzp)
    # partial w from omega (ref :2946-2955); completed after the metric part
    w_part = jnp.zeros_like(rw)
    w_part = w_part.at[:, 1:nz].set(rw[:, 1:nz] / zz_int[:, 1:nz])

    if rk_step == 3:
        rtheta_p = rtheta_p_save + av.rtheta_pp \
            - dt * rho_zz * rt_diabatic_tend
        theta_m_new = (rtheta_p + grid.rtheta_base) / rho_zz
        exner = (grid.zz * (rgas / p0)
                 * (rtheta_p + grid.rtheta_base)) ** RCV
        pressure_p = grid.zz * rgas * (exner * rtheta_p + grid.rtheta_base
                                       * (exner - grid.exner_base))
    else:
        rtheta_p = rtheta_p_save + av.rtheta_pp
        theta_m_new = (rtheta_p + grid.rtheta_base) / rho_zz
        exner = None
        pressure_p = None

    ruAvg = ru_save + av.ruAvg * inv_ns
    ru = ru_save + av.ru_p
    u = 2.0 * ru / (rho_zz[c1] + rho_zz[c2])

    # metric part of w (ref :2978-3005), slot-major (see
    # set_smlstep_pert_variables)
    ru_int = to_interface(ru, fzm, fzp)
    # surface flux uses cf1/2/3 extrapolation
    flux_sfc = cf1 * ru[:, 0] + cf2 * ru[:, 1] + cf3 * ru[:, 2]  # (nE,)
    cat = jnp.concatenate([ru_int, flux_sfc[:, None]], axis=-1)
    eocT = mesh.edgesOnCell.T
    w_metric = 0.0
    w_sfc = 0.0
    for s in range(mesh.edgesOnCell.shape[1]):
        g = cat[eocT[s]]                                 # (nC, nz+2)
        gi = g[:, :nz + 1]
        gs = g[:, nz + 1]
        zbz3 = grid.zb_cell[s] + jnp.sign(gi) * grid.zb3_cell[s]
        zbz3s = grid.zb_cell[s][:, 0] + jnp.sign(gs) * grid.zb3_cell[s][:, 0]
        sgn_s = mesh.edgeSignOnCell[:, s]
        w_metric = w_metric + sgn_s[:, None] * zbz3 * gi
        w_sfc = w_sfc + sgn_s * zbz3s * gs

    rho_sfc = cf1 * rho_zz[:, 0] + cf2 * rho_zz[:, 1] + cf3 * rho_zz[:, 2]
    w = w_part + w_metric
    w = w.at[:, 0].set(w_sfc / rho_sfc)
    w = w.at[:, 1:nz].set(w[:, 1:nz] / rho_int[:, 1:nz])
    w = w.at[:, nz].set(0.0)

    return (u, w, theta_m_new, rho_zz, ru, rw, rho_p, rtheta_p, exner,
            pressure_p, ruAvg, wwAvg)
