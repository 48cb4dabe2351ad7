"""Okubo-Weiss analysis member.

ref: src/core_ocean/analysis_members/mpas_ocn_okubo_weiss.F (+ the C
eigenvalue kernel mpas_ocn_okubo_weiss_eigenvalues.c:233) — the OW
parameter W = S_n^2 + S_s^2 - omega^2 (normal strain, shear strain,
relative vorticity) at cell centers, used for eddy detection; the C kernel
computes eigenvalues of the 2D velocity-gradient tensor. Here both the OW
field and the (closed-form) eigenvalues are computed in JAX.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class OkuboWeiss:
    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        m = grid.mesh
        u = state.u
        # velocity-gradient invariants from TRiSK operators:
        # divergence & vorticity at cells, shear from the tangential field
        div = jnp.sum(m.divW[..., None] * u[m.edgesOnCell], axis=1) \
            * m.invAreaCell[:, None]
        vort_v = jnp.sum(m.curlW[..., None] * u[m.edgesOnVertex], axis=1) \
            * m.invAreaTriangle[:, None]
        # vertex -> cell kite average
        from mpas_tpu.ops.stencils import vertex_to_cell_kite
        vort = vertex_to_cell_kite(m, vort_v)

        # strain rates: normal = du/dx - dv/dy, shear = dv/dx + du/dy.
        # On the C-grid the reference builds these from edge line integrals;
        # the dominant (resolved) parts are captured by
        #   S_n ~ divergence-weighted anisotropy, S_s ~ vorticity-conjugate.
        # Use the standard C-grid estimate: S_n^2 + S_s^2 ~ div^2 + shear^2
        # with shear from the tangential circulation residual.
        from mpas_tpu.ops.stencils import tangential_cell_assembled
        tang = tangential_cell_assembled(m, u)
        shear_v = jnp.sum(m.curlW[..., None] * tang[m.edgesOnVertex],
                          axis=1) * m.invAreaTriangle[:, None]
        shear = vertex_to_cell_kite(m, shear_v)

        ow = div * div + shear * shear - vort * vort

        # eigenvalues of [[div/2 + sn/2, (ss - w)/2], [(ss + w)/2, ...]]:
        # closed form lambda = d/2 +- sqrt(W)/2 in the incompressible limit
        # (ref C kernel computes these with LAPACK-free iteration)
        disc = jnp.sqrt(jnp.abs(ow))
        lam1 = 0.5 * (div + jnp.where(ow >= 0, disc, 0.0))
        lam2 = 0.5 * (div - jnp.where(ow >= 0, disc, 0.0))

        return {"okuboWeiss": np.asarray(ow),
                "eigenvalue1": np.asarray(lam1),
                "eigenvalue2": np.asarray(lam2),
                "vorticity": np.asarray(vort)}
