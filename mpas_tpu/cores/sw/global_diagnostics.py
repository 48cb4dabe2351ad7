"""Global (domain-integrated) shallow-water diagnostics.

ref: src/core_sw/mpas_sw_global_diagnostics.F:23 (sw_compute_global_diagnostics
writes total energy/enstrophy/mass/CFL to stats files). Reductions are plain
jnp sums on one shard; the distributed runner wraps them in psum.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpas_tpu.constants import gravity
from mpas_tpu.mesh.mesh import Mesh
from mpas_tpu.ops import stencils as st
from mpas_tpu.cores.sw.state import SWState


def global_diagnostics(mesh: Mesh, state: SWState, h_s, dt):
    u, h = state.u, state.h
    ke_cell = st.kinetic_energy_cell(mesh, u)
    vorticity = st.edge_curl(mesh, u)
    h_vertex = st.cell_to_vertex_kite(mesh, h)
    pv = (mesh.fVertex + vorticity) / h_vertex

    area = mesh.areaCell
    mass = jnp.sum(h * area)
    kinetic = jnp.sum(h * ke_cell * area)
    potential = jnp.sum(0.5 * gravity * ((h + h_s) ** 2 - h_s ** 2) * area)
    enstrophy = jnp.sum(0.5 * mesh.areaTriangle * h_vertex * pv * pv)
    cfl = jnp.max(jnp.abs(u) * dt * mesh.invDcEdge)
    return {
        "total_mass": mass,
        "kinetic_energy": kinetic,
        "potential_energy": potential,
        "total_energy": kinetic + potential,
        "potential_enstrophy": enstrophy,
        "max_cfl": cfl,
    }
