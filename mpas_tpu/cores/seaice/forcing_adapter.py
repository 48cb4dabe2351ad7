"""Sea-ice forcing adapter: framework forcing groups -> SeaiceForcing.

ref: src/core_seaice/model_forward/mpas_seaice_forcing.F (1,876 LoC):
builds two framework forcing groups — 6-hourly atmospheric (winds, air
temperature, radiation) and monthly climatological oceanic (SST, currents,
heat flux) — with cyclic year wrapping, then maps the interpolated records
onto the coupling fields each timestep.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.seaice.state import SeaiceForcing
from mpas_tpu.framework.forcing import ForcingGroup, ForcingStream
from mpas_tpu.framework.timekeeping import Time

# coupling-field names (ref: the atmos_coupling/ocean_coupling pools)
ATM_FIELDS = ("uAirVelocity", "vAirVelocity", "airTemperature",
              "shortwaveDown", "longwaveDown")
OCN_FIELDS = ("uOceanVelocity", "vOceanVelocity", "seaSurfaceTemperature",
              "oceanHeatFlux")


class SeaiceForcingManager:
    """ref: seaice_forcing_init + seaice_forcing_get
    (mpas_seaice_forcing.F)."""

    def __init__(self, atm_file: str | None = None,
                 ocn_file: str | None = None,
                 atm_fields=ATM_FIELDS, ocn_fields=OCN_FIELDS,
                 cycle_start=None, cycle_duration=None):
        self.groups = []
        if atm_file is not None:
            g = ForcingGroup("seaice_atm", cycle_start=cycle_start,
                             cycle_duration=cycle_duration)
            s = ForcingStream(atm_file, list(atm_fields))
            for f in atm_fields:
                g.add_field(s, f)
            self.groups.append(g)
        if ocn_file is not None:
            g = ForcingGroup("seaice_ocn", cycle_start=cycle_start,
                             cycle_duration=cycle_duration)
            s = ForcingStream(ocn_file, list(ocn_fields))
            for f in ocn_fields:
                g.add_field(s, f, interpolation="linear")
            self.groups.append(g)

    def get(self, model_time: Time, n_cells: int, n_vertices: int,
            dtype=jnp.float64) -> SeaiceForcing:
        """Interpolate all groups to model_time and assemble the coupling
        struct (missing fields default to zero)."""
        vals = {}
        for g in self.groups:
            vals.update(g.get_forcing(model_time))
        zc = np.zeros(n_cells)
        zv = np.zeros(n_vertices)

        def f(name, default):
            return jnp.asarray(vals.get(name, default), dtype=dtype)

        return SeaiceForcing(
            uAirVelocity=f("uAirVelocity", zc),
            vAirVelocity=f("vAirVelocity", zc),
            airTemperature=f("airTemperature", zc),
            shortwaveDown=f("shortwaveDown", zc),
            longwaveDown=f("longwaveDown", zc),
            uOceanVelocity=f("uOceanVelocity", zc),
            vOceanVelocity=f("vOceanVelocity", zc),
            seaSurfaceTemperature=f("seaSurfaceTemperature", zc - 1.8),
            oceanHeatFlux=f("oceanHeatFlux", zc),
            sshGradientU=jnp.asarray(zv, dtype=dtype),
            sshGradientV=jnp.asarray(zv, dtype=dtype))

    def restart_times(self, model_time: Time) -> dict:
        """ref: mpas_forcing_write_restart_times (mpas_forcing.F:2494)."""
        out = {}
        for g in self.groups:
            out.update(g.restart_times(model_time))
        return out
