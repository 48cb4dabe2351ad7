"""Round-2 analysis-member breadth: ten additional runtime-togglable
diagnostic plugins mirroring src/core_ocean/analysis_members/:

  eddyProductVariables        <- mpas_ocn_eddy_product_variables.F
  waterMassCensus             <- mpas_ocn_water_mass_census.F
  transectTransport           <- mpas_ocn_transect_transport.F
  highFrequencyOutput         <- mpas_ocn_high_frequency_output.F
  surfaceAreaWeightedAverages <- mpas_ocn_surface_area_weighted_averages.F
  pointwiseStats              <- mpas_ocn_pointwise_stats.F
  debugDiagnostics            <- mpas_ocn_debug_diagnostics.F
  timeFilters                 <- mpas_ocn_time_filters.F
  regionalStats               <- mpas_ocn_regional_stats.F
  rpnCalculator               <- mpas_ocn_rpn_calculator.F

Each member exposes init(grid, cfg) / compute(grid, cfg, state) -> dict,
the driver contract of analysis/__init__.py (ref:
mpas_ocn_analysis_driver.F:388-701).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpas_tpu.cores.ocean.core import equation_of_state


def _ssh(grid, state):
    return jnp.sum(state.layerThickness * (grid.cellMask
                                           if grid.cellMask is not None
                                           else 1.0), axis=-1) \
        - grid.bottomDepth


def _cell_velocity(grid, state):
    """Cell-centered (zonal, meridional) from edge normals via the
    per-cell LSQ reconstruction (ops/reconstruct)."""
    from mpas_tpu.ops.reconstruct import build_reconstruct_coeffs, reconstruct
    coeffs = build_reconstruct_coeffs(grid.mesh)
    _, _, _, uzonal, umerid = reconstruct(grid.mesh, coeffs, state.u)
    return uzonal, umerid


class EddyProductVariables:
    """Products of velocity/tracer fields whose time means minus the
    product of time means give eddy covariances (ref:
    mpas_ocn_eddy_product_variables.F: velocityZonal*velocityZonal,
    velocityZonal*velocityMeridional, u*T, SSH^2 ...)."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        uz, um = _cell_velocity(grid, state)
        T = state.tracers[..., 0]
        ssh = _ssh(grid, state)
        return {
            "uu": np.asarray(uz * uz), "vv": np.asarray(um * um),
            "uv": np.asarray(uz * um),
            "uT": np.asarray(uz * T), "vT": np.asarray(um * T),
            "ssh2": np.asarray(ssh * ssh),
        }


class WaterMassCensus:
    """Volume census binned in (T, S) classes (ref:
    mpas_ocn_water_mass_census.F): the volume of water in each
    temperature/salinity bin over the masked domain."""
    t_edges = np.linspace(-2.0, 30.0, 17)
    s_edges = np.linspace(32.0, 37.0, 11)

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        h = np.asarray(state.layerThickness)
        mask = np.asarray(grid.cellMask) if grid.cellMask is not None \
            else np.ones_like(h)
        area = np.asarray(grid.mesh.areaCell)[:, None]
        vol = (h * mask * area).ravel()
        T = np.asarray(state.tracers[..., 0]).ravel()
        S = np.asarray(state.tracers[..., 1]).ravel()
        census, _, _ = np.histogram2d(T, S, bins=(self.t_edges,
                                                  self.s_edges),
                                      weights=vol)
        return {"waterMassCensus": census,
                "temperatureBinEdges": self.t_edges,
                "salinityBinEdges": self.s_edges}


class TransectTransport:
    """Volume transport through a transect (ref:
    mpas_ocn_transect_transport.F). The transect is the set of edges
    crossed by a y (planar) or latitude (sphere) line at the domain
    middle; the sign convention is positive toward +y / north."""

    def init(self, grid, cfg):
        mesh = grid.mesh
        coe = np.asarray(mesh.cellsOnEdge)
        yc = np.asarray(mesh.latCell if mesh.on_sphere else mesh.yCell)
        y0 = 0.5 * (yc.min() + yc.max())
        y1, y2 = yc[coe[:, 0]], yc[coe[:, 1]]
        crosses = ((y1 - y0) * (y2 - y0) < 0.0) \
            & (np.asarray(mesh.boundaryEdge) == 0)
        self.edge_ids = np.where(crosses)[0]
        self.sign = np.sign(y2 - y1)[self.edge_ids]

    def compute(self, grid, cfg, state):
        c1 = grid.mesh.cellsOnEdge[self.edge_ids, 0]
        c2 = grid.mesh.cellsOnEdge[self.edge_ids, 1]
        h_e = 0.5 * (state.layerThickness[c1] + state.layerThickness[c2])
        if grid.edgeMask is not None:
            h_e = h_e * grid.edgeMask[self.edge_ids]
        dv = grid.mesh.dvEdge[self.edge_ids]
        flux = jnp.sum(state.u[self.edge_ids] * h_e, axis=-1) * dv
        sv = float(jnp.sum(jnp.asarray(self.sign) * flux)) / 1e6
        return {"transectTransportSv": sv,
                "nTransectEdges": len(self.edge_ids)}


class HighFrequencyOutput:
    """Lightweight snapshot fields for high-frequency streams (ref:
    mpas_ocn_high_frequency_output.F: ssh, surface T/S, kineticEnergy)."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        mesh = grid.mesh
        ke = jnp.sum(mesh.keW[..., None]
                     * (state.u * state.u)[mesh.edgesOnCell], axis=1) \
            * mesh.invAreaCell[:, None]
        return {"ssh": np.asarray(_ssh(grid, state)),
                "surfaceTemperature": np.asarray(state.tracers[:, 0, 0]),
                "surfaceSalinity": np.asarray(state.tracers[:, 0, 1]),
                "kineticEnergyAtSurface": np.asarray(ke[:, 0])}


class SurfaceAreaWeightedAverages:
    """Area-weighted means of surface fields (ref:
    mpas_ocn_surface_area_weighted_averages.F)."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        area = grid.mesh.areaCell
        tot = jnp.sum(area)
        avg = lambda f: float(jnp.sum(f * area) / tot)
        ssh = _ssh(grid, state)
        return {"avgSSH": avg(ssh),
                "avgSST": avg(state.tracers[:, 0, 0]),
                "avgSSS": avg(state.tracers[:, 0, 1]),
                "avgBottomDepth": avg(grid.bottomDepth)}


class PointwiseStats:
    """Field values sampled at selected cells (ref:
    mpas_ocn_pointwise_stats.F). Default: 8 cells spread through the
    index space (index order follows the SFC, so they spread spatially)."""
    n_points = 8

    def init(self, grid, cfg):
        nC = grid.mesh.nCells
        self.cells = np.linspace(0, nC - 1, self.n_points).astype(np.int64)

    def compute(self, grid, cfg, state):
        ssh = _ssh(grid, state)
        return {"cellIndices": self.cells,
                "sshAtPoints": np.asarray(ssh[self.cells]),
                "sstAtPoints": np.asarray(state.tracers[self.cells, 0, 0])}


class DebugDiagnostics:
    """Min/max/NaN counts of the prognostic state (ref:
    mpas_ocn_debug_diagnostics.F)."""

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state):
        out = {}
        for name, f in (("u", state.u), ("h", state.layerThickness),
                        ("T", state.tracers[..., 0]),
                        ("S", state.tracers[..., 1])):
            a = np.asarray(f)
            out[f"{name}Min"] = float(np.nanmin(a))
            out[f"{name}Max"] = float(np.nanmax(a))
            out[f"{name}NaNs"] = int(np.isnan(a).sum())
        return out


class TimeFilters:
    """Running low-pass (exponential) time filter of u and SSH (ref:
    mpas_ocn_time_filters.F). tau is the filter timescale in seconds;
    compute() must be called at a fixed interval for a calibrated
    cutoff — each call blends with weight dt/tau."""
    tau = 86400.0
    interval = 3600.0

    def init(self, grid, cfg):
        self._u = None
        self._ssh = None

    def compute(self, grid, cfg, state):
        w = min(self.interval / self.tau, 1.0)
        u = np.asarray(state.u)
        ssh = np.asarray(_ssh(grid, state))
        if self._u is None:
            self._u, self._ssh = u, ssh
        else:
            self._u = (1 - w) * self._u + w * u
            self._ssh = (1 - w) * self._ssh + w * ssh
        return {"uLowPass": self._u.copy(), "sshLowPass": self._ssh.copy()}


class RegionalStats:
    """Per-region min/mean/max over cell-region masks (ref:
    mpas_ocn_regional_stats.F + regional_stats_inc). Default regions:
    thirds of the domain by y (planar) or latitude (sphere); custom
    masks can be assigned to `region_masks` ({name: bool (nCells,)})
    before init."""
    region_masks = None

    def init(self, grid, cfg):
        if self.region_masks is None:
            mesh = grid.mesh
            yc = np.asarray(mesh.latCell if mesh.on_sphere else mesh.yCell)
            lo, hi = yc.min(), yc.max()
            t1, t2 = lo + (hi - lo) / 3.0, lo + 2.0 * (hi - lo) / 3.0
            self.region_masks = {"south": yc < t1,
                                 "middle": (yc >= t1) & (yc < t2),
                                 "north": yc >= t2}

    def compute(self, grid, cfg, state):
        ssh = np.asarray(_ssh(grid, state))
        sst = np.asarray(state.tracers[:, 0, 0])
        area = np.asarray(grid.mesh.areaCell)
        out = {}
        for name, m in self.region_masks.items():
            if not m.any():
                continue
            w = area[m] / area[m].sum()
            out[f"{name}MeanSSH"] = float((ssh[m] * w).sum())
            out[f"{name}MeanSST"] = float((sst[m] * w).sum())
            out[f"{name}MaxSST"] = float(sst[m].max())
            out[f"{name}MinSST"] = float(sst[m].min())
        return out


class RpnCalculator:
    """Reverse-Polish-notation field calculator (ref:
    mpas_ocn_rpn_calculator.F + rpn_calc_inc): evaluates a postfix
    expression over named state fields. Default expression computes
    density from the configured EOS minus 1000 (sigma-t genre).

    Tokens: field names {temperature, salinity, ssh, layerThickness},
    numeric literals, operators {+ - * /}."""
    expression = "temperature salinity sigma"

    def init(self, grid, cfg):
        pass

    def _fields(self, grid, cfg, state):
        return {
            "temperature": state.tracers[..., 0],
            "salinity": state.tracers[..., 1],
            "layerThickness": state.layerThickness,
            "ssh": _ssh(grid, state),
        }

    def compute(self, grid, cfg, state):
        fields = self._fields(grid, cfg, state)
        stack = []
        for tok in self.expression.split():
            if tok in fields:
                stack.append(fields[tok])
            elif tok in ("+", "-", "*", "/"):
                b, a = stack.pop(), stack.pop()
                stack.append({"+": lambda x, y: x + y,
                              "-": lambda x, y: x - y,
                              "*": lambda x, y: x * y,
                              "/": lambda x, y: x / y}[tok](a, b))
            elif tok == "sigma":       # built-in: EOS density - 1000
                S = stack.pop()
                T = stack.pop()
                stack.append(equation_of_state(cfg, T, S) - 1000.0)
            else:
                stack.append(jnp.asarray(float(tok)))
        if len(stack) != 1:
            raise ValueError(
                f"rpn expression {self.expression!r} leaves "
                f"{len(stack)} values on the stack")
        return {"rpnResult": np.asarray(stack[0])}


class EliassenPalm:
    """Eliassen-Palm flux diagnostics (ref: mpas_ocn_eliassen_palm.F —
    the thickness-weighted-average (TWA) eddy flux tensor in buoyancy
    coordinates). '-class' form on z-levels: zonal-band TWA velocity,
    the eddy momentum flux u'v' and form-drag-like h'u' components of the
    EP tensor, and their band-wise divergence. Bands follow ZonalMean."""
    n_bins: int = 12

    def init(self, grid, cfg):
        m = grid.mesh
        import numpy as _np
        y = _np.asarray(m.latCell) if m.on_sphere else _np.asarray(m.yCell)
        edges = _np.linspace(y.min() - 1e-9, y.max() + 1e-9,
                             self.n_bins + 1)
        which = _np.clip(_np.searchsorted(edges, y) - 1, 0, self.n_bins - 1)
        onehot = _np.zeros((len(y), self.n_bins))
        onehot[_np.arange(len(y)), which] = 1.0
        self._onehot = jnp.asarray(onehot)
        self._centers = 0.5 * (edges[:-1] + edges[1:])

    def compute(self, grid, cfg, state):
        h = state.layerThickness
        area = grid.mesh.areaCell[:, None]
        w = self._onehot * area
        wsum = jnp.maximum(jnp.sum(w, axis=0), 1e-30)[:, None]
        ux, vy = _cell_velocity(grid, state)

        def band(f):                     # area mean per band
            return (w.T @ f) / wsum

        def band_twa(f):                 # thickness-weighted average
            return (w.T @ (f * h)) / jnp.maximum(w.T @ h, 1e-30)

        u_hat = band_twa(ux)             # (nBins, nz)
        v_hat = band_twa(vy)
        h_bar = band(h)
        # eddy components relative to the band TWA mean
        which = jnp.argmax(self._onehot, axis=1)
        up = ux - u_hat[which]
        vp = vy - v_hat[which]
        hp = h - h_bar[which]
        epfy = band_twa(up * vp)         # meridional eddy momentum flux
        form = band(hp * up)             # form-drag (h'u') component
        dy = jnp.asarray(self._centers[1] - self._centers[0])
        div = jnp.gradient(epfy, axis=0) / dy
        return {"binCenters": np.asarray(self._centers),
                "uTWA": np.asarray(u_hat), "vTWA": np.asarray(v_hat),
                "epFluxMeridional": np.asarray(epfy),
                "epFormDrag": np.asarray(form),
                "epFluxDivergence": np.asarray(div)}


class TestComputeInterval:
    """Compute-interval self test (ref: mpas_ocn_test_compute_interval.F
    — counts its own invocations so alarm-driven members can be
    validated)."""

    def init(self, grid, cfg):
        self.count = 0

    def compute(self, grid, cfg, state):
        self.count += 1
        return {"computeCount": self.count}
