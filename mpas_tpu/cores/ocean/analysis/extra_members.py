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
    """T/S-binned water-mass census at the reference's output structure
    (ref: mpas_ocn_water_mass_census.F;
    Registry_water_mass_census.xml vars: bin-center values, the
    FRACTIONAL volume distribution, the volume-weighted potential
    density and mean z-position of every T-S diagram bin, plus the
    per-region variants over `region_masks`)."""
    t_edges = np.linspace(-2.0, 30.0, 17)
    s_edges = np.linspace(32.0, 37.0, 11)
    region_masks = None          # {name: bool (nCells,)}; None = global

    def init(self, grid, cfg):
        if self.region_masks is None:
            mesh = grid.mesh
            yc = np.asarray(mesh.latCell if mesh.on_sphere
                            else mesh.yCell)
            lo, hi = yc.min(), yc.max()
            mid = 0.5 * (lo + hi)
            self.region_masks = {"south": yc < mid, "north": yc >= mid}

    def _census(self, grid, state, cell_mask):
        h = np.asarray(state.layerThickness)
        mask = np.asarray(grid.cellMask) if grid.cellMask is not None \
            else np.ones_like(h)
        mask = mask * np.asarray(cell_mask)[:, None]
        area = np.asarray(grid.mesh.areaCell)[:, None]
        vol = (h * mask * area).ravel()
        T = np.asarray(state.tracers[..., 0]).ravel()
        S = np.asarray(state.tracers[..., 1]).ravel()
        # z position of layer midpoints (negative down from the surface)
        zmid = -(np.cumsum(h, axis=1) - 0.5 * h).ravel()
        # UNESCO-genre sigma-0 (the linear/JM EOS of the run would also
        # do; the census only needs a consistent density label per bin)
        sigma = (-0.2 * T + 0.8 * S) + 1000.0 - 1000.0
        bins = (self.t_edges, self.s_edges)
        census, _, _ = np.histogram2d(T, S, bins=bins, weights=vol)
        rho_sum, _, _ = np.histogram2d(T, S, bins=bins,
                                       weights=vol * sigma)
        z_sum, _, _ = np.histogram2d(T, S, bins=bins, weights=vol * zmid)
        tot = max(census.sum(), 1e-30)
        nz_mask = census > 0
        rho_bin = np.where(nz_mask, rho_sum / np.maximum(census, 1e-30),
                           0.0)
        z_bin = np.where(nz_mask, z_sum / np.maximum(census, 1e-30), 0.0)
        return census / tot, rho_bin, z_bin

    def compute(self, grid, cfg, state):
        tc = 0.5 * (self.t_edges[:-1] + self.t_edges[1:])
        sc = 0.5 * (self.s_edges[:-1] + self.s_edges[1:])
        frac, rho_bin, z_bin = self._census(
            grid, state, np.ones(grid.mesh.nCells, bool))
        out = {
            "waterMassCensusTemperatureValues": tc,
            "waterMassCensusSalinityValues": sc,
            "waterMassFractionalDistribution": frac,
            "potentialDensityOfTSDiagram": rho_bin,
            "zPositionOfTSDiagram": z_bin,
            "regionNames": list(self.region_masks),
        }
        fr_l, rho_l, z_l = [], [], []
        for name, m in self.region_masks.items():
            f, r, z = self._census(grid, state, m)
            fr_l.append(f)
            rho_l.append(r)
            z_l.append(z)
        out["waterMassCensusTemperatureValuesRegion"] = tc
        out["waterMassCensusSalinityValuesRegion"] = sc
        out["waterMassFractionalDistributionRegion"] = np.stack(fr_l)
        out["potentialDensityOfTSDiagramRegion"] = np.stack(rho_l)
        out["zPositionOfTSDiagramRegion"] = np.stack(z_l)
        return out


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
    """min/max/area-weighted-avg of the full reference surface-field
    list (ref: mpas_ocn_surface_area_weighted_averages.F; var list
    Registry_surface_area_weighted_averages.xml — 30 fields x
    {min,max,avg} + sumSurfaceMaskValue). Forcing components the run
    does not carry enter as zeros (the reference reads the same pool
    slots, zero-initialized when un-forced)."""

    #: the reference's 30-entry field order (Registry :1-96)
    FIELDS = (
        "SurfaceMaskValue", "SurfaceArea", "LatentHeatFlux",
        "SensibleHeatFlux", "LongWaveHeatFluxUp", "LongWaveHeatFluxDown",
        "SeaIceHeatFlux", "ShortWaveHeatFlux", "EvaporationFlux",
        "SeaIceFreshWaterFlux", "RiverRunoffFlux", "IceRunoffFlux",
        "RainFlux", "SnowFlux", "SeaIceEnergy", "SurfaceThicknessFlux",
        "SurfaceTemperatureFlux", "SurfaceSalinityFlux",
        "SeaIceSalinityFlux", "SurfaceWindStressMagnitude",
        "WindStressZonal", "WindStressMeridional", "SeaSurfacePressure",
        "SurfaceSSH", "SurfaceTemperature", "SurfaceSalinity",
        "BoundaryLayerDepth", "SurfaceNetHeatFlux",
        "SurfaceNetSalinitFlux", "SurfaceNetFreshWaterFlux")

    def init(self, grid, cfg):
        pass

    def compute(self, grid, cfg, state, forcing=None):
        mesh = grid.mesh
        n = mesh.nCells
        zero = jnp.zeros(n)

        def fz(name):
            v = getattr(forcing, name, None) if forcing is not None \
                else None
            return zero if v is None else jnp.asarray(v)

        cm = getattr(grid, "cellMask", None)
        mask = (jnp.ones(n) if cm is None
                else jnp.asarray(cm)[:, 0] if jnp.asarray(cm).ndim == 2
                else jnp.asarray(cm))
        area = mesh.areaCell
        tx, ty = fz("windStressZonal"), fz("windStressMeridional")
        sens = fz("sensibleHeatFlux")
        sw = fz("shortwaveFlux")
        lat = fz("latentHeatFlux")
        lwu, lwd = fz("longWaveHeatFluxUp"), fz("longWaveHeatFluxDown")
        iceq = fz("seaIceHeatFlux")
        evap = fz("evaporationFlux")
        icefw = fz("seaIceFreshWaterFlux")
        riv, icer = fz("riverRunoffFlux"), fz("iceRunoffFlux")
        rain, snow = fz("rainFlux"), fz("snowFlux")
        fw = fz("freshwaterFlux")
        sisf = fz("seaIceSalinityFlux")
        vals = {
            "SurfaceMaskValue": mask,
            "SurfaceArea": area * mask,
            "LatentHeatFlux": lat,
            "SensibleHeatFlux": sens,
            "LongWaveHeatFluxUp": lwu,
            "LongWaveHeatFluxDown": lwd,
            "SeaIceHeatFlux": iceq,
            "ShortWaveHeatFlux": sw,
            "EvaporationFlux": evap,
            "SeaIceFreshWaterFlux": icefw,
            "RiverRunoffFlux": riv,
            "IceRunoffFlux": icer,
            "RainFlux": rain,
            "SnowFlux": snow,
            "SeaIceEnergy": fz("seaIceEnergy"),
            "SurfaceThicknessFlux": fw / 1000.0,
            "SurfaceTemperatureFlux": (sens + sw + lat + lwu + lwd
                                       + iceq) / (1026.0 * 3996.0),
            # virtual salt flux: restoring handled inside the tracer
            # step; reported as the freshwater-equivalent dilution flux
            "SurfaceSalinityFlux": -fw / 1000.0
            * state.tracers[:, 0, 1],
            "SeaIceSalinityFlux": sisf,
            "SurfaceWindStressMagnitude": jnp.sqrt(tx * tx + ty * ty),
            "WindStressZonal": tx,
            "WindStressMeridional": ty,
            "SeaSurfacePressure": fz("seaSurfacePressure"),
            "SurfaceSSH": _ssh(grid, state),
            "SurfaceTemperature": state.tracers[:, 0, 0],
            "SurfaceSalinity": state.tracers[:, 0, 1],
            "BoundaryLayerDepth": (state.blDepth if getattr(
                state, "blDepth", None) is not None else zero),
            "SurfaceNetHeatFlux": sens + sw + lat + lwu + lwd + iceq,
            "SurfaceNetSalinitFlux": sisf,
            "SurfaceNetFreshWaterFlux": fw + rain + snow + evap + riv
            + icer + icefw,
        }
        w = area * mask
        tot = jnp.maximum(jnp.sum(w), 1e-30)
        big = 1e30
        out = {"sumSurfaceMaskValue": float(jnp.sum(mask))}
        for name in self.FIELDS:
            f = vals[name]
            out["min" + name] = float(jnp.min(
                jnp.where(mask > 0, f, big)))
            out["max" + name] = float(jnp.max(
                jnp.where(mask > 0, f, -big)))
            out["avg" + name] = float(jnp.sum(f * w) / tot)
        return out


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

    #: per-region statistics over the reference's stat set (min, max,
    #: area-weighted avg, std, sum) applied to the regional field list
    #: of mpas_ocn_regional_stats.F (surface + column-integrated)
    STATS = ("Min", "Max", "Avg", "Std", "Sum")

    def compute(self, grid, cfg, state):
        mesh = grid.mesh
        area = np.asarray(mesh.areaCell)
        h = np.asarray(state.layerThickness)
        ke_edge = np.asarray(state.u) ** 2
        ke = np.zeros((mesh.nCells,))
        eoc = np.asarray(mesh.edgesOnCell)
        kw = np.asarray(mesh.keW)
        ke = (kw[..., None] * ke_edge[eoc]).sum(axis=1)[:, 0] \
            * np.asarray(mesh.invAreaCell)
        fields = {
            "ssh": np.asarray(_ssh(grid, state)),
            "surfaceTemperature": np.asarray(state.tracers[:, 0, 0]),
            "surfaceSalinity": np.asarray(state.tracers[:, 0, 1]),
            "bottomTemperature": np.asarray(state.tracers[:, -1, 0]),
            "bottomSalinity": np.asarray(state.tracers[:, -1, 1]),
            "columnThickness": h.sum(axis=1),
            "heatContent": (np.asarray(state.tracers[..., 0]) * h
                            ).sum(axis=1) * 1026.0 * 3996.0,
            "surfaceKineticEnergy": ke,
        }
        out = {}
        for rname, m in self.region_masks.items():
            if not m.any():
                continue
            w = area[m] / area[m].sum()
            out[f"{rname}Area"] = float(area[m].sum())
            out[f"{rname}NCells"] = int(m.sum())
            for fname, f in fields.items():
                fv = f[m]
                avg = float((fv * w).sum())
                out[f"{rname}Min{fname}"] = float(fv.min())
                out[f"{rname}Max{fname}"] = float(fv.max())
                out[f"{rname}Avg{fname}"] = avg
                out[f"{rname}Std{fname}"] = float(
                    np.sqrt(((fv - avg) ** 2 * w).sum()))
                out[f"{rname}Sum{fname}"] = float(fv.sum())
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
