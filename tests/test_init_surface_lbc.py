"""init_atmosphere cases 8 (surface update) and 9 (LBC generation).

Parity model: mpas_init_atm_surface.F interp_sfc_to_MPAS behavior and the
case-9 LBC pipeline feeding mpas_atm_boundaries.F.
"""

import numpy as np
import pytest

try:
    from tests.test_init_real import _synthetic_gfs
except ModuleNotFoundError:      # running with tests/ as the cwd
    from test_init_real import _synthetic_gfs

from mpas_tpu.cores.atmosphere.boundaries import build_bdy_masks
from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.init_atmosphere import met_reader as mr
from mpas_tpu.cores.init_atmosphere.surface_lbc import (build_lbc_records,
                                                        build_surface_updates)
from mpas_tpu.mesh.planar import box_hex_mesh
from mpas_tpu.mesh.sphere import icosahedral_mesh


def _sfc_file(tmp_path, time, sst0):
    nx, ny = 72, 37
    lats = -90.0 + 5.0 * np.arange(ny)
    lons = 0.0 + 5.0 * np.arange(nx)
    LA, _ = np.meshgrid(lats, lons, indexing="ij")
    fields = []
    for name, slab in [("SST", sst0 + 12.0 * np.cos(np.radians(LA))),
                       ("SKINTEMP", sst0 + 10.0 * np.cos(np.radians(LA))),
                       ("SEAICE", (np.abs(LA) > 70.0).astype(float))]:
        fields.append(mr.MetField(
            field=name, units="-", desc=name, hdate=time, xfcst=0.0,
            xlvl=200100.0, nx=nx, ny=ny, iproj=0,
            startlat=float(lats[0]), startlon=float(lons[0]),
            deltalat=5.0, deltalon=5.0, earth_radius=6371.229,
            is_wind_grid_rel=False, slab=np.asarray(slab, float)))
    path = str(tmp_path / f"SFC_{time[:13]}")
    mr.write_met_file(path, fields)
    return path


class TestCase8SurfaceUpdate:
    def test_sequence_interpolates_and_orders(self, tmp_path):
        mesh = icosahedral_mesh(8, lloyd_iters=1)
        paths = [(t, _sfc_file(tmp_path, t, sst0))
                 for t, sst0 in [("2020-01-01_00:00:00", 288.0),
                                 ("2020-01-01_06:00:00", 290.0)]]
        recs = build_surface_updates(mesh, paths)
        assert [r.time for r in recs] == [p[0] for p in paths]
        for r in recs:
            assert r.sst.shape == (mesh.nCells,)
            assert np.isfinite(r.sst).all()
            assert (0.0 <= r.xice).all() and (r.xice <= 1.0).all()
        # warmer second record; equator warmer than poles; ice at poles
        assert recs[1].sst.mean() > recs[0].sst.mean() + 1.0
        lat = np.degrees(np.asarray(mesh.latCell))
        eq = np.abs(lat) < 15.0
        po = np.abs(lat) > 75.0
        assert recs[0].sst[eq].mean() > recs[0].sst[po].mean()
        assert recs[0].xice[po].mean() > 0.5
        assert recs[0].xice[eq].max() == 0.0


class TestCase9Lbc:
    def test_lbc_records_on_boundary_zone(self, tmp_path):
        mesh = box_hex_mesh(20, 20, 120000.0)
        masks = build_bdy_masks(mesh)
        cfg = AtmConfig(config_nvertlevels=10, config_dt=60.0)
        path = _synthetic_gfs(tmp_path)
        fields = mr.read_met_file(path)
        recs = build_lbc_records(mesh, cfg,
                                 [("2020-01-01_00:00:00", fields),
                                  ("2020-01-01_06:00:00", fields)], masks)
        assert len(recs) == 2
        r = recs[0]
        cmask = np.asarray(masks.bdyMaskCell) > 0
        emask = np.asarray(masks.bdyMaskEdge) > 0
        assert cmask.any() and (~cmask).any()
        # interior zeroed, boundary populated and finite
        assert np.abs(r.lbc_theta[~cmask]).max() == 0.0
        assert np.isfinite(r.lbc_theta[cmask]).all()
        assert (r.lbc_theta[cmask] > 100.0).all()     # physical theta_m
        assert (r.lbc_rho[cmask] > 0.0).all()
        assert np.abs(r.lbc_u[~emask]).max() == 0.0
        assert r.lbc_scalars.shape[-1] >= 1
        assert (r.lbc_scalars[cmask] >= 0.0).all()    # qv non-negative
