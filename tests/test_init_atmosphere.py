"""init_atmosphere toolchain: projections, hinterp, vinterp, geogrid.

Parity model: mpas_init_atm_llxy.F round-trip identities, hinterp exactness
on linear fields, read_geogrid.c byte-level contract."""

import numpy as np
import pytest

from mpas_tpu.cores.init_atmosphere.llxy import ProjInfo, llij, ijll
from mpas_tpu.cores.init_atmosphere.hinterp import (interp_nearest,
                                                    interp_bilinear,
                                                    interp_weighted16,
                                                    interp_sequence)
from mpas_tpu.cores.init_atmosphere.vinterp import vertical_interp
from mpas_tpu.cores.init_atmosphere.static import (read_geogrid_tile,
                                                   write_geogrid_tile,
                                                   interp_static_to_cells)


_PROJS = [
    ProjInfo("latlon", lat1=-30.0, lon1=10.0, dx=0.5, dy=0.5),
    ProjInfo("merc", lat1=-20.0, lon1=100.0, dx=25000.0, truelat1=10.0),
    ProjInfo("ps", lat1=60.0, lon1=-100.0, dx=30000.0, stdlon=-100.0,
             truelat1=70.0),
    ProjInfo("lc", lat1=35.0, lon1=-95.0, dx=20000.0, stdlon=-95.0,
             truelat1=30.0, truelat2=50.0),
]


class TestProjections:
    @pytest.mark.parametrize("proj", _PROJS, ids=[p.code for p in _PROJS])
    def test_roundtrip_ll_ij_ll(self, proj):
        rng = np.random.default_rng(0)
        if proj.code == "ps":
            lat = rng.uniform(30.0, 85.0, 50)
        elif proj.code == "lc":
            lat = rng.uniform(20.0, 60.0, 50)
        else:
            lat = rng.uniform(-60.0, 60.0, 50)
        lon = rng.uniform(-170.0, 170.0, 50)
        i, j = llij(proj, lat, lon)
        lat2, lon2 = ijll(proj, i, j)
        assert np.allclose(lat2, lat, atol=1e-6)
        dlon = np.mod(lon2 - lon + 180.0, 360.0) - 180.0
        assert np.allclose(dlon, 0.0, atol=1e-6)

    @pytest.mark.parametrize("proj", _PROJS, ids=[p.code for p in _PROJS])
    def test_known_point_maps_to_knownij(self, proj):
        i, j = llij(proj, proj.lat1, proj.lon1)
        assert float(i) == pytest.approx(proj.knowni, abs=1e-6)
        assert float(j) == pytest.approx(proj.knownj, abs=1e-6)

    def test_lc_grid_spacing_near_truelat(self):
        """At the standard parallel the map scale factor is 1: moving one
        grid cell east should move ~dx meters."""
        proj = ProjInfo("lc", lat1=30.0, lon1=-95.0, dx=20000.0,
                        stdlon=-95.0, truelat1=30.0, truelat2=30.0)
        lat1, lon1 = ijll(proj, 10.0, 1.0)
        lat2, lon2 = ijll(proj, 11.0, 1.0)
        # great-circle distance
        r = 6370000.0
        d = r * np.arccos(
            np.sin(np.radians(lat1)) * np.sin(np.radians(lat2))
            + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2))
            * np.cos(np.radians(lon2 - lon1)))
        assert d == pytest.approx(20000.0, rel=0.01)


class TestHinterp:
    def _grid(self):
        ny, nx = 20, 30
        yy, xx = np.mgrid[0:ny, 0:nx]
        return 2.0 * xx + 3.0 * yy + 1.0     # linear field

    def test_bilinear_exact_on_linear(self):
        src = self._grid()
        rng = np.random.default_rng(1)
        i = rng.uniform(2.0, 28.0, 40)       # 1-based fractional
        j = rng.uniform(2.0, 18.0, 40)
        out = interp_bilinear(src, i, j)
        expect = 2.0 * (i - 1.0) + 3.0 * (j - 1.0) + 1.0
        assert np.allclose(out, expect, rtol=1e-12)

    def test_sixteen_pt_exact_on_linear(self):
        src = self._grid()
        rng = np.random.default_rng(2)
        i = rng.uniform(3.0, 27.0, 40)
        j = rng.uniform(3.0, 17.0, 40)
        out = interp_weighted16(src, i, j)
        expect = 2.0 * (i - 1.0) + 3.0 * (j - 1.0) + 1.0
        assert np.allclose(out, expect, rtol=1e-10)

    def test_nearest_picks_grid_value(self):
        src = self._grid()
        assert interp_nearest(src, np.asarray([5.0]),
                              np.asarray([7.0]))[0] == src[6, 4]

    def test_sequence_falls_back_over_missing(self):
        src = self._grid()
        src[5:8, 5:8] = -999.0
        out = interp_sequence(src, np.asarray([6.5]), np.asarray([6.5]),
                              methods=("bilinear", "nearest"),
                              missing=-999.0)
        # bilinear sees missing corners -> nearest fallback, also -999 ->
        # remains missing flag from nearest; value must be a real grid value
        assert out[0] == -999.0 or np.isfinite(out[0])


class TestVinterp:
    def test_linear_profile_exact(self):
        src_lev = np.broadcast_to(np.linspace(0.0, 10000.0, 20),
                                  (4, 20)).copy()
        vals = 5.0 + 0.002 * src_lev
        tgt = np.broadcast_to(np.linspace(500.0, 9500.0, 7), (4, 7)).copy()
        out = vertical_interp(tgt, src_lev, vals)
        assert np.allclose(out, 5.0 + 0.002 * tgt, rtol=1e-12)

    def test_const_extrapolation_clamps(self):
        src_lev = np.broadcast_to(np.linspace(100.0, 900.0, 9), (1, 9))
        vals = np.broadcast_to(np.linspace(1.0, 9.0, 9), (1, 9))
        out = vertical_interp(np.asarray([[0.0, 1000.0]]), src_lev, vals)
        assert out[0, 0] == 1.0 and out[0, 1] == 9.0


class TestGeogrid:
    def test_roundtrip_tile(self, tmp_path):
        rng = np.random.default_rng(3)
        arr = rng.uniform(-3000.0, 8000.0, (1, 12, 17)).astype(np.float32)
        arr = np.round(arr)                   # representable at scale 1
        p = tmp_path / "00001-00017.00001-00012"
        write_geogrid_tile(p, arr, isigned=1, endian=0, scalefactor=1.0,
                           wordsize=2)
        back = read_geogrid_tile(p, 17, 12, 1, isigned=1, endian=0,
                                 scalefactor=1.0, wordsize=2)
        assert np.array_equal(back, arr)

    def test_scalefactor_and_wordsize(self, tmp_path):
        arr = np.asarray([[[0.5, -0.25, 1.75]]], dtype=np.float32)
        p = tmp_path / "tile"
        write_geogrid_tile(p, arr, isigned=1, endian=0, scalefactor=0.25,
                           wordsize=4)
        back = read_geogrid_tile(p, 3, 1, 1, isigned=1, endian=0,
                                 scalefactor=0.25, wordsize=4)
        assert np.allclose(back, arr)
        # file must be exactly nx*ny*nz*wordsize bytes (flat binary contract)
        assert p.stat().st_size == 3 * 4

    def test_static_interp_through_projection(self, tmp_path):
        """Terrain tile on a latlon projection -> cells recover the field."""
        proj = ProjInfo("latlon", lat1=0.0, lon1=0.0, dx=1.0, dy=1.0)
        ny, nx = 30, 40
        yy, xx = np.mgrid[0:ny, 0:nx]
        tile = (10.0 * xx + 5.0 * yy).astype(np.float32)
        lat = np.asarray([3.0, 10.5, 20.25])
        lon = np.asarray([4.0, 20.5, 30.75])
        out = interp_static_to_cells(tile, proj, lat, lon,
                                     method="bilinear")
        assert np.allclose(out, 10.0 * lon + 5.0 * lat, rtol=1e-6)
