"""netCDF4/HDF5 ingest path (io/hdf5.py + io/hdf5_write.py).

ref: mpas_io.F:144-200 (MPAS_IO_NETCDF4 iotype), mpas_bootstrapping.F:79-423
(mesh bootstrap must accept netCDF4 container files — the format
MPAS-Tools/JIGSAW-produced meshes routinely ship in).

The reader is implemented against the published HDF5 file-format spec
(no h5py in this image); the writer emits the same structures the netCDF4
C library does (v1 symbol-table groups, dimension scales, DIMENSION_LIST
vlen references, chunked+shuffle+deflate layouts), so the round trip
covers the real-file feature set, not just our own writer's subset.
"""

import numpy as np
import pytest

from mpas_tpu.io.hdf5 import read_hdf5
from mpas_tpu.io.hdf5_write import write_hdf5
from mpas_tpu.io.netcdf import read_netcdf


@pytest.fixture(scope="module")
def icos8():
    from mpas_tpu.mesh.sphere import icosahedral_mesh
    return icosahedral_mesh(8, lloyd_iters=2)


class TestHDF5Container:
    def test_round_trip_all_dtypes(self, tmp_path):
        rng = np.random.default_rng(0)
        dims = {"n": 50, "m": 7}
        variables = {
            "a_f8": (("n",), rng.standard_normal(50)),
            "a_f4": (("n", "m"),
                     rng.standard_normal((50, 7)).astype(np.float32)),
            "a_i4": (("n",), rng.integers(-9, 9, 50).astype(np.int32)),
            "a_i8": (("n",), rng.integers(0, 2 ** 40, 50).astype(np.int64)),
            "a_i2": (("n",), rng.integers(-9, 9, 50).astype(np.int16)),
            "a_u1": (("n",), rng.integers(0, 255, 50).astype(np.uint8)),
        }
        p = str(tmp_path / "t.nc")
        write_hdf5(p, dims, variables, {"title": "x", "ver": np.int32(3)})
        v, d, a = read_hdf5(p)
        assert d == dims
        assert a["title"] == "x" and int(a["ver"]) == 3
        for k, (dn, arr) in variables.items():
            assert np.array_equal(v[k], arr), k
            assert a["__vardims__"][k] == dn, k

    def test_chunked_deflate_shuffle(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = rng.standard_normal((1000, 26)).astype(np.float32)
        big = rng.integers(1, 10 ** 6, (3000, 2)).astype(np.int32)
        p = str(tmp_path / "c.nc")
        write_hdf5(p, {"n": 1000, "k": 26, "e": 3000, "TWO": 2},
                   {"x": (("n", "k"), arr), "conn": (("e", "TWO"), big)},
                   compress=True, chunk_rows=128)
        v, d, a = read_hdf5(p)
        assert np.array_equal(v["x"], arr)
        assert np.array_equal(v["conn"], big)

    def test_autodetect_dispatch(self, tmp_path):
        # read_netcdf must route HDF5-magic files to the hdf5 reader
        p = str(tmp_path / "h.nc")
        write_hdf5(p, {"n": 4}, {"y": (("n",), np.arange(4.0))})
        v, d, a = read_netcdf(p)
        assert np.array_equal(v["y"], np.arange(4.0))
        assert d["n"] == 4

    def test_netcdf3_still_classic(self, tmp_path):
        from mpas_tpu.io.netcdf import write_netcdf
        p = str(tmp_path / "c3.nc")
        write_netcdf(p, {"n": 4}, {"y": (("n",), np.arange(4.0))})
        with open(p, "rb") as f:
            assert f.read(3) == b"CDF"
        v, _, _ = read_netcdf(p)
        assert np.array_equal(v["y"], np.arange(4.0))


class TestMeshFromNetCDF4:
    def test_mesh_round_trip_netcdf4(self, icos8, tmp_path):
        from mpas_tpu.mesh.gridfile import mesh_from_netcdf, mesh_to_netcdf
        p = str(tmp_path / "grid4.nc")
        mesh_to_netcdf(icos8, p, fmt="netcdf4")
        with open(p, "rb") as f:
            assert f.read(4) == b"\x89HDF"
        m2 = mesh_from_netcdf(p)
        for nm in ("areaCell", "dvEdge", "dcEdge", "edgeSignOnCell",
                   "triskM", "kiteAreasOnCell", "angleEdge", "invAreaCell"):
            a = np.asarray(getattr(icos8, nm), dtype=np.float64)
            b = np.asarray(getattr(m2, nm), dtype=np.float64)
            assert np.max(np.abs(a - b)) < 1e-12, nm
        for nm in ("cellsOnEdge", "edgesOnCell", "verticesOnCell",
                   "cellsOnVertex", "edgesOnVertex"):
            assert np.array_equal(np.asarray(getattr(icos8, nm)),
                                  np.asarray(getattr(m2, nm))), nm

    def test_sw_run_equivalence_netcdf4(self, icos8, tmp_path):
        from mpas_tpu.cores.sw import test_cases as tc
        from mpas_tpu.cores.sw.config import SWConfig
        from mpas_tpu.cores.sw.time_integration import run_steps
        from mpas_tpu.mesh.gridfile import mesh_from_netcdf, mesh_to_netcdf
        from mpas_tpu.mesh.mesh import to_device
        p = str(tmp_path / "grid4.nc")
        mesh_to_netcdf(icos8, p, fmt="netcdf4")
        m2 = mesh_from_netcdf(p)
        cfg = SWConfig(config_dt=600.0, config_test_case=5)
        outs = []
        for m in (icos8, m2):
            mesh, state, h_s = tc.test_case_5(m)
            mesh = to_device(mesh, dtype=np.float64)
            outs.append(np.asarray(
                run_steps(mesh, cfg, state, h_s, 5).h))
        assert np.max(np.abs(outs[0] - outs[1])) < 1e-10


class TestRealFileQuirks:
    """1-based/padding/Fortran-transpose quirks of real toolchain files."""

    def test_transposed_fortran_layout(self, icos8, tmp_path):
        # some MPAS-Tools writers emit (vertexDegree, nVertices)-shaped
        # kite/weights arrays; the ingest path must accept either
        from mpas_tpu.mesh.gridfile import mesh_from_netcdf, mesh_to_netcdf
        from mpas_tpu.io.netcdf import read_netcdf
        p0 = str(tmp_path / "g.nc")
        mesh_to_netcdf(icos8, p0, fmt="netcdf4")
        v, d, a = read_netcdf(p0)
        vd = a["__vardims__"]
        v2 = dict(v)
        v2["kiteAreasOnVertex"] = v["kiteAreasOnVertex"].T.copy()
        v2["weightsOnEdge"] = v["weightsOnEdge"].T.copy()
        v2["edgesOnEdge"] = v["edgesOnEdge"].T.copy()
        vd = dict(vd)
        vd["kiteAreasOnVertex"] = ("vertexDegree", "nVertices")
        vd["weightsOnEdge"] = ("maxEdges2", "nEdges")
        vd["edgesOnEdge"] = ("maxEdges2", "nEdges")
        p1 = str(tmp_path / "gT.nc")
        write_hdf5(p1, {k: s for k, s in d.items()},
                   {k: (vd.get(k, ("n",)), arr) for k, arr in v2.items()},
                   {k: val for k, val in a.items() if k != "__vardims__"})
        m2 = mesh_from_netcdf(p1)
        assert np.max(np.abs(np.asarray(m2.kiteAreasOnVertex)
                             - np.asarray(icos8.kiteAreasOnVertex))) < 1e-12
        u = np.random.default_rng(0).normal(size=icos8.nEdges)

        def tang(m):
            return np.sum(np.asarray(m.weightsOnEdge)
                          * u[np.asarray(m.edgesOnEdge)], axis=1)
        assert np.max(np.abs(tang(icos8) - tang(m2))) < 1e-12
