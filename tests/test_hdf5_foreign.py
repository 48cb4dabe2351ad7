"""Foreign-byte HDF5 fixture: breaks the reader/writer circularity.

Round-4 verdict: every netCDF4 file `io/hdf5.py` had ever parsed was
produced by `io/hdf5_write.py`, so a mirrored reader/writer bug would be
invisible. This module assembles an HDF5 file BYTE BY BYTE from the
published HDF5 file-format specification (superblock v0, v1 object
headers, v1 group/chunk B-trees, local+global heaps, chunked layout with
shuffle+deflate, netCDF4 dimension scales with vlen-object-reference
DIMENSION_LIST) — sharing no code with io/hdf5_write.py (struct.pack
against spec offsets, not the writer's abstractions) — and checks the
reader decodes it exactly. A fuzz pass (truncation + byte flips) checks
the parser fails with controlled errors on corrupt input.

ref: src/framework/mpas_io.F:144-200 (MPAS_IO_NETCDF4 ingest capability).
"""

import struct
import zlib

import numpy as np
import pytest

from mpas_tpu.io.hdf5 import HDF5Error, HDF5File, read_hdf5

UNDEF = 0xFFFFFFFFFFFFFFFF


class _Buf:
    """Append-only byte buffer with 8-alignment and patch-back."""

    def __init__(self):
        self.b = bytearray()

    def align(self, n=8):
        while len(self.b) % n:
            self.b.append(0)

    def add(self, data):
        self.align()
        off = len(self.b)
        self.b += data
        return off

    def patch(self, off, data):
        self.b[off:off + len(data)] = data


def _u16(v):
    return struct.pack("<H", v)


def _u32(v):
    return struct.pack("<I", v)


def _u64(v):
    return struct.pack("<Q", v)


# -- spec-level message builders (HDF5 file format spec III/IV) -------------

def _dt_f64():
    # class 1 (float) v1; LE, IEEE f64: bitoff 0, prec 64, exp 52/11,
    # mant 0/52, bias 1023  [spec IV.A.2.d]
    return (bytes([0x11, 0x20, 0x3F, 0x00]) + _u32(8)
            + _u16(0) + _u16(64) + bytes([52, 11, 0, 52]) + _u32(1023))


def _dt_f32():
    return (bytes([0x11, 0x20, 0x1F, 0x00]) + _u32(4)
            + _u16(0) + _u16(32) + bytes([23, 8, 0, 23]) + _u32(127))


def _dt_i32():
    # class 0 fixed-point, signed LE: bitoff 0, prec 32
    return bytes([0x10, 0x08, 0x00, 0x00]) + _u32(4) + _u16(0) + _u16(32)


def _dt_str(n):
    # class 3 string, null-terminated ASCII
    return bytes([0x13, 0x00, 0x00, 0x00]) + _u32(n)


def _dt_ref():
    # class 7 reference (object reference)
    return bytes([0x17, 0x00, 0x00, 0x00]) + _u32(8)


def _dt_vlen_ref():
    # class 9 vlen sequence of object references; on-disk elem = 16 B
    return bytes([0x19, 0x00, 0x00, 0x00]) + _u32(16) + _dt_ref()


def _dt_vlen_str():
    # class 9 vlen string (type 1), ASCII
    return bytes([0x19, 0x01, 0x00, 0x00]) + _u32(16) + _dt_str(1)


def _dspace(dims):
    # dataspace message v1: version, rank, flags, 5 reserved, dims
    out = bytes([1, len(dims), 0, 0, 0, 0, 0, 0])
    for d in dims:
        out += _u64(d)
    return out


def _pad8(b):
    return bytes(b) + b"\x00" * ((-len(b)) % 8)


def _attr(name, dt, dspace, data):
    # attribute message v1: ver, reserved, name size (incl NUL),
    # datatype size, dataspace size; name/dt/dspace each padded to 8
    nm = name.encode() + b"\x00"
    return (bytes([1, 0]) + _u16(len(nm)) + _u16(len(dt))
            + _u16(len(dspace)) + _pad8(nm) + _pad8(dt) + _pad8(dspace)
            + data)


def _msg(mtype, body):
    body = _pad8(body)
    return _u16(mtype) + _u16(len(body)) + bytes([0, 0, 0, 0]) + body


def _ohdr_v1(msgs):
    blob = b"".join(msgs)
    return (bytes([1, 0]) + _u16(len(msgs)) + _u32(1) + _u32(len(blob))
            + _u32(0) + blob)


def build_fixture():
    """4x3 float32 'T' (chunked 2x2, shuffle+deflate) over dims x(4)/y(3),
    1-D contiguous f64 coordinate 'x', 1-D contiguous i32 'cellID',
    phony dim 'y', netCDF4 dimension-scale bookkeeping, root attribute."""
    buf = _Buf()
    buf.add(b"\x00" * 96)  # superblock placeholder [0, 96)

    # raw data ------------------------------------------------------------
    x_data = np.arange(4, dtype="<f8") * 2.5
    x_addr = buf.add(x_data.tobytes())
    cid = np.array([7, -3, 11, 42], dtype="<i4")
    cid_addr = buf.add(cid.tobytes())

    T = (np.arange(12, dtype="<f4") * 10.0).reshape(4, 3)
    chunks = []  # (i, j, addr, csize)
    for ci in (0, 2):
        for cj in (0, 2):
            blk = np.zeros((2, 2), dtype="<f4")
            si = min(2, 4 - ci)
            sj = min(2, 3 - cj)
            blk[:si, :sj] = T[ci:ci + si, cj:cj + sj]
            raw = blk.tobytes()
            # shuffle: byte-transpose (es=4), then deflate  [spec filters]
            a = np.frombuffer(raw, np.uint8).reshape(-1, 4)
            shuf = a.T.tobytes()
            comp = zlib.compress(shuf, 6)
            addr = buf.add(comp)
            chunks.append((ci, cj, addr, len(comp)))

    # chunk B-tree v1 (node type 1, leaf): key = {chunk bytes, filter
    # mask, offsets rank+1}, child = chunk address; n+1 keys
    bt = b"TREE" + bytes([1, 0]) + _u16(len(chunks)) + _u64(UNDEF) \
        + _u64(UNDEF)
    for (ci, cj, addr, csz) in chunks:
        bt += _u32(csz) + _u32(0) + _u64(ci) + _u64(cj) + _u64(0)
        bt += _u64(addr)
    bt += _u32(0) + _u32(0) + _u64(4) + _u64(3) + _u64(0)  # upper key
    t_btree = buf.add(bt)

    # dataset object headers ----------------------------------------------
    dscale = _attr("CLASS", _dt_str(16), _dspace(()),
                   b"DIMENSION_SCALE\x00")
    x_hdr = buf.add(_ohdr_v1([
        _msg(0x01, _dspace((4,))),
        _msg(0x03, _dt_f64()),
        _msg(0x08, bytes([3, 1]) + _u64(x_addr) + _u64(32)),
        _msg(0x0C, dscale),
        _msg(0x0C, _attr("NAME", _dt_str(2), _dspace(()), b"x\x00")),
        _msg(0x0C, _attr("_Netcdf4Dimid", _dt_i32(), _dspace(()),
                         _u32(0))),
    ]))
    yname = b"This is a netCDF dimension but not a netCDF variable." \
        b"         3\x00"
    y_hdr = buf.add(_ohdr_v1([
        _msg(0x01, _dspace((3,))),
        _msg(0x03, _dt_f32()),
        _msg(0x08, bytes([3, 1]) + _u64(UNDEF) + _u64(12)),
        _msg(0x0C, dscale),
        _msg(0x0C, _attr("NAME", _dt_str(len(yname)), _dspace(()), yname)),
        _msg(0x0C, _attr("_Netcdf4Dimid", _dt_i32(), _dspace(()),
                         _u32(1))),
    ]))

    # global heap: DIMENSION_LIST ref arrays + one vlen string ------------
    gobjs = [_u64(x_hdr), _u64(y_hdr), _u64(x_hdr), b"K"]
    gb = bytearray(b"GCOL" + bytes([1, 0, 0, 0]) + _u64(4096))
    for i, ob in enumerate(gobjs):
        gb += _u16(i + 1) + _u16(1) + _u32(0) + _u64(len(ob)) + _pad8(ob)
    gb += _u16(0) + _u16(0) + _u32(0) + _u64(4096 - len(gb) - 16)
    gb += b"\x00" * (4096 - len(gb))
    gcol = buf.add(bytes(gb))

    def hvl(nref, idx):
        return _u32(nref) + _u64(gcol) + _u32(idx)

    t_hdr = buf.add(_ohdr_v1([
        _msg(0x01, _dspace((4, 3))),
        _msg(0x03, _dt_f32()),
        _msg(0x0B, bytes([1, 2, 0, 0, 0, 0, 0, 0])
             + _u16(2) + _u16(0) + _u16(1) + _u16(1) + _u32(4)  # shuffle
             + _u16(1) + _u16(0) + _u16(1) + _u16(1) + _u32(6)),  # deflate
        _msg(0x08, bytes([3, 2, 3]) + _u64(t_btree)
             + _u32(2) + _u32(2) + _u32(4)),
        _msg(0x0C, _attr("DIMENSION_LIST", _dt_vlen_ref(), _dspace((2,)),
                         hvl(1, 1) + hvl(1, 2))),
        _msg(0x0C, _attr("units", _dt_vlen_str(), _dspace(()),
                         hvl(1, 4))),
    ]))
    cid_hdr = buf.add(_ohdr_v1([
        _msg(0x01, _dspace((4,))),
        _msg(0x03, _dt_i32()),
        _msg(0x08, bytes([3, 1]) + _u64(cid_addr) + _u64(16)),
        _msg(0x0C, _attr("DIMENSION_LIST", _dt_vlen_ref(), _dspace((1,)),
                         hvl(1, 3))),
    ]))

    # root group: local heap + SNOD + group B-tree ------------------------
    names = ["T", "cellID", "x", "y"]  # SNOD entries sorted by name
    hdrs = [t_hdr, cid_hdr, x_hdr, y_hdr]
    heap_data = bytearray(b"\x00" * 8)  # offset 0 reserved (free list)
    name_off = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        heap_data += nm.encode() + b"\x00"
        while len(heap_data) % 8:
            heap_data += b"\x00"
    heap_seg = buf.add(bytes(heap_data))
    heap = buf.add(b"HEAP" + bytes([0, 0, 0, 0]) + _u64(len(heap_data))
                   + _u64(UNDEF) + _u64(heap_seg))

    snod = b"SNOD" + bytes([1, 0]) + _u16(len(names))
    for nm, h in zip(names, hdrs):
        snod += _u64(name_off[nm]) + _u64(h) + _u32(0) + _u32(0) \
            + b"\x00" * 16
    snod_addr = buf.add(snod)

    gbt = b"TREE" + bytes([0, 0]) + _u16(1) + _u64(UNDEF) + _u64(UNDEF)
    gbt += _u64(name_off[names[0]]) + _u64(snod_addr) \
        + _u64(name_off[names[-1]])
    gbt_addr = buf.add(gbt)

    root_hdr = buf.add(_ohdr_v1([
        _msg(0x11, _u64(gbt_addr) + _u64(heap)),
        _msg(0x0C, _attr("title", _dt_str(22), _dspace(()),
                         b"hand-authored fixture\x00")),
    ]))

    # superblock v0 (spec II.A): sig, versions, sizes 8/8, leaf/internal
    # k, flags, base/free/EOF/driver addresses, root symbol-table entry
    sb = b"\x89HDF\r\n\x1a\n" + bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += _u16(4) + _u16(16) + _u32(0)
    sb += _u64(0) + _u64(UNDEF) + _u64(len(buf.b)) + _u64(UNDEF)
    sb += _u64(0) + _u64(root_hdr) + _u32(1) + _u32(0)
    sb += _u64(gbt_addr) + _u64(heap)
    buf.patch(0, sb)
    return bytes(buf.b), {"T": T, "x": x_data, "cellID": cid}


@pytest.fixture(scope="module")
def fixture_file(tmp_path_factory):
    data, arrays = build_fixture()
    p = tmp_path_factory.mktemp("foreign") / "foreign.nc"
    p.write_bytes(data)
    return p, arrays


def test_reader_decodes_foreign_bytes(fixture_file):
    path, arrays = fixture_file
    out, dims, attrs = read_hdf5(str(path))
    assert dims == {"x": 4, "y": 3}
    np.testing.assert_array_equal(out["T"], arrays["T"])
    np.testing.assert_array_equal(out["x"], arrays["x"])
    np.testing.assert_array_equal(out["cellID"], arrays["cellID"])
    assert "y" not in out  # phony dimension excluded from variables
    assert attrs["__vardims__"]["T"] == ("x", "y")
    assert attrs["__vardims__"]["cellID"] == ("x",)
    assert attrs["title"] == "hand-authored fixture"


def test_reader_decodes_attrs(fixture_file):
    path, _ = fixture_file
    f = HDF5File(str(path))
    assert f.datasets["x"].get("attrs", {}).get("CLASS") \
        == "DIMENSION_SCALE"
    assert f.datasets["T"]["attrs"]["units"] == "K"
    assert int(f.datasets["x"]["attrs"]["_Netcdf4Dimid"]) == 0


def test_partial_chunk_and_unwritten_data(fixture_file):
    """Edge chunks (2x2 chunk over the 3-wide dim) must clip; the
    never-written 'y' contiguous dataset reads as fill zeros."""
    path, arrays = fixture_file
    out, dims, _ = read_hdf5(str(path), variables=["T", "y"])
    np.testing.assert_array_equal(out["T"][:, 2], arrays["T"][:, 2])
    np.testing.assert_array_equal(out["y"], np.zeros(3, np.float32))


def _expect_controlled(data, tmp_path, i):
    p = tmp_path / f"fz{i}.nc"
    p.write_bytes(data)
    try:
        out, dims, attrs = read_hdf5(str(p), max_elements=1 << 20)
        for v in out.values():
            assert v.size <= 1 << 20
    except HDF5Error:
        pass  # controlled failure


def test_fuzz_truncation(fixture_file, tmp_path):
    data, _ = build_fixture()
    rng = np.random.default_rng(7)
    cuts = sorted(set(int(c) for c in rng.integers(0, len(data), 60)))
    for i, cut in enumerate(cuts + [8, 16, 48, 95, 96, 200]):
        _expect_controlled(data[:cut], tmp_path, i)


def test_fuzz_byteflips(fixture_file, tmp_path):
    data, _ = build_fixture()
    rng = np.random.default_rng(11)
    for i in range(120):
        buf = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(buf)))
            buf[pos] = int(rng.integers(0, 256))
        _expect_controlled(bytes(buf), tmp_path, 1000 + i)


def test_fuzz_field_corruption(fixture_file, tmp_path):
    """Targeted corruption of structurally-load-bearing fields: sizes,
    counts, addresses — the places where a naive parser loops forever or
    allocates unbounded memory."""
    data, _ = build_fixture()
    rng = np.random.default_rng(13)
    for i in range(80):
        buf = bytearray(data)
        pos = int(rng.integers(8, 256))
        width = int(rng.choice([2, 4, 8]))
        val = int(rng.choice([0, 1, 0xFF, 0xFFFF, len(data) - 1,
                              len(data), 2 ** 31, UNDEF & 0xFFFFFFFF]))
        val &= (1 << (8 * width)) - 1
        buf[pos:pos + width] = val.to_bytes(width, "little")
        _expect_controlled(bytes(buf), tmp_path, 2000 + i)
