"""netCDF-4 (HDF5) codec tests.

The container has no libhdf5/h5py, so the reader can't be exercised against
library-written files; instead correctness rests on three legs:
  1. roundtrips through our own writer (write -> read -> identical arrays),
  2. golden byte-level assertions that the written structures match the
     public HDF5 File Format Specification (signatures, superblock fields,
     object-header layout) — this breaks the writer/reader circularity,
  3. negative tests that unsupported features raise the named Hdf5Error.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ophidia_server_spark.sources import hdf5
from ophidia_server_spark.sources.netcdf3 import Dataset, Variable


def _cube(compress=None, chunk_rows=None, tmp_path=None, name="t.nc"):
    ds = Dataset()
    ds.dimensions = {"time": 4, "lat": 3, "lon": 2}
    ds.attributes = {"title": "roundtrip cube", "version": 2}
    ds.variables["time"] = Variable(
        "time", ("time",), {"units": "hours since 2001-01-01"},
        np.arange(4, dtype="f8"),
    )
    ds.variables["lat"] = Variable(
        "lat", ("lat",), {"units": "degrees_north"}, np.array([10, 20, 30], "f4")
    )
    ds.variables["temperature"] = Variable(
        "temperature", ("time", "lat", "lon"),
        {"units": "K", "_FillValue": np.float32(-999.0)},
        np.arange(24, dtype="f4").reshape(4, 3, 2) + 0.5,
    )
    ds.variables["counts"] = Variable(
        "counts", ("time", "lat", "lon"), {},
        (np.arange(24, dtype="i4") * 7).reshape(4, 3, 2),
    )
    p = str(tmp_path / name)
    hdf5.write(p, ds, compress=compress, chunk_rows=chunk_rows)
    return ds, p


def test_contiguous_roundtrip(tmp_path):
    ds, p = _cube(tmp_path=tmp_path)
    back = hdf5.read(p)
    assert back.dimensions == {"lat": 3, "lon": 2, "time": 4}
    assert back.attributes == {"title": "roundtrip cube", "version": 2}
    for name in ("time", "lat", "temperature", "counts"):
        assert np.array_equal(back.variables[name].data, ds.variables[name].data)
        assert back.variables[name].data.dtype == ds.variables[name].data.dtype
    assert back.variables["temperature"].dimensions == ("time", "lat", "lon")
    assert back.variables["temperature"].attributes["units"] == "K"
    assert back.variables["temperature"].attributes["_FillValue"] == -999.0


def test_chunked_deflate_shuffle_roundtrip(tmp_path):
    ds, p = _cube(compress=4, chunk_rows=2, tmp_path=tmp_path)
    back = hdf5.read(p)
    for name in ("temperature", "counts", "time", "lat"):
        assert np.array_equal(back.variables[name].data, ds.variables[name].data)


def test_compression_actually_compresses(tmp_path):
    import os

    ds = Dataset()
    ds.dimensions = {"x": 20000}
    ds.variables["v"] = Variable("v", ("x",), {}, np.zeros(20000, "f8"))
    raw = str(tmp_path / "raw.nc")
    comp = str(tmp_path / "comp.nc")
    hdf5.write(raw, ds)
    hdf5.write(comp, ds, compress=6, chunk_rows=5000)
    assert os.path.getsize(raw) > 160000
    assert os.path.getsize(comp) < 20000
    assert np.array_equal(hdf5.read(comp).variables["v"].data, np.zeros(20000))


def test_phony_dims_without_coordinates(tmp_path):
    # dims that carry no coordinate variable become phony dimension scales;
    # reading back must keep the dim sizes and not invent data variables
    ds = Dataset()
    ds.dimensions = {"a": 5, "b": 7}
    ds.variables["m"] = Variable(
        "m", ("a", "b"), {}, np.arange(35, dtype="f4").reshape(5, 7)
    )
    p = str(tmp_path / "p.nc")
    hdf5.write(p, ds)
    back = hdf5.read(p)
    assert back.dimensions == {"a": 5, "b": 7}
    assert list(back.variables) == ["m"]
    assert back.variables["m"].dimensions == ("a", "b")


# ---------------------------------------------------------------------------
# golden structural assertions against the public spec (not our reader)
# ---------------------------------------------------------------------------

def test_superblock_v0_spec_layout(tmp_path):
    _, p = _cube(tmp_path=tmp_path)
    buf = open(p, "rb").read()
    # signature (spec II.A): \x89HDF\r\n\x1a\n at offset 0
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    # superblock v0: versions 0, sizeof(offsets)=sizeof(lengths)=8
    assert buf[8] == 0 and buf[9] == 0 and buf[10] == 0
    assert buf[13] == 8 and buf[14] == 8
    # group leaf / internal node k
    leaf_k, internal_k = struct.unpack_from("<HH", buf, 16)
    assert leaf_k > 0 and internal_k > 0
    # end-of-file address == actual file size
    eof = struct.unpack_from("<Q", buf, 40)[0]
    assert eof == len(buf)
    # root symbol-table entry's object header address points at a v1 header
    root_oh = struct.unpack_from("<Q", buf, 64)[0]
    assert buf[root_oh] == 1  # object header version 1


def test_group_structures_spec_signatures(tmp_path):
    _, p = _cube(tmp_path=tmp_path)
    buf = open(p, "rb").read()
    # spec III.A/III.C/III.D: B-tree, local heap, symbol node signatures
    assert b"TREE" in buf and b"HEAP" in buf and b"SNOD" in buf
    # global heap present (DIMENSION_LIST vlen references)
    assert b"GCOL" in buf
    # SNOD: version 1, symbol count == number of root objects (5: the three
    # dimension scales — time/lat coordinates + phony lon — plus 2 data vars)
    i = buf.index(b"SNOD")
    assert buf[i + 4] == 1
    nsym = struct.unpack_from("<H", buf, i + 6)[0]
    assert nsym == 5


def test_chunk_btree_and_filter_pipeline_spec(tmp_path):
    _, p = _cube(compress=4, chunk_rows=2, tmp_path=tmp_path)
    buf = open(p, "rb").read()
    # chunk B-tree nodes are node-type 1 (raw data); at least one exists
    found = False
    i = -1
    while True:
        i = buf.find(b"TREE", i + 1)
        if i < 0:
            break
        if buf[i + 4] == 1:  # node type 1 = raw data chunk
            found = True
            nchunks = struct.unpack_from("<H", buf, i + 6)[0]
            assert nchunks >= 1
    assert found
    # a deflated chunk payload must be valid zlib (spec: filter id 1)
    back = hdf5.read(p)
    assert np.array_equal(
        back.variables["temperature"].data,
        np.arange(24, dtype="f4").reshape(4, 3, 2) + 0.5,
    )


def test_shuffle_filter_bytes(tmp_path):
    # decode one chunk by hand: unshuffling the zlib-inflated payload must
    # yield the first chunk rows — validates the byte transform against the
    # spec definition (all byte 0s, then all byte 1s, ...), not our reader
    ds = Dataset()
    ds.dimensions = {"x": 4}
    data = np.array([1.0, 2.0, 3.0, 4.0], "<f8")
    ds.variables["v"] = Variable("v", ("x",), {}, data)
    p = str(tmp_path / "s.nc")
    hdf5.write(p, ds, compress=1, chunk_rows=4)
    buf = open(p, "rb").read()
    # find the zlib stream (0x78 preamble) that inflates to 32 bytes
    payload = None
    for i in range(len(buf) - 2):
        if buf[i] == 0x78:
            try:
                cand = zlib.decompress(buf[i:])
                if len(cand) == 32:
                    payload = cand
                    break
            except zlib.error:
                continue
    assert payload is not None
    unshuffled = np.frombuffer(payload, np.uint8).reshape(8, 4).T.tobytes()
    assert np.frombuffer(unshuffled, "<f8").tolist() == [1.0, 2.0, 3.0, 4.0]


def test_netcdf4_dimension_scale_convention(tmp_path):
    # the netCDF-4 mapping rides on attributes CLASS/NAME/DIMENSION_LIST;
    # their on-disk names must appear so other netCDF readers find them
    _, p = _cube(tmp_path=tmp_path)
    buf = open(p, "rb").read()
    assert b"DIMENSION_SCALE" in buf
    assert b"DIMENSION_LIST" in buf
    assert b"This is a netCDF dimension but not a netCDF variable" in buf
    assert b"_Netcdf4Dimid" in buf


# ---------------------------------------------------------------------------
# negative paths
# ---------------------------------------------------------------------------

def test_unsupported_features_raise_named_error(tmp_path):
    p = str(tmp_path / "bad.nc")
    open(p, "wb").write(b"not an hdf5 file at all" + b"\x00" * 100)
    with pytest.raises(hdf5.Hdf5Error, match="signature"):
        hdf5.read(p)


def test_truncated_superblock_raises(tmp_path):
    p = str(tmp_path / "trunc.nc")
    open(p, "wb").write(b"\x89HDF\r\n\x1a\n" + bytes([9]) + b"\x00" * 40)
    with pytest.raises(hdf5.Hdf5Error, match="superblock version"):
        hdf5.read(p)


def test_int64_and_strings_roundtrip(tmp_path):
    ds = Dataset()
    ds.dimensions = {"x": 3}
    ds.variables["big"] = Variable(
        "big", ("x",), {"note": "int64 survives netCDF-4 (unlike classic)"},
        np.array([2**40, -(2**40), 7], "i8"),
    )
    p = str(tmp_path / "i8.nc")
    hdf5.write(p, ds)
    back = hdf5.read(p)
    assert back.variables["big"].data.tolist() == [2**40, -(2**40), 7]
    assert back.variables["big"].data.dtype == np.dtype("<i8")
    assert back.variables["big"].attributes["note"].startswith("int64")


def test_unlimited_record_dim_roundtrip(tmp_path):
    # the netCDF-4 twin of the classic record-variable roundtrip: an
    # unlimited dim writes as a chunked dataset with H5S_UNLIMITED maxdims
    # and reads back as dimensions[dim] = None with the actual record count
    # on each variable's shape — matching netcdf3.read semantics exactly
    ds = Dataset()
    ds.dimensions = {"time": None, "x": 3}
    ds.variables["r1"] = Variable(
        "r1", ("time", "x"), {}, np.arange(12, dtype="f8").reshape(4, 3)
    )
    ds.variables["r2"] = Variable("r2", ("time",), {}, np.array([7, 8, 9, 10], "i4"))
    p = str(tmp_path / "rec4.nc")
    hdf5.write(p, ds)  # no compression: chunked layout still required
    back = hdf5.read(p)
    assert back.dimensions == {"time": None, "x": 3}
    assert np.array_equal(back.variables["r1"].data, ds.variables["r1"].data)
    assert back.variables["r2"].data.tolist() == [7, 8, 9, 10]
    # and with deflate on top
    p2 = str(tmp_path / "rec4z.nc")
    hdf5.write(p2, ds, compress=4, chunk_rows=2)
    back2 = hdf5.read(p2)
    assert back2.dimensions["time"] is None
    assert np.array_equal(back2.variables["r1"].data, ds.variables["r1"].data)


def test_read_superblock_v3_ohdr_v2_link_messages(tmp_path):
    # Handcrafted per spec: superblock v3 + version-2 object headers (OHDR)
    # with in-header link messages — the layout libhdf5 writes under
    # libver=v18+ — exercising the reader paths our own writer never emits.
    import struct as _s

    UNDEF = 0xFFFFFFFFFFFFFFFF

    def ohdr(messages: bytes) -> bytes:
        # OHDR, version 2, flags 0x00 (1-byte chunk0 size), no times
        body = _s.pack("<4sBBB", b"OHDR", 2, 0, len(messages)) + messages
        return body + b"\x00" * 4  # checksum (unverified by the reader)

    def msg(mtype: int, data: bytes) -> bytes:
        return _s.pack("<BHB", mtype, len(data), 0) + data

    # dataset payload: 5 little-endian int32
    data = np.arange(5, dtype="<i4")

    # file layout plan (addresses fixed by construction)
    sb_size = 12 + 8 * 4 + 4          # sig..sizes(12) + 4 addrs + checksum
    data_addr = 256
    dset_addr = 320
    root_addr = 512

    dt_msg = _s.pack("<B3BI", 0x10, 0x08, 0, 0, 4) + _s.pack("<HH", 0, 32)
    ds_msg = _s.pack("<BBBB", 2, 1, 0, 1) + _s.pack("<Q", 5)  # dataspace v2
    lay_msg = _s.pack("<BBQQ", 3, 1, data_addr, data.nbytes)
    dset = ohdr(msg(0x01, ds_msg) + msg(0x03, dt_msg) + msg(0x08, lay_msg))

    # root group: one hard link message "v" -> dset_addr
    name = b"v"
    link = _s.pack("<BB", 1, 0) + bytes([len(name)]) + name + _s.pack("<Q", dset_addr)
    root = ohdr(msg(0x06, link))

    eof = root_addr + len(root)
    sb = b"\x89HDF\r\n\x1a\n" + _s.pack("<BBBB", 3, 8, 8, 0)
    sb += _s.pack("<QQQQ", 0, UNDEF, eof, root_addr)
    sb += b"\x00" * 4  # superblock checksum (unverified)

    buf = bytearray(eof)
    buf[: len(sb)] = sb
    buf[data_addr : data_addr + data.nbytes] = data.tobytes()
    buf[dset_addr : dset_addr + len(dset)] = dset
    buf[root_addr : root_addr + len(root)] = root

    p = str(tmp_path / "v3.h5")
    open(p, "wb").write(bytes(buf))
    ds = hdf5.read(p)
    assert ds.variables["v"].data.tolist() == [0, 1, 2, 3, 4]
    assert ds.variables["v"].dimensions == ("phony_dim_0",)
    assert ds.dimensions == {"phony_dim_0": 5}


def test_parse_big_endian_datatypes():
    # external writers may store big-endian payloads; the datatype parser
    # must honor the byte-order bit (spec class 0/1 bit field, bit 0)
    import struct as _s

    from ophidia_server_spark.sources.hdf5 import _parse_datatype

    be_int = _s.pack("<B3BI", 0x10, 0x09, 0, 0, 4) + _s.pack("<HH", 0, 32)
    dt, used = _parse_datatype(be_int, 0)
    assert dt.np_dtype == np.dtype(">i4") and used == 12

    be_f8 = (
        _s.pack("<B3BI", 0x11, 0x21, 63, 0, 8)
        + _s.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    )
    dt, used = _parse_datatype(be_f8, 0)
    assert dt.np_dtype == np.dtype(">f8") and used == 20


def test_read_nested_groups_v2_headers(tmp_path):
    # nested netCDF-4 groups: a root OHDR links to a GROUP header which
    # links to the dataset — names become slash-joined paths
    import struct as _s

    UNDEF = 0xFFFFFFFFFFFFFFFF

    def ohdr(messages: bytes) -> bytes:
        return _s.pack("<4sBBB", b"OHDR", 2, 0, len(messages)) + messages + b"\x00" * 4

    def msg(mtype: int, data: bytes) -> bytes:
        return _s.pack("<BHB", mtype, len(data), 0) + data

    def hard_link(name: bytes, addr: int) -> bytes:
        return msg(0x06, _s.pack("<BB", 1, 0) + bytes([len(name)]) + name + _s.pack("<Q", addr))

    data = np.array([4.0, 5.0], "<f8")
    data_addr, dset_addr, grp_addr, root_addr = 256, 320, 512, 640

    dt = _s.pack("<B3BI", 0x11, 0x20, 63, 0, 8) + _s.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    sp = _s.pack("<BBBB", 2, 1, 0, 1) + _s.pack("<Q", 2)
    lay = _s.pack("<BBQQ", 3, 1, data_addr, data.nbytes)
    dset = ohdr(msg(0x01, sp) + msg(0x03, dt) + msg(0x08, lay))
    grp = ohdr(hard_link(b"v", dset_addr))
    root = ohdr(hard_link(b"sub", grp_addr))

    eof = root_addr + len(root)
    sb = b"\x89HDF\r\n\x1a\n" + _s.pack("<BBBB", 3, 8, 8, 0)
    sb += _s.pack("<QQQQ", 0, UNDEF, eof, root_addr) + b"\x00" * 4

    buf = bytearray(eof)
    buf[: len(sb)] = sb
    buf[data_addr : data_addr + data.nbytes] = data.tobytes()
    buf[dset_addr : dset_addr + len(dset)] = dset
    buf[grp_addr : grp_addr + len(grp)] = grp
    buf[root_addr : root_addr + len(root)] = root
    p = str(tmp_path / "nested.h5")
    open(p, "wb").write(bytes(buf))

    ds = hdf5.read(p)
    assert "sub/v" in ds.variables
    assert ds.variables["sub/v"].data.tolist() == [4.0, 5.0]


def test_selective_variable_decode(tmp_path):
    # read(variables={...}) must skip other data variables entirely while
    # always decoding dimension scales; a corrupted unrequested chunk
    # proves the skip (its decode would raise)
    ds = Dataset()
    ds.dimensions = {"x": 8}
    ds.variables["x"] = Variable("x", ("x",), {}, np.arange(8, dtype="f8"))
    ds.variables["want"] = Variable("want", ("x",), {}, np.arange(8, dtype="f4"))
    ds.variables["skip"] = Variable("skip", ("x",), {}, np.ones(8, "f8"))
    p = str(tmp_path / "sel.nc")
    hdf5.write(p, ds, compress=4, chunk_rows=8)
    back = hdf5.read(p, variables={"want"})
    assert set(back.variables) == {"x", "want"}  # scales always present
    assert np.array_equal(back.variables["want"].data, ds.variables["want"].data)


def test_filter_mask_skips_only_masked_filters():
    # spec: the chunk's filter mask is per-filter (bit i = pipeline filter i
    # skipped at write time), NOT all-or-nothing. Pipeline [shuffle, deflate]
    # like our writer emits; decode reverses the unskipped subset.
    data = np.arange(16, dtype="f8").tobytes()
    filters = [(2, (8,)), (1, ())]  # shuffle(elem=8) then deflate

    def shuffle(b, s):
        n = len(b) // s
        return np.frombuffer(b, np.uint8).reshape(n, s).T.tobytes()

    full = zlib.compress(shuffle(data, 8))
    only_deflate = zlib.compress(data)        # shuffle (filter 0) skipped
    only_shuffle = shuffle(data, 8)           # deflate (filter 1) skipped

    df = hdf5._H5Reader._defilter
    assert df(None, full, filters, 0) == data
    assert df(None, only_deflate, filters, 0b01) == data
    assert df(None, only_shuffle, filters, 0b10) == data
    assert df(None, data, filters, 0b11) == data


def test_unlimited_dim_subset_without_coordinate(tmp_path):
    # hyperslab on an unlimited (record) dim that has NO coordinate variable:
    # the fallback index coords must use the record count, not arange(0)
    from ophidia_server_spark.operators.io_ops import _hyperslab_mask

    ds = Dataset()
    ds.dimensions = {"time": None, "x": 3}
    ds.variables["r1"] = Variable(
        "r1", ("time", "x"), {}, np.arange(12, dtype="f8").reshape(4, 3)
    )
    p = str(tmp_path / "rec_nocoord.nc")
    hdf5.write(p, ds)
    back = hdf5.read(  # 1-based index triplets (oph_subset_library semantics)
        p, subset={"time": "2:3"}, subset_type="index", mask_fn=_hyperslab_mask
    )
    assert back.variables["r1"].data.tolist() == [
        [3.0, 4.0, 5.0], [6.0, 7.0, 8.0],
    ]


# ---------------------------------------------------------------------------
# version-4 chunk indexes + dense attributes (libver=latest file shapes)
# ---------------------------------------------------------------------------

def _ohdr2(messages: bytes) -> bytes:
    return struct.pack("<4sBBB", b"OHDR", 2, 0, len(messages)) + messages + b"\x00" * 4


def _msg2(mtype: int, data: bytes) -> bytes:
    return struct.pack("<BHB", mtype, len(data), 0) + data


def _sb3(root_addr: int, eof: int) -> bytes:
    sb = b"\x89HDF\r\n\x1a\n" + struct.pack("<BBBB", 3, 8, 8, 0)
    return sb + struct.pack("<QQQQ", 0, 0xFFFFFFFFFFFFFFFF, eof, root_addr) + b"\x00" * 4


_DT_I4 = struct.pack("<B3BI", 0x10, 0x08, 0, 0, 4) + struct.pack("<HH", 0, 32)


def _dspace1d(n: int) -> bytes:
    return struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", n)


def _lay4_chunked(chunk: int, itype: int, addr: int, *, flags: int = 0,
                  extra: bytes = b"") -> bytes:
    # layout v4 class 2: flags, ndim=1, 8-byte dim encoding, index type,
    # index-specific info, then the index/chunk address
    return (
        struct.pack("<BBBBB", 4, 2, flags, 1, 8)
        + struct.pack("<Q", chunk)
        + bytes([itype])
        + extra
        + struct.pack("<Q", addr)
    )


def _write_v4_file(tmp_path, name, dset_msgs: bytes, payload: dict[int, bytes]):
    """Assemble a superblock-v3 file: root group OHDR links 'v' -> dataset
    OHDR built from dset_msgs; payload maps address -> raw bytes."""
    dset_addr, root_addr = 2048, 3072
    dset = _ohdr2(dset_msgs)
    link = struct.pack("<BB", 1, 0) + bytes([1]) + b"v" + struct.pack("<Q", dset_addr)
    root = _ohdr2(_msg2(0x06, link))
    eof = max([root_addr + len(root)] + [a + len(b) for a, b in payload.items()])
    buf = bytearray(eof)
    buf[:48] = _sb3(root_addr, eof)
    for a, b in payload.items():
        buf[a : a + len(b)] = b
    buf[dset_addr : dset_addr + len(dset)] = dset
    buf[root_addr : root_addr + len(root)] = root
    p = str(tmp_path / name)
    open(p, "wb").write(bytes(buf))
    return p


def test_v4_single_chunk_index(tmp_path):
    data = np.arange(5, dtype="<i4")
    lay = _lay4_chunked(5, 1, 256)
    msgs = _msg2(0x01, _dspace1d(5)) + _msg2(0x03, _DT_I4) + _msg2(0x08, lay)
    p = _write_v4_file(tmp_path, "v4single.h5", msgs, {256: data.tobytes()})
    assert hdf5.read(p).variables["v"].data.tolist() == [0, 1, 2, 3, 4]


def test_v4_single_chunk_filtered_with_mask(tmp_path):
    data = np.arange(5, dtype="<i4")
    comp = zlib.compress(data.tobytes(), 6)
    filt = struct.pack("<BBHHH", 2, 1, 1, 0, 1) + struct.pack("<I", 6)  # deflate(6)
    # filtered single chunk: flags bit 1 -> size + mask precede the address
    lay = _lay4_chunked(
        5, 1, 256, flags=0x02,
        extra=struct.pack("<QI", len(comp), 0),
    )
    msgs = (
        _msg2(0x01, _dspace1d(5)) + _msg2(0x03, _DT_I4)
        + _msg2(0x0B, filt) + _msg2(0x08, lay)
    )
    p = _write_v4_file(tmp_path, "v4sf.h5", msgs, {256: comp})
    assert hdf5.read(p).variables["v"].data.tolist() == [0, 1, 2, 3, 4]

    # mask bit 0 set: deflate was skipped at write -> chunk stored raw
    lay2 = _lay4_chunked(
        5, 1, 256, flags=0x02,
        extra=struct.pack("<QI", data.nbytes, 1),
    )
    msgs2 = (
        _msg2(0x01, _dspace1d(5)) + _msg2(0x03, _DT_I4)
        + _msg2(0x0B, filt) + _msg2(0x08, lay2)
    )
    p2 = _write_v4_file(tmp_path, "v4sfm.h5", msgs2, {256: data.tobytes()})
    assert hdf5.read(p2).variables["v"].data.tolist() == [0, 1, 2, 3, 4]


def test_v4_implicit_index(tmp_path):
    data = np.arange(6, dtype="<i4")
    lay = _lay4_chunked(2, 2, 256)  # 3 dense chunks of 2 els at 256
    msgs = _msg2(0x01, _dspace1d(6)) + _msg2(0x03, _DT_I4) + _msg2(0x08, lay)
    p = _write_v4_file(tmp_path, "v4imp.h5", msgs, {256: data.tobytes()})
    assert hdf5.read(p).variables["v"].data.tolist() == list(range(6))


def test_v4_fixed_array_index(tmp_path):
    # 2-chunk grid (chunk 4, shape 6): FAHD at 256 -> FADB at 320, chunks at
    # 512/640; second chunk is partial (reader clips at the dataset edge)
    data = np.arange(6, dtype="<i4")
    c0 = data[:4].tobytes()
    c1 = data[4:].tobytes() + b"\x00" * 8  # full chunk stored, tail ignored
    fahd = (
        b"FAHD" + struct.pack("<BBBB", 0, 0, 8, 10)
        + struct.pack("<QQ", 2, 320) + b"\x00" * 4
    )
    fadb = b"FADB" + struct.pack("<BB", 0, 0) + struct.pack("<Q", 256)
    fadb += struct.pack("<QQ", 512, 640) + b"\x00" * 4
    lay = _lay4_chunked(4, 3, 256, extra=bytes([10]))  # page bits
    msgs = _msg2(0x01, _dspace1d(6)) + _msg2(0x03, _DT_I4) + _msg2(0x08, lay)
    p = _write_v4_file(
        tmp_path, "v4fa.h5", msgs, {256: fahd, 320: fadb, 512: c0, 640: c1}
    )
    assert hdf5.read(p).variables["v"].data.tolist() == list(range(6))


def test_v4_fixed_array_filtered(tmp_path):
    # client-id 1 elements: addr(8) + 4-byte size + mask; deflated chunks
    data = np.arange(8, dtype="<i4")
    c0 = zlib.compress(data[:4].tobytes(), 6)
    c1 = zlib.compress(data[4:].tobytes(), 6)
    fahd = (
        b"FAHD" + struct.pack("<BBBB", 0, 1, 16, 10)
        + struct.pack("<QQ", 2, 320) + b"\x00" * 4
    )
    fadb = b"FADB" + struct.pack("<BB", 0, 1) + struct.pack("<Q", 256)
    fadb += struct.pack("<QII", 512, len(c0), 0)
    fadb += struct.pack("<QII", 640, len(c1), 0) + b"\x00" * 4
    filt = struct.pack("<BBHHH", 2, 1, 1, 0, 1) + struct.pack("<I", 6)
    lay = _lay4_chunked(4, 3, 256, extra=bytes([10]))
    msgs = (
        _msg2(0x01, _dspace1d(8)) + _msg2(0x03, _DT_I4)
        + _msg2(0x0B, filt) + _msg2(0x08, lay)
    )
    p = _write_v4_file(
        tmp_path, "v4faf.h5", msgs, {256: fahd, 320: fadb, 512: c0, 640: c1}
    )
    assert hdf5.read(p).variables["v"].data.tolist() == list(range(8))


def test_v4_index_garbage_raises_named_error(tmp_path):
    # itype 4/5 are implemented now (round 6); an index address pointing at
    # garbage must still fail with a *named* signature error, not decode junk
    for itype, frag in ((4, "extensible-array header"), (5, "B-tree header")):
        extra = b"\x00" * 6
        lay = _lay4_chunked(4, itype, 256, extra=extra)
        msgs = _msg2(0x01, _dspace1d(8)) + _msg2(0x03, _DT_I4) + _msg2(0x08, lay)
        p = _write_v4_file(tmp_path, f"v4bad{itype}.h5", msgs, {})
        with pytest.raises(hdf5.Hdf5Error, match=frag):
            hdf5.read(p)


def test_dense_attribute_storage(tmp_path):
    # ATTRINFO -> fractal heap (root direct block) + name-index v2 B-tree
    # (depth 0) — the storage libhdf5 switches to above its compact limit
    def attr_msg(name: bytes, value: int) -> bytes:
        scalar_sp = struct.pack("<BBBB", 2, 0, 0, 0)
        body = struct.pack("<BBHHHB", 3, 0, len(name) + 1, len(_DT_I4),
                           len(scalar_sp), 0)
        return body + name + b"\x00" + _DT_I4 + scalar_sp + struct.pack("<i", value)

    a1, a2 = attr_msg(b"alpha", 7), attr_msg(b"beta", 42)
    # FHDB header = sig(4)+ver(1)+heapaddr(8)+blockoff(4) = 17 bytes; heap
    # offsets address block space including the header
    fhdb_addr, frhp_addr, bt_addr, leaf_addr = 320, 256 + 768, 1280, 1408
    fhdb = (
        b"FHDB" + struct.pack("<B", 0) + struct.pack("<Q", frhp_addr)
        + struct.pack("<I", 0) + a1 + a2
    )
    off1, off2 = 17, 17 + len(a1)
    frhp = (
        b"FRHP" + struct.pack("<BHHB", 0, 8, 0, 0)
        + struct.pack("<I", 4096) + struct.pack("<Q", 0) * 12
        + struct.pack("<H", 4)        # table width
        + struct.pack("<QQ", 512, 4096)  # starting / max direct block size
        + struct.pack("<HH", 32, 1)   # max heap bits (off size 4), start rows
        + struct.pack("<QH", fhdb_addr, 0)  # root block addr, cur rows 0
        + b"\x00" * 4
    )

    def heap_id(off: int, length: int) -> bytes:
        return bytes([0]) + off.to_bytes(4, "little") + length.to_bytes(3, "little")

    def rec(off: int, length: int) -> bytes:
        return heap_id(off, length) + b"\x00" * 9  # flags + corder + hash

    leaf = b"BTLF" + struct.pack("<BB", 0, 8) + rec(off1, len(a1)) + rec(off2, len(a2))
    leaf += b"\x00" * 4
    bthd = (
        b"BTHD" + struct.pack("<BB", 0, 8) + struct.pack("<I", 2048)
        + struct.pack("<HH", 17, 0)   # record size, depth
        + struct.pack("<BB", 100, 40)
        + struct.pack("<QH", leaf_addr, 2) + struct.pack("<Q", 2) + b"\x00" * 4
    )

    data = np.arange(3, dtype="<i4")
    attrinfo = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bt_addr)
    lay = struct.pack("<BBQQ", 3, 1, 256, data.nbytes)
    msgs = (
        _msg2(0x01, _dspace1d(3)) + _msg2(0x03, _DT_I4)
        + _msg2(0x08, lay) + _msg2(0x15, attrinfo)
    )
    p = _write_v4_file(
        tmp_path, "dense_attrs.h5", msgs,
        {256: data.tobytes(), fhdb_addr: fhdb, frhp_addr: frhp,
         bt_addr: bthd, leaf_addr: leaf},
    )
    ds = hdf5.read(p)
    assert ds.variables["v"].attributes == {"alpha": 7, "beta": 42}
    assert ds.variables["v"].data.tolist() == [0, 1, 2]


_DT_F8 = struct.pack("<B3BI", 0x11, 0x20, 63, 0, 8) + struct.pack(
    "<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023
)


def test_compound_datatype_v3_contiguous(tmp_path):
    # station-record style compound {t: i4 @0, val: f8 @4}, packed itemsize 12
    # encoded as a version-3 datatype message (bare names, 1-byte offsets)
    cdt = (
        struct.pack("<B3BI", 0x36, 0x02, 0, 0, 12)
        + b"t\x00" + bytes([0]) + _DT_I4
        + b"val\x00" + bytes([4]) + _DT_F8
    )
    rec = np.dtype([("t", "<i4"), ("val", "<f8")])
    data = np.array([(1, 1.5), (2, 2.5), (3, 3.5)], rec)
    lay = struct.pack("<BBQQ", 3, 1, 256, data.nbytes)
    msgs = _msg2(0x01, _dspace1d(3)) + _msg2(0x03, cdt) + _msg2(0x08, lay)
    p = _write_v4_file(tmp_path, "compound3.h5", msgs, {256: data.tobytes()})
    got = hdf5.read(p).variables["v"].data
    assert got.dtype.names == ("t", "val")
    assert got["t"].tolist() == [1, 2, 3]
    assert got["val"].tolist() == [1.5, 2.5, 3.5]


def test_compound_datatype_v1_chunked_deflate(tmp_path):
    # version-1 member encoding (8-padded names + 28 bytes of dims/perm
    # bookkeeping) on a v4 single-chunk deflated dataset
    def member_v1(name: bytes, off: int, dtmsg: bytes) -> bytes:
        pad = name + b"\x00"
        pad += b"\x00" * ((8 - len(pad) % 8) % 8)
        return pad + struct.pack("<I", off) + b"\x00" * 28 + dtmsg

    cdt = (
        struct.pack("<B3BI", 0x16, 0x02, 0, 0, 12)
        + member_v1(b"t", 0, _DT_I4)
        + member_v1(b"val", 4, _DT_F8)
    )
    rec = np.dtype([("t", "<i4"), ("val", "<f8")])
    data = np.array([(7, 0.5), (8, 0.25)], rec)
    comp = zlib.compress(data.tobytes(), 6)
    filt = struct.pack("<BBHHH", 2, 1, 1, 0, 1) + struct.pack("<I", 6)
    lay = _lay4_chunked(2, 1, 256, flags=0x02, extra=struct.pack("<QI", len(comp), 0))
    msgs = (
        _msg2(0x01, _dspace1d(2)) + _msg2(0x03, cdt)
        + _msg2(0x0B, filt) + _msg2(0x08, lay)
    )
    p = _write_v4_file(tmp_path, "compound1.h5", msgs, {256: comp})
    got = hdf5.read(p).variables["v"].data
    assert got["t"].tolist() == [7, 8]
    assert got["val"].tolist() == [0.5, 0.25]


def test_defilter_registered_zstd_lz4_blosc():
    # registered third-party filters (zstd 32015, lz4 32004, blosc 32001)
    # decode through the shared codec shims; the pipeline runs in reverse
    # declaration order like the built-in filters
    import struct

    import numpy as np
    import pyarrow as pa

    from ophidia_server_spark.sources import lz4blosc as lb
    from ophidia_server_spark.sources.codecs import zstd_compress
    from ophidia_server_spark.sources.hdf5 import _H5Reader

    raw = np.arange(1024, dtype="<f8").tobytes()
    # zstd: one frame per chunk, size from the frame's FCS field
    out = _H5Reader._defilter(None, zstd_compress(raw), [(32015, [])])
    assert out == raw
    # lz4 plugin framing: u64be orig + u32be blocksize + per-block
    # [u32be csize][block]; exercise multi-block and a stored block
    bsize = 4096
    payload = struct.pack(">QI", len(raw), bsize)
    for off in range(0, len(raw), bsize):
        part = raw[off : off + bsize]
        comp = bytes(pa.Codec("lz4_raw").compress(part))
        if off == 0:  # force one stored block (csize == block size)
            comp = part
        payload += struct.pack(">I", len(comp)) + comp
    out = _H5Reader._defilter(None, payload, [(32004, [0, 0, 0, 0, bsize, 0, 0])])
    assert out == raw
    # blosc plugin: the chunk payload is a blosc1 frame
    frame = lb.blosc_compress(raw, 8)
    out = _H5Reader._defilter(None, frame, [(32001, [2, 2, 8, len(raw), 5, 1, 1])])
    assert out == raw
    # shuffle+zstd pipeline composes (reverse order: zstd first, then unshuffle)
    shuf = lb._shuffle(raw, 8)
    out = _H5Reader._defilter(None, zstd_compress(shuf), [(2, [8]), (32015, [])])
    assert out == raw


def test_chunked_zstd_shuffle_roundtrip(tmp_path):
    # compress="zstd" writes shuffle + the registered zstd filter (32015);
    # the reader reverses the pipeline through the shared codec shim
    ds, p = _cube(compress="zstd", chunk_rows=2, tmp_path=tmp_path, name="z.nc")
    back = hdf5.read(p)
    for name in ("temperature", "counts", "time", "lat"):
        assert np.array_equal(back.variables[name].data, ds.variables[name].data)
    # the declared pipeline really is shuffle+zstd (reader-visible)
    from ophidia_server_spark.sources.hdf5 import _H5Reader

    r = _H5Reader(open(p, "rb").read())
    root = r.read_object(r.root_addr, "/")
    temp = next(c for c in root.children if c.name == "temperature")
    assert [f for f, _ in temp.filters] == [2, 32015]


# ---------------------------------------------------------------------------
# round 6: v4 chunk indexes — Extensible Array and version-2 B-tree
# (spec: Data Layout v4 index types 4/5; appendix "Extensible Array";
# reference ingest surface oph_json_objkeys.h:114)
# ---------------------------------------------------------------------------

def _rec_ds(nt: int):
    ds = Dataset()
    ds.dimensions = {"time": None, "lat": 3}
    ds.variables["time"] = Variable("time", ("time",), {}, np.arange(nt, dtype="f8"))
    ds.variables["lat"] = Variable("lat", ("lat",), {}, np.array([0.0, 10.0, 20.0]))
    ds.variables["tas"] = Variable(
        "tas", ("time", "lat"), {"units": "K"},
        np.arange(nt * 3, dtype="f8").reshape(nt, 3),
    )
    return ds


@pytest.mark.parametrize(
    "nt,chunk_rows,compress",
    [
        (3, 1, None),     # all elements fit in the EAIB index block
        (50, 1, None),    # spills into direct data blocks + super blocks
        (300, 1, None),   # multiple super blocks
        (40, 2, 4),       # filtered elements (addr + size + mask)
    ],
)
def test_earray_roundtrip(tmp_path, nt, chunk_rows, compress):
    ds = _rec_ds(nt)
    p = str(tmp_path / "ea.nc")
    hdf5.write(p, ds, compress=compress, chunk_rows=chunk_rows, index="earray")
    back = hdf5.read(p)
    assert back.dimensions["time"] is None
    assert np.array_equal(back.variables["tas"].data, ds.variables["tas"].data)
    assert np.array_equal(back.variables["time"].data, ds.variables["time"].data)


def test_earray_paged_data_blocks(tmp_path):
    # custom creation params force element paging inside data blocks
    # (dblk_nelmts > 2^page_bits -> per-page checksums after the prefix)
    ds = _rec_ds(30)
    p = str(tmp_path / "eap.nc")
    hdf5.write(p, ds, chunk_rows=1, index="earray",
               ea_params=dict(min_elmts=4, page_bits=1))
    back = hdf5.read(p)
    assert np.array_equal(back.variables["tas"].data, ds.variables["tas"].data)


def test_btree2_chunk_index_roundtrip(tmp_path):
    for compress in (None, 4, "zstd"):
        ds = _rec_ds(12)
        p = str(tmp_path / f"bt2_{compress}.nc")
        hdf5.write(p, ds, compress=compress, chunk_rows=2, index="btree2")
        back = hdf5.read(p)
        assert np.array_equal(back.variables["tas"].data, ds.variables["tas"].data)


def test_earray_structural_golden(tmp_path):
    # spec-structural checks on the emitted blocks, not just the roundtrip:
    # EAHD creation params at their spec offsets, EAIB signature, EADB block
    # offsets, and a verified Jenkins lookup3 checksum on the header
    from ophidia_server_spark.sources.hdf5 import _H5Reader, _lookup3

    ds = _rec_ds(50)
    p = str(tmp_path / "eag.nc")
    hdf5.write(p, ds, chunk_rows=1, index="earray")
    buf = open(p, "rb").read()
    h = buf.index(b"EAHD")
    assert buf[h + 4] == 0                  # version
    assert buf[h + 5] == 0                  # client id: non-filtered chunks
    assert buf[h + 6] == 8                  # element size (address only)
    assert buf[h + 7] == 32                 # max nelmts bits
    assert buf[h + 8] == 4                  # index block elements
    assert buf[h + 9] == 16                 # data block min elements
    assert buf[h + 10] == 4                 # secondary block min pointers
    assert buf[h + 11] == 10                # max data-block-page nelmts bits
    max_idx = struct.unpack_from("<Q", buf, h + 12 + 32)[0]
    assert max_idx == 50                    # one element per chunk
    iblk = struct.unpack_from("<Q", buf, h + 12 + 48)[0]
    assert buf[iblk : iblk + 4] == b"EAIB"
    assert struct.unpack_from("<Q", buf, iblk + 6)[0] == h  # header backref
    # header checksum is lookup3 over everything before it
    hdr_size = 12 + 6 * 8 + 8
    want = struct.unpack_from("<I", buf, h + hdr_size)[0]
    assert _lookup3(buf[h : h + hdr_size]) == want
    # the first data block exists and carries its element-offset field
    d = buf.index(b"EADB")
    assert struct.unpack_from("<Q", buf, d + 6)[0] == h
    block_off = int.from_bytes(buf[d + 14 : d + 18], "little")
    assert block_off == 4                   # first dblock starts past iblock elmts
    # reader agrees: 50 elements, addresses all allocated
    r = _H5Reader(buf)
    elems = list(r._ea_elements(h))
    assert len(elems) == 50
    assert all(a != hdf5.UNDEF for a, _, _ in elems)


def test_btree2_structural_golden(tmp_path):
    ds = _rec_ds(12)
    p = str(tmp_path / "btg.nc")
    hdf5.write(p, ds, compress=4, chunk_rows=2, index="btree2")
    buf = open(p, "rb").read()
    h = buf.index(b"BTHD")
    assert buf[h + 5] == 11                 # record type: filtered chunks
    node_size = struct.unpack_from("<I", buf, h + 6)[0]
    rec_size = struct.unpack_from("<H", buf, h + 10)[0]
    depth = struct.unpack_from("<H", buf, h + 12)[0]
    assert node_size == 2048 and depth == 0
    assert rec_size == 8 + 4 + 4 + 8 * 2    # addr + size + mask + 2 offsets
    root = struct.unpack_from("<Q", buf, h + 16)[0]
    nrec = struct.unpack_from("<H", buf, h + 24)[0]
    assert buf[root : root + 4] == b"BTLF"
    assert nrec == 6                        # ceil(12/2) chunks of tas
    from ophidia_server_spark.sources.hdf5 import _H5Reader

    r = _H5Reader(buf)
    recs = list(r._v2btree_chunk_entries(h, 2))
    assert len(recs) == 6
    scaled = [tuple(s) for _, _, _, s in recs]
    assert scaled == [(i, 0) for i in range(6)]


def test_earray_hyperslab_pruning(tmp_path):
    # axis_keep chunk pruning must work through the EA index too: keeping
    # rows 0..2 of a 300-record variable decodes only those chunks
    from ophidia_server_spark.sources.hdf5 import _H5Reader

    ds = _rec_ds(300)
    p = str(tmp_path / "easub.nc")
    hdf5.write(p, ds, chunk_rows=1, index="earray")
    r = _H5Reader(open(p, "rb").read())
    root = r.read_object(r.root_addr, "/")
    tas = next(c for c in root.children if c.name == "tas")
    keep = np.array([0, 1, 2])
    out = r.read_data(tas, axis_keep=[keep, None])
    assert out.shape == (3, 3)
    assert np.array_equal(out, ds.variables["tas"].data[:3])


def test_lookup3_known_vectors():
    # Jenkins lookup3 hashlittle(): the published zero-length value, plus
    # avalanche sanity (any 1-byte change flips the checksum) and length
    # sensitivity across the 12-byte block boundary
    from ophidia_server_spark.sources.hdf5 import _lookup3

    assert _lookup3(b"") == 0xDEADBEEF
    base = _lookup3(b"extensible array test block")
    assert base != _lookup3(b"extensible arraY test block")
    lens = {_lookup3(b"x" * n) for n in range(1, 40)}
    assert len(lens) == 39


def test_btree2_multi_level_roundtrip_default_nodes(tmp_path):
    # 300 one-row chunks exceed one 2048-byte leaf (cap 84 for the 24-byte
    # type-10 record), so the writer must emit an internal level and the
    # reader must walk BTIN -> BTLF in record order
    ds = _rec_ds(300)
    p = str(tmp_path / "bt2deep.nc")
    hdf5.write(p, ds, chunk_rows=1, index="btree2")
    buf = open(p, "rb").read()
    h = buf.index(b"BTHD")
    assert struct.unpack_from("<H", buf, h + 12)[0] == 1   # depth
    assert b"BTIN" in buf
    back = hdf5.read(p)
    assert np.array_equal(back.variables["tas"].data, ds.variables["tas"].data)
    assert np.array_equal(back.variables["time"].data, ds.variables["time"].data)


def test_btree2_depth2_small_nodes_roundtrip(tmp_path):
    # a 64-byte node holds 1 filtered record per leaf and 1 per internal
    # node, so 12 chunks need depth >= 2 — exercises the subtree-total
    # pointer field that only exists on pointers to internal children
    ds = _rec_ds(24)
    p = str(tmp_path / "bt2d2.nc")
    hdf5.write(p, ds, compress=4, chunk_rows=2, index="btree2", b2_node_size=64)
    buf = open(p, "rb").read()
    h = buf.index(b"BTHD")
    depth = struct.unpack_from("<H", buf, h + 12)[0]
    assert depth >= 2
    back = hdf5.read(p)
    assert np.array_equal(back.variables["tas"].data, ds.variables["tas"].data)


def test_btree2_deep_walk_yields_sorted_offsets(tmp_path):
    from ophidia_server_spark.sources.hdf5 import _H5Reader, _b2_node_caps

    ds = _rec_ds(40)
    p = str(tmp_path / "bt2walk.nc")
    hdf5.write(p, ds, chunk_rows=1, index="btree2", b2_node_size=96)
    buf = open(p, "rb").read()
    h = buf.index(b"BTHD")
    node_size = struct.unpack_from("<I", buf, h + 6)[0]
    rec_size = struct.unpack_from("<H", buf, h + 10)[0]
    depth = struct.unpack_from("<H", buf, h + 12)[0]
    assert depth >= 1
    # capacity ladder is self-consistent: subtree capacity covers the count
    _max_nrec, cum_max, _cum_size, _w = _b2_node_caps(node_size, rec_size, depth)
    assert cum_max[depth] >= 40
    r = _H5Reader(buf)
    recs = list(r._v2btree_chunk_entries(h, 2))
    assert len(recs) == 40
    # in-order walk: scaled offsets come back sorted and complete
    assert [s[0] for _, _, _, s in recs] == list(range(40))
    assert all(a != hdf5.UNDEF for a, _, _, _ in recs)


@pytest.mark.parametrize("node_size", [64, 96])
def test_btree2_builder_all_small_counts_roundtrip(tmp_path, node_size):
    # sweep chunk counts across every depth transition for tiny nodes: the
    # builder's fan-out starts at 1, so underfull recursion paths (a sibling
    # took the separators) still emit uniform-depth trees the walker accepts
    for nt in (1, 2, 3, 5, 9, 17, 33, 80):
        ds = _rec_ds(nt)
        p = str(tmp_path / f"bt_{node_size}_{nt}.nc")
        hdf5.write(p, ds, chunk_rows=1, index="btree2", b2_node_size=node_size)
        back = hdf5.read(p)
        assert np.array_equal(
            back.variables["tas"].data, ds.variables["tas"].data
        ), (node_size, nt)


def test_btree2_internal_nodes_never_empty(tmp_path):
    # libhdf5's insertion builder never emits a BTIN with 0 records and a
    # single child pointer; neither may ours at any node size that holds
    # >= 2 leaf records. Walk every internal node of a depth>=2 tree and
    # assert its record count.
    from ophidia_server_spark.sources.hdf5 import _H5Reader, _b2_node_caps

    ds = _rec_ds(61)
    p = str(tmp_path / "bt2full.nc")
    hdf5.write(p, ds, chunk_rows=1, index="btree2", b2_node_size=128)
    buf = open(p, "rb").read()
    h = buf.index(b"BTHD")
    node_size = struct.unpack_from("<I", buf, h + 6)[0]
    rec_size = struct.unpack_from("<H", buf, h + 10)[0]
    depth = struct.unpack_from("<H", buf, h + 12)[0]
    assert depth >= 2  # the shape where tail subtrees used to go m=1
    max_nrec, _cum, cum_size, w = _b2_node_caps(node_size, rec_size, depth)
    assert max_nrec[0] >= 2  # non-degenerate config
    r = _H5Reader(buf)
    root_addr = struct.unpack_from("<Q", buf, h + 16)[0]
    root_nrec = struct.unpack_from("<H", buf, h + 24)[0]
    seen = []

    def walk(addr, nrec, level):
        q = r.at(addr)
        sig = buf[q : q + 4]
        if level == 0:
            assert sig == b"BTLF" and nrec >= 1
            return
        assert sig == b"BTIN"
        seen.append((level, nrec))
        ptr = q + 6 + nrec * rec_size
        for _ in range(nrec + 1):
            caddr = struct.unpack_from("<Q", buf, ptr)[0]
            cnrec = int.from_bytes(buf[ptr + 8 : ptr + 8 + w], "little")
            walk(caddr, cnrec, level - 1)
            ptr += 8 + w + cum_size[level - 1]

    walk(root_addr, root_nrec, depth)
    assert seen and all(n >= 1 for _, n in seen)
    # and the file still round-trips
    back = hdf5.read(p)
    assert np.array_equal(back.variables["tas"].data, ds.variables["tas"].data)
