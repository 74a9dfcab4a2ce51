"""NetCDF3 codec: golden-bytes fidelity against the public classic-format
spec (hand-assembled files), writer/reader round-trip, record-variable
interleaving. No Spark session needed."""

import struct

import numpy as np

from ophidia_server_spark.sources import netcdf3 as nc


def _golden_bytes() -> bytes:
    # dims {x:2}, global att title='t', var v double[x]=[1.5,2.5] att units='m'
    g = b"CDF\x01" + struct.pack(">i", 0)
    g += struct.pack(">ii", 0x0A, 1) + struct.pack(">i", 1) + b"x\x00\x00\x00"
    g += struct.pack(">i", 2)
    g += struct.pack(">ii", 0x0C, 1) + struct.pack(">i", 5) + b"title\x00\x00\x00"
    g += struct.pack(">ii", 2, 1) + b"t\x00\x00\x00"
    g += struct.pack(">ii", 0x0B, 1)
    g += struct.pack(">i", 1) + b"v\x00\x00\x00" + struct.pack(">i", 1)
    g += struct.pack(">i", 0)
    g += struct.pack(">ii", 0x0C, 1) + struct.pack(">i", 5) + b"units\x00\x00\x00"
    g += struct.pack(">ii", 2, 1) + b"m\x00\x00\x00"
    g += struct.pack(">ii", 6, 16) + struct.pack(">i", 128)
    g += struct.pack(">d", 1.5) + struct.pack(">d", 2.5)
    return g


def test_reader_parses_golden_file(tmp_path):
    p = str(tmp_path / "g.nc")
    open(p, "wb").write(_golden_bytes())
    ds = nc.read(p)
    assert ds.dimensions == {"x": 2}
    assert ds.attributes == {"title": "t"}
    v = ds.variables["v"]
    assert v.data.tolist() == [1.5, 2.5]
    assert v.attributes == {"units": "m"} and v.dimensions == ("x",)


def test_writer_reproduces_golden_bytes(tmp_path):
    ds = nc.Dataset()
    ds.dimensions = {"x": 2}
    ds.attributes = {"title": "t"}
    ds.variables["v"] = nc.Variable("v", ("x",), {"units": "m"}, np.array([1.5, 2.5]))
    p = str(tmp_path / "w.nc")
    nc.write(p, ds)
    assert open(p, "rb").read() == _golden_bytes()


def test_roundtrip_all_types(tmp_path):
    ds = nc.Dataset()
    ds.dimensions = {"x": 2, "y": 3}
    ds.attributes = {"title": "test", "version": 2, "scale": 1.5, "levels": [1, 2, 3]}
    ds.variables["x"] = nc.Variable("x", ("x",), {}, np.array([10.0, 20.0]))
    ds.variables["m"] = nc.Variable(
        "m", ("x", "y"), {"units": "K"}, np.arange(6, dtype="float32").reshape(2, 3)
    )
    ds.variables["c"] = nc.Variable("c", ("y",), {}, np.array([1, 2, 3], dtype="int16"))
    ds.variables["b"] = nc.Variable("b", ("y",), {}, np.array([-1, 0, 1], dtype="int8"))
    ds.variables["i"] = nc.Variable("i", ("x",), {}, np.array([7, 8], dtype="int32"))
    p = str(tmp_path / "t.nc")
    nc.write(p, ds)
    r = nc.read(p)
    assert r.dimensions == ds.dimensions
    assert r.attributes == ds.attributes
    assert r.variables["m"].data.tolist() == [[0, 1, 2], [3, 4, 5]]
    assert r.variables["m"].attributes == {"units": "K"}
    assert r.variables["c"].data.tolist() == [1, 2, 3]
    assert r.variables["b"].data.tolist() == [-1, 0, 1]
    assert r.variables["i"].data.tolist() == [7, 8]


def test_reader_single_record_variable(tmp_path):
    # unlimited dim t (numrecs=3), r short[t, x] — single record var packs
    # contiguously with per-record padding
    h = b"CDF\x01" + struct.pack(">i", 3)
    h += struct.pack(">ii", 0x0A, 2)
    h += struct.pack(">i", 1) + b"t\x00\x00\x00" + struct.pack(">i", 0)
    h += struct.pack(">i", 1) + b"x\x00\x00\x00" + struct.pack(">i", 2)
    h += b"\x00" * 8
    h += struct.pack(">ii", 0x0B, 1)
    h += struct.pack(">i", 1) + b"r\x00\x00\x00" + struct.pack(">i", 2)
    h += struct.pack(">ii", 0, 1)
    h += b"\x00" * 8 + struct.pack(">ii", 3, 4) + struct.pack(">i", 96)
    assert len(h) == 96
    h += struct.pack(">6h", 1, 2, 3, 4, 5, 6)
    p = str(tmp_path / "rec.nc")
    open(p, "wb").write(h)
    ds = nc.read(p)
    assert ds.dimensions == {"t": None, "x": 2}
    assert ds.variables["r"].data.tolist() == [[1, 2], [3, 4], [5, 6]]


def test_reader_interleaved_record_variables(tmp_path):
    # two record vars: per-record stride is the summed padded chunk sizes
    h = b"CDF\x01" + struct.pack(">i", 2)
    h += struct.pack(">ii", 0x0A, 1)
    h += struct.pack(">i", 1) + b"t\x00\x00\x00" + struct.pack(">i", 0)
    h += b"\x00" * 8
    h += struct.pack(">ii", 0x0B, 2)
    h += struct.pack(">i", 2) + b"r1\x00\x00" + struct.pack(">i", 1)
    h += struct.pack(">i", 0)
    h += b"\x00" * 8 + struct.pack(">ii", 3, 4) + struct.pack(">i", 116)
    h += struct.pack(">i", 2) + b"r2\x00\x00" + struct.pack(">i", 1)
    h += struct.pack(">i", 0)
    h += b"\x00" * 8 + struct.pack(">ii", 4, 4) + struct.pack(">i", 120)
    assert len(h) == 116
    h += struct.pack(">h", 1) + b"\x00\x00" + struct.pack(">i", 10)
    h += struct.pack(">h", 2) + b"\x00\x00" + struct.pack(">i", 11)
    p = str(tmp_path / "rec2.nc")
    open(p, "wb").write(h)
    ds = nc.read(p)
    assert ds.variables["r1"].data.tolist() == [1, 2]
    assert ds.variables["r2"].data.tolist() == [10, 11]


def test_reader_rejects_non_netcdf(tmp_path):
    p = str(tmp_path / "bad.nc")
    open(p, "wb").write(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    try:
        nc.read(p)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_cdf2_64bit_offsets(tmp_path):
    # CDF-2 only widens the begin field to 8 bytes
    g = b"CDF\x02" + struct.pack(">i", 0)
    g += struct.pack(">ii", 0x0A, 1) + struct.pack(">i", 1) + b"x\x00\x00\x00"
    g += struct.pack(">i", 2)
    g += b"\x00" * 8
    g += struct.pack(">ii", 0x0B, 1)
    g += struct.pack(">i", 1) + b"v\x00\x00\x00" + struct.pack(">i", 1)
    g += struct.pack(">i", 0)
    g += b"\x00" * 8 + struct.pack(">ii", 6, 16) + struct.pack(">q", 84)
    assert len(g) == 84
    g += struct.pack(">d", 3.0) + struct.pack(">d", 4.0)
    p = str(tmp_path / "c2.nc")
    open(p, "wb").write(g)
    ds = nc.read(p)
    assert ds.variables["v"].data.tolist() == [3.0, 4.0]


# -- property-based roundtrip (no Spark needed) -------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_dim_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")), min_size=1, max_size=6
)
_np_type = st.sampled_from(["int8", "int16", "int32", "float32", "float64"])


@settings(max_examples=25, deadline=None)
@given(
    dims=st.dictionaries(_dim_name, st.integers(1, 5), min_size=1, max_size=3),
    dtype=_np_type,
    seed=st.integers(0, 2**31 - 1),
    title=st.text(max_size=12),
)
def test_roundtrip_property(tmp_path_factory, dims, dtype, seed, title):
    rng = np.random.default_rng(seed)
    shape = tuple(dims.values())
    if dtype.startswith("float"):
        data = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(info.min, info.max, size=shape, dtype=dtype)
    ds = nc.Dataset()
    ds.dimensions = dict(dims)
    if title:
        ds.attributes = {"title": title}
    ds.variables["m"] = nc.Variable("m", tuple(dims), {}, data)
    p = str(tmp_path_factory.mktemp("ncprop") / "p.nc")
    nc.write(p, ds)
    r = nc.read(p)
    assert r.dimensions == dims
    assert r.attributes == ({"title": title} if title else {})
    got = r.variables["m"].data
    assert got.shape == shape
    assert np.array_equal(got.astype(dtype), data)


def test_reader_single_short_record_var_unpadded(tmp_path):
    # spec special case: ONE record variable of short type with odd-sized
    # records packs contiguously (no inter-record padding)
    h = b"CDF\x01" + struct.pack(">i", 3)
    h += struct.pack(">ii", 0x0A, 1)
    h += struct.pack(">i", 1) + b"t\x00\x00\x00" + struct.pack(">i", 0)
    h += b"\x00" * 8
    h += struct.pack(">ii", 0x0B, 1)
    h += struct.pack(">i", 1) + b"r\x00\x00\x00" + struct.pack(">i", 1)
    h += struct.pack(">i", 0)
    h += b"\x00" * 8 + struct.pack(">ii", 3, 4) + struct.pack(">i", 80)
    assert len(h) == 80
    h += struct.pack(">3h", 7, 8, 9)  # contiguous shorts, no padding
    p = str(tmp_path / "short_rec.nc")
    open(p, "wb").write(h)
    ds = nc.read(p)
    assert ds.variables["r"].data.tolist() == [7, 8, 9]


def test_hdf5_magic_dispatches_to_hdf5_codec(tmp_path):
    # a netCDF-4 file is an HDF5 container; read() must delegate to the HDF5
    # codec — a corrupt container surfaces the codec's named error, and a
    # valid one (written by sources/hdf5.py) decodes transparently
    import numpy as np
    import pytest

    from ophidia_server_spark.sources.hdf5 import Hdf5Error, write as h5write

    p = str(tmp_path / "bad4.nc")
    open(p, "wb").write(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(Hdf5Error):
        nc.read(p)

    ds = nc.Dataset()
    ds.dimensions = {"x": 3}
    ds.variables["v"] = nc.Variable("v", ("x",), {}, np.array([1.0, 2.0, 3.0]))
    good = str(tmp_path / "good4.nc")
    h5write(good, ds)
    back = nc.read(good)  # format-blind: same entry point as classic files
    assert back.variables["v"].data.tolist() == [1.0, 2.0, 3.0]


def test_write_record_variables_roundtrip(tmp_path):
    # two record variables along an unlimited dim: write interleaves record
    # slabs; read must recover byte-identical data (importnc -> exportnc path)
    ds = nc.Dataset()
    ds.dimensions = {"time": None, "x": 3}
    ds.variables["t"] = nc.Variable(
        "t", ("time",), {}, np.array([0.0, 1.0, 2.0, 3.0])
    )
    ds.variables["m"] = nc.Variable(
        "m", ("time", "x"), {"units": "K"},
        np.arange(12, dtype="float32").reshape(4, 3),
    )
    ds.variables["lon"] = nc.Variable("lon", ("x",), {}, np.array([1.0, 2.0, 3.0]))
    p = str(tmp_path / "rec.nc")
    nc.write(p, ds)
    back = nc.read(p)
    assert back.dimensions == {"time": None, "x": 3}
    assert back.variables["t"].data.tolist() == [0.0, 1.0, 2.0, 3.0]
    assert back.variables["m"].data.tolist() == ds.variables["m"].data.tolist()
    assert back.variables["lon"].data.tolist() == [1.0, 2.0, 3.0]
    # single-record-variable special case: unpadded short payload
    ds2 = nc.Dataset()
    ds2.dimensions = {"time": None}
    ds2.variables["s"] = nc.Variable(
        "s", ("time",), {}, np.array([1, 2, 3], dtype="int16")
    )
    p2 = str(tmp_path / "rec1.nc")
    nc.write(p2, ds2)
    assert nc.read(p2).variables["s"].data.tolist() == [1, 2, 3]


def test_write_cdf2_forced_roundtrip(tmp_path):
    ds = nc.Dataset()
    ds.dimensions = {"x": 4}
    ds.variables["v"] = nc.Variable("v", ("x",), {}, np.array([1.0, 2.0, 3.0, 4.0]))
    p = str(tmp_path / "big.nc")
    nc.write(p, ds, version="64bit")
    assert open(p, "rb").read(4) == b"CDF\x02"
    assert nc.read(p).variables["v"].data.tolist() == [1.0, 2.0, 3.0, 4.0]


def test_int64_narrowing_is_range_checked(tmp_path):
    import pytest

    ds = nc.Dataset()
    ds.dimensions = {"x": 2}
    ds.variables["ok"] = nc.Variable(
        "ok", ("x",), {}, np.array([2**31 - 1, -(2**31)], dtype="int64")
    )
    p = str(tmp_path / "i64.nc")
    nc.write(p, ds)  # exactly-representable int64 narrows fine
    assert nc.read(p).variables["ok"].data.tolist() == [2**31 - 1, -(2**31)]
    ds.variables["ok"] = nc.Variable(
        "ok", ("x",), {}, np.array([2**31, 0], dtype="int64")
    )
    with pytest.raises(ValueError, match="NC_INT range"):
        nc.write(p, ds)


def test_streaming_numrecs_sentinel_recovers(tmp_path):
    # an interrupted writer leaves numrecs = 0xFFFFFFFF (STREAMING); the
    # reader must derive the record count from the file size, for both the
    # interleaved and the single-record-variable stride
    ds = nc.Dataset()
    ds.dimensions = {"time": None, "x": 2}
    ds.variables["a"] = nc.Variable("a", ("time",), {}, np.array([1.0, 2.0, 3.0]))
    ds.variables["b"] = nc.Variable(
        "b", ("time", "x"), {}, np.arange(6, dtype="float32").reshape(3, 2)
    )
    p = str(tmp_path / "stream.nc")
    nc.write(p, ds)
    raw = bytearray(open(p, "rb").read())
    raw[4:8] = b"\xff\xff\xff\xff"
    open(p, "wb").write(bytes(raw))
    back = nc.read(p)
    assert back.variables["a"].data.tolist() == [1.0, 2.0, 3.0]
    assert back.variables["b"].data.tolist() == ds.variables["b"].data.tolist()

    ds2 = nc.Dataset()
    ds2.dimensions = {"time": None}
    ds2.variables["s"] = nc.Variable(
        "s", ("time",), {}, np.array([1, 2, 3, 4, 5], dtype="int16")
    )
    p2 = str(tmp_path / "stream1.nc")
    nc.write(p2, ds2)
    raw = bytearray(open(p2, "rb").read())
    raw[4:8] = b"\xff\xff\xff\xff"
    open(p2, "wb").write(bytes(raw))
    assert nc.read(p2).variables["s"].data.tolist() == [1, 2, 3, 4, 5]


def test_cdf5_roundtrip_wide_headers_and_64bit_types(tmp_path):
    # CDF-5 ("64-bit data"): every NON_NEG header field is INT64 and
    # int64/unsigned payloads keep their width (no narrow-check needed)
    big = np.array([2**40, -(2**40), 7], dtype=np.int64)
    ds = nc.Dataset(
        dimensions={"t": None, "x": 3},
        attributes={"title": "cdf5", "levels": [1, 2, 3]},
        variables={
            "t": nc.Variable("t", ("t",), {}, np.arange(4, dtype=np.float64)),
            "big": nc.Variable("big", ("x",), {"u": "count"}, big),
            "u32": nc.Variable(
                "u32", ("x",), {}, np.array([1, 2, 4000000000], dtype=np.uint32)
            ),
            "rec": nc.Variable(
                "rec", ("t", "x"), {},
                np.arange(12, dtype=np.int64).reshape(4, 3) * 2**35,
            ),
        },
    )
    p = str(tmp_path / "wide.nc")
    nc.write(p, ds, version="cdf5")
    raw = open(p, "rb").read()
    assert raw[:4] == b"CDF\x05"
    back = nc.read(p)
    assert back.dimensions == {"t": None, "x": 3}
    assert back.attributes["title"] == "cdf5"
    assert np.array_equal(back.variables["big"].data, big)
    assert back.variables["big"].data.dtype == np.dtype(">i8")
    assert np.array_equal(
        back.variables["u32"].data, np.array([1, 2, 4000000000], dtype=np.uint64)
    )
    assert np.array_equal(
        back.variables["rec"].data, np.arange(12).reshape(4, 3) * 2**35
    )


def test_cdf1_still_narrow_checks_int64(tmp_path):
    # the classic path keeps refusing silent int64 wrap; CDF-5 accepts it
    import pytest
    ds = nc.Dataset(
        dimensions={"x": 1},
        variables={"v": nc.Variable("v", ("x",), {}, np.array([2**40]))},
    )
    with pytest.raises(ValueError, match="NC_INT range"):
        nc.write(str(tmp_path / "narrow.nc"), ds)
    nc.write(str(tmp_path / "wide.nc"), ds, version="cdf5")
    back = nc.read(str(tmp_path / "wide.nc"))
    assert int(back.variables["v"].data[0]) == 2**40
