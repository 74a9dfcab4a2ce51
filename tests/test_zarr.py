"""Zarr v2 codec + Spark import/export tests.

Zarr's on-disk format is plain JSON + one file per chunk, so — unlike the
HDF5 codec — golden stores can be handcrafted from the public spec without
our writer, breaking writer/reader circularity directly.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest

from ophidia_server_spark.sources import zarr as zr
from ophidia_server_spark.sources.netcdf3 import Dataset, Variable


def _handmade_store(tmp_path, compress=True):
    """Write a store byte-by-byte per the Zarr v2 spec (not via zr.write)."""
    store = str(tmp_path / "hand")
    os.makedirs(os.path.join(store, "tas"))
    os.makedirs(os.path.join(store, "time"))
    json.dump({"zarr_format": 2}, open(os.path.join(store, ".zgroup"), "w"))
    # time: 1-D coordinate, one chunk, no compression
    t = np.array([0.0, 6.0, 12.0, 18.0])
    json.dump(
        {
            "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
            "compressor": None, "fill_value": 0, "order": "C", "filters": None,
        },
        open(os.path.join(store, "time", ".zarray"), "w"),
    )
    json.dump(
        {"_ARRAY_DIMENSIONS": ["time"], "units": "hours since 2001-01-01"},
        open(os.path.join(store, "time", ".zattrs"), "w"),
    )
    open(os.path.join(store, "time", "0"), "wb").write(t.tobytes())
    # tas: 2-D, 2x2 chunk grid over a 4x3 array (ragged edge), zlib chunks
    tas = np.arange(12, dtype="<f4").reshape(4, 3)
    comp = {"id": "zlib", "level": 5} if compress else None
    json.dump(
        {
            "zarr_format": 2, "shape": [4, 3], "chunks": [2, 2], "dtype": "<f4",
            "compressor": comp, "fill_value": "NaN", "order": "C",
            "filters": None,
        },
        open(os.path.join(store, "tas", ".zarray"), "w"),
    )
    json.dump(
        {"_ARRAY_DIMENSIONS": ["time", "lat"]},
        open(os.path.join(store, "tas", ".zattrs"), "w"),
    )
    for i in range(2):
        for j in range(2):
            piece = np.full((2, 2), np.nan, "<f4")
            src = tas[i * 2 : i * 2 + 2, j * 2 : j * 2 + 2]
            piece[: src.shape[0], : src.shape[1]] = src
            raw = piece.tobytes()
            if compress:
                raw = zlib.compress(raw, 5)
            open(os.path.join(store, "tas", f"{i}.{j}"), "wb").write(raw)
    return store, tas, t


def test_read_handmade_spec_store(tmp_path):
    store, tas, t = _handmade_store(tmp_path)
    ds = zr.read(store)
    assert ds.dimensions == {"time": 4, "lat": 3}
    assert np.array_equal(ds.variables["time"].data, t)
    assert np.array_equal(ds.variables["tas"].data, tas)
    assert ds.variables["tas"].dimensions == ("time", "lat")
    assert ds.variables["time"].attributes["units"].startswith("hours since")


def test_missing_chunk_is_fill_value(tmp_path):
    store, tas, _ = _handmade_store(tmp_path)
    os.remove(os.path.join(store, "tas", "1.1"))
    ds = zr.read(store)
    got = ds.variables["tas"].data
    assert np.array_equal(got[:2], tas[:2])
    assert np.isnan(got[2:, 2:]).all()  # fill_value "NaN" per spec JSON encoding


def test_roundtrip_with_consolidated_metadata(tmp_path):
    ds = Dataset()
    ds.dimensions = {"time": 5, "lat": 3}
    ds.attributes = {"title": "zarr roundtrip"}
    ds.variables["time"] = Variable("time", ("time",), {}, np.arange(5, dtype="f8"))
    ds.variables["tas"] = Variable(
        "tas", ("time", "lat"), {"units": "K"},
        np.arange(15, dtype="f8").reshape(5, 3),
    )
    store = str(tmp_path / "rt")
    zr.write(store, ds, chunks={"tas": (2, 3)}, compress=6)
    assert os.path.exists(os.path.join(store, ".zmetadata"))  # one-GET cloud read
    assert os.path.exists(os.path.join(store, "tas", "2.0"))  # 3 chunks of 2 rows
    back = zr.read(store)
    assert back.attributes["title"] == "zarr roundtrip"
    assert np.array_equal(back.variables["tas"].data, ds.variables["tas"].data)
    assert back.variables["tas"].attributes == {"units": "K"}
    # consolidated read path: nuke per-array metadata, .zmetadata must suffice
    os.remove(os.path.join(store, "tas", ".zarray"))
    back2 = zr.read(store)
    assert np.array_equal(back2.variables["tas"].data, ds.variables["tas"].data)


def test_unsupported_compressor_named_error(tmp_path):
    store, _, _ = _handmade_store(tmp_path)
    meta = json.load(open(os.path.join(store, "tas", ".zarray")))
    meta["compressor"] = {"id": "blosc", "cname": "lz4"}
    json.dump(meta, open(os.path.join(store, "tas", ".zarray"), "w"))
    with pytest.raises(zr.ZarrError, match="blosc"):
        zr.read(store)


def test_spark_import_per_chunk(spark, tmp_path):
    # one task per chunk: the 4x3 handmade store has 4 chunk keys
    from ophidia_server_spark.operators import io_ops

    store, tas, t = _handmade_store(tmp_path)
    cube = io_ops.oph_importzarr(spark, store, "tas", ["time"], "lat")
    rows = {(r["time"], r["lat"], r["tas"]) for r in cube.long().collect()}
    want = {
        (t[i], float(j), float(tas[i, j])) for i in range(4) for j in range(3)
    }
    assert rows == want


def test_spark_export_import_roundtrip(spark, tmp_path):
    from ophidia_server_spark.operators import io_ops
    from ophidia_server_spark.cube import build_cube
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(g), float(x), float(g * 100 + x)) for g in range(4) for x in range(5)],
        "lat double, time double, tas double",
    )
    cube = build_cube(df, ["lat"], "time", F.col("tas"), measure="tas")
    store = str(tmp_path / "exp")
    io_ops.oph_exportzarr(cube, store, compress=3)
    back = io_ops.oph_importzarr(spark, store, "tas", ["lat"], "time")
    rows = {(r["lat"], r["time"], r["tas"]) for r in back.long().collect()}
    assert rows == {
        (float(g), float(x), float(g * 100 + x)) for g in range(4) for x in range(5)
    }


def test_spark_export_per_dim_chunks(spark, tmp_path):
    # executor-side chunk writes: driver handles metadata only
    from ophidia_server_spark.operators import io_ops
    from ophidia_server_spark.cube import build_cube
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(g), float(x), float(g * 10 + x)) for g in range(3) for x in range(4)],
        "lat double, time double, tas double",
    )
    cube = build_cube(df, ["lat"], "time", F.col("tas"), measure="tas")
    store = str(tmp_path / "shard")
    io_ops.oph_exportzarr(cube, store, compress=2, per_dim_chunks=True)
    # one chunk per lat value, named by its grid position
    assert sorted(
        f for f in os.listdir(os.path.join(store, "tas")) if not f.startswith(".")
    ) == ["0.0", "1.0", "2.0"]
    back = io_ops.oph_importzarr(spark, store, "tas", ["lat"], "time")
    rows = {(r["lat"], r["time"], r["tas"]) for r in back.long().collect()}
    assert rows == {
        (float(g), float(x), float(g * 10 + x)) for g in range(3) for x in range(4)
    }


def test_explorenc_peeks_zarr_store(spark, tmp_path):
    # oph_explorenc is the one-file peek; a Zarr store (directory with
    # .zgroup) routes to the zarr codec, files route on magic as before
    from ophidia_server_spark.operators import io_ops

    store, tas, _ = _handmade_store(tmp_path)
    info = io_ops.oph_explorenc(spark, store, measure="tas")
    assert info["dims"] == {"time": 4, "lat": 3}
    assert info["vars"]["tas"] == ["time", "lat"]
    assert info["stats"]["n"] == 12
    assert info["stats"]["min"] == 0.0 and info["stats"]["max"] == 11.0


def test_zero_length_arrays_roundtrip(tmp_path):
    # spec: chunk dims must be positive even when the array is zero-length;
    # a 0-length array just has no chunk files
    ds = Dataset()
    ds.dimensions = {"a": 0, "b": 3}
    ds.variables["m"] = Variable("m", ("a", "b"), {}, np.zeros((0, 3), "f4"))
    store = str(tmp_path / "z0")
    zr.write(store, ds)
    back = zr.read(store)
    assert back.variables["m"].data.shape == (0, 3)


def test_nested_group_store(tmp_path):
    # arrays inside nested groups (directories with .zgroup) surface under
    # their slash-joined store path, as consolidated metadata names them
    store = str(tmp_path / "nested")
    os.makedirs(os.path.join(store, "model", "run1"))
    json.dump({"zarr_format": 2}, open(os.path.join(store, ".zgroup"), "w"))
    json.dump({"zarr_format": 2}, open(os.path.join(store, "model", ".zgroup"), "w"))
    adir = os.path.join(store, "model", "run1")
    json.dump(
        {
            "zarr_format": 2, "shape": [3], "chunks": [3], "dtype": "<f8",
            "compressor": None, "fill_value": 0, "order": "C", "filters": None,
        },
        open(os.path.join(adir, ".zarray"), "w"),
    )
    json.dump({"_ARRAY_DIMENSIONS": ["x"]}, open(os.path.join(adir, ".zattrs"), "w"))
    open(os.path.join(adir, "0"), "wb").write(
        np.array([1.0, 2.0, 3.0]).tobytes()
    )
    ds = zr.read(store)
    assert list(ds.variables) == ["model/run1"]
    assert ds.variables["model/run1"].data.tolist() == [1.0, 2.0, 3.0]


def test_spark_import_hyperslab_prunes_chunks(spark, tmp_path):
    # import-time hyperslab with chunk-level pruning: a time range touching
    # only chunk row 0 must drop chunk keys 1.* from the task list entirely
    from ophidia_server_spark.operators import io_ops

    store, tas, t = _handmade_store(tmp_path)  # 4x3, chunks 2x2, t=[0,6,12,18]
    cube = io_ops.oph_importzarr(
        spark, store, "tas", ["time"], "lat",
        subset={"time": "0:6"}, subset_type="coord",
    )
    rows = {(r["time"], r["lat"], r["tas"]) for r in cube.long().collect()}
    want = {
        (t[i], float(j), float(tas[i, j])) for i in range(2) for j in range(3)
    }
    assert rows == want  # times 0.0 and 6.0 only

    # index-type subset: 1-based rows 2:3 -> times 6.0 and 12.0
    cube3 = io_ops.oph_importzarr(
        spark, store, "tas", ["time"], "lat",
        subset={"time": "2:3"}, subset_type="index",
    )
    got3 = {r["time"] for r in cube3.long().collect()}
    assert got3 == {6.0, 12.0}

    # pruning is observable: delete the out-of-range chunks — the subset
    # import must succeed without ever opening them
    os.remove(os.path.join(store, "tas", "1.0"))
    os.remove(os.path.join(store, "tas", "1.1"))
    cube2 = io_ops.oph_importzarr(
        spark, store, "tas", ["time"], "lat",
        subset={"time": "0:6"}, subset_type="coord",
    )
    assert {(r["time"], r["lat"], r["tas"]) for r in cube2.long().collect()} == want


def test_fill_value_translation_per_dtype(tmp_path):
    # spec JSON fill encodings: float specials as strings, base64 for "S"
    # dtypes, null = undefined (we materialize zeros), bad strings = named error
    import base64

    rf = zr._resolve_fill
    assert np.isnan(rf("NaN", np.dtype("f8")))
    assert rf("-Infinity", np.dtype("f4")) == -np.inf
    assert rf(None, np.dtype("i4")) == 0
    assert rf(7, np.dtype("i4")) == 7
    assert rf(base64.b64encode(b"ab").decode(), np.dtype("S2")) == b"ab"
    with pytest.raises(zr.ZarrError):
        rf("NaN", np.dtype("i4"))
    with pytest.raises(zr.ZarrError):
        rf("!!notb64", np.dtype("S4"))

    # end-to-end: an int array with a string fill must raise the named error,
    # a bytes array with base64 fill decodes to the fill on missing chunks
    adir = tmp_path / "s" / "v"
    adir.mkdir(parents=True)
    meta = {
        "zarr_format": 2, "shape": [4], "chunks": [2], "dtype": "|S2",
        "compressor": None, "fill_value": base64.b64encode(b"zz").decode(),
        "order": "C", "filters": None,
    }
    (adir / ".zarray").write_text(json.dumps(meta))
    (adir / "0").write_bytes(np.array([b"aa", b"bb"], "S2").tobytes())
    got, _ = zr.read_array(str(tmp_path / "s"), "v")
    assert got.tolist() == [b"aa", b"bb", b"zz", b"zz"]

    meta_bad = dict(meta, dtype="<i4", fill_value="oops")
    (adir / ".zarray").write_text(json.dumps(meta_bad))
    with pytest.raises(zr.ZarrError):
        zr.read_array(str(tmp_path / "s"), "v")


def test_blosc_lz4_store_roundtrip(tmp_path):
    # write -> read through the pure-Python blosc(lz4) codec — the numcodecs
    # default of real CMIP6/Pangeo cloud stores
    ds = Dataset()
    ds.dimensions = {"t": 50, "x": 4}
    ds.variables["t"] = Variable("t", ("t",), {}, np.arange(50, dtype="f8"))
    ds.variables["v"] = Variable(
        "v", ("t", "x"), {"units": "K"},
        np.arange(200, dtype="f8").reshape(50, 4) / 3.0,
    )
    p = str(tmp_path / "bl.zarr")
    zr.write(p, ds, compress="blosc-lz4")
    meta = json.load(open(os.path.join(p, "v", ".zarray")))
    assert meta["compressor"]["id"] == "blosc"
    assert meta["compressor"]["cname"] == "lz4"
    back = zr.read(p)
    assert np.array_equal(back.variables["v"].data, ds.variables["v"].data)
    assert back.variables["v"].attributes["units"] == "K"


def test_blosc_handmade_split_store(tmp_path):
    # a store whose chunks are split-mode blosc frames (what pre-1.14 /
    # always-split writers emit) must decode identically
    from ophidia_server_spark.sources import lz4blosc as lb
    import struct

    data = np.arange(32, dtype="<i4").reshape(8, 4)
    adir = tmp_path / "s" / "v"
    adir.mkdir(parents=True)
    meta = {
        "zarr_format": 2, "shape": [8, 4], "chunks": [8, 4], "dtype": "<i4",
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                       "shuffle": 1, "blocksize": 0},
        "fill_value": 0, "order": "C", "filters": None,
    }
    (adir / ".zarray").write_text(json.dumps(meta))
    raw = data.tobytes()
    shuf = lb._shuffle(raw, 4)
    ne = len(shuf) // 4
    streams = b""
    for j in range(4):
        part = shuf[j * ne : (j + 1) * ne]
        comp = lb.lz4_compress_block(part)
        if len(comp) >= len(part):
            comp = part
        streams += struct.pack("<i", len(comp)) + comp
    frame = (
        struct.pack("<BBBBIII", 2, 1, (1 << 5) | 0x01, 4,
                    len(raw), len(raw), 20 + len(streams))
        + struct.pack("<I", 20) + streams
    )
    (adir / "0.0").write_bytes(frame)
    got, _ = zr.read_array(str(tmp_path / "s"), "v")
    assert np.array_equal(got, data)


def test_zstd_corrupt_payload_named_error(tmp_path):
    # a blosc-zstd stream whose payload is garbage must fail with the codec
    # named, not crash or return junk (zstd itself IS supported via pyarrow)
    import struct

    adir = tmp_path / "s" / "v"
    adir.mkdir(parents=True)
    meta = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
        "compressor": {"id": "blosc", "cname": "zstd", "clevel": 5,
                       "shuffle": 1, "blocksize": 0},
        "fill_value": 0, "order": "C", "filters": None,
    }
    (adir / ".zarray").write_text(json.dumps(meta))
    frame = (
        struct.pack("<BBBBIII", 2, 1, (4 << 5) | 0x10, 8, 32, 32, 26)
        + struct.pack("<I", 20) + struct.pack("<i", 2) + b"zz"
    )
    (adir / "0").write_bytes(frame)
    with pytest.raises(zr.ZarrError, match="zstd"):
        zr.read_array(str(tmp_path / "s"), "v")


def test_blosc_zstd_and_snappy_streams_decode(tmp_path):
    # unsplit blosc frames whose streams are zstd / snappy (flag bits 5-7
    # carry the codec) decode through pyarrow's bundled C codecs
    import struct

    import pyarrow as pa

    from ophidia_server_spark.sources import lz4blosc as lb

    data = np.arange(256, dtype="<f8")
    raw = data.tobytes()
    shuf = lb._shuffle(raw, 8)
    for codec_id, name in ((4, "zstd"), (2, "snappy")):
        comp = bytes(pa.Codec(name).compress(shuf))
        stream = struct.pack("<i", len(comp)) + comp
        frame = (
            struct.pack(
                "<BBBBIII", 2, 1, (codec_id << 5) | 0x10 | 0x01, 8,
                len(raw), len(raw), 20 + len(stream),
            )
            + struct.pack("<I", 20)
            + stream
        )
        assert lb.blosc_decompress(frame) == raw


def test_zstd_numcodecs_store_roundtrip(tmp_path):
    # a store whose chunks are plain zstd frames (numcodecs Zstd codec — the
    # zarr-python v3-era default) reads back exactly; the decoded size comes
    # from each frame's Frame_Content_Size header field
    from ophidia_server_spark.sources import codecs

    data = np.arange(40, dtype="<i8").reshape(8, 5)
    adir = tmp_path / "s" / "v"
    adir.mkdir(parents=True)
    meta = {
        "zarr_format": 2, "shape": [8, 5], "chunks": [4, 5], "dtype": "<i8",
        "compressor": {"id": "zstd", "level": 3},
        "fill_value": 0, "order": "C", "filters": None,
    }
    (adir / ".zarray").write_text(json.dumps(meta))
    for ci in range(2):
        chunk = data[ci * 4 : (ci + 1) * 4, :].tobytes()
        assert codecs.zstd_frame_content_size(codecs.zstd_compress(chunk)) == len(chunk)
        (adir / f"{ci}.0").write_bytes(codecs.zstd_compress(chunk))
    got, _ = zr.read_array(str(tmp_path / "s"), "v")
    assert np.array_equal(got, data)


def test_write_zstd_roundtrip(tmp_path):
    ds = Dataset(
        dimensions={"x": 6},
        variables={
            "x": Variable("x", ("x",), {}, np.arange(6, dtype="<f8")),
            "v": Variable("v", ("x",), {}, np.arange(6, dtype="<f8") * 1.5),
        },
        attributes={},
    )
    p = str(tmp_path / "z.zarr")
    zr.write(p, ds, compress="zstd")
    meta = json.load(open(os.path.join(p, "v", ".zarray")))
    assert meta["compressor"]["id"] == "zstd"
    got, _ = zr.read_array(p, "v")
    assert np.array_equal(got, np.arange(6, dtype="<f8") * 1.5)


def test_spark_export_blosc_per_dim_chunks(spark, tmp_path):
    # the executor-sharded export path writes blosc-lz4 chunks too
    from pyspark.sql import functions as F

    from ophidia_server_spark.cube import build_cube
    from ophidia_server_spark.operators import io_ops

    pdf = spark.createDataFrame(
        [(i, float(j), float(i * 4 + j)) for i in range(3) for j in range(4)],
        "a long, b double, m double",
    )
    cube = build_cube(pdf, ["a"], "b", F.col("m"), measure="m")
    store = str(tmp_path / "blosc.zarr")
    io_ops.oph_exportzarr(cube, store, compress="blosc-lz4", per_dim_chunks=True)
    meta = json.load(open(os.path.join(store, "m", ".zarray")))
    assert meta["compressor"]["id"] == "blosc"
    back = io_ops.oph_importzarr(spark, store, "m", ["a"], "b")
    got = {
        (r["a"], r["b"]): r["m"]
        for r in back.long().collect()
        if not np.isnan(r["m"])
    }
    want = {(float(i), float(j)): float(i * 4 + j) for i in range(3) for j in range(4)}
    assert got == want


# ---------------------------------------------------------------------------
# Zarr v3 (zarr.json layout — the zarr-python 3 default format)
# ---------------------------------------------------------------------------

def test_v3_handmade_store_reads(tmp_path):
    # store written byte-by-byte per the v3 core spec: root group zarr.json,
    # array zarr.json with bytes+zstd codecs, "c/"-prefixed chunk keys
    from ophidia_server_spark.sources import codecs

    data = np.arange(48, dtype="<f8").reshape(6, 8)
    root = tmp_path / "s"
    adir = root / "tas"
    (adir).mkdir(parents=True)
    (root / "zarr.json").write_text(json.dumps(
        {"zarr_format": 3, "node_type": "group", "attributes": {"title": "t"}}))
    (adir / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [6, 8],
        "data_type": "float64",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [3, 8]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": "NaN",
        "codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
                   {"name": "zstd", "configuration": {"level": 3}}],
        "attributes": {"units": "K"},
        "dimension_names": ["y", "x"],
    }))
    (adir / "c").mkdir()
    for ci in range(2):
        chunk = data[ci * 3 : (ci + 1) * 3, :].tobytes()
        (adir / "c" / str(ci)).mkdir()
        (adir / "c" / str(ci) / "0").write_bytes(codecs.zstd_compress(chunk))
    got, attrs = zr.read_array(str(root), "tas")
    assert np.array_equal(got, data)
    assert attrs["units"] == "K"
    assert attrs["_ARRAY_DIMENSIONS"] == ["y", "x"]
    ds = zr.read(str(root))
    assert ds.attributes == {"title": "t"}
    assert ds.variables["tas"].dimensions == ("y", "x")
    assert ds.dimensions == {"y": 6, "x": 8}


def test_v3_crc32c_and_transpose_codecs(tmp_path):
    # crc32c checksum verifies (and a flipped byte is caught); the transpose
    # array->array codec stores the permuted layout
    data = np.arange(24, dtype="<i4").reshape(4, 6)
    root = tmp_path / "s"
    adir = root / "v"
    adir.mkdir(parents=True)
    stored = np.ascontiguousarray(data.T)  # transpose order [1, 0]
    payload = stored.tobytes()
    payload += zr._crc32c(payload).to_bytes(4, "little")
    (adir / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [4, 6],
        "data_type": "int32",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4, 6]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": 0,
        "codecs": [{"name": "transpose", "configuration": {"order": [1, 0]}},
                   {"name": "bytes", "configuration": {"endian": "little"}},
                   {"name": "crc32c"}],
        "dimension_names": ["a", "b"],
    }))
    (adir / "c" / "0").mkdir(parents=True)
    (adir / "c" / "0" / "0").write_bytes(payload)
    got, _ = zr.read_array(str(root), "v")
    assert np.array_equal(got, data)
    bad = bytearray(payload)
    bad[3] ^= 0xFF
    (adir / "c" / "0" / "0").write_bytes(bytes(bad))
    with pytest.raises(zr.ZarrError, match="crc32c"):
        zr.read_array(str(root), "v")


def test_v3_write_read_roundtrip_all_codecs(tmp_path):
    ds = Dataset(
        dimensions={"x": 2100},
        variables={
            "x": Variable("x", ("x",), {}, np.arange(2100, dtype="<f8")),
            "v": Variable("v", ("x",), {"units": "m"},
                          np.arange(2100, dtype="<f8") * 0.5),
        },
        attributes={"title": "v3"},
    )
    for compress in (4, "zstd", "blosc-lz4", None):
        p = str(tmp_path / f"z3_{compress}")
        zr.write(p, ds, compress=compress, zarr_format=3)
        meta = json.load(open(os.path.join(p, "v", "zarr.json")))
        assert meta["zarr_format"] == 3
        back = zr.read(p)
        assert back.attributes == {"title": "v3"}
        assert np.array_equal(back.variables["v"].data,
                              np.arange(2100, dtype="<f8") * 0.5)
        assert back.variables["v"].attributes["units"] == "m"
        assert back.variables["v"].dimensions == ("x",)


def test_v3_shard_corrupt_index_named_error(tmp_path):
    # a shard whose index checksum is wrong fails with a named error rather
    # than returning garbage (sharded arrays ARE supported — see
    # test_v3_sharded_array_reads)
    import struct

    adir = tmp_path / "s" / "v"
    adir.mkdir(parents=True)
    (adir / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [4],
        "data_type": "float32",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": 0,
        "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": [4],
            "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
            "index_codecs": [{"name": "bytes"}, {"name": "crc32c"}],
        }}],
    }))
    body = np.arange(4, dtype="<f4").tobytes()
    idx = struct.pack("<QQ", 0, len(body)) + b"\x00\x00\x00\x00"  # bad crc
    (adir / "c").mkdir()
    (adir / "c" / "0").write_bytes(body + idx)
    with pytest.raises(zr.ZarrError, match="crc32c"):
        zr.read_array(str(tmp_path / "s"), "v")


def test_spark_import_v3_store(spark, tmp_path):
    # the distributed import path (one task per chunk) reads v3 stores:
    # zarr.json metadata, c/-prefixed keys, v3 codec chain, dimension_names
    from pyspark.sql import functions as F

    from ophidia_server_spark.cube import build_cube
    from ophidia_server_spark.operators import io_ops

    df = spark.createDataFrame(
        [(float(g), float(x), float(g * 100 + x)) for g in range(4) for x in range(5)],
        "lat double, time double, tas double",
    )
    cube = build_cube(df, ["lat"], "time", F.col("tas"), measure="tas")
    store = str(tmp_path / "v3exp")
    io_ops.oph_exportzarr(cube, store, compress="zstd", zarr_format=3)
    assert os.path.exists(os.path.join(store, "tas", "zarr.json"))
    assert not os.path.exists(os.path.join(store, "tas", ".zarray"))
    back = io_ops.oph_importzarr(spark, store, "tas", ["lat"], "time")
    rows = {(r["lat"], r["time"], r["tas"]) for r in back.long().collect()}
    assert rows == {
        (float(g), float(x), float(g * 100 + x)) for g in range(4) for x in range(5)
    }
    # hyperslab + chunk pruning works on v3 key naming too
    sub = io_ops.oph_importzarr(
        spark, store, "tas", ["lat"], "time",
        subset={"lat": "1:2"}, subset_type="coord",
    )
    got = {(r["lat"], r["time"]) for r in sub.long().collect() if r["tas"] == r["tas"]}
    assert got == {(float(g), float(x)) for g in (1, 2) for x in range(5)}


def test_v3_consolidated_metadata_one_get(tmp_path):
    # the v3 writer inlines every child's zarr.json into the root node; a
    # reader that trusts it never stats the per-array metadata files
    ds = Dataset(
        dimensions={"x": 4},
        variables={
            "x": Variable("x", ("x",), {}, np.arange(4, dtype="<f8")),
            "v": Variable("v", ("x",), {"u": "m"}, np.arange(4, dtype="<i4")),
        },
        attributes={"title": "cm"},
    )
    p = str(tmp_path / "cm")
    zr.write(p, ds, compress="zstd", zarr_format=3)
    root = json.load(open(os.path.join(p, "v") + "/../zarr.json"))
    assert root["consolidated_metadata"]["metadata"]["v"]["node_type"] == "array"
    # nuke the per-array metadata: the consolidated read path must suffice
    os.remove(os.path.join(p, "v", "zarr.json"))
    os.remove(os.path.join(p, "x", "zarr.json"))
    back = zr.read(p)
    assert back.attributes == {"title": "cm"}
    assert np.array_equal(back.variables["v"].data, np.arange(4, dtype="<i4"))
    assert back.variables["v"].attributes["u"] == "m"


def test_v3_sharded_array_reads(tmp_path):
    # handmade sharded store per the v3 sharding_indexed spec: each shard
    # object = zstd-encoded inner chunks + (offset, nbytes) u64-LE index
    # with crc32c, index at the end; one missing inner chunk = fill value
    import struct

    from ophidia_server_spark.sources import codecs

    data = np.arange(64, dtype="<f8").reshape(8, 8)
    root = tmp_path / "s"
    adir = root / "v"
    adir.mkdir(parents=True)
    (adir / "zarr.json").write_text(json.dumps({
        "zarr_format": 3, "node_type": "array", "shape": [8, 8],
        "data_type": "float64",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [8, 4]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": "NaN",
        "codecs": [{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": [4, 4],
                "codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
                           {"name": "zstd", "configuration": {"level": 3}}],
                "index_codecs": [{"name": "bytes"}, {"name": "crc32c"}],
                "index_location": "end",
            },
        }],
        "dimension_names": ["y", "x"],
    }))
    (adir / "c" / "0").mkdir(parents=True)
    MISSING = 0xFFFFFFFFFFFFFFFF
    for sj in range(2):  # shard grid: 1 x 2 shards of 8x4, inner 4x4 -> 2 inner
        shard_vals = data[:, sj * 4 : (sj + 1) * 4]
        body = b""
        entries = []
        for ii in range(2):  # inner grid 2x1 (rows)
            if sj == 1 and ii == 1:     # leave one inner chunk missing
                entries.append((MISSING, MISSING))
                continue
            piece = np.ascontiguousarray(shard_vals[ii * 4 : (ii + 1) * 4, :])
            enc = codecs.zstd_compress(piece.tobytes())
            entries.append((len(body), len(enc)))
            body += enc
        idx = b"".join(struct.pack("<QQ", o, nb) for o, nb in entries)
        idx += zr._crc32c(idx).to_bytes(4, "little")
        (adir / "c" / "0" / str(sj)).write_bytes(body + idx)
    got, attrs = zr.read_array(str(root), "v")
    assert np.array_equal(got[:, :4], data[:, :4])
    assert np.array_equal(got[:4, 4:], data[:4, 4:])
    assert np.isnan(got[4:, 4:]).all()  # the missing inner chunk = fill


def test_v3_sharded_write_read_roundtrip(tmp_path):
    # write sharded (2 shards of 4x6, inner 2x3 -> 4 inner chunks each),
    # read back through the shard-index decoder; the store holds 2 chunk
    # objects, not 8 (the object-count knob at scale)
    ds = Dataset(
        dimensions={"y": 8, "x": 6},
        variables={
            "v": Variable("v", ("y", "x"), {"u": "K"},
                          np.arange(48, dtype="<f8").reshape(8, 6)),
        },
        attributes={},
    )
    p = str(tmp_path / "sharded")
    zr.write(p, ds, chunks={"v": (4, 6)}, compress="zstd", zarr_format=3,
             shard_inner={"v": (2, 3)})
    meta = json.load(open(os.path.join(p, "v", "zarr.json")))
    assert meta["codecs"][0]["name"] == "sharding_indexed"
    assert meta["codecs"][0]["configuration"]["chunk_shape"] == [2, 3]
    files = []
    for root, _dirs, fs in os.walk(os.path.join(p, "v", "c")):
        files += [os.path.join(root, f) for f in fs]
    assert len(files) == 2  # shards, not inner chunks
    back = zr.read(p)
    assert np.array_equal(back.variables["v"].data,
                          np.arange(48, dtype="<f8").reshape(8, 6))
    assert back.variables["v"].attributes["u"] == "K"
    # a non-dividing inner shape is a named error
    with pytest.raises(zr.ZarrError, match="divide"):
        zr.write(str(tmp_path / "bad"), ds, chunks={"v": (4, 6)},
                 zarr_format=3, shard_inner={"v": (3, 3)})


def test_spark_import_v3_sharded_store(spark, tmp_path):
    # the one-task-per-chunk import path decodes shard objects too (each
    # task parses its shard's index and inner chunks)
    from pyspark.sql import functions as F

    from ophidia_server_spark.cube import build_cube
    from ophidia_server_spark.operators import io_ops

    df = spark.createDataFrame(
        [(float(g), float(x), float(g * 100 + x)) for g in range(4) for x in range(6)],
        "lat double, time double, tas double",
    )
    cube = build_cube(df, ["lat"], "time", F.col("tas"), measure="tas")
    store = str(tmp_path / "v3shard")
    io_ops.oph_exportzarr(
        cube, store, compress="zstd", zarr_format=3, shard_inner={"tas": (2, 3)}
    )
    meta = json.load(open(os.path.join(store, "tas", "zarr.json")))
    assert meta["codecs"][0]["name"] == "sharding_indexed"
    back = io_ops.oph_importzarr(spark, store, "tas", ["lat"], "time")
    rows = {(r["lat"], r["time"], r["tas"]) for r in back.long().collect()}
    assert rows == {
        (float(g), float(x), float(g * 100 + x)) for g in range(4) for x in range(6)
    }
