"""I/O operator pack tests: fs listing, glob expansion, publish, netCDF gate."""

import os

import pytest
from pyspark.sql import functions as F

from ophidia_server_spark.cube import build_cube
from ophidia_server_spark.operators import io_ops


def test_oph_fs_filter_and_recursion(tmp_path):
    (tmp_path / "a_12.test").write_text("")
    (tmp_path / "a_xx.dat").write_text("")
    sub = tmp_path / "inner"
    sub.mkdir()
    (sub / "b_13.test").write_text("")
    flat = io_ops.oph_fs(str(tmp_path), file_filter=r"\.test$")
    assert [f["name"] for f in flat] == ["a_12.test"]
    rec = io_ops.oph_fs(str(tmp_path), file_filter=r"\.test$", recursive=True)
    assert [f["name"] for f in rec] == ["a_12.test", "b_13.test"]
    assert all(f["type"] == "f" for f in rec)


def test_expand_file_glob(tmp_path):
    for n in ("x1.nc", "x2.nc", "y.nc"):
        (tmp_path / n).write_text("")
    got = io_ops.expand_file_glob(str(tmp_path / "x*.nc"))
    assert [os.path.basename(p) for p in got] == ["x1.nc", "x2.nc"]


def test_importnc_multi_file(spark, tmp_path):
    # importncs shape: several .nc files fan out to tasks, one cube out
    import numpy as np

    from ophidia_server_spark.sources import netcdf3 as nc

    paths = []
    for i in range(3):
        ds = nc.Dataset()
        ds.dimensions = {"lat": 2, "time": 2}
        ds.variables["lat"] = nc.Variable("lat", ("lat",), {}, np.array([10.0 * i, 10.0 * i + 5]))
        ds.variables["time"] = nc.Variable("time", ("time",), {}, np.array([1.0, 2.0]))
        ds.variables["tas"] = nc.Variable(
            "tas", ("lat", "time"), {}, np.arange(4, dtype="float64").reshape(2, 2) + 10 * i
        )
        p = str(tmp_path / f"f{i}.nc")
        nc.write(p, ds)
        paths.append(p)
    cube = io_ops.oph_importnc(spark, paths, "tas", ["lat"], "time")
    rows = {(r["lat"], r["time"], r["tas"]) for r in cube.long().collect()}
    assert len(rows) == 12
    assert (0.0, 1.0, 0.0) in rows and (15.0, 2.0, 13.0) in rows


def test_publish_unpublish(spark, tmp_path):
    df = spark.createDataFrame([("a", 1, 1.0), ("a", 2, 2.0)], "g string, t int, v double")
    cube = build_cube(df, ["g"], "t", F.col("v"), measure="v")
    out = io_ops.oph_publish(cube, str(tmp_path), "mycube")
    assert os.path.exists(out + ".html")
    assert os.path.isdir(out + ".parquet")
    html = open(out + ".html").read()
    assert "<table>" in html and "<td>a</td>" in html
    io_ops.oph_unpublish(str(tmp_path), "mycube")
    assert not os.path.exists(out + ".html")
    assert not os.path.isdir(out + ".parquet")


def test_export_import_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 5.0)], "g string, t int, v double"
    )
    cube = build_cube(df, ["g"], "t", F.col("v"), measure="v")
    io_ops.oph_exportparquet(cube, str(tmp_path / "c"))
    back = spark.read.parquet(str(tmp_path / "c"))
    assert back.count() == 2
    assert set(back.columns) == {"g", "__dim", "__m"}


def test_fs_reference_fixture_layout(tmp_path):
    """Mirror the reference's file-massive test fixtures
    (/root/reference/test/testdata: a, a_12.test, a_123.test;
    testdata2: b_1.tst, b_123.tst, b_124.test, b_13.test) and its file=regex +
    recursion semantics."""
    from ophidia_server_spark.operators.io_ops import oph_fs

    d = tmp_path / "testdata"
    d2 = d / "testdata2"
    d2.mkdir(parents=True)
    for f in ("a", "a_12.test", "a_123.test"):
        (d / f).touch()
    for f in ("b_1.tst", "b_123.tst", "b_124.test", "b_13.test"):
        (d2 / f).touch()

    # non-recursive: only the top dir
    names = [e["name"] for e in oph_fs(str(d))]
    assert names == ["a", "a_12.test", "a_123.test"]
    # regex filter like file=.*\.test
    names = [e["name"] for e in oph_fs(str(d), file_filter=r"\.test$")]
    assert names == ["a_12.test", "a_123.test"]
    # recursive + regex spans both levels
    names = sorted(e["name"] for e in oph_fs(str(d), file_filter=r"\.test$", recursive=True))
    assert names == ["a_12.test", "a_123.test", "b_124.test", "b_13.test"]
    # digit-pattern filter (reference uses patterns like a_12x variants)
    names = sorted(e["name"] for e in oph_fs(str(d), file_filter=r"_12\d", recursive=True))
    assert names == ["a_123.test", "b_123.tst", "b_124.test"]


def test_importnc_hyperslab_subset(spark, tmp_path):
    import numpy as np

    from ophidia_server_spark.sources import netcdf3 as nc

    ds = nc.Dataset()
    ds.dimensions = {"lat": 4, "time": 6}
    ds.variables["lat"] = nc.Variable("lat", ("lat",), {}, np.array([0.0, 10.0, 20.0, 30.0]))
    ds.variables["time"] = nc.Variable("time", ("time",), {}, np.arange(1.0, 7.0))
    ds.variables["tas"] = nc.Variable(
        "tas", ("lat", "time"), {}, np.arange(24, dtype="float64").reshape(4, 6)
    )
    p = str(tmp_path / "h.nc")
    nc.write(p, ds)

    # coord subset: lat in [10,20], time in [2,4] -> 2x3 slab
    cube = io_ops.oph_importnc(
        spark, [p], "tas", ["lat"], "time",
        subset={"lat": "10:20", "time": "2:4"}, subset_type="coord",
    )
    rows = {(r["lat"], r["time"], r["tas"]) for r in cube.long().collect()}
    assert len(rows) == 6
    assert (10.0, 2.0, 7.0) in rows and (20.0, 4.0, 15.0) in rows
    assert all(10.0 <= lat <= 20.0 and 2.0 <= t <= 4.0 for lat, t, _ in rows)

    # index subset: every other time step (1-based triplet), 'end' keyword
    cube = io_ops.oph_importnc(
        spark, [p], "tas", ["lat"], "time",
        subset={"time": "1:2:end"}, subset_type="index",
    )
    rows = {(r["lat"], r["time"], r["tas"]) for r in cube.long().collect()}
    assert len(rows) == 12  # 4 lats x times {1,3,5}
    assert {t for _, t, _ in rows} == {1.0, 3.0, 5.0}


def test_cf_time_decode(spark, tmp_path):
    import numpy as np

    from ophidia_server_spark.sources import netcdf3 as nc

    ds = nc.Dataset()
    ds.dimensions = {"time": 3}
    ds.variables["time"] = nc.Variable(
        "time", ("time",), {"units": "days since 2000-01-01"}, np.array([0.0, 1.0, 31.0])
    )
    ds.variables["tas"] = nc.Variable("tas", ("time",), {}, np.array([1.0, 2.0, 3.0]))
    p = str(tmp_path / "cf.nc")
    nc.write(p, ds)

    units = io_ops.nc_time_units(p, "time")
    assert units == "days since 2000-01-01"
    cube = io_ops.oph_importnc(spark, [p], "tas", [], "time")
    out = cube.long().withColumn("ts", io_ops.cf_time_column(F.col("time"), units))
    got = sorted(str(r["ts"]) for r in out.collect())
    assert got == ["2000-01-01 00:00:00", "2000-01-02 00:00:00", "2000-02-01 00:00:00"]

    # hours variant + error path
    hrs = io_ops.cf_time_column(F.lit(25.0), "hours since 1999-12-31 00:00:00")
    assert str(spark.range(1).select(hrs.alias("t")).first()["t"]) == "2000-01-01 01:00:00"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        io_ops.cf_time_column(F.lit(1), "fortnights since 2000-01-01")


def test_importnc_empty_paths_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no input files"):
        io_ops.oph_importnc(spark, [], "tas", ["lat"], "time")


def test_cf_time_legacy_origin(spark):
    # legacy CF spellings ('1-1-1 00:00:0.0'-style) must either parse or fail
    # fast — never silently produce NULL timestamps
    col = io_ops.cf_time_column(F.lit(1.0), "days since 2000-1-1 0:0:0")
    assert str(spark.range(1).select(col.alias("t")).first()["t"]) == "2000-01-02 00:00:00"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unparseable CF origin"):
        io_ops.cf_time_column(F.lit(1.0), "days since sometime")


def test_importnc_netcdf4_hdf5(spark, tmp_path):
    # the same import path must ingest netCDF-4 (HDF5 container) files: the
    # codec dispatch on the \x89HDF magic happens inside each decode task
    import numpy as np

    from ophidia_server_spark.sources import hdf5, netcdf3 as nc

    paths = []
    for i in range(2):
        ds = nc.Dataset()
        ds.dimensions = {"lat": 2, "time": 3}
        ds.variables["lat"] = nc.Variable(
            "lat", ("lat",), {}, np.array([10.0 * i, 10.0 * i + 5])
        )
        ds.variables["time"] = nc.Variable(
            "time", ("time",), {}, np.array([1.0, 2.0, 3.0])
        )
        ds.variables["tas"] = nc.Variable(
            "tas", ("lat", "time"), {"units": "K"},
            np.arange(6, dtype="float64").reshape(2, 3) + 100 * i,
        )
        p = str(tmp_path / f"v4_{i}.nc")
        hdf5.write(p, ds, compress=2 if i else None)  # one deflated, one raw
        assert open(p, "rb").read(4) == b"\x89HDF"
        paths.append(p)
    cube = io_ops.oph_importnc(spark, paths, "tas", ["lat"], "time")
    rows = {(r["lat"], r["time"], r["tas"]) for r in cube.long().collect()}
    assert len(rows) == 12
    assert (0.0, 1.0, 0.0) in rows and (15.0, 3.0, 105.0) in rows


def test_exportnc_netcdf4_roundtrip(spark, tmp_path):
    # cube -> netCDF-4 (HDF5) export -> importnc again: values identical
    import numpy as np

    df = spark.createDataFrame(
        [(float(g), float(t), float(g * 10 + t)) for g in range(3) for t in range(4)],
        "lat double, time double, tas double",
    )
    cube = build_cube(df, ["lat"], "time", F.col("tas"), measure="tas")
    out = io_ops.oph_exportnc(
        cube, str(tmp_path / "exp4"), nc_format="netcdf4", compress=4
    )
    assert len(out) == 1 and open(out[0], "rb").read(4) == b"\x89HDF"
    back = io_ops.oph_importnc(spark, out, "tas", ["lat"], "time")
    rows = {(r["lat"], r["time"], r["tas"]) for r in back.long().collect()}
    assert rows == {
        (float(g), float(t), float(g * 10 + t)) for g in range(3) for t in range(4)
    }


def test_importnc_netcdf4_hyperslab_prunes_chunks(spark, tmp_path):
    # netCDF-4 hyperslab: the codec prunes whole chunks — observable by
    # corrupting an out-of-range chunk's bytes (its inflation would raise)
    import numpy as np

    from ophidia_server_spark.sources import hdf5, netcdf3 as nc

    ds = nc.Dataset()
    ds.dimensions = {"lat": 2, "time": 8}
    ds.variables["lat"] = nc.Variable("lat", ("lat",), {}, np.array([10.0, 20.0]))
    ds.variables["time"] = nc.Variable(
        "time", ("time",), {}, np.arange(1.0, 9.0)
    )
    ds.variables["tas"] = nc.Variable(
        "tas", ("lat", "time"), {}, np.arange(16, dtype="float64").reshape(2, 8)
    )
    p = str(tmp_path / "slab4.nc")
    # chunk_rows=1 over dim lat -> whole-time chunks; re-chunk by writing
    # time-major instead: transpose so time is first and chunks split time
    ds2 = nc.Dataset()
    ds2.dimensions = {"time": 8, "lat": 2}
    ds2.variables["time"] = ds.variables["time"]
    ds2.variables["lat"] = ds.variables["lat"]
    ds2.variables["tas"] = nc.Variable(
        "tas", ("time", "lat"), {},
        np.arange(16, dtype="float64").reshape(2, 8).T.copy(),
    )
    hdf5.write(p, ds2, compress=4, chunk_rows=2)  # 4 chunks of 2 time rows

    cube = io_ops.oph_importnc(
        spark, [p], "tas", ["time"], "lat",
        subset={"time": "1:4"}, subset_type="coord",
    )
    rows = {(r["time"], r["lat"], r["tas"]) for r in cube.long().collect()}
    base = np.arange(16, dtype="float64").reshape(2, 8)
    want = {
        (float(t + 1), [10.0, 20.0][la], float(base[la, t]))
        for t in range(4) for la in range(2)
    }
    assert rows == want

    # corrupt the LAST chunk (times 7,8 — outside 1:4): find its compressed
    # bytes via the chunk B-tree and zero them; the subset import must still
    # succeed because that chunk is pruned before inflation
    import struct as _s

    buf = bytearray(open(p, "rb").read())
    i = -1
    last = None
    while True:
        i = buf.find(b"TREE", i + 1)
        if i < 0:
            break
        if buf[i + 4] == 1:
            used = _s.unpack_from("<H", buf, i + 6)[0]
            q = i + 24
            key_len = 8 + 8 * 3
            for _ in range(used):
                csize = _s.unpack_from("<I", buf, q)[0]
                offs0 = _s.unpack_from("<Q", buf, q + 8)[0]
                caddr = _s.unpack_from("<Q", buf, q + key_len)[0]
                if offs0 == 6:  # chunk starting at time index 6
                    last = (caddr, csize)
                q += key_len + 8
    assert last is not None
    caddr, csize = last
    buf[caddr : caddr + csize] = b"\x00" * csize
    open(p, "wb").write(bytes(buf))

    cube2 = io_ops.oph_importnc(
        spark, [p], "tas", ["time"], "lat",
        subset={"time": "1:4"}, subset_type="coord",
    )
    assert {(r["time"], r["lat"], r["tas"]) for r in cube2.long().collect()} == want
    # and WITHOUT the subset the corrupt chunk is read -> decode fails
    import pytest

    with pytest.raises(Exception):
        io_ops.oph_importnc(spark, [p], "tas", ["time"], "lat").long().collect()


def test_exportparquet_sorted_by_prunes(spark, tmp_path):
    # range-clustered export: each parquet file covers a narrow,
    # non-overlapping range of the sort dim, so min/max stats prune whole
    # files for range queries (verified on the files' own metadata)
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ophidia_server_spark.cube import build_cube
    from ophidia_server_spark.operators import io_ops

    df = spark.createDataFrame(
        [(float(g), float(x), float(g * 10 + x))
         for g in range(64) for x in range(4)],
        "lat double, time double, tas double",
    )
    cube = build_cube(df, ["lat"], "time", F.col("tas"), measure="tas")
    out = str(tmp_path / "sorted.parquet")
    io_ops.oph_exportparquet(cube, out, sorted_by=["lat"], n_files=8)
    ranges = []
    for fn in os.listdir(out):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, fn)).metadata
        names = md.schema.to_arrow_schema().names
        idx = names.index("lat")
        lo = min(md.row_group(r).column(idx).statistics.min for r in range(md.num_row_groups))
        hi = max(md.row_group(r).column(idx).statistics.max for r in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1  # actually range-partitioned into several files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # non-overlapping: a range filter skips whole files
    # and the data still reads back complete
    back = io_ops.oph_importparquet(spark, out, ["lat"], "time", "tas", measure="tas")
    assert back.long().count() == 64 * 4


def test_arrow_ipc_roundtrip_sharded(spark, tables, tmp_path):
    from ophidia_server_spark.cube import build_cube
    from ophidia_server_spark.operators import io_ops
    from pyspark.sql import functions as F

    li = tables["lineitem"].withColumn("month", F.month("l_shipdate"))
    cube = build_cube(
        li, ["l_returnflag", "l_linestatus"], "month",
        F.col("l_quantity").cast("decimal(18,2)"), measure="qty",
    )
    path = str(tmp_path / "arrow_store")
    files = io_ops.oph_exportarrow(cube, path, shards=4)
    assert 1 <= len(files) <= 4 and all(f.endswith(".arrow") for f in files)
    back = io_ops.oph_importarrow(
        spark, path, ["l_returnflag", "l_linestatus"], "month", "qty",
        measure="qty",
    )
    want = {
        tuple(r) for r in cube.long().collect()
    }
    got = {tuple(r) for r in back.long().collect()}
    assert got == want


def test_arrow_import_rejects_unsupported_type(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.feather as feather
    import pytest

    from ophidia_server_spark.operators import io_ops

    t = pa.table({"m": [{"a": 1}]})  # struct column: outside the subset
    f = str(tmp_path / "part-00000.arrow")
    feather.write_feather(t, f)
    with pytest.raises(ValueError, match="struct"):
        io_ops.oph_importarrow(spark, str(tmp_path), ["m"], "m", "m")


def test_repack_parquet_targets_file_count(spark, tables, tmp_path):
    import glob

    from ophidia_server_spark.operators import io_ops

    docs = tables["documents"]
    out = str(tmp_path / "repacked")
    info = io_ops.repack_parquet(docs, out, target_mb=0.02)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == info["n_files"] > 1
    # estimate is derived from real column stats, so it tracks actual bytes
    # within the compression-model slack
    actual = sum(__import__("os").path.getsize(f) for f in files)
    assert 0.1 * actual < info["est_bytes"] < 10 * actual
    # content survives the repack
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # explicit bytes_per_row skips the stats pass and pins the count
    info2 = io_ops.repack_parquet(docs, out, target_mb=1024, bytes_per_row=100.0)
    assert info2["n_files"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        io_ops.repack_parquet(docs, out, target_mb=0)


def test_safetensors_roundtrip_and_spec_validation(spark, tables, tmp_path):
    # from-spec sharded safetensors: bit-exact float32 roundtrip,
    # byte-reproducible shards, and named refusals for spec violations
    import json
    import struct

    import pytest

    from ophidia_server_spark.operators.io_ops import (
        oph_exportsafetensors, oph_importsafetensors,
    )

    emb = tables["embeddings"]
    path = str(tmp_path / "st")
    files = oph_exportsafetensors(emb, path, shards=4)
    assert len(files) == 4
    back = oph_importsafetensors(spark, path)
    assert back.count() == emb.count()
    a = {r["vec_id"]: (r["label"], tuple(r["embedding"]))
         for r in emb.collect()}
    b = {r["vec_id"]: (r["label"], tuple(r["embedding"]))
         for r in back.collect()}
    assert a == b  # float32 exact
    # deterministic bytes: exporting again produces identical shards
    path2 = str(tmp_path / "st2")
    files2 = oph_exportsafetensors(emb.repartition(7), path2, shards=4)
    for f1, f2 in zip(files, files2):
        assert open(f1, "rb").read() == open(f2, "rb").read()
    # header structure is real safetensors: u64 length + JSON + buffer
    blob = open(files[0], "rb").read()
    n = struct.unpack("<Q", blob[:8])[0]
    hdr = json.loads(blob[8:8 + n])
    assert set(hdr) == {"ids", "embeddings", "labels", "__metadata__"}
    assert hdr["embeddings"]["dtype"] == "F32"

    # violated offsets are refused by name
    bad = dict(hdr)
    bad["ids"] = dict(hdr["ids"], data_offsets=[8, hdr["ids"]["data_offsets"][1]])
    bj = json.dumps(bad, separators=(",", ":")).encode()
    bj += b" " * (-len(bj) % 8)
    bad_path = tmp_path / "bad"
    bad_path.mkdir()
    with open(bad_path / "x.safetensors", "wb") as fh:
        fh.write(struct.pack("<Q", len(bj)) + bj + blob[8 + n:])
    with pytest.raises(Exception, match="non-contiguous|cover"):
        oph_importsafetensors(spark, str(bad_path)).collect()
