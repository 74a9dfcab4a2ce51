"""Avro Object Container File codec + Spark sink/source tests.

Wire shapes from the public Apache Avro spec: zigzag varints, the Obj\\x01
container with a metadata map and per-block sync markers, raw-deflate
block compression.
"""

import pytest

from ophidia_server_spark.sources import avro as av


def test_zigzag_spec_vectors():
    # the spec's varint examples: 0->00, -1->01, 1->02, -2->03, 2->04,
    # -64->7f, 64->80 01
    vectors = [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
               (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]
    for n, enc in vectors:
        assert av.write_long(n) == enc
        val, pos = av.read_long(memoryview(enc), 0)
        assert (val, pos) == (n, len(enc))


def test_container_structure(tmp_path):
    p = str(tmp_path / "a.avro")
    schema = {
        "type": "record", "name": "row",
        "fields": [{"name": "x", "type": "long"}],
    }
    av.write_container(p, schema, [{"x": 1}, {"x": 2}], codec="null")
    raw = open(p, "rb").read()
    assert raw[:4] == b"Obj\x01"
    sync = raw[-16:]
    # the sync marker after the header equals the one closing the block
    assert raw.count(sync) == 2


def test_roundtrip_all_types_both_codecs(tmp_path):
    schema = {
        "type": "record", "name": "row",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "raw", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
    rows = [
        {"b": True, "i": -(2**40), "d": 1.5, "f": 0.25, "s": "héllo",
         "raw": b"\x00\xff", "arr": [1, -2, 3]},
        {"b": False, "i": 7, "d": -0.0, "f": 2.0, "s": None,
         "raw": b"", "arr": []},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"{codec}.avro")
        assert av.write_container(p, schema, rows, codec=codec) == 2
        got_schema, got = av.read_container(p)
        assert got_schema == schema
        assert list(got) == rows


def test_multiblock_and_corruption(tmp_path):
    p = str(tmp_path / "blocks.avro")
    schema = {"type": "record", "name": "row",
              "fields": [{"name": "x", "type": "long"}]}
    rows = [{"x": i} for i in range(1000)]
    av.write_container(p, schema, rows, codec="null", block_rows=128)
    _, got = av.read_container(p)
    assert list(got) == rows
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # corrupt the final sync marker
    open(p, "wb").write(bytes(raw))
    _, got = av.read_container(p)
    with pytest.raises(av.AvroError, match="sync marker"):
        list(got)


def test_unsupported_schema_named(tmp_path):
    with pytest.raises(av.AvroError, match="unsupported schema node"):
        av.write_container(
            str(tmp_path / "x.avro"),
            {"type": "record", "name": "r",
             "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}]},
            [{"m": {}}],
        )


def test_spark_roundtrip_sharded(spark, tables, tmp_path):
    from pyspark.sql import functions as F

    from ophidia_server_spark.operators import io_ops

    docs = tables["documents"].limit(60).select(
        "doc_id", "text", "lang", "n_chars",
        F.array((F.col("doc_id") % 5).cast("double"), F.lit(0.5)).alias("v"),
    )
    path = str(tmp_path / "avro")
    files = io_ops.oph_exportavro(docs, path, shards=4)
    assert files and all(f.endswith(".avro") for f in files)
    back = io_ops.oph_importavro(spark, path)
    orig = sorted(docs.collect(), key=lambda r: r["doc_id"])
    got = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [r.asDict() for r in got] == [r.asDict() for r in orig]


def test_spark_export_rejects_timestamp(spark, tables):
    from ophidia_server_spark.operators import io_ops

    with pytest.raises(ValueError, match="no Avro mapping"):
        io_ops.oph_exportavro(tables["events"].select("event_id", "ts"), "/tmp/never")
