"""TFRecord codec + sharded Spark sink/source tests.

Framing and tf.train.Example wire shapes from the public TensorFlow specs
(record_writer.h framing; example.proto/feature.proto messages) — see
sources/tfrecord.py. The golden-bytes case pins the canonical encoding so
any wire-format regression is caught byte-for-byte.
"""

import os
import struct

import pytest

from ophidia_server_spark.sources import tfrecord as tfr


def test_crc32c_and_mask_vectors():
    # the standard CRC-32C check vector, then the TFRecord mask algebra
    from ophidia_server_spark.sources.zarr import _crc32c

    assert _crc32c(b"123456789") == 0xE3069283
    crc = _crc32c(b"foo")
    want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert tfr.masked_crc(b"foo") == want


def test_varint_int64_negative_is_ten_bytes():
    enc = tfr._varint(-2)
    assert len(enc) == 10  # two's-complement int64, per the protobuf spec
    val, pos = tfr._read_varint(enc, 0)
    assert pos == len(enc) and tfr._signed64(val) == -2


def test_example_golden_bytes():
    """Hand-checkable golden: one bytes feature 'k' -> 'v'.

    Example.features (field 1, LD) wraps one map entry (field 1, LD) of
    key='k' (field 1) and Feature{bytes_list{value:['v']}} (field 2)."""
    got = tfr.encode_example({"k": "v"})
    bytes_list = bytes.fromhex("0a01") + b"v"                       # value: 'v'
    feature = bytes.fromhex("0a03") + bytes_list                    # bytes_list
    entry = bytes.fromhex("0a016b") + bytes.fromhex("1205") + feature
    want = bytes.fromhex("0a0c") + bytes.fromhex("0a0a") + entry
    assert got == want


def test_example_roundtrip_all_kinds(tmp_path):
    ex = tfr.encode_example(
        {
            "text": "héllo",           # utf-8 bytes feature
            "blob": b"\x00\xff\x10",
            "ids": [1, -2, 3_000_000_000],
            "score": [1.5, -0.25],      # exact binary32 values
            "one_int": 7,
            "missing": None,
        }
    )
    d = tfr.decode_example(ex)
    assert d["text"] == ("bytes", ["héllo".encode()])
    assert d["blob"] == ("bytes", [b"\x00\xff\x10"])
    assert d["ids"] == ("int64", [1, -2, 3_000_000_000])
    assert d["score"] == ("float", [1.5, -0.25])
    assert d["one_int"] == ("int64", [7])
    assert "missing" not in d


def test_encoding_is_canonical():
    a = tfr.encode_example({"a": 1, "b": "x"})
    b = tfr.encode_example({"b": "x", "a": 1})
    assert a == b


def test_framing_detects_each_corruption(tmp_path):
    p = str(tmp_path / "r.tfrecord")
    payload = tfr.encode_example({"k": "v"})
    tfr.write_records(p, [payload])
    raw = open(p, "rb").read()
    # header crc byte, body byte, truncation
    for attack, msg in [
        (raw[:8] + bytes([raw[8] ^ 1]) + raw[9:], "length CRC"),
        (raw[:12] + bytes([raw[12] ^ 1]) + raw[13:], "data CRC"),
        (raw[:-2], "truncated"),
    ]:
        open(p, "wb").write(attack)
        with pytest.raises(tfr.TFRecordError):
            list(tfr.read_records(p))
    # a fresh valid file still reads
    tfr.write_records(p, [payload, payload])
    assert list(tfr.read_records(p)) == [payload, payload]


def test_spark_roundtrip_sharded(spark, tables, tmp_path):
    """documents + embedding-style columns through the sharded sink and
    back: strings, int64s, and a float32 list survive exactly; shard files
    are written executor-side and read one-task-per-file."""
    from pyspark.sql import functions as F

    from ophidia_server_spark.operators import io_ops

    docs = (
        tables["documents"]
        .limit(50)
        .select(
            "doc_id",
            "lang",
            "text",
            "n_chars",
            F.array(
                (F.col("doc_id") % 7).cast("float") / 4.0,
                F.lit(-1.25).cast("float"),
            ).alias("vec"),
        )
    )
    path = str(tmp_path / "tfr")
    files = io_ops.oph_exporttfrecord(docs, path, shards=4)
    assert files and all(f.endswith(".tfrecord") for f in files)
    back = io_ops.oph_importtfrecord(
        spark, path,
        "doc_id bigint, lang string, text string, n_chars bigint, "
        "vec array<float>",
    )
    orig = sorted(docs.collect(), key=lambda r: r["doc_id"])
    got = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [r.asDict() for r in got] == [r.asDict() for r in orig]


def test_export_rejects_unsupported_type(spark, tables):
    from ophidia_server_spark.operators import io_ops

    ev = tables["events"].select("event_id", "ts")
    with pytest.raises(ValueError, match="ts.*feature kind"):
        io_ops.oph_exporttfrecord(ev, "/tmp/never")
