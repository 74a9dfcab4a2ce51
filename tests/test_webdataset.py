"""WebDataset tar-shard sink/source tests.

Format rules from the public webdataset spec: a shard is a plain tar; a
sample is the set of members sharing a basename stem (key = name up to the
FIRST dot); each member's extension names the sample-dict field.
"""

import hashlib
import os
import tarfile

import pytest


def _export(spark, df, path, **kw):
    from ophidia_server_spark.operators import io_ops

    return io_ops.oph_exportwebdataset(df, path, "doc_id", **kw)


def test_roundtrip_text_binary_json(spark, tables, tmp_path):
    from pyspark.sql import functions as F

    from ophidia_server_spark.operators import io_ops

    docs = tables["documents"].limit(40).select(
        "doc_id", "text", "lang",
        F.encode(F.col("source"), "utf-8").alias("payload"),  # binary member
        "n_chars",                                            # json member
    )
    path = str(tmp_path / "wds")
    files = _export(spark, docs, path, shards=4)
    assert files and all(f.endswith(".tar") for f in files)
    back = io_ops.oph_importwebdataset(
        spark, path, "doc_id",
        "doc_id bigint, text string, lang string, payload binary, n_chars bigint",
    )
    orig = sorted(docs.collect(), key=lambda r: r["doc_id"])
    got = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [r.asDict() for r in got] == [r.asDict() for r in orig]


def test_shards_are_byte_reproducible(spark, tables, tmp_path):
    docs = tables["documents"].limit(20).select("doc_id", "text", "lang")

    def digest(d):
        files = _export(spark, docs, str(d), shards=2)
        return [hashlib.md5(open(f, "rb").read()).hexdigest() for f in files]

    assert digest(tmp_path / "a") == digest(tmp_path / "b")


def test_members_follow_webdataset_layout(spark, tables, tmp_path):
    """Members are `<key>.<column>`, samples contiguous and key-sorted
    within a shard — the sequential-read contract loaders rely on."""
    docs = tables["documents"].limit(30).select("doc_id", "text", "lang")
    path = str(tmp_path / "wds")
    files = _export(spark, docs, path, shards=2)
    for f in files:
        with tarfile.open(f) as tar:
            names = tar.getnames()
        stems = [n.partition(".")[0] for n in names]
        exts = [n.partition(".")[2] for n in names]
        assert all(e in ("text", "lang") for e in exts)
        # contiguous runs of 2 members per sample, stems sorted by key value
        assert stems == sorted(stems, key=int)
        assert all(stems[i] == stems[i + 1] for i in range(0, len(stems), 2))


def test_multidot_extension_and_null_member(spark, tmp_path):
    """A column named like `cap.json` keeps its whole multi-dot extension
    (key = up-to-first-dot), and a NULL value simply omits the member."""
    from ophidia_server_spark.operators import io_ops

    df = spark.createDataFrame(
        [(1, "alpha", '{"a":1}'), (2, None, '{"b":2}')],
        "doc_id bigint, txt string, `cap.json` string",
    )
    path = str(tmp_path / "wds")
    files = io_ops.oph_exportwebdataset(df, path, "doc_id", shards=1)
    with tarfile.open(files[0]) as tar:
        names = set(tar.getnames())
    assert "1.cap.json" in names and "2.cap.json" in names
    assert "1.txt" in names and "2.txt" not in names
    back = io_ops.oph_importwebdataset(
        spark, path, "doc_id", "doc_id bigint, txt string, `cap.json` string"
    ).collect()
    by_id = {r["doc_id"]: r for r in back}
    assert by_id[1]["txt"] == "alpha" and by_id[2]["txt"] is None
    assert by_id[2]["cap.json"] == '{"b":2}'


def test_missing_key_column_raises(spark, tables):
    from ophidia_server_spark.operators import io_ops

    with pytest.raises(ValueError, match="key column"):
        io_ops.oph_exportwebdataset(
            tables["documents"].select("text"), "/tmp/never", "doc_id"
        )
