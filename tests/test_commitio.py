"""Scheme-aware commit protocol (round 13, VERDICT r12 item 5).

The snapshot manifests (layout._commit_manifest) and the vector store's
compaction swap (vector_store.index_compact) previously assumed atomic
POSIX rename/hardlink — true locally and on HDFS, FALSE on S3-class
object stores where rename is copy+delete. commitio abstracts the commit
primitive: posix = hardlink create-exclusive + rename swaps; object =
conditional put + generation pointers, with rename NEVER called on the
commit path. These tests run the object strategy on local disk
(SPARK_GRAFT_COMMIT_BACKEND=object) under a fake non-atomic rename that
raises if the protocol ever touches it, and prove no observable state is
ever a half-visible version.
"""

import json
import os

import pytest

from ophidia_server_spark import commitio


@pytest.fixture
def object_backend(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_BACKEND", "object")


@pytest.fixture
def rename_forbidden(monkeypatch):
    """A fake filesystem where rename is NOT available as an atomic
    primitive: any call on the commit path is an immediate failure, the
    way a copy+delete 'rename' on an object store is a silent hazard."""
    def boom(*a, **k):
        raise AssertionError(
            f"rename called on the object-scheme commit path: {a}"
        )

    monkeypatch.setattr(os, "rename", boom)
    monkeypatch.setattr(os, "replace", boom)


def test_commit_scheme_detection(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_COMMIT_BACKEND", raising=False)
    assert commitio.commit_scheme("/data/tbl") == "posix"
    assert commitio.commit_scheme("file:///data/tbl") == "posix"
    assert commitio.commit_scheme("hdfs://nn/data/tbl") == "posix"
    for s in ("s3", "s3a", "gs", "abfss", "oss", "wasbs"):
        assert commitio.commit_scheme(f"{s}://bucket/tbl") == "object"
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_BACKEND", "object")
    assert commitio.commit_scheme("/data/tbl") == "object"
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_BACKEND", "bogus")
    with pytest.raises(ValueError, match="posix|object"):
        commitio.commit_scheme("/data/tbl")


def test_publish_exclusive_object_no_rename_and_single_winner(
    tmp_path, rename_forbidden
):
    final = tmp_path / "v1.json"
    t1, t2 = tmp_path / ".t1", tmp_path / ".t2"
    t1.write_text('{"who": "winner"}')
    t2.write_text('{"who": "loser"}')
    commitio.publish_exclusive(str(t1), str(final), "object")
    assert json.loads(final.read_text()) == {"who": "winner"}
    assert not t1.exists()  # consumed
    with pytest.raises(FileExistsError):
        commitio.publish_exclusive(str(t2), str(final), "object")
    # the loser never half-overwrites the winner
    assert json.loads(final.read_text()) == {"who": "winner"}


def test_publish_exclusive_posix_single_winner(tmp_path):
    final = tmp_path / "v1.json"
    t1, t2 = tmp_path / ".t1", tmp_path / ".t2"
    t1.write_text("a")
    t2.write_text("b")
    commitio.publish_exclusive(str(t1), str(final), "posix")
    with pytest.raises(FileExistsError):
        commitio.publish_exclusive(str(t2), str(final), "posix")
    assert final.read_text() == "a"


def test_snapshot_commits_on_object_backend(
    spark, tmp_path, object_backend, rename_forbidden
):
    """The full snapshot lifecycle (write, upsert, conflict, time travel)
    must run rename-free under the object strategy, and every readable
    version must be complete."""
    from ophidia_server_spark import layout

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, v long"
    )
    v1 = layout.snapshot_write(df, path, stats_cols=["k"])
    upd = spark.createDataFrame([(3, 999), (77, 770)], "k long, v long")
    r = layout.snapshot_upsert(spark, path, upd, ["k"])
    assert r["version"] == v1 + 1
    got = {
        t["k"]: t["v"] for t in layout.snapshot_read(spark, path).collect()
    }
    assert got[3] == 999 and got[77] == 770 and got[0] == 0
    old = {
        t["k"]: t["v"]
        for t in layout.snapshot_read(spark, path, version=v1).collect()
    }
    assert old[3] == 30 and 77 not in old  # old version fully intact
    # commit conflict: the second writer of the same version loses cleanly
    man_dir = os.path.join(path, "_manifests")
    tmp = os.path.join(man_dir, ".conflict.tmp")
    with open(tmp, "w") as fh:
        fh.write("{}")
    with pytest.raises(layout.SnapshotConflictError):
        layout._commit_manifest(path, r["version"], tmp)
    assert got == {
        t["k"]: t["v"] for t in layout.snapshot_read(spark, path).collect()
    }


def test_vector_compact_object_generations(
    spark, tables, tmp_path, object_backend, rename_forbidden
):
    """Object-scheme compaction: generation dir + pointer publish, no
    rename; probes identical before/after; re-compaction retires
    generations older than the grace window."""
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline import vector_store as vs

    emb = tables["embeddings"]
    n = emb.count()
    path = str(tmp_path / "ivf_obj")
    idx = vs.ivf_build(emb.filter(F.col("vec_id") < n - 5), path, n_cells=8)
    vs.index_append(emb.filter(F.col("vec_id") >= n - 5), idx)
    qv = [float(v) for v in emb.filter(F.col("vec_id") == n - 1)
          .select("embedding").first()[0]]
    before = [
        tuple(r) for r in vs.ivf_probe(spark, idx, qv, k=10, nprobe=4).collect()
    ]
    rep = vs.index_compact(spark, idx)
    assert rep["rows"] == n
    assert os.path.isfile(os.path.join(path, "_gen", "v1.json"))
    assert idx.path != path and idx.store_root() == path
    reopened = vs.load_index(path)
    assert reopened.path == idx.path
    after = [
        tuple(r)
        for r in vs.ivf_probe(spark, reopened, qv, k=10, nprobe=4).collect()
    ]
    assert after == before
    gen1_dir = idx.path
    rep2 = vs.index_compact(spark, reopened)
    assert rep2["rows"] == n
    # grace window: generation 1 retained after committing generation 2
    assert os.path.isdir(gen1_dir)
    vs.index_compact(spark, vs.load_index(path))
    # ...and retired once generation 3 lands
    assert not os.path.isdir(gen1_dir)
    final = vs.load_index(path)
    assert [
        tuple(r) for r in vs.ivf_probe(spark, final, qv, k=10, nprobe=4).collect()
    ] == before


def test_vector_compact_crash_before_pointer_serves_old(
    spark, tables, tmp_path, object_backend, rename_forbidden, monkeypatch
):
    """A crash AFTER the compacted generation is written but BEFORE the
    pointer publishes leaves the old store fully live (no half-visible
    version), and the next successful compaction sweeps the orphan."""
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline import vector_store as vs

    emb = tables["embeddings"]
    n = emb.count()
    path = str(tmp_path / "ivf_crash")
    idx = vs.ivf_build(emb, path, n_cells=8)
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()[0]]
    before = [
        tuple(r) for r in vs.ivf_probe(spark, idx, qv, k=5, nprobe=4).collect()
    ]

    real_publish = commitio.publish_exclusive

    def crash(*a, **k):
        raise OSError("simulated crash before pointer publish")

    monkeypatch.setattr(commitio, "publish_exclusive", crash)
    with pytest.raises(OSError, match="simulated crash"):
        vs.index_compact(spark, vs.load_index(path))
    monkeypatch.setattr(commitio, "publish_exclusive", real_publish)
    # old store fully live: no pointer, probes unchanged
    crashed = vs.load_index(path)
    assert crashed.path == path
    assert [
        tuple(r) for r in vs.ivf_probe(spark, crashed, qv, k=5, nprobe=4).collect()
    ] == before
    orphans = os.listdir(os.path.join(path, "_gendata"))
    assert len(orphans) == 1
    rep = vs.index_compact(spark, crashed)
    assert rep["rows"] == n
    # the crashed writer's orphan was swept; the committed gen remains
    left = os.listdir(os.path.join(path, "_gendata"))
    assert len(left) == 1 and left != orphans


def test_conditional_put_failed_write_withdraws_claim(tmp_path, monkeypatch):
    """A content-write failure after the O_EXCL create (disk full) must
    not leave a partial object claiming the version — retries would lose
    the create-exclusive race to a corrupt winner forever."""
    tmp, final = tmp_path / ".t", tmp_path / "v1.json"
    tmp.write_text("payload")

    def no_space(fd, data):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(os, "write", no_space)
    with pytest.raises(OSError, match="No space left"):
        commitio._conditional_put(str(tmp), str(final))
    monkeypatch.undo()
    assert not final.exists()
    commitio.publish_exclusive(str(tmp), str(final), "object")
    assert final.read_text() == "payload"
