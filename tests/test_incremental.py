"""Mergeable exact aggregate states (functions/incremental.py)."""

from pyspark.sql import functions as F

from ophidia_server_spark.functions import incremental as inc


def _rows(df):
    return {
        tuple(r[k] for k in ("event_type", "count", "sum", "min", "max", "avg",
                             "variance"))
        for r in df.collect()
    }


def test_merge_equals_whole_regardless_of_split(spark, tables):
    ev = tables["events"]
    whole = inc.finalize_state(
        inc.aggregate_state(ev, ["event_type"], "value"), ["event_type"]
    )
    for nb in (2, 3, 5):
        batches = [
            inc.aggregate_state(
                ev.filter(F.pmod(F.col("event_id"), F.lit(nb)) == i),
                ["event_type"], "value",
            )
            for i in range(nb)
        ]
        merged = inc.finalize_state(
            inc.merge_states(["event_type"], *batches), ["event_type"]
        )
        assert _rows(merged) == _rows(whole), nb


def test_merge_is_associative_and_tolerates_empty_batches(spark, tables):
    ev = tables["events"]
    a = inc.aggregate_state(ev.filter("event_id % 2 = 0"), ["event_type"], "value")
    b = inc.aggregate_state(ev.filter("event_id % 2 = 1"), ["event_type"], "value")
    empty = inc.aggregate_state(ev.filter("1 = 0"), ["event_type"], "value")
    left = inc.merge_states(["event_type"], inc.merge_states(["event_type"], a, b), empty)
    right = inc.merge_states(["event_type"], a, inc.merge_states(["event_type"], b, empty))
    f = lambda s: _rows(inc.finalize_state(s, ["event_type"]))  # noqa: E731
    assert f(left) == f(right)


def test_finalized_metrics_match_direct_aggregation(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 2.0)], "g string, v double"
    )
    out = {
        r["g"]: r.asDict()
        for r in inc.finalize_state(
            inc.aggregate_state(df, ["g"], "v"), ["g"]
        ).collect()
    }
    assert out["a"]["count"] == 3 and out["a"]["sum"] == 9.0
    assert out["a"]["min"] == 1.0 and out["a"]["max"] == 5.0
    assert out["a"]["avg"] == 3.0
    assert abs(out["a"]["variance"] - 8.0 / 3.0) < 1e-6
    assert out["b"]["variance"] == 0.0


def test_stream_maintained_state_equals_batch(spark, tables, tmp_path):
    # the stream-vs-batch equivalence law: maintaining the state over
    # micro-batches of a file stream ends at exactly the state a one-shot
    # batch aggregation computes
    src = str(tmp_path / "stream_src")
    state = str(tmp_path / "state")
    ev = tables["events"].select("event_id", "event_type", "value")
    # three "arrival" files so availableNow sees a multi-file backlog
    for i in range(3):
        ev.filter(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    inc.stream_maintain_state(
        spark, src, "event_id long, event_type string, value double",
        state, ["event_type"], "value",
    )
    streamed = inc.finalize_state(
        inc.read_state(spark, state), ["event_type"]
    )
    batch = inc.finalize_state(
        inc.aggregate_state(ev, ["event_type"], "value"), ["event_type"]
    )
    assert _rows(streamed) == _rows(batch)


def test_stream_state_resumes_on_new_arrivals(spark, tables, tmp_path):
    # second invocation picks up ONLY the new file (checkpoint + batch-id
    # marker make reprocessing idempotent) and the state still equals batch
    src = str(tmp_path / "resume_src")
    state = str(tmp_path / "resume_state")
    ev = tables["events"].select("event_id", "event_type", "value")
    first = ev.filter("event_id % 2 = 0")
    second = ev.filter("event_id % 2 = 1")
    first.coalesce(1).write.mode("append").parquet(src)
    schema = "event_id long, event_type string, value double"
    inc.stream_maintain_state(spark, src, schema, state, ["event_type"], "value")
    second.coalesce(1).write.mode("append").parquet(src)
    inc.stream_maintain_state(spark, src, schema, state, ["event_type"], "value")
    streamed = inc.finalize_state(inc.read_state(spark, state), ["event_type"])
    batch = inc.finalize_state(
        inc.aggregate_state(ev, ["event_type"], "value"), ["event_type"]
    )
    assert _rows(streamed) == _rows(batch)


def test_stream_state_replay_after_crash_does_not_double_merge(
    spark, tables, tmp_path
):
    # The ADVICE r7 window, driven through the exact foreachBatch body
    # (make_batch_folder): the process dies AFTER writing the g2 parquet
    # but BEFORE its commit marker lands, and the checkpoint also did not
    # commit — so batch 1 REPLAYS. It must fold against the last COMMITTED
    # generation (g1), overwrite the remnant, and land exactly once.
    import os

    state = str(tmp_path / "crash_state")
    ev = tables["events"].select("event_id", "event_type", "value")
    fold = inc.make_batch_folder(state, ["event_type"], "value")
    b0 = ev.filter("event_id % 2 = 0")
    b1 = ev.filter("event_id % 2 = 1")
    fold(b0, 0)
    fold(b1, 1)
    assert sorted(d for d in os.listdir(state) if d.startswith("g")) == ["g1", "g2"]
    one_shot = _rows(inc.finalize_state(
        inc.aggregate_state(ev, ["event_type"], "value"), ["event_type"]
    ))
    assert _rows(inc.finalize_state(inc.read_state(spark, state), ["event_type"])) \
        == one_shot

    # crash: strip g2's commit marker -> readers fall back to g1
    os.remove(os.path.join(state, "g2", "_batch"))
    g1 = spark.read.parquet(os.path.join(state, "g1"))
    assert _rows(inc.finalize_state(inc.read_state(spark, state), ["event_type"])) \
        == _rows(inc.finalize_state(g1, ["event_type"]))

    # replay of batch 1: no double merge, remnant overwritten and committed
    fold(b1, 1)
    assert _rows(inc.finalize_state(inc.read_state(spark, state), ["event_type"])) \
        == one_shot
    # a second replay of an already-committed batch is a no-op
    fold(b1, 1)
    assert sorted(d for d in os.listdir(state) if d.startswith("g")) == ["g1", "g2"]
    assert _rows(inc.finalize_state(inc.read_state(spark, state), ["event_type"])) \
        == one_shot


def test_incremental_view_maintenance_equals_direct_aggregate(
    spark, tables, tmp_path
):
    # The IVM law: maintaining a rollup state through a CDC diff (deletes,
    # plain updates, GROUP-MOVING updates, inserts — including ones that
    # remove a group's extremum) lands on exactly aggregate_state of the
    # new table content.
    from pyspark.sql import functions as F

    from ophidia_server_spark.layout import (
        snapshot_diff, snapshot_read, snapshot_write,
    )

    li = tables["lineitem"]

    def keyed(pred):
        return (
            li.filter(pred)
            .groupBy("l_orderkey", "l_linenumber")
            .agg(
                F.min("l_returnflag").alias("flag"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("qty"),
            )
        )

    base = keyed("l_orderkey < 1000")
    v2 = (
        base.filter("l_orderkey % 13 != 0")  # deletes
        .withColumn("qty", F.when(
            F.col("l_orderkey") % 7 == 0,
            (F.col("qty") + 1000).cast("decimal(18,2)"),
        ).otherwise(F.col("qty")))          # value updates
        .withColumn("flag", F.when(
            F.col("l_orderkey") % 11 == 0, F.lit("Z")
        ).otherwise(F.col("flag")))          # group-moving updates
        .unionByName(keyed("l_orderkey >= 1000 AND l_orderkey < 1100"))
    )
    path = str(tmp_path / "ivm")
    snapshot_write(base, path)
    snapshot_write(v2, path)
    state1 = inc.aggregate_state(snapshot_read(spark, path, 1), ["flag"], "qty")
    diff = snapshot_diff(
        spark, path, 1, 2, ["l_orderkey", "l_linenumber"],
        carry_cols=["flag", "qty"],
    )
    assert {r["change_type"] for r in diff.select("change_type").distinct().collect()} \
        == {"insert", "delete", "update"}
    st2 = inc.maintain_state_from_diff(
        state1, diff, snapshot_read(spark, path, 2), "flag", "qty"
    )
    direct = inc.aggregate_state(snapshot_read(spark, path, 2), ["flag"], "qty")

    def rows(st):
        cols = ("flag", "count", "sum", "min", "max", "avg", "variance")
        return {tuple(r[k] for k in cols)
                for r in inc.finalize_state(st, ["flag"]).collect()}

    assert rows(st2) == rows(direct)
    # the moved-to group exists, and no zero-count group survives
    flags = {r["flag"] for r in st2.select("flag").collect()}
    assert "Z" in flags
    assert st2.filter("n <= 0").count() == 0
