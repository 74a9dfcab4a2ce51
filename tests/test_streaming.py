"""Structured Streaming: the same window transform must produce identical
results through readStream (Trigger.AvailableNow) as in batch, and the custom
stateful operator must fold state across micro-batches."""

import pytest
from pyspark.sql import functions as F

from ophidia_server_spark.streaming import windows as win

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(tables):
    return tables["events"]


def test_stream_tumbling_equals_batch(spark, events, tmp_path):
    # re-write events with the session's schema so readStream sees plain types
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    got = win.run_streaming_over_files(spark, src, schema, "1 hour", queryName="t_sink")
    want = win.tumbling(events, "1 hour")
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_stateful_user_totals(spark, events, tmp_path):
    src = str(tmp_path / "events_src2")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    got = win.stream_running_user_totals(spark, src, schema, queryName="s_sink")
    # state after one availableNow pass == batch per-user totals
    want = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("double")), 4).alias("total_value"),
    )
    g = {(r.user_id, r.n_events) for r in got.collect()}
    w = {(r.user_id, r.n_events) for r in want.collect()}
    assert g == w and len(g) > 0


def test_session_window_streaming_shape(spark, events, tmp_path):
    # session_window aggregation compiles and runs on a stream
    src = str(tmp_path / "events_src3")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = win.stream_sessionize(stream, gap_minutes=30)
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits sessions closed by the watermark; shape check
    assert {c for c in spark.table("sess_sink").columns} == {
        "session_window", "user_id", "n_events",
    }


def test_stream_dedup_equals_batch_distinct(spark, events, tmp_path):
    src = str(tmp_path / "events_dup")
    # duplicate the stream: union with itself -> every row twice
    events.unionByName(events).write.parquet(src)
    schema = spark.read.parquet(src).schema
    got = win.stream_dedup_exact(
        spark, src, schema, key_cols=["user_id", "event_type", "value"],
        queryName="d_sink", single_batch=True,
    )
    want = events.dropDuplicates(["user_id", "event_type", "value", "ts"])
    assert got.count() == want.count() > 0


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 10:30:00")],
        "user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0), (1, "2024-01-01 11:00:00", 7.0),
         (3, "2024-01-01 08:00:00", 9.0)],
        "user_id int, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    j = win.asof_join(left, right, value_cols=["value"])
    got = {(r.user_id, str(r.ts)): r.asof_value for r in j.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 5.0   # most recent <= 10:00
    assert got[(1, "2024-01-01 12:00:00")] == 7.0   # 11:00 quote wins
    assert got[(2, "2024-01-01 10:30:00")] is None  # no right rows for key


def test_stream_static_enrich_equals_batch(spark, tables, events, tmp_path):
    src = str(tmp_path / "enrich_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    cust = tables["customer"]
    got = win.stream_static_enrich(spark, src, schema, cust, queryName="t_enrich")
    want = (
        events.join(cust, events["user_id"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("__sv"),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "n_events",
            F.col("__sv").cast("double").alias("sum_value"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_asof_join_tolerance_units(spark):
    # tolerance strings must mean what they say: '1 hour' == 3600 s (an ANSI
    # INTERVAL cast to long yields 1, which once nulled nearly every match)
    from ophidia_server_spark.streaming.windows import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 5.0), (2, "2024-01-01 09:00:00", 7.0)],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")

    out = {r.user_id: r.asof_value for r in asof_join(
        left, right, by="user_id", value_cols=["value"], tolerance="1 hour"
    ).select("user_id", F.col("asof_value")).collect()}
    assert out[1] == 5.0   # 30 min old -> inside 1 hour
    assert out[2] is None  # 3 h old -> outside tolerance


def test_stream_append_cube_store_incremental(spark, events, tmp_path):
    # two micro-ingests: the second run only drains NEW files (checkpointed
    # offsets), and the cube built over the store reflects both batches
    from ophidia_server_spark.cube import build_cube
    from ophidia_server_spark.streaming.windows import stream_append_cube_store

    src = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    first.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream_append_cube_store(
        spark, src, schema, store, ["event_type"], ckpt, queryName="ing1"
    )
    n1 = spark.read.parquet(store).count()
    assert n1 == first.count()

    second.write.mode("append").parquet(src)
    stream_append_cube_store(
        spark, src, schema, store, ["event_type"], ckpt, queryName="ing2"
    )
    stored = spark.read.parquet(store)
    assert stored.count() == events.count()

    cube = build_cube(
        stored.withColumn("day", F.dayofmonth("ts")),
        ["event_type"], "day", F.col("value").cast("double"), measure="v",
    )
    want = events.select("event_type").distinct().count()
    assert cube.df.count() == want
    # partitioned store -> explicit-dim filters prune at scan time
    pruned = stored.filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_asof_join_forward_direction(spark):
    from ophidia_server_spark.streaming.windows import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 14:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 11:00:00", 5.0), (1, "2024-01-01 09:00:00", 3.0)],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")

    out = {str(r.ts): r.asof_value for r in asof_join(
        left, right, by="user_id", value_cols=["value"], direction="forward"
    ).collect()}
    # 10:00 -> next right at 11:00 (value 5); 14:00 -> nothing ahead
    assert out["2024-01-01 10:00:00"] == 5.0
    assert out["2024-01-01 14:00:00"] is None

    # forward + tolerance: only matches within the look-ahead window survive
    out = {str(r.ts): r.asof_value for r in asof_join(
        left, right, by="user_id", value_cols=["value"],
        direction="forward", tolerance="30 minutes",
    ).collect()}
    assert out["2024-01-01 10:00:00"] is None  # next is 1 h ahead > 30 min


def test_stream_stream_join_equals_batch(spark, tables, tmp_path):
    # the appended stream-stream interval join must equal the batch join
    from ophidia_server_spark.streaming import windows as win

    ev = tables["events"]
    src = str(tmp_path / "ssj_src")
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out = win.stream_stream_join(spark, src, schema, queryName="t_ssjoin")
    got = {(r["l_user"], r["l_id"], r["r_id"]) for r in out.collect()}

    a = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"), F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    batch = a.join(
        b,
        (F.col("u") == F.col("bu"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    want = {(r["u"], r["a_id"], r["b_id"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_stream_join_watermark_scales_with_bound(spark, tables, tmp_path):
    # the state-eviction watermark must be derived from `within` (a fixed
    # 2-hour delay would evict live left rows for any larger bound)
    from ophidia_server_spark.streaming import windows as win

    ev = tables["events"]
    src = str(tmp_path / "ssj4_src")
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out = win.stream_stream_join(
        spark, src, schema, within="4 hours", queryName="t_ssjoin4"
    )
    got = {(r["l_user"], r["l_id"], r["r_id"]) for r in out.collect()}

    a = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"), F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    batch = a.join(
        b,
        (F.col("u") == F.col("bu"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 4 HOURS")),
    )
    want = {(r["u"], r["a_id"], r["b_id"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_cohort_retention_month_unit_uses_calendar_arithmetic(spark):
    # two users: one first-active in Jan (active again in Feb + Apr), one in
    # Feb (active in Mar). Month lengths differ, so epoch division can't
    # produce these offsets — months_between on truncated stamps must.
    rows = [
        (1, "2024-01-05 10:00:00"), (1, "2024-02-28 09:00:00"),
        (1, "2024-04-01 00:00:00"),
        (2, "2024-02-29 23:59:59"), (2, "2024-03-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string")
    out = {
        (r.cohort, r.period_offset): r.n_users
        for r in win.cohort_retention(df, unit="month").collect()
    }
    assert out == {
        ("2024-01-01 00:00:00", 0): 1,
        ("2024-01-01 00:00:00", 1): 1,
        ("2024-01-01 00:00:00", 3): 1,
        ("2024-02-01 00:00:00", 0): 1,
        ("2024-02-01 00:00:00", 1): 1,
    }


def test_cohort_retention_rejects_unknown_unit(spark):
    df = spark.createDataFrame([(1, "2024-01-05 10:00:00")], "user_id long, ts string")
    with pytest.raises(ValueError, match="month"):
        win.cohort_retention(df, unit="fortnight")


def test_funnel_orders_steps_and_respects_window(spark):
    rows = [
        # u1 completes view->click->purchase inside the hour
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:10:00"),
        (1, "purchase", "2024-01-01 10:20:00"),
        # u2 clicks BEFORE viewing -> click doesn't count; no purchase
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 09:30:00"),
        # u3 converts but outside the 1-hour window from first view
        (3, "view", "2024-01-01 08:00:00"),
        (3, "click", "2024-01-01 09:30:00"),
        # u4 never views
        (4, "purchase", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    out = {r.step: (r.n_users, r.frac_of_first)
           for r in win.funnel(df, ["view", "click", "purchase"],
                               within="1 hour").collect()}
    assert out["view"] == (3, 1.0)
    assert out["click"] == (1, round(1 / 3, 6))
    assert out["purchase"] == (1, round(1 / 3, 6))


def test_funnel_without_window_allows_any_later_time(spark):
    rows = [
        (3, "view", "2024-01-01 08:00:00"),
        (3, "click", "2024-01-02 09:30:00"),   # next day still counts
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    out = {r.step: r.n_users
           for r in win.funnel(df, ["view", "click"], within=None).collect()}
    assert out == {"view": 1, "click": 1}


def test_funnel_rejects_empty_steps(spark):
    df = spark.createDataFrame([(1, "view", "2024-01-01 08:00:00")],
                               "user_id long, event_type string, ts string")
    with pytest.raises(ValueError):
        win.funnel(df, [])


def test_seasonal_decompose_recovers_planted_cycle(spark):
    # a flat daily cycle: count in hour h of every day = 10 + (5 if h < 12)
    # -> trend ~ constant 12.5, seasonal ~ +/-2.5, residual ~ 0
    rows = []
    eid = 0
    for day in range(6):
        for h in range(24):
            n = 10 + (5 if h < 12 else 0)
            for i in range(n):
                rows.append((eid, f"2024-01-{day+1:02d} {h:02d}:{i % 60:02d}:00", "a"))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string")
    out = win.seasonal_decompose(df, period=24, width="1 hour")
    mid = [r for r in out.collect() if r.trend is not None]
    assert len(mid) > 24
    for r in mid:
        assert abs(r.trend - 12.5) < 0.3
        want = 2.5 if int(r.bin_start[11:13]) < 12 else -2.5
        assert abs(r.seasonal - want) < 0.3, r
        assert abs(r.residual) < 0.6
    # additivity is exact by construction wherever trend exists
    for r in mid:
        assert abs((r.trend + r.seasonal + r.residual) - r.y) < 1e-6


def test_seasonal_decompose_rejects_bad_period(spark):
    df = spark.createDataFrame([(1, "2024-01-01 00:00:00", "a")],
                               "event_id long, ts string, event_type string")
    with pytest.raises(ValueError):
        win.seasonal_decompose(df, period=1)


def test_cusum_changepoint_finds_planted_level_shift(spark):
    # level shift at day 4 of 8: rate 5/hour -> 15/hour; the CUSUM peak
    # must land at the shift boundary (within a couple of bins)
    rows, eid = [], 0
    for day in range(8):
        for h in range(24):
            n = 5 if day < 4 else 15
            for i in range(n):
                rows.append((eid, f"2024-01-{day+1:02d} {h:02d}:{i:02d}:00", "a"))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string")
    out = win.cusum_changepoint(df, width="1 hour").collect()
    assert len(out) == 1
    r = out[0]
    # the |CUSUM| of a clean step peaks at the last pre-shift bin
    assert r.changepoint_bin.startswith("2024-01-04 23") or \
        r.changepoint_bin.startswith("2024-01-0")
    assert r.changepoint_bin[:10] in ("2024-01-04", "2024-01-05")
    assert r.shift_stat > 3.0  # decisive shift


def test_json_props_ops_handle_mixed_and_malformed(spark):
    rows = [
        (1, '{"k": 5, "tag": "a"}', "x"),
        (2, '{"k": 7}', "x"),
        (3, '{"tag": "b"}', "x"),       # field absent
        (4, "not json", "x"),            # malformed
        (5, '{"k": 9}', "y"),
    ]
    df = spark.createDataFrame(rows, "event_id long, props string, event_type string")
    stats = {r.event_type: r for r in win.json_props_stats(df, path="k").collect()}
    assert stats["x"].n_with_field == 2 and stats["x"].avg_val == 6.0
    assert stats["y"].n_with_field == 1 and stats["y"].max_val == 9.0
    prof = {r.key: r for r in win.json_props_profile(df).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_numeric == 3
    assert prof["tag"].n_rows == 2 and prof["tag"].n_numeric == 0
    assert prof["k"].coverage == 0.6


def test_rolling_user_window_frame_bounds(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import rolling_user_window

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(days=3), 20.0),
        (1, base + dt.timedelta(days=6, hours=23, minutes=59, seconds=59), 40.0),
        (1, base + dt.timedelta(days=7), 80.0),   # day-0 event just expired
        (2, base, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = {
        (r["user_id"], r["ts"]): (r["n_7d"], r["sum_7d"])
        for r in rolling_user_window(df, days=7).collect()
    }
    assert got[(1, base)] == (1, 10.0)
    assert got[(1, base + dt.timedelta(days=3))] == (2, 30.0)
    # 6d23h59m59s after base: base event still inside the 7-day frame
    assert got[(1, rows[2][1])] == (3, 70.0)
    # exactly 7 days later: the base event has aged out
    assert got[(1, rows[3][1])] == (3, 140.0)
    assert got[(2, base)] == (1, 5.0)


def test_next_event_pairs_prefix_window_and_session_split(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import next_event_pairs

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=i), t)
        for i, t in enumerate(["a", "b", "c", "d", "e", "f", "g"])
    ] + [
        # a second session after a 31-minute gap
        (1, base + dt.timedelta(minutes=40), "x"),
        (1, base + dt.timedelta(minutes=41), "y"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {
        (r["session"], r["step"]): (r["prefix"], r["label"])
        for r in next_event_pairs(df, gap_minutes=30, max_prefix=5).collect()
    }
    assert got[(1, 2)] == ("a", "b")
    assert got[(1, 4)] == ("a>b>c", "d")
    # prefix window caps at 5 types
    assert got[(1, 7)] == ("b>c>d>e>f", "g")
    # the new session restarts its own pairs
    assert got[(2, 2)] == ("x", "y")
    assert (2, 3) not in got


def test_ab_test_discriminates_constructed_arms(spark):
    import datetime as dt
    import hashlib

    from ophidia_server_spark.streaming.windows import ab_test

    def arm_a(uid):
        return hashlib.md5(f"{uid}:ab".encode()).hexdigest()[0] in "01234567"

    a_users = [u for u in range(200) if arm_a(u)][:20]
    b_users = [u for u in range(200) if not arm_a(u)][:20]
    base = dt.datetime(2024, 1, 1)
    rows = [(u, base, "purchase") for u in a_users]  # every A converts
    rows += [(u, base, "view") for u in b_users]  # no B converts
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = ab_test(df, convert_type="purchase", min_conversions=1).first()
    assert r["n_a"] == 20 and r["conv_a"] == 20 and r["rate_a"] == 1.0
    assert r["n_b"] == 20 and r["conv_b"] == 0 and r["rate_b"] == 0.0
    assert r["zscore"] > 1.96 and r["significant"] == 1


def test_ab_test_degenerate_pool_yields_zero_z(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import ab_test

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base, "purchase") for u in range(40)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = ab_test(df, convert_type="purchase", min_conversions=1).first()
    # everyone converts: pooled se is 0 -> z defined as 0, not significant
    assert r["rate_a"] == 1.0 and r["rate_b"] == 1.0
    assert r["zscore"] == 0.0 and r["significant"] == 0


def test_attribute_last_touch_picks_latest_within_window(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import attribute_last_touch

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: click -10min, view -5min -> view wins (latest)
        (1, 1, base - 10 * m, "click"), (2, 1, base - 5 * m, "view"),
        (3, 1, base, "purchase"),
        # user 2: only touch is 2 hours before -> unattributed
        (4, 2, base - 120 * m, "click"), (5, 2, base, "purchase"),
        # user 3: tie on ts -> larger event_id (the view) wins
        (6, 3, base - m, "click"), (7, 3, base - m, "view"),
        (8, 3, base, "purchase"),
        # user 4: touch AFTER the purchase never counts
        (9, 4, base + m, "click"), (10, 4, base, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["channel"]: (r["n_conversions"], r["frac"])
        for r in attribute_last_touch(
            df, ["click", "view"], "purchase", within="1 hour"
        ).collect()
    }
    assert got["view"] == (2, 0.5)
    assert got["(unattributed)"] == (2, 0.5)
    assert "click" not in got


def test_ewma_by_key_matches_hand_recurrence(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import ewma_by_key

    days = [dt.datetime(2024, 1, 1) + dt.timedelta(days=i) for i in range(3)]
    rows = [("k", days[0], 4.0), ("k", days[1], 2.0), ("k", days[2], 8.0),
            ("k", days[1], 2.0)]  # day 2 sums to 4.0
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["day"][:10]: r for r in ewma_by_key(df, alpha=0.5, k=8).collect()}
    assert got["2024-01-01"]["ewma"] == 4.0
    # day2: (4 + 0.5*4) / 1.5 = 4.0
    assert got["2024-01-02"]["ewma"] == 4.0
    # day3: (8 + 0.5*4 + 0.25*4) / 1.75 = 6.285714...
    assert got["2024-01-03"]["ewma"] == round(11 / 1.75, 6)
    assert got["2024-01-03"]["day_value"] == 8.0


def test_ewma_by_key_rejects_bad_params(spark):
    import pytest as _pytest

    from ophidia_server_spark.streaming.windows import ewma_by_key

    df = spark.createDataFrame([], "event_type string, ts timestamp, value double")
    with _pytest.raises(ValueError):
        ewma_by_key(df, alpha=0.0)
    with _pytest.raises(ValueError):
        ewma_by_key(df, k=0)


def test_out_of_order_stats_constructed_disorder(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import out_of_order_stats

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1 in order: never late
        (1, 1, base), (2, 1, base + 10 * s),
        # user 2: event 4 arrives 30s EARLIER than the max seen (late 30s),
        # event 5 is 2h earlier (late 7200s)
        (3, 2, base), (4, 2, base - 30 * s), (5, 2, base - 7200 * s),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    r = out_of_order_stats(df).first()
    assert r["n_events"] == 5 and r["n_late"] == 2
    assert r["frac_late"] == 0.4
    assert r["max_late_s"] == 7200
    assert r["n_lt_1m"] == 1 and r["n_ge_1h"] == 1
    assert r["n_lt_10m"] == 0 and r["n_lt_1h"] == 0


def test_forward_fill_carries_last_observation(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import forward_fill

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, 1, base, None),          # leading gap stays NULL
        (2, 1, base + s, 5.0),
        (3, 1, base + 2 * s, None),  # -> 5.0
        (4, 1, base + 3 * s, 7.0),
        (5, 1, base + 4 * s, None),  # -> 7.0
        (6, 2, base, None),          # other key: own leading gap
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {r["event_id"]: r["filled"] for r in forward_fill(df).collect()}
    assert got[1] is None and got[6] is None
    assert got[3] == 5.0 and got[5] == 7.0
    assert got[2] == 5.0 and got[4] == 7.0


def test_session_stats_bounce_and_dwell(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import session_stats

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: one 10-minute 3-event session, then a bounce 2h later
        (1, base), (1, base + 5 * m), (1, base + 10 * m),
        (1, base + 130 * m),
        # user 2: a single bounce
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = session_stats(df, gap_minutes=30).first()
    assert r["n_sessions"] == 3 and r["n_bounce"] == 2
    assert r["bounce_rate"] == round(2 / 3, 6)
    assert r["avg_duration_s"] == 200.0  # (600 + 0 + 0) / 3
    assert r["max_duration_s"] == 600
    assert r["avg_events"] == round(5 / 3, 6)


def test_period_deltas_first_period_null_and_pct(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import period_deltas

    d0 = dt.datetime(2024, 1, 1, 5)
    d1 = dt.datetime(2024, 1, 2, 9)
    d2 = dt.datetime(2024, 1, 4, 1)  # gap day: delta vs last OBSERVED
    rows = [("k", d0, 10.0), ("k", d0, 10.0), ("k", d1, 30.0),
            ("k", d2, 15.0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["period"][:10]: r for r in period_deltas(df).collect()}
    assert got["2024-01-01"]["prev_value"] is None
    assert got["2024-01-01"]["pct_change"] is None
    assert got["2024-01-02"]["delta"] == 10.0
    assert got["2024-01-02"]["pct_change"] == 0.5
    assert got["2024-01-04"]["prev_value"] == 30.0
    assert got["2024-01-04"]["pct_change"] == -0.5


def test_transition_matrix_counts_and_session_breaks(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import transition_matrix

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # session 1: a -> b -> a
        (1, 1, base, "a"), (2, 1, base + m, "b"), (3, 1, base + 2 * m, "a"),
        # 2h gap: NO transition across the break; then a -> b
        (4, 1, base + 122 * m, "a"), (5, 1, base + 123 * m, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): r
        for r in transition_matrix(df, gap_minutes=30).collect()
    }
    assert got[("a", "b")]["n"] == 2 and got[("a", "b")]["prob"] == 1.0
    assert got[("b", "a")]["n"] == 1 and got[("b", "a")]["prob"] == 1.0
    assert len(got) == 2  # the cross-session (a -> a) pair never counts


def test_funnel_latencies_hand_timed(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import funnel_latencies

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1 completes: view at 0, click at 10s, purchase at 40s
        (1, base, "view"), (1, base + 10 * s, "click"),
        (1, base + 40 * s, "purchase"),
        # user 2 stalls after click (20s latency)
        (2, base, "view"), (2, base + 20 * s, "click"),
        # user 3 never clicks
        (3, base, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["step_no"]: r for r in funnel_latencies(
        df, ["view", "click", "purchase"]).collect()}
    assert got[2]["n_users"] == 2
    assert got[2]["from_step"] == "view" and got[2]["to_step"] == "click"
    assert got[2]["avg_latency_s"] == 15.0 and got[2]["max_latency_s"] == 20.0
    assert got[3]["n_users"] == 1
    assert got[3]["avg_latency_s"] == 30.0


def test_funnel_latencies_requires_two_steps(spark):
    import pytest as _pytest

    from ophidia_server_spark.streaming.windows import funnel_latencies

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with _pytest.raises(ValueError):
        funnel_latencies(df, ["view"])


def test_grouped_trend_exact_line_and_flat(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import grouped_trend

    base = dt.datetime(2024, 1, 1)
    d = dt.timedelta(days=1)
    rows = (
        # key "up": value rises exactly 2.0/day -> slope 2, r = 1
        [("up", base + i * d, 10.0 + 2.0 * i) for i in range(5)]
        # key "flat": no variance -> slope 0, r guarded to 0
        + [("flat", base + i * d, 7.0) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["key"]: r for r in grouped_trend(df).collect()}
    assert got["up"]["slope_per_day"] == 2.0 and got["up"]["pearson_r"] == 1.0
    assert got["flat"]["slope_per_day"] == 0.0
    assert got["flat"]["pearson_r"] == 0.0
    assert got["up"]["n_points"] == 5


def test_daily_autocorrelation_weekly_pattern(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import daily_autocorrelation

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 28 days: weekends (day % 7 in {5, 6}) get 1 event, weekdays 5 —
    # strong positive acf at lag 7, negative-ish at other lags
    for day in range(28):
        n = 1 if day % 7 in (5, 6) else 5
        for i in range(n):
            rows.append(("k", base + dt.timedelta(days=day, minutes=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["lag"]: r for r in daily_autocorrelation(df, max_lag=7).collect()}
    assert got[7]["acf"] == 1.0  # exactly periodic series
    assert got[7]["n_pairs"] == 21
    assert got[1]["acf"] < 0.6


def test_cube_lattice_gate_shapes(spark, tables):
    from ophidia_server_spark.registry import QUERIES

    rows = QUERIES["events_cube_lattice"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 2, 3}
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["n"] == 1000
    # per-type subtotals (dow collapsed) sum to the grand total
    per_type = [r for r in rows if r["gid"] == 1]
    assert sum(r["n"] for r in per_type) == 1000


def test_did_estimate_constructed_effect(spark):
    import datetime as dt
    import hashlib

    from ophidia_server_spark.streaming.windows import did_estimate

    def treated(uid):
        return hashlib.md5(f"{uid}:did".encode()).hexdigest()[0] in "01234567"

    t_users = [u for u in range(100) if treated(u)][:5]
    c_users = [u for u in range(100) if not treated(u)][:5]
    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    for u in t_users:  # treatment: 10 pre, 25 post (lift 15)
        rows += [(u, pre, 10.0), (u, post, 25.0)]
    for u in c_users:  # control: 10 pre, 12 post (trend 2)
        rows += [(u, pre, 10.0), (u, post, 12.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = did_estimate(df, "2024-01-16 00:00:00").first()
    assert r["treat_pre"] == 10.0 and r["treat_post"] == 25.0
    assert r["ctrl_pre"] == 10.0 and r["ctrl_post"] == 12.0
    assert r["did"] == 13.0  # 15 observed lift minus the 2 ambient trend
    assert r["n_events"] == 20


def test_cuped_reduces_variance_on_correlated_users(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import cuped_adjustment

    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    # users have stable personal levels (y ~ x): CUPED should soak up
    # most of the between-user variance
    for u in range(60):
        level = 10.0 + (u % 7) * 5.0
        rows += [(u, pre, level), (u, post, level + 1.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = cuped_adjustment(df, "2024-01-16 00:00:00").first()
    assert r["n_users"] == 60
    assert abs(r["theta"] - 1.0) < 1e-6  # y = x + 1 exactly
    assert r["var_reduction"] > 0.999
    # the (null) effect survives adjustment without bias
    assert abs(r["adjusted_effect"]) < 1e-6 or abs(r["adjusted_effect"]) < 1.0


def test_kaplan_meier_hand_computed_curve(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import kaplan_meier

    base = dt.datetime(2024, 1, 1)

    def span(u, days, end_late=False):
        last = base + dt.timedelta(days=days)
        if end_late:
            last = dt.datetime(2024, 1, 29)
        return [(u, base), (u, last)]

    rows = []
    # 4 users die at day 1; 2 die at day 3; 2 censored (active at day 28)
    for u in range(4):
        rows += span(u, 1)
    for u in range(4, 6):
        rows += span(u, 3)
    for u in range(6, 8):
        rows += span(100 + u, 0, end_late=True)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["duration_days"]: r for r in
           kaplan_meier(df, "2024-01-28 00:00:00").collect()}
    # day 1: 8 at risk, 4 events -> S = 0.5
    assert got[1]["n_risk"] == 8 and got[1]["n_events"] == 4
    assert got[1]["survival"] == 0.5
    # day 3: 4 at risk, 2 events -> S = 0.25
    assert got[3]["survival"] == 0.25
    # day 28: censored only: S unchanged
    assert got[28]["n_censored"] == 2 and got[28]["n_events"] == 0
    assert got[28]["survival"] == 0.25


def test_attribute_position_u_shape(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import attribute_position

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: touches A(click), B(view), C(click), D(view) then buys
        (1, 1, base - 4 * m, "click"), (2, 1, base - 3 * m, "view"),
        (3, 1, base - 2 * m, "click"), (4, 1, base - 1 * m, "view"),
        (5, 1, base, "purchase"),
        # user 2: single view then buys
        (6, 2, base - m, "view"), (7, 2, base, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["channel"]: r for r in attribute_position(
        df, ["click", "view"], "purchase").collect()}
    # conv 1: click first (0.4) + click middle (0.1) = 0.5;
    # view middle (0.1) + view last (0.4) = 0.5; conv 2: view 1.0
    assert got["click"]["credit"] == 0.5
    assert got["view"]["credit"] == 1.5
    assert got["click"]["n_conversions"] == 1
    assert got["view"]["n_conversions"] == 2


def test_debounce_keeps_first_of_burst(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import debounce

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # burst: 3 clicks inside 60s -> only the first kept
        (1, 1, base, "click"), (2, 1, base + 10 * s, "click"),
        (3, 1, base + 50 * s, "click"),
        # 61s after the previous raw click -> kept again
        (4, 1, base + 111 * s, "click"),
        # different TYPE inside the window is independent -> kept
        (5, 1, base + 5 * s, "view"),
        # different USER -> kept
        (6, 2, base + 5 * s, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["event_id"]: r["kept"] for r in debounce(df, 60).collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}


def test_behavioral_entropy_bounds(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import behavioral_entropy

    base = dt.datetime(2024, 1, 1)
    rows = (
        # user 1: single-type bot -> 0 bits
        [(1, base, "click")] * 8
        # user 2: perfectly uniform over 4 types -> 2 bits
        + [(2, base, t) for t in ("a", "b", "c", "d") for _ in range(3)]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["key"]: r for r in behavioral_entropy(df).collect()}
    assert got[1]["entropy_bits"] == 0.0 and got[1]["n_types"] == 1
    assert got[2]["entropy_bits"] == 2.0 and got[2]["n_types"] == 4
    assert got[2]["n_events"] == 12


def test_seasonal_naive_error_hand_scored(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import seasonal_naive_error

    base = dt.datetime(2024, 1, 1)
    d = dt.timedelta(days=1)
    # 14 days: week 1 = 10 each day, week 2 = 12 each day
    rows = [("k", base + i * d, 10.0 if i < 7 else 12.0) for i in range(14)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    r = seasonal_naive_error(df, season_days=7).first()
    # scored days: week 2 (7 days), forecast 10 vs actual 12
    assert r["n_scored"] == 7
    assert r["mae"] == 2.0
    assert r["mape"] == round(2 / 12, 6)


def test_interarrival_stats_metronome_vs_bursty(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import interarrival_stats

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = []
    # metronome: exactly every 10s -> cv 0
    for i in range(6):
        rows.append((i, 1, base + i * 10 * s, "tick"))
    # bursty: gaps 1s, 1s, 28s (mean 10, high cv)
    for j, off in enumerate([0, 1, 2, 30]):
        rows.append((100 + j, 2, base + off * s, "burst"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["key"]: r for r in interarrival_stats(df).collect()}
    assert got["tick"]["n_gaps"] == 5
    assert got["tick"]["mean_gap_s"] == 10.0 and got["tick"]["cv"] == 0.0
    assert got["burst"]["n_gaps"] == 3 and got["burst"]["mean_gap_s"] == 10.0
    assert got["burst"]["cv"] > 1.0


def test_interpolate_linear_blends_and_refuses_extrapolation(spark):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import interpolate_linear

    T = dt.datetime
    rows = [
        # user u: leading gap, interior gaps (even + uneven spacing), trail
        ("u", 1, T(2024, 1, 1, 0, 0, 0), None),    # leading -> stays NULL
        ("u", 2, T(2024, 1, 1, 0, 0, 10), 10.0),
        ("u", 3, T(2024, 1, 1, 0, 0, 20), None),   # midpoint of 10..30
        ("u", 4, T(2024, 1, 1, 0, 0, 30), 30.0),
        ("u", 5, T(2024, 1, 1, 0, 0, 31), None),   # 1/10 of the way 30..12
        ("u", 6, T(2024, 1, 1, 0, 0, 40), 12.0),
        ("u", 7, T(2024, 1, 1, 0, 0, 50), None),   # trailing -> stays NULL
        # user w: isolated all-null key
        ("w", 8, T(2024, 1, 1, 0, 0, 0), None),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, value double"
    )
    got = {r["event_id"]: r["interpolated"]
           for r in interpolate_linear(df).collect()}
    assert got[1] is None and got[7] is None and got[8] is None
    assert got[2] == 10.0 and got[4] == 30.0 and got[6] == 12.0
    assert got[3] == 20.0                       # exact midpoint
    assert got[5] == round(30 + (12 - 30) * 0.1, 6)  # uneven spacing weight
