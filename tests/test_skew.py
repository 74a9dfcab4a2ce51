"""Salted join must be result-identical to the plain join while spreading any
single key across n_salt shards."""

from pyspark.sql import functions as F

from ophidia_server_spark.functions.skew import salted_join, skew_stats


def test_salted_join_equals_plain(tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    orders = tables["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    plain = li.join(orders, on=["l_orderkey"]).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).alias("s")
    )
    salted = salted_join(li, orders, on=["l_orderkey"], n_salt=4).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).alias("s")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left_outer(tables):
    li = tables["lineitem"].select("l_orderkey").distinct()
    orders = tables["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    plain = li.join(orders, on=["l_orderkey"], how="left").count()
    salted = salted_join(li, orders, on=["l_orderkey"], n_salt=3, how="left").count()
    assert plain == salted


def test_skew_stats_shape(tables):
    st = skew_stats(tables["lineitem"], ["l_returnflag"], top=3)
    rows = st.collect()
    assert len(rows) == 3
    assert rows[0].n_rows >= rows[-1].n_rows
    assert 0 < rows[0].share <= 1.0


def test_bucketed_range_join_equals_theta(spark, tables):
    from ophidia_server_spark.functions.joins import bucketed_range_join

    ev = tables["events"].select("ts", "user_id")
    iv = ev.groupBy("user_id").agg(
        F.min("ts").alias("lo"), (F.min("ts") + F.expr("INTERVAL 6 HOURS")).alias("hi")
    ).drop("user_id").limit(20)
    theta = ev.join(iv, (F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi"))).count()
    bucketed = bucketed_range_join(ev, iv, "ts", "lo", "hi", bucket_seconds=3600).count()
    assert theta == bucketed > 0
    # and the bucketized plan is a real hash join, not a nested loop
    plan = bucketed_range_join(ev, iv, "ts", "lo", "hi", 3600)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
