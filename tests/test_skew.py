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
