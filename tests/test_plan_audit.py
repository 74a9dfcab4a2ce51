"""plan_audit metric extraction (scripts/plan_audit.py audit_plan): the
counting contract that PLANS.md's regression flags depend on — executed
final plan only, ReusedExchange not a shuffle, SMJ nodes AQE replaced at
runtime not reported."""

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from plan_audit import audit_plan  # noqa: E402


def test_reused_exchange_not_counted_as_shuffle(spark):
    # a self-join of one aggregate produces 1 real exchange + 1
    # ReusedExchange in the final plan; the old lookbehind regex matched
    # the ', Exchange hashpartitioning' embedded in the ReusedExchange
    # line and reported 2
    base = spark.range(10_000).select((F.col("id") % 100).alias("k"))
    agg = base.groupBy("k").agg(F.count("*").alias("n"))
    j = agg.alias("a").join(
        agg.alias("b"), F.col("a.k") == F.col("b.k")
    ).select(F.col("a.k"), (F.col("a.n") + F.col("b.n")).alias("s"))
    j.collect()
    m = audit_plan(j)
    assert m["final"]
    assert m["shuffles"] == 1, m


def test_initial_plan_smj_not_reported(spark, tables):
    # two sf-fixture tables joined without hints: the initial plan may
    # carry SortMergeJoin, but AQE converts to broadcast at this size —
    # the audit must report the EXECUTED join strategy
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    orders = tables["orders"].select("o_orderkey", "o_orderdate")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy().count()
    j.collect()
    m = audit_plan(j)
    assert m["final"]
    assert m["smj"] == 0
    assert m["bhj"] >= 1
    # scans counted once each (not doubled by the Initial Plan section)
    assert m["scans"] == 2
