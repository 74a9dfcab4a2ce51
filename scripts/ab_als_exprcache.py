"""Interleaved A/B: ALS (k, reg) expression-bundle cache vs per-call
rebuild (the round-14 _expr_bundle memoization). The "old" arm clears the
bundle cache before every _expr_bundle call, reproducing the per-half-step
expression construction the cache removes; plans and results identical.

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_als_exprcache.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time
from weakref import WeakKeyDictionary

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_server_spark.registry import _t  # noqa: E402
from ophidia_server_spark.session import get_spark  # noqa: E402
from ophidia_server_spark.pipeline import als as alsm  # noqa: E402

_ORIG_BUNDLE = alsm._expr_bundle


def _uncached_bundle(spark, k, reg):
    alsm._BUNDLES = WeakKeyDictionary()  # force a rebuild on every call
    return _ORIG_BUNDLE(spark, k, reg)


def run_once(spark, sf_dir) -> float:
    li = _t(spark, sf_dir)["lineitem"]
    orders = _t(spark, sf_dir)["orders"]
    t0 = time.perf_counter()
    ratings = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("user"),
                 F.col("l_partkey").alias("item"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("double").alias("rating"))
        .persist()
    )
    res = alsm.als(ratings, k=4, iters=3, reg=0.1)
    alsm.predict(res, ratings).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("prediction"), 6).alias("avg_pred"),
    ).collect()
    ratings.unpersist()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_als_exprcache")
    run_once(spark, sf_dir)  # warm
    old, new = [], []
    for _ in range(reps):
        alsm._expr_bundle = _uncached_bundle
        old.append(run_once(spark, sf_dir))
        alsm._expr_bundle = _ORIG_BUNDLE
        alsm._BUNDLES = WeakKeyDictionary()  # cold cache per rep: honest 1x build
        new.append(run_once(spark, sf_dir))
    print("old(per-call rebuild):", [round(x, 2) for x in old], "min", round(min(old), 2))
    print("new(bundle cache)    :", [round(x, 2) for x in new], "min", round(min(new), 2))


if __name__ == "__main__":
    main()
